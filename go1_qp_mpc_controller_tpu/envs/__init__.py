from go1_qp_mpc_controller_tpu.envs import srb_sim  # noqa: F401
