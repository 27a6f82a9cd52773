from go1_qp_mpc_controller_tpu.parallel import mesh, sweep  # noqa: F401
