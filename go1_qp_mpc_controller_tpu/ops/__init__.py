from go1_qp_mpc_controller_tpu.ops import admm, ekf, qp  # noqa: F401
