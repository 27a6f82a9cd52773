from go1_qp_mpc_controller_tpu.config import params  # noqa: F401
