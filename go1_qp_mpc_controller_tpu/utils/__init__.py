from go1_qp_mpc_controller_tpu.utils import bezier, filters, rotations  # noqa: F401
