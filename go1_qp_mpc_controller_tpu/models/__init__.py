from go1_qp_mpc_controller_tpu.models import kinematics, srb, types  # noqa: F401
