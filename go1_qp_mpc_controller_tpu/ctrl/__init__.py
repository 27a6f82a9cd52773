from go1_qp_mpc_controller_tpu.ctrl import (  # noqa: F401
    controller,
    gait,
    swing,
    terrain,
    torque,
)
