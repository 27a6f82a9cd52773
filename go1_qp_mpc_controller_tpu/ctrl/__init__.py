from go1_qp_mpc_controller_tpu.ctrl import (  # noqa: F401
    command,
    controller,
    gait,
    swing,
    terrain,
    torque,
)
