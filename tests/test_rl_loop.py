"""RL host loop over the bridge (R2/R6): estimation + observation +
policy/servo as one jitted step against the sim feeder, position-mode
commands out (Go1RLHardwareController / Go1HardwareObservation /
servo_stand_policy parity)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.ctrl import rl
from go1_qp_mpc_controller_tpu.models import policy as policy_lib
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.runtime import feeder as feeder_lib
from go1_qp_mpc_controller_tpu.runtime import rl_loop as rl_loop_lib


def test_rl_loop_servo_then_walk():
    model = types.default_robot_model(jnp.float32)
    params = types.default_ctrl_params(jnp.float32)
    actor = policy_lib.init_mlp(jax.random.PRNGKey(0))
    loop = rl_loop_lib.RLControlLoop(model, actor, action_period_s=0.004,
                                     hardware=True, time_scale=0.5)
    feeder = None
    try:
        loop.warmup()
        feeder = feeder_lib.SimFeeder(loop.bridge, model, params,
                                      height=0.3, period_s=0.002,
                                      time_scale=0.5)
        feeder.start(duration_s=30.0)
        loop.start(duration_s=8.0)
        time.sleep(2.0)
        # servo phase: crouch interpolation with servo gains
        assert int(loop.rl_state.movement_mode) == 0
        _, cmd = loop.bridge.read_command()
        np.testing.assert_allclose(cmd["kp"], np.asarray(rl.SERVO_P_GAINS))
        assert np.all(np.isfinite(feeder.sim_root_pos))
        assert 0.15 < feeder.sim_root_pos[2] < 0.35
        # A-button: switch to the walk policy
        loop.toggle = True
        time.sleep(1.5)
        assert int(loop.rl_state.movement_mode) == 1
        _, cmd = loop.bridge.read_command()
        np.testing.assert_allclose(cmd["kp"], np.asarray(rl.WALK_P_GAINS))
        # position targets clipped to joint limits by the controller AND
        # the bridge's PositionLimit clamp
        assert np.all(cmd["q"] >= np.asarray(rl.CLIP_POSE_LOWER) - 1e-6)
        assert np.all(cmd["q"] <= np.asarray(rl.CLIP_POSE_UPPER) + 1e-6)
        assert loop.ticks > 100
        loop.stop()
        feeder.stop()
        assert np.all(np.isfinite(feeder.sim_root_pos))
    finally:
        if feeder is not None:
            feeder.stop()
        loop.close()
