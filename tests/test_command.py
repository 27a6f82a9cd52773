"""Joystick command processing tests (GazeboA1ROS.cpp:117-190 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.ctrl import command
from go1_qp_mpc_controller_tpu.models import types

DTYPE = jnp.float64


def _axes(**kw):
    base = dict(velx=0.0, vely=0.0, velz=0.0, yaw_rate=0.0, pitch_rate=0.0,
                roll_rate=0.0, toggle=False, exit=False)
    base.update(kw)
    return command.JoyAxes(**{k: jnp.asarray(v) for k, v in base.items()})


def _setup():
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    ctrl = types.init_ctrl_state(model, DTYPE)
    joy = command.init_joy_state(0.3, DTYPE)
    return joy, ctrl, params


def test_axes_clamped_to_limits():
    axes = command.clamp_axes(_axes(velx=5.0, vely=-5.0, yaw_rate=10.0))
    assert float(axes.velx) == P.JOY_CMD_VELX_MAX
    assert float(axes.vely) == -P.JOY_CMD_VELY_MAX
    assert float(axes.yaw_rate) == P.JOY_CMD_YAW_MAX


def test_axes_from_raw_mapping():
    """Raw /joy axis assignment (GazeboA1ROS.cpp:391-415): axis 4 -> velx,
    3 -> vely, 1 -> velz, 0 -> yaw, 7 -> pitch, 6 -> roll; A toggles, LB
    exits."""
    raw = np.zeros(8)
    raw[4], raw[3], raw[1] = 0.5, -1.0, 0.25
    raw[0], raw[7], raw[6] = -0.5, 1.0, -1.0
    buttons = np.array([1, 0, 0, 0, 0])
    axes = command.axes_from_raw(jnp.asarray(raw), jnp.asarray(buttons))
    np.testing.assert_allclose(float(axes.velx), 0.5 * P.JOY_CMD_VELX_MAX)
    np.testing.assert_allclose(float(axes.vely), -P.JOY_CMD_VELY_MAX)
    np.testing.assert_allclose(float(axes.velz),
                               0.25 * P.JOY_CMD_BODY_HEIGHT_VEL)
    np.testing.assert_allclose(float(axes.yaw_rate),
                               -0.5 * P.JOY_CMD_YAW_MAX)
    np.testing.assert_allclose(float(axes.pitch_rate), P.JOY_CMD_PITCH_MAX)
    np.testing.assert_allclose(float(axes.roll_rate), -P.JOY_CMD_ROLL_MAX)
    assert bool(axes.toggle) and not bool(axes.exit)

    buttons = np.array([0, 0, 0, 0, 1])
    axes = command.axes_from_raw(jnp.asarray(raw), jnp.asarray(buttons))
    assert not bool(axes.toggle) and bool(axes.exit)


def test_latch_buttons_or_semantics():
    """Button requests latch across samples until apply_commands clears
    them (joy_cmd_ctrl_state_change_request semantics)."""
    joy, ctrl, params = _setup()
    joy = command.latch_buttons(joy, _axes(toggle=True))
    joy = command.latch_buttons(joy, _axes())   # later sample: no press
    assert bool(joy.toggle_request)
    joy, ctrl, params = command.apply_commands(joy, _axes(), ctrl, params,
                                               jnp.asarray(0.01, DTYPE))
    assert not bool(joy.toggle_request)     # consumed and cleared
    assert int(joy.ctrl_state) == 1         # toggle took effect


def test_height_integration_and_clamp():
    joy, ctrl, params = _setup()
    dt = jnp.asarray(0.01, DTYPE)
    for _ in range(1000):
        joy, ctrl, params = command.apply_commands(
            joy, _axes(velz=P.JOY_CMD_BODY_HEIGHT_VEL), ctrl, params, dt)
    np.testing.assert_allclose(float(joy.body_height),
                               P.JOY_CMD_BODY_HEIGHT_MAX)
    np.testing.assert_allclose(float(ctrl.root_pos_d[2]),
                               P.JOY_CMD_BODY_HEIGHT_MAX)


def test_mode_toggle_and_leave_walk_position_lock():
    joy, ctrl, params = _setup()
    dt = jnp.asarray(0.002, DTYPE)
    # enter walking
    joy = joy._replace(toggle_request=jnp.asarray(True))
    joy, ctrl, params = command.apply_commands(joy, _axes(), ctrl, params,
                                               dt)
    assert int(ctrl.movement_mode) == 1
    # robot has moved; leave walking -> xy target locks at current position
    ctrl = ctrl._replace(root_pos=jnp.asarray([1.5, -0.4, 0.29], DTYPE))
    joy = joy._replace(toggle_request=jnp.asarray(True))
    joy, ctrl, params = command.apply_commands(joy, _axes(), ctrl, params,
                                               dt)
    assert int(ctrl.movement_mode) == 0
    np.testing.assert_allclose(np.asarray(ctrl.root_pos_d[0:2]),
                               [1.5, -0.4])


def test_walking_velocity_zeroes_xy_gains():
    joy, ctrl, params = _setup()
    dt = jnp.asarray(0.002, DTYPE)
    joy = joy._replace(ctrl_state=jnp.asarray(1, jnp.int32))
    # translating: xy gains zeroed, xy target follows current position
    joy2, ctrl2, params2 = command.apply_commands(
        joy, _axes(velx=0.3), ctrl, params, dt)
    np.testing.assert_allclose(np.asarray(params2.kp_linear[0:2]), 0.0)
    # standing still in walk mode: lock gains restored
    joy3, ctrl3, params3 = command.apply_commands(
        joy, _axes(velx=0.0), ctrl, params, dt)
    np.testing.assert_allclose(np.asarray(params3.kp_linear[0:2]),
                               np.asarray(params.kp_linear[0:2]))


def test_euler_integration():
    joy, ctrl, params = _setup()
    dt = jnp.asarray(0.01, DTYPE)
    for _ in range(100):
        joy, ctrl, params = command.apply_commands(
            joy, _axes(yaw_rate=0.5), ctrl, params, dt)
    np.testing.assert_allclose(float(ctrl.root_euler_d[2]), 0.5, atol=1e-9)


def test_terminal_state_joint_limits():
    # nominal stand pose: inside limits (GazeboA1ROS.h:175-179)
    q = jnp.asarray([0.0, 0.67, -1.3] * 4, DTYPE)
    assert not bool(command.is_terminal_state(q))
    # hip past +1.047 trips
    q_bad = q.at[0].set(1.2)
    assert bool(command.is_terminal_state(q_bad))
    # calf above -0.837 trips (leg 3)
    q_bad = q.at[11].set(-0.5)
    assert bool(command.is_terminal_state(q_bad))
    # exactly at a limit counts as terminal (reference uses <= / >=)
    q_edge = q.at[4].set(P.JOINT_POS_LIMITS[1][1])
    assert bool(command.is_terminal_state(q_edge))
    # batched
    batch = jnp.stack([q, q_bad, q_edge])
    out = np.asarray(jax.vmap(command.is_terminal_state)(batch))
    assert out.tolist() == [False, True, True]
