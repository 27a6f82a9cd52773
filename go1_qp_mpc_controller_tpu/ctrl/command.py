"""Joystick command processing: raw axes -> desired root state.

TPU-native equivalent of the joystick block of GazeboA1ROS::main_update
(src/a1_cpp/src/GazeboA1ROS.cpp:117-190) and the joy callback axis mapping
(:381-415): body-height integration with clamps, desired-euler
integration, walk/stand mode toggling, and the xy position-locking logic
(lock on leaving walk mode and while walking with no velocity command).

Pure function over (JoyState, CtrlState); branchless, batched with vmap.
"""

from typing import NamedTuple

import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.config import params as P


class JoyState(NamedTuple):
    """Persistent joystick-interpretation state.

    Attributes:
      body_height: () integrated height command (JOY_CMD_BODY_HEIGHT_*).
      ctrl_state: () int32, 0 stand / 1 walk.
      toggle_request: () bool latch (the A-button edge).
      exit_request: () bool (terminates the host loop).
    """
    body_height: jnp.ndarray
    ctrl_state: jnp.ndarray
    toggle_request: jnp.ndarray
    exit_request: jnp.ndarray


class JoyAxes(NamedTuple):
    """One joystick sample, already scaled to command units
    (GazeboA1ROS.cpp:381-410 axis mapping)."""
    velx: jnp.ndarray        # m/s, clamp +-JOY_CMD_VELX_MAX
    vely: jnp.ndarray        # m/s
    velz: jnp.ndarray        # m/s body-height rate
    yaw_rate: jnp.ndarray    # rad/s
    pitch_rate: jnp.ndarray  # rad/s
    roll_rate: jnp.ndarray   # rad/s
    toggle: jnp.ndarray      # bool, A-button edge
    exit: jnp.ndarray        # bool


def axes_from_raw(raw_axes, raw_buttons):
    """Map a raw /joy sample (8 axes, >=5 buttons) to scaled JoyAxes.

    The reference's joy_callback axis assignment
    (src/a1_cpp/src/GazeboA1ROS.cpp:391-415): left-stick vertical (axis 1)
    scales body-height rate, right-stick vertical (4) forward velocity,
    right-stick horizontal (3) lateral velocity, left-stick horizontal (0)
    yaw rate, d-pad vertical (7) pitch rate, d-pad horizontal (6) roll
    rate; button 0 (A) requests the stand/walk toggle, button 4 (LB)
    requests exit. Raw axes are in [-1, 1] so the scaled values are
    already inside the A1Params limits; :func:`clamp_axes` stays the
    guard for non-joystick callers.

    Args:
      raw_axes: (8,) float axes as published by the joy driver.
      raw_buttons: (>=5,) int/bool buttons.

    Returns:
      JoyAxes.
    """
    return JoyAxes(
        velx=raw_axes[4] * P.JOY_CMD_VELX_MAX,
        vely=raw_axes[3] * P.JOY_CMD_VELY_MAX,
        velz=raw_axes[1] * P.JOY_CMD_BODY_HEIGHT_VEL,
        yaw_rate=raw_axes[0] * P.JOY_CMD_YAW_MAX,
        pitch_rate=raw_axes[7] * P.JOY_CMD_PITCH_MAX,
        roll_rate=raw_axes[6] * P.JOY_CMD_ROLL_MAX,
        toggle=raw_buttons[0] != 0,
        exit=raw_buttons[4] != 0)


def latch_buttons(joy, axes):
    """Latch the button-edge requests of one joy sample into JoyState.

    The reference's joy_callback sets joy_cmd_ctrl_state_change_request /
    joy_cmd_exit that a later main_update consumes and clears
    (GazeboA1ROS.cpp:396-398, 411-415) — callbacks may fire many times
    between control ticks, so the request is an OR-latch, not the last
    sample.
    """
    return joy._replace(
        toggle_request=joy.toggle_request | axes.toggle,
        exit_request=joy.exit_request | axes.exit)


def init_joy_state(height=0.3, dtype=jnp.float32):
    return JoyState(
        body_height=jnp.asarray(height, dtype),
        ctrl_state=jnp.zeros((), jnp.int32),
        toggle_request=jnp.zeros((), bool),
        exit_request=jnp.zeros((), bool))


def clamp_axes(axes):
    """Apply the A1Params joystick limits (A1Params.h:16-23)."""
    return axes._replace(
        velx=jnp.clip(axes.velx, -P.JOY_CMD_VELX_MAX, P.JOY_CMD_VELX_MAX),
        vely=jnp.clip(axes.vely, -P.JOY_CMD_VELY_MAX, P.JOY_CMD_VELY_MAX),
        velz=jnp.clip(axes.velz, -P.JOY_CMD_BODY_HEIGHT_VEL,
                      P.JOY_CMD_BODY_HEIGHT_VEL),
        yaw_rate=jnp.clip(axes.yaw_rate, -P.JOY_CMD_YAW_MAX,
                          P.JOY_CMD_YAW_MAX),
        pitch_rate=jnp.clip(axes.pitch_rate, -P.JOY_CMD_PITCH_MAX,
                            P.JOY_CMD_PITCH_MAX),
        roll_rate=jnp.clip(axes.roll_rate, -P.JOY_CMD_ROLL_MAX,
                           P.JOY_CMD_ROLL_MAX))


def is_terminal_state(joint_pos):
    """True if any joint is at/past its position limit.

    The environment adapters run this every tick and terminate the
    control process when it trips (GazeboA1ROS::isTerminalState,
    src/a1_cpp/src/GazeboA1ROS.cpp:418-425; limits GazeboA1ROS.h:175-179).
    Branchless; batches with vmap.

    Args:
      joint_pos: (12,) joint angles ordered (hip, thigh, calf) x 4 legs.

    Returns:
      () bool.
    """
    limits = jnp.asarray(P.JOINT_POS_LIMITS, joint_pos.dtype)  # (3, 2)
    q = joint_pos.reshape(P.NUM_LEG, P.NUM_DOF_PER_LEG)
    return jnp.any((q <= limits[None, :, 0]) | (q >= limits[None, :, 1]))


def apply_commands(joy, axes, ctrl, params, dt):
    """Process one joystick sample into the controller state.

    Mirrors GazeboA1ROS.cpp:122-190: height integration, mode toggle with
    the leave-walk position lock, desired velocity/euler updates, and the
    walking-mode xy lock policy. kp_linear xy gains are zeroed while
    translating and restored to the preset lock gains otherwise.

    Args:
      joy: JoyState.
      axes: JoyAxes (already scaled; use clamp_axes for limits).
      ctrl: CtrlState.
      params: CtrlParams (kp_linear holds the lock gains).
      dt: () tick period.

    Returns:
      (new JoyState, new CtrlState, updated CtrlParams kp_linear).
    """
    dtype = ctrl.root_pos.dtype
    height = jnp.clip(joy.body_height + axes.velz * dt,
                      P.JOY_CMD_BODY_HEIGHT_MIN, P.JOY_CMD_BODY_HEIGHT_MAX)

    prev_state = joy.ctrl_state
    new_state = jnp.where(joy.toggle_request, (joy.ctrl_state + 1) % 2,
                          joy.ctrl_state)
    entering_stand = (new_state == 0) & (prev_state == 1)
    walking = new_state == 1

    root_lin_vel_d = jnp.stack([axes.velx, axes.vely, axes.velz]).astype(
        dtype)
    root_ang_vel_d = jnp.stack(
        [axes.roll_rate, axes.pitch_rate, axes.yaw_rate]).astype(dtype)
    root_euler_d = ctrl.root_euler_d + root_ang_vel_d * dt
    root_pos_d = ctrl.root_pos_d.at[2].set(height)

    # leaving walk: lock xy at the current position
    root_pos_d = jnp.where(entering_stand,
                           root_pos_d.at[0:2].set(ctrl.root_pos[0:2]),
                           root_pos_d)
    # walking with a velocity command: keep refreshing the xy target and
    # zero the xy position gains; otherwise lock gains hold position
    translating = walking & (
        jnp.linalg.norm(root_lin_vel_d[0:2]) > 0.05)
    root_pos_d = jnp.where(translating,
                           root_pos_d.at[0:2].set(ctrl.root_pos[0:2]),
                           root_pos_d)
    kp_xy_lock = params.kp_linear[0:2]
    kp_linear = params.kp_linear.at[0:2].set(
        jnp.where(translating, jnp.zeros((2,), dtype), kp_xy_lock))

    new_ctrl = ctrl._replace(
        movement_mode=walking.astype(jnp.int32),
        root_lin_vel_d=root_lin_vel_d,
        root_ang_vel_d=root_ang_vel_d,
        root_euler_d=root_euler_d,
        root_pos_d=root_pos_d)
    new_joy = JoyState(
        body_height=height,
        ctrl_state=new_state.astype(jnp.int32),
        toggle_request=jnp.zeros((), bool),
        exit_request=axes.exit)
    return new_joy, new_ctrl, params._replace(kp_linear=kp_linear)
