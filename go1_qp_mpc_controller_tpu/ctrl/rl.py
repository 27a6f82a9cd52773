"""RL policy controller: observation pipeline + policy + PD position targets.

TPU-native equivalent of the go1_rl_ctrl_cpp stack:

- observation assembly and scaling (Go1Observation.hpp:143-170),
- the 48-dim obs = 36 proprio + 12 previous actions feeding the actor
  (Go1RLController.cpp:78-119),
- action -> joint-position targets with scale/clip and fixed PD gains
  (Go1RLController.cpp:102-109, 149-166),
- the servo stand policy's 1000-step interpolation to the crouch pose
  (Go1RLController.cpp:121-146),
- the joystick A-button stand/walk switcher (SwitchController.hpp:11-69).

All pure functions over an RLControllerState pytree, batched with vmap.
"""

from typing import NamedTuple

import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.models import policy as policy_lib

# scale factors (Go1Observation.hpp:51-63)
LIN_VEL_SCALE = 2.0
ANG_VEL_SCALE = 0.25
COMMAND_SCALE = (2.0, 2.0, 0.25)
DOF_VEL_SCALE = 0.05
CLIP_OBS = 100.0
# action post-processing (Go1RLController.hpp:84-88, Go1RLController.cpp:36-37)
CLIP_ACTION = 100.0
ACTION_SCALE = 0.25
CLIP_POSE_LOWER = (-0.9425, -0.4817, -2.6285) * 4
CLIP_POSE_UPPER = (0.9425, 2.7855, -0.9320) * 4
# default joint pose (Go1CtrlStates.hpp:74-78)
DEFAULT_JOINT_POS = (0.1, 0.8, -1.5, -0.1, 0.8, -1.5,
                     0.1, 1.0, -1.5, -0.1, 1.0, -1.5)
# PD gains (Go1RLController.cpp:78-86)
WALK_P_GAINS = (20.0, 50.0, 50.0) * 4
WALK_D_GAINS = (1.0, 2.0, 2.0) * 4
# servo stand (Go1RLController.cpp:121-146)
SERVO_TARGET = (0.1, 0.6, -1.3, -0.1, 0.6, -1.3,
                0.1, 0.6, -1.3, -0.1, 0.6, -1.3)
SERVO_P_GAINS = (20.0, 30.0, 60.0, 20.0, 30.0, 60.0,
                 20.0, 80.0, 140.0, 20.0, 80.0, 140.0)
SERVO_D_GAINS = (5.0, 8.0, 12.0) * 4
SERVO_DURATION = 1000.0


class RLControllerState(NamedTuple):
    prev_action: jnp.ndarray       # (12,) previous clipped actions
    servo_motion_time: jnp.ndarray  # () interpolation counter
    servo_start_pose: jnp.ndarray  # (12,) pose at servo-mode entry
    movement_mode: jnp.ndarray     # () int32: 0 stand/servo, 1 walk


class MotorCommand(NamedTuple):
    """Position-mode command (Go1RLController.cpp:149-166)."""
    q: jnp.ndarray       # (12,) target positions
    kp: jnp.ndarray      # (12,)
    kd: jnp.ndarray      # (12,)
    tau: jnp.ndarray     # (12,) zero in RL mode


def init_rl_state(joint_pos=None, dtype=jnp.float32):
    start = (jnp.asarray(joint_pos, dtype) if joint_pos is not None
             else jnp.zeros((12,), dtype))
    return RLControllerState(
        prev_action=jnp.zeros((12,), dtype),
        servo_motion_time=jnp.zeros((), dtype),
        servo_start_pose=start,
        movement_mode=jnp.zeros((), jnp.int32))


def build_observation(root_rot_mat, root_rot_mat_z, root_lin_vel,
                      imu_ang_vel, command, joint_pos, joint_vel,
                      prev_action):
    """48-dim scaled+clipped observation (Go1Observation.hpp:150-166 +
    Go1RLController.cpp:94-96).

    Args:
      root_rot_mat: (..., 3, 3); root_rot_mat_z: (..., 3, 3).
      root_lin_vel: (..., 3) world-frame velocity (estimator output).
      imu_ang_vel: (..., 3) body-frame gyro.
      command: (..., 3) = (cmd_velx, cmd_vely, cmd_yaw_rate).
      joint_pos, joint_vel: (..., 12).
      prev_action: (..., 12).

    Returns:
      (..., 48) observation.
    """
    dtype = root_lin_vel.dtype
    base_vel = jnp.einsum('...ba,...b->...a', root_rot_mat_z, root_lin_vel)
    gravity = -root_rot_mat[..., 2, :]    # R^T (-z_hat)
    dq0 = joint_pos - jnp.asarray(DEFAULT_JOINT_POS, dtype)
    ob = jnp.concatenate([
        base_vel * LIN_VEL_SCALE,
        imu_ang_vel * ANG_VEL_SCALE,
        gravity,
        command * jnp.asarray(COMMAND_SCALE, dtype),
        dq0,
        joint_vel * DOF_VEL_SCALE,
    ], axis=-1)
    ob = jnp.clip(ob, -CLIP_OBS, CLIP_OBS)
    return jnp.concatenate([ob, prev_action], axis=-1)


def advance(rl_state, params, obs):
    """Walk-mode policy step -> (new state, MotorCommand)
    (Go1RLController.cpp:78-119)."""
    dtype = obs.dtype
    action = policy_lib.mlp_apply(params, obs)
    action = jnp.clip(action, -CLIP_ACTION, CLIP_ACTION)
    target = action * ACTION_SCALE + jnp.asarray(DEFAULT_JOINT_POS, dtype)
    target = jnp.clip(target, jnp.asarray(CLIP_POSE_LOWER, dtype),
                      jnp.asarray(CLIP_POSE_UPPER, dtype))
    cmd = MotorCommand(
        q=target,
        kp=jnp.asarray(WALK_P_GAINS, dtype),
        kd=jnp.asarray(WALK_D_GAINS, dtype),
        tau=jnp.zeros((12,), dtype))
    return rl_state._replace(prev_action=action), cmd


def advance_servo(rl_state, joint_pos):
    """Stand/servo mode: linear interpolation to the crouch pose over 1000
    ticks (Go1RLController.cpp:121-146)."""
    dtype = joint_pos.dtype
    t = rl_state.servo_motion_time + 1.0
    percent = jnp.clip(t / SERVO_DURATION, 0.0, 1.0)
    target = (joint_pos * (1.0 - percent)
              + jnp.asarray(SERVO_TARGET, dtype) * percent)
    cmd = MotorCommand(
        q=target,
        kp=jnp.asarray(SERVO_P_GAINS, dtype),
        kd=jnp.asarray(SERVO_D_GAINS, dtype),
        tau=jnp.zeros((12,), dtype))
    return rl_state._replace(servo_motion_time=t), cmd


def switch_mode(rl_state, toggle_request):
    """Joystick A-button stand<->walk toggle (SwitchController.hpp:11-69)."""
    new_mode = jnp.where(toggle_request, 1 - rl_state.movement_mode,
                         rl_state.movement_mode)
    # entering servo mode resets the interpolation clock
    reset = toggle_request & (new_mode == 0)
    return rl_state._replace(
        movement_mode=new_mode,
        servo_motion_time=jnp.where(reset, 0.0,
                                    rl_state.servo_motion_time))


def rl_control_step(rl_state, params, root_rot_mat, root_rot_mat_z,
                    root_lin_vel, imu_ang_vel, command, joint_pos,
                    joint_vel):
    """Full RL tick: mode dispatch + observation + policy/servo.

    Branchless mode mixing (both paths computed, selected by mode) so the
    step stays one fused program under vmap.
    """
    obs = build_observation(root_rot_mat, root_rot_mat_z, root_lin_vel,
                            imu_ang_vel, command, joint_pos, joint_vel,
                            rl_state.prev_action)
    walk_state, walk_cmd = advance(rl_state, params, obs)
    servo_state, servo_cmd = advance_servo(rl_state, joint_pos)
    walking = rl_state.movement_mode == 1
    cmd = MotorCommand(
        q=jnp.where(walking, walk_cmd.q, servo_cmd.q),
        kp=jnp.where(walking, walk_cmd.kp, servo_cmd.kp),
        kd=jnp.where(walking, walk_cmd.kd, servo_cmd.kd),
        tau=walk_cmd.tau)
    new_state = RLControllerState(
        prev_action=jnp.where(walking, walk_state.prev_action,
                              rl_state.prev_action),
        servo_motion_time=jnp.where(walking, rl_state.servo_motion_time,
                                    servo_state.servo_motion_time),
        servo_start_pose=rl_state.servo_start_pose,
        movement_mode=rl_state.movement_mode)
    return new_state, cmd, obs


class JointHistory(NamedTuple):
    """Rolling joint pos-error / velocity history stacks.

    The reference maintains num_history_stack frames via shift-and-append
    (Go1Observation.hpp:172-181, updateHistory). Functional ring here;
    read oldest-first like the reference's head/tail layout.
    """
    pos_err: jnp.ndarray   # (stack, 12)
    vel: jnp.ndarray       # (stack, 12)


def init_joint_history(num_stack=3, dtype=jnp.float32):
    return JointHistory(pos_err=jnp.zeros((num_stack, 12), dtype),
                        vel=jnp.zeros((num_stack, 12), dtype))


def update_joint_history(hist, joint_pos, joint_vel):
    """Shift-append one frame (Go1Observation.hpp:172-181)."""
    dtype = hist.pos_err.dtype
    err = joint_pos - jnp.asarray(DEFAULT_JOINT_POS, dtype)
    return JointHistory(
        pos_err=jnp.concatenate([hist.pos_err[1:], err[None]], axis=0),
        vel=jnp.concatenate([hist.vel[1:], joint_vel[None]], axis=0))
