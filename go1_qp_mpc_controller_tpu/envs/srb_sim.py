"""On-device single-rigid-body simulator for closed-loop rollouts.

The reference's integration test harness is Gazebo over ROS
(README.md:27-36); that boundary becomes an on-device physics step so whole
rollouts (controller + plant) stay inside one jitted, batched XLA program —
thousands of closed-loop scenarios per chip with zero host traffic.

Plant model: the trunk is a single rigid body driven by stance-foot forces
recovered from the commanded joint torques (f = -J^-T tau, inverting the
controller's stance map, A1RobotControl.cpp:303); swing feet track the
controller's Bezier plan kinematically and joints follow by closed-form IK.
Stance feet are pinned where they touch down. The sensor model produces the
same observations the adapters feed the controller (IMU specific force,
body-frame gyro, joints, foot forces).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.ctrl.controller import SensorData
from go1_qp_mpc_controller_tpu.models import kinematics
from go1_qp_mpc_controller_tpu.utils import rotations


class SimState(NamedTuple):
    """World-frame plant state.

    Attributes:
      root_pos: (3,) trunk CoM position.
      root_rot: (3, 3) trunk orientation (body -> world).
      root_lin_vel: (3,) world-frame velocity.
      root_ang_vel: (3,) world-frame angular velocity.
      foot_pos_world: (4, 3) foot contact points.
      prev_contacts: (4,) bool, last tick's stance flags.
      prev_joint_pos: (12,) for joint-velocity finite differences.
      last_acc_world: (3,) CoM acceleration (for the IMU model).
    """
    root_pos: jnp.ndarray
    root_rot: jnp.ndarray
    root_lin_vel: jnp.ndarray
    root_ang_vel: jnp.ndarray
    foot_pos_world: jnp.ndarray
    prev_contacts: jnp.ndarray
    prev_joint_pos: jnp.ndarray
    last_acc_world: jnp.ndarray


def ground_height(ground_coef, xy):
    """Planar terrain model z = g0 + gx x + gy y.

    Args:
      ground_coef: (3,) = (g0, gx, gy); zeros = flat ground.
      xy: (..., 2) horizontal position.

    Returns:
      (...) terrain height.
    """
    return (ground_coef[0] + ground_coef[1] * xy[..., 0]
            + ground_coef[2] * xy[..., 1])


def init_sim_state(model, height=0.3, dtype=jnp.float32, ground_coef=None):
    """Robot standing at ``height`` with feet planted on the terrain."""
    feet = model.default_foot_pos.astype(dtype)
    if ground_coef is None:
        ground_coef = jnp.zeros(3, dtype)
    feet_world = feet.at[:, 2].set(ground_height(ground_coef, feet[:, :2]))
    root = jnp.asarray([0.0, 0.0, height], dtype)
    joint0 = kinematics.inverse_kinematics(
        feet_world - root, model.leg_geometry.rho_fix).reshape(12)
    return SimState(
        root_pos=root,
        root_rot=jnp.eye(3, dtype=dtype),
        root_lin_vel=jnp.zeros(3, dtype),
        root_ang_vel=jnp.zeros(3, dtype),
        foot_pos_world=feet_world,
        prev_contacts=jnp.ones(4, bool),
        prev_joint_pos=joint0,
        last_acc_world=jnp.zeros(3, dtype),
    )


def _integrate_rotation(rot, omega_world, dt):
    """First-order rotation update R <- (I + skew(w dt)) R, re-orthonormalized
    via one Gram-Schmidt pass (cheap, keeps long rollouts stable)."""
    r_new = (jnp.eye(3, dtype=rot.dtype)
             + rotations.skew(omega_world * dt)) @ rot
    # Gram-Schmidt on columns
    c0 = r_new[:, 0] / jnp.linalg.norm(r_new[:, 0])
    c1 = r_new[:, 1] - jnp.dot(c0, r_new[:, 1]) * c0
    c1 = c1 / jnp.linalg.norm(c1)
    c2 = jnp.cross(c0, c1)
    return jnp.stack([c0, c1, c2], axis=1)


def read_sensors(sim, model, contacts, stance_forces_z, dt):
    """Sensor model: observations of the CURRENT plant state.

    Produces what the adapters feed the controller (HardwareA1ROS
    receive-thread unpacking, HardwareA1ROS.cpp:260-312): IMU specific
    force / body-frame gyro / orientation quaternion, joints from foot IK,
    joint velocities by finite difference, and foot-force readings.

    Args:
      sim: SimState.
      model: RobotModel.
      contacts: (4,) bool current stance flags (for the force sensor).
      stance_forces_z: (4,) last applied normal forces (sensor reading).
      dt: () step for the joint-velocity finite difference.
    """
    dtype = sim.root_pos.dtype
    g_vec = jnp.asarray([0.0, 0.0, -P.GRAVITY], dtype)
    feet_body = (sim.foot_pos_world - sim.root_pos) @ sim.root_rot
    q = kinematics.inverse_kinematics(
        feet_body, model.leg_geometry.rho_fix).reshape(12)
    joint_vel = (q - sim.prev_joint_pos) / dt
    quat = _rot_to_quat(sim.root_rot)
    imu_acc = sim.root_rot.T @ (sim.last_acc_world - g_vec)
    gyro = sim.root_rot.T @ sim.root_ang_vel
    foot_force = jnp.where(contacts, jnp.maximum(stance_forces_z, 0.0), 0.0)
    return SensorData(quat_wxyz=quat, imu_acc=imu_acc, imu_ang_vel=gyro,
                      joint_pos=q, joint_vel=joint_vel,
                      foot_force=foot_force)


def step(sim, model, joint_torques, contacts, swing_targets_rel, dt,
         ground_coef=None):
    """Advance the plant by ``dt``.

    Args:
      sim: SimState.
      model: RobotModel.
      joint_torques: (12,) commanded torques.
      contacts: (4,) bool stance schedule from the controller.
      swing_targets_rel: (4, 3) yaw-frame swing-foot targets (the
        controller's Bezier points this tick).
      dt: () step.
      ground_coef: optional (3,) planar terrain (g0, gx, gy); None = flat.

    Returns:
      (new SimState, (4,) applied stance normal forces).
    """
    dtype = sim.root_pos.dtype
    rot = sim.root_rot
    yaw = jnp.arctan2(rot[1, 0], rot[0, 0])
    rot_z = rotations.rot_z(yaw)

    # joints consistent with current feet: IK on body-frame foot positions
    feet_body = (sim.foot_pos_world - sim.root_pos) @ rot  # R^T (p - c)
    q_legs = kinematics.inverse_kinematics(feet_body,
                                           model.leg_geometry.rho_fix)
    j_legs = kinematics.jac(q_legs, model.leg_geometry.rho_opt,
                            model.leg_geometry.rho_fix)

    # stance forces from torques: tau = J^T (-f_body)  ->  f = -J^-T tau
    # (adjugate 3x3 solve; batched LU serializes on TPU)
    tau_legs = joint_torques.reshape(4, 3)
    f_body = -rotations.solve_3x3(jnp.swapaxes(j_legs, -1, -2), tau_legs)
    f_world = f_body @ rot.T
    f_world = jnp.where(contacts[:, None], f_world, 0.0)

    # SRB dynamics
    g_vec = jnp.asarray([0.0, 0.0, -P.GRAVITY], dtype)
    acc = jnp.sum(f_world, axis=0) / model.mass + g_vec
    arms = sim.foot_pos_world - sim.root_pos
    torque_world = jnp.sum(jnp.cross(arms, f_world), axis=0)
    i_world = rot @ model.trunk_inertia @ rot.T
    ang_acc = rotations.solve_3x3(i_world, torque_world)

    lin_vel = sim.root_lin_vel + acc * dt
    ang_vel = sim.root_ang_vel + ang_acc * dt
    root_pos = sim.root_pos + lin_vel * dt
    rot_new = _integrate_rotation(rot, ang_vel, dt)

    # feet: stance pinned where they touched down; swing tracks the
    # controller's plan kinematically
    swing_world = (swing_targets_rel @ rot_z.T) + root_pos
    feet_world_new = jnp.where(contacts[:, None], sim.foot_pos_world,
                               swing_world)
    # feet cannot go below the terrain
    if ground_coef is None:
        ground_coef = jnp.zeros(3, dtype)
    gz = ground_height(ground_coef, feet_world_new[:, :2])
    feet_world_new = feet_world_new.at[:, 2].set(
        jnp.maximum(feet_world_new[:, 2], gz))

    # carry THIS tick's joints so the next read_sensors finite-differences
    # joint velocity across the step
    new_sim = SimState(
        root_pos=root_pos, root_rot=rot_new, root_lin_vel=lin_vel,
        root_ang_vel=ang_vel, foot_pos_world=feet_world_new,
        prev_contacts=contacts, prev_joint_pos=q_legs.reshape(12),
        last_acc_world=acc)
    return new_sim, jnp.maximum(f_world[:, 2], 0.0)


def step_pd(sim, model, cmd_q, kp, kd, tau_ff, contacts,
            swing_targets_rel, dt, ground_coef=None, n_substeps=4):
    """Advance the plant ``dt`` under joint-level position-PD commands.

    The motor-side PD loop the RL controller commands instead of torques
    (Go1RLController.cpp:149-166 sends q + kp/kd with tau=0; the Unitree
    motor firmware closes tau = kp (q_d - q) - kd q_dot + tau_ff). The
    resulting torques drive the same SRB force mapping as :func:`step`.

    The command is held over ``n_substeps`` inner plant steps of
    dt/n_substeps: the motor PD runs at >= 1 kHz on the robot while the
    RL action period is 2.5-4 ms (config/parameters.yaml:9-11), and a
    single explicit step at the action period is numerically unstable
    (the one-step-lagged finite-difference q_dot turns kd into
    anti-damping on the trunk pitch mode — measured blowup in ~6 steps).

    Args:
      cmd_q: (12,) position targets.
      kp, kd: (12,) per-motor gains.
      tau_ff: (12,) feedforward torque (zero in RL mode).
      n_substeps: static int inner-loop count.

    Returns:
      (new SimState, (4,) applied stance normal forces from the last
      substep).
    """
    sub_dt = dt / n_substeps

    def substep(carry, _):
        s, _fz = carry
        feet_body = (s.foot_pos_world - s.root_pos) @ s.root_rot
        q = kinematics.inverse_kinematics(
            feet_body, model.leg_geometry.rho_fix).reshape(12)
        q_dot = (q - s.prev_joint_pos) / sub_dt
        tau = kp * (cmd_q - q) - kd * q_dot + tau_ff
        s, fz = step(s, model, tau, contacts, swing_targets_rel, sub_dt,
                     ground_coef=ground_coef)
        return (s, fz), None

    zero_fz = jnp.zeros(4, sim.root_pos.dtype)
    (sim, fz), _ = jax.lax.scan(substep, (sim, zero_fz), None,
                                length=n_substeps)
    return sim, fz


def _rot_to_quat(r):
    """Rotation matrix -> quaternion (w, x, y, z), Shepperd-style branchless."""
    w = 0.5 * jnp.sqrt(jnp.maximum(1.0 + r[0, 0] + r[1, 1] + r[2, 2], 1e-12))
    denom = jnp.maximum(4.0 * w, 1e-9)
    x = (r[2, 1] - r[1, 2]) / denom
    y = (r[0, 2] - r[2, 0]) / denom
    z = (r[1, 0] - r[0, 1]) / denom
    return jnp.stack([w, x, y, z])
