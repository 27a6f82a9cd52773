"""The fused controller step: sensors -> estimation -> plan -> GRF -> torques.

TPU-native re-composition of the reference's per-tick work, which is spread
across ROS callbacks and two free-running threads
(GazeboA1ROS.cpp:112-239, MainGazebo.cpp:47-121):

- :func:`sensor_update` ingests raw sensor values and refreshes kinematic
  quantities + the Kalman filter (the reference's callback/receive-thread
  work, GazeboA1ROS.cpp:242-288 + HardwareA1ROS.cpp:253-386),
- :func:`compute_grf` solves for stance forces — MPC (horizon-10 condensed
  QP, A1RobotControl.cpp:446-561) or single-step balance QP (:377-444),
- :func:`control_step` chains plan -> swing -> grf -> torques, the fused
  equivalent of main_update + update_foot_forces_grf + send_cmd.

Everything is a pure function of (CtrlState, RobotModel, CtrlParams) and is
batched by vmapping over a leading scenario axis. The solver branch
(MPC vs QP) is a static Python flag — two separate compiled programs, like
the reference's launch-time solver_type selection (launch/a1_ctrl.launch:2).
"""

from typing import NamedTuple

import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.ctrl import gait, swing, terrain, torque
from go1_qp_mpc_controller_tpu.models import kinematics, srb
from go1_qp_mpc_controller_tpu.ops import admm, ekf, qp as balance
from go1_qp_mpc_controller_tpu.utils import rotations

MPC = 1   # stance_leg_control_type values (A1CtrlStates.h:330)
QP = 0


class SensorData(NamedTuple):
    """Raw per-tick sensor sample (the adapters' callback payloads)."""
    quat_wxyz: jnp.ndarray    # (4,) IMU orientation
    imu_acc: jnp.ndarray      # (3,) body-frame accelerometer
    imu_ang_vel: jnp.ndarray  # (3,) body-frame gyro
    joint_pos: jnp.ndarray    # (12,)
    joint_vel: jnp.ndarray    # (12,)
    foot_force: jnp.ndarray   # (4,) contact sensor normal forces


def sensor_update(state, model, sensors, dt, estimate=True):
    """Ingest sensors, refresh kinematics, and run the KF.

    Mirrors gt_pose_callback + main_update estimation
    (GazeboA1ROS.cpp:242-288, 190-198).

    Args:
      state: CtrlState.
      model: RobotModel.
      sensors: SensorData.
      dt: () estimator step.
      estimate: static bool — run the KF (False = trust root_pos/root_lin_vel
        already in the state, e.g. simulator ground truth).

    Returns:
      updated CtrlState.
    """
    rot = rotations.quat_to_rot_mat(sensors.quat_wxyz)
    euler = rotations.quat_to_euler(sensors.quat_wxyz)
    rot_z = rotations.rot_z(euler[2])

    q_legs = sensors.joint_pos.reshape(4, 3)
    dq_legs = sensors.joint_vel.reshape(4, 3)
    geom = model.leg_geometry
    foot_pos_rel = kinematics.fk(q_legs, geom.rho_opt, geom.rho_fix)
    j_foot = kinematics.jac(q_legs, geom.rho_opt, geom.rho_fix)
    foot_vel_rel = jnp.einsum('lij,lj->li', j_foot, dq_legs)
    foot_pos_abs = foot_pos_rel @ rot.T
    root_ang_vel = rot @ sensors.imu_ang_vel   # world frame
                                               # (HardwareA1ROS.cpp:284)

    state = state._replace(
        root_rot_mat=rot, root_euler=euler, root_rot_mat_z=rot_z,
        imu_acc=sensors.imu_acc, imu_ang_vel=sensors.imu_ang_vel,
        joint_pos=sensors.joint_pos, joint_vel=sensors.joint_vel,
        foot_force=sensors.foot_force, foot_pos_rel=foot_pos_rel,
        foot_pos_abs=foot_pos_abs, foot_vel_rel=foot_vel_rel,
        j_foot=j_foot, root_ang_vel=root_ang_vel)

    if estimate:
        res = ekf.update_estimation(
            state.estimator_x, state.estimator_P, dt, rot, sensors.imu_acc,
            sensors.imu_ang_vel, foot_pos_rel, foot_vel_rel,
            sensors.foot_force, state.movement_mode)
        state = state._replace(
            estimator_x=res.x, estimator_P=res.P,
            estimated_contacts=res.estimated_contacts >= 0.5,
            root_pos=res.x[0:3], root_lin_vel=res.x[3:6])
    return state


def compute_grf_mpc(state, model, params,
                    settings=admm.ADMMSettings(), use_terrain_adapt=True):
    """Horizon-10 condensed MPC solve (A1RobotControl.cpp:446-561).

    Uses the warm-started persistent solver pattern: primal/dual/rho carry
    across ticks in the CtrlState (matching A1RobotControl.cpp:522-540).
    """
    state = terrain.terrain_adaptation(state, use_terrain_adapt)

    x0 = srb.mpc_state(state.root_euler, state.root_pos, state.root_ang_vel,
                       state.root_lin_vel)
    vel_d_world = state.root_rot_mat @ state.root_lin_vel_d
    x_ref = srb.reference_trajectory(
        state.root_pos, state.root_euler, state.root_pos_d,
        state.root_euler_d, state.root_ang_vel_d, vel_d_world,
        params.mpc_dt)

    a_c = srb.calculate_A_c(state.root_euler)
    b_c = srb.calculate_B_c(model.mass, model.trunk_inertia,
                            state.root_rot_mat, state.foot_pos_abs)
    a_d, b_d = srb.discretize(a_c, b_c, params.mpc_dt)
    # the reference holds foot positions constant over the horizon
    # (A1RobotControl.cpp:498-514) -> identical B_d per step, which the
    # closed-form nilpotent condensation exploits (no A-power recursion)
    qp = srb.condense_nilpotent_const(a_d, b_d, x0, x_ref, params.q_weights,
                                      params.r_weights, state.contacts)
    sol = admm.mpc_solve(qp, settings, warm_x=state.qp_warm_x,
                         warm_y=state.qp_warm_y)

    grf_world = sol.x[:12].reshape(4, 3)
    grf_body = grf_world @ state.root_rot_mat    # R^T f per leg
    # NaN guard per leg (A1RobotControl.cpp:558-561)
    bad = jnp.isnan(jnp.linalg.norm(grf_body, axis=-1, keepdims=True))
    grf_body = jnp.where(bad, state.foot_forces_grf, grf_body)
    return state._replace(foot_forces_grf=grf_body,
                          qp_warm_x=jnp.where(jnp.any(bad), state.qp_warm_x,
                                              sol.x),
                          qp_warm_y=jnp.where(jnp.any(bad), state.qp_warm_y,
                                              sol.y))


def compute_grf_qp(state, model, params, settings=admm.ADMMSettings()):
    """Single-step balance QP (A1RobotControl.cpp:377-444)."""
    acc = balance.desired_root_acc(state, params, model.mass)
    qp = balance.build_balance_qp(acc, state.root_rot_mat_z,
                                  state.foot_pos_abs, state.contacts)
    grf_world, _ = balance.solve_balance_qp(qp, settings)
    grf_body = grf_world @ state.root_rot_mat
    bad = jnp.isnan(jnp.linalg.norm(grf_body, axis=-1, keepdims=True))
    grf_body = jnp.where(bad, state.foot_forces_grf, grf_body)
    return state._replace(foot_forces_grf=grf_body)


def control_step(state, model, params, dt, solver_type=MPC,
                 settings=admm.ADMMSettings(), use_terrain_adapt=True):
    """One full controller tick; returns updated CtrlState (incl. torques).

    Fuses the reference's two-thread pipeline into one jitted program:
    update_plan -> swing control -> GRF solve -> torque mapping
    (MainGazebo.cpp:47-121 collapsed; the estimator runs in
    :func:`sensor_update`).
    """
    state = gait.update_plan(state, params, model)
    state = swing.generate_swing_legs_ctrl(state, params, dt)
    if solver_type == MPC:
        state = compute_grf_mpc(state, model, params, settings,
                                use_terrain_adapt)
    else:
        state = compute_grf_qp(state, model, params, settings)
    state = torque.compute_joint_torques(state, params)
    return state
