"""Swing-leg trajectory tracking and contact bookkeeping.

TPU-native equivalent of A1RobotControl::generate_swing_legs_ctrl
(src/a1_cpp/src/A1RobotControl.cpp:204-287): Bezier interpolation from the
liftoff point to the planned foothold, PD forces in the yaw-aligned body
frame, early-contact detection from foot-force sensors, and gated
moving-average filtering of recent contact positions. All four legs are
processed vectorized; the reference's per-leg loop disappears.
"""

import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.utils import bezier, filters


def generate_swing_legs_ctrl(state, params, dt):
    """One swing-control tick; returns updated CtrlState.

    Args:
      state: CtrlState (uses gait counters, foot kinematics, plan targets).
      params: CtrlParams.
      dt: () control period for the finite-difference velocities.
    """
    # current feet in the yaw-aligned frame (A1RobotControl.cpp:224)
    foot_pos_cur = state.foot_pos_abs @ state.root_rot_mat_z  # = Rz^T p per leg

    stance = state.gait_counter <= params.counter_per_swing
    spline_time = jnp.where(
        stance, 0.0,
        (state.gait_counter - params.counter_per_swing)
        / params.counter_per_swing)
    # liftoff point refreshes while in stance (A1RobotControl.cpp:229-236)
    foot_pos_start = jnp.where(stance[:, None], foot_pos_cur,
                               state.foot_pos_start)

    foot_pos_target = bezier.swing_foot_pos(
        spline_time, foot_pos_start, state.foot_pos_target_rel)

    foot_vel_cur = (foot_pos_cur - state.foot_pos_rel_last_time) / dt
    foot_vel_target = (foot_pos_target
                       - state.foot_pos_target_last_time) / dt

    pos_err = foot_pos_target - foot_pos_cur
    vel_err = foot_vel_target - foot_vel_cur
    foot_forces_kin = (params.kp_foot * pos_err + params.kd_foot * vel_err)

    # early contact detection (A1RobotControl.cpp:259-271)
    late_swing = state.gait_counter > params.counter_per_swing * 1.5
    early = jnp.where(~late_swing, False, state.early_contacts)
    early = jnp.where(
        (~state.plan_contacts) & late_swing
        & (state.foot_force > P.FOOT_FORCE_LOW), True, early)
    contacts = state.plan_contacts | early

    # gated recent-contact filters (A1RobotControl.cpp:274-281)
    new_filter, recent_avg = filters.moving_window_update_masked(
        state.recent_contact_filter, state.foot_pos_abs, contacts)
    foot_pos_recent_contact = jnp.where(
        contacts[:, None], recent_avg, state.foot_pos_recent_contact)

    return state._replace(
        foot_pos_start=foot_pos_start,
        foot_pos_rel_last_time=foot_pos_cur,
        foot_pos_target_last_time=foot_pos_target,
        early_contacts=early,
        contacts=contacts,
        recent_contact_filter=new_filter,
        foot_pos_recent_contact=foot_pos_recent_contact,
        foot_forces_kin=foot_forces_kin,
    )
