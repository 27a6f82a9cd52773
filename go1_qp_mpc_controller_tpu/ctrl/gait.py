"""Gait scheduling and Raibert foot placement.

TPU-native equivalent of A1RobotControl::update_plan
(src/a1_cpp/src/A1RobotControl.cpp:148-202): per-leg phase counters advanced
mod the gait period, contact schedule from the stance/swing split, and the
Raibert heuristic foothold

    delta = sqrt(|z0| / g) (v - v_d) + (T_swing / 2) v_d

clamped to +-0.1 m. Everything branchless (jnp.where) so it vmaps.
"""

import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.config import params as P

TROT_OFFSETS = (0.0, 120.0, 120.0, 0.0)  # A1CtrlStates.h:323-327


def update_plan(state, params, model):
    """Advance gait counters and plan footholds; returns updated CtrlState.

    In stand mode (movement_mode == 0) all feet are planned in contact and
    counters reset to the trot phase offsets (A1RobotControl.cpp:150-153).
    """
    dtype = state.root_pos.dtype
    walking = state.movement_mode != 0

    adv = jnp.mod(state.gait_counter + params.gait_counter_speed,
                  params.counter_per_gait)
    gait_counter = jnp.where(walking, adv,
                             jnp.asarray(TROT_OFFSETS, dtype))
    plan_contacts = jnp.where(walking,
                              gait_counter <= params.counter_per_swing,
                              jnp.ones((4,), bool))

    # Raibert heuristic (A1RobotControl.cpp:168-201)
    lin_vel_rel = state.root_rot_mat_z.T @ state.root_lin_vel
    stance_height = jnp.abs(model.default_foot_pos[0, 2])
    t_half_swing = ((params.counter_per_swing / params.gait_counter_speed)
                    * params.control_dt) / 2.0            # (4,)
    k = jnp.sqrt(stance_height / P.GRAVITY)
    delta_xy = (k * (lin_vel_rel[:2] - state.root_lin_vel_d[:2])[None, :]
                + t_half_swing[:, None] * state.root_lin_vel_d[None, :2])
    delta_xy = jnp.clip(
        delta_xy,
        -jnp.asarray([P.FOOT_DELTA_X_LIMIT, P.FOOT_DELTA_Y_LIMIT], dtype),
        jnp.asarray([P.FOOT_DELTA_X_LIMIT, P.FOOT_DELTA_Y_LIMIT], dtype))

    target_rel = model.default_foot_pos.at[:, :2].add(delta_xy)
    target_abs = target_rel @ state.root_rot_mat.T
    target_world = target_abs + state.root_pos

    return state._replace(
        counter=state.counter + 1,
        gait_counter=gait_counter,
        plan_contacts=plan_contacts,
        foot_pos_target_rel=target_rel,
        foot_pos_target_abs=target_abs,
        foot_pos_target_world=target_world,
    )
