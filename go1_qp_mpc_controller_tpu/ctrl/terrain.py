"""Terrain plane estimation and pitch adaptation.

TPU-native equivalent of A1RobotControl::compute_walking_surface
(src/a1_cpp/src/A1RobotControl.cpp:566-582) and the terrain-adaptation block
of compute_grf (:334-376): least-squares plane through the recent contact
points, dihedral angle vs flat ground through a height-gated 100-sample
moving average, clamped to +-0.5 rad, with the sign chosen by the
front/rear height difference.
"""

import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.utils import filters, rotations


def compute_walking_surface(foot_pos_recent_contact):
    """Plane fit z = a0 + a1 x + a2 y; returns coef (a1, a2, -1)
    (A1RobotControl.cpp:566-582).

    The normal-equation solve runs as a ridge-regularized closed-form
    3x3 adjugate solve instead of the reference's SVD pseudo-inverse
    (Utils.cpp:44-52): a batched tiny SVD serializes on TPU, and the
    1e-6-scaled ridge handles the same degenerate contact geometries the
    pinv's singular-value truncation does (collinear/coincident recent
    contacts) — for well-posed fits the two agree to ~1e-5.
    """
    dtype = foot_pos_recent_contact.dtype
    w = jnp.concatenate(
        [jnp.ones((4, 1), dtype), foot_pos_recent_contact[:, :2]], axis=1)
    z = foot_pos_recent_contact[:, 2]
    gram = w.T @ w
    ridge = 1e-6 * jnp.trace(gram) + 1e-12
    gram = gram + ridge * jnp.eye(3, dtype=dtype)
    a = rotations.solve_3x3(gram, w.T @ z)
    return jnp.stack([a[1], a[2], -jnp.ones((), dtype)])


def terrain_adaptation(state, use_terrain_adapt=True):
    """Update the desired pitch from the estimated terrain plane.

    Only active in MPC mode in the reference (compute_grf type-1 branch,
    A1RobotControl.cpp:335-376). Mutates root_euler_d[1] persistently, like
    the reference does on the shared state.

    Args:
      state: CtrlState.
      use_terrain_adapt: static or traced bool.

    Returns:
      updated CtrlState (terrain filter, terrain_pitch_angle, root_euler_d).
    """
    dtype = state.root_pos.dtype
    surf = compute_walking_surface(state.foot_pos_recent_contact)
    flat = jnp.asarray([0.0, 0.0, 1.0], dtype)
    angle_raw = rotations.cal_dihedral_angle(flat, surf)
    # only fold into the filter when the body is high enough
    # (A1RobotControl.cpp:340-345)
    body_high = state.root_pos[2] > 0.1
    new_filter, angle_avg = filters.moving_window_update_if(
        state.terrain_angle_filter, angle_raw, body_high)
    terrain_angle = jnp.where(body_high, angle_avg, 0.0)
    terrain_angle = jnp.clip(terrain_angle, -0.5, 0.5)

    # sign from front-vs-rear contact height difference (:354-364)
    z = state.foot_pos_recent_contact[:, 2]
    f_r_diff = z[0] + z[1] - z[2] - z[3]
    pitch_d = jnp.where(f_r_diff > 0.05, -terrain_angle, terrain_angle)
    root_euler_d = jnp.where(
        jnp.asarray(use_terrain_adapt),
        state.root_euler_d.at[1].set(pitch_d), state.root_euler_d)

    return state._replace(
        terrain_angle_filter=new_filter,
        terrain_pitch_angle=terrain_angle,
        root_euler_d=root_euler_d,
    )
