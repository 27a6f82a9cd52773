"""Degree-4 Bezier swing-foot trajectory.

TPU-native equivalent of BezierUtils::get_foot_pos_curve
(src/a1_cpp/src/utils/Utils.cpp:64-107). Pure function of (t, start, end),
fully vectorized over legs / batch — no per-leg curve objects.
"""

import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.config.params import (
    FOOT_SWING_CLEARANCE1,
    FOOT_SWING_CLEARANCE2,
)

# Binomial coefficients of the degree-4 Bernstein basis (Utils.cpp:101).
_BINOM = (1.0, 4.0, 6.0, 4.0, 1.0)


def bernstein4(t, control_points):
    """Evaluate a degree-4 Bernstein polynomial.

    Args:
      t: (...) phase in [0, 1].
      control_points: (..., 5) control values P0..P4.

    Returns:
      (...) curve value sum_i C(4,i) t^i (1-t)^(4-i) P_i.
    """
    t = jnp.asarray(t)
    one_m_t = 1.0 - t
    out = jnp.zeros(jnp.broadcast_shapes(t.shape, control_points.shape[:-1]),
                    dtype=control_points.dtype)
    for i in range(5):
        basis = _BINOM[i] * t ** i * one_m_t ** (4 - i)
        out = out + basis * control_points[..., i]
    return out


def swing_foot_pos(t, foot_pos_start, foot_pos_final, terrain_pitch_angle=0.0):
    """Interpolated swing-foot position at phase ``t``.

    Control points per axis are (start, start, final, final, final); the z
    axis adds clearance bumps FOOT_SWING_CLEARANCE1 at P1 and
    FOOT_SWING_CLEARANCE2 + 0.5*sin(terrain_pitch) at P2 (Utils.cpp:87-94).
    The reference always calls this with terrain_pitch_angle = 0
    (A1RobotControl.cpp:238-241).

    Args:
      t: (...) swing phase in [0, 1].
      foot_pos_start: (..., 3) swing liftoff position.
      foot_pos_final: (..., 3) target foothold position.
      terrain_pitch_angle: scalar or (...) terrain pitch (rad).

    Returns:
      (..., 3) foot position on the curve.
    """
    s = foot_pos_start
    f = foot_pos_final
    # (..., 3, 5) control-point stack.
    ctrl = jnp.stack([s, s, f, f, f], axis=-1)
    bump1 = jnp.zeros_like(ctrl[..., 2, 1]) + FOOT_SWING_CLEARANCE1
    bump2 = FOOT_SWING_CLEARANCE2 + 0.5 * jnp.sin(terrain_pitch_angle)
    ctrl = ctrl.at[..., 2, 1].add(bump1)
    ctrl = ctrl.at[..., 2, 2].add(bump2)
    t = jnp.asarray(t)[..., None]  # broadcast over the xyz axis
    return bernstein4(t, ctrl)
