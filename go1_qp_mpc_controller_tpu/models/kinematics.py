"""Analytic 3-DOF leg kinematics for the A1/Go1 quadruped.

TPU-native re-derivation of the reference's MATLAB-symbolic-generated
A1Kinematics (src/a1_cpp/src/legKinematics/A1Kinematics.cpp:39-293). Instead
of transcribing generated trig expressions, the forward kinematics is written
as the physical chain

    p = [ox, oy, 0] + Rx(q1) @ ([0, cy + d, 0]
                                + Ry(q2) @ ([0, 0, -lt]
                                            + Ry(q3) @ [cx, 0, -(lc - cz)]))

with joint angles q = (hip roll q1, thigh pitch q2, calf pitch q3),
calibration offsets rho_opt = (cx, cy, cz) and leg geometry
rho_fix = (ox, oy, d, lt, lc) = (body offset x, body offset y, motor offset,
upper leg length, lower leg length) — the same parameterization as
A1Kinematics.h:16-19. The analytic Jacobian falls out of the same derivation;
the calibration derivatives (dfk/drho, dJ/dq, dJ/drho) are produced with JAX
autodiff, which XLA folds into the same fused program.

All functions take arbitrary leading batch dimensions (vmap-free batching) so
a (num_scenarios, 4)-leg call is one vectorized trace.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

RHO_OPT_SIZE = 3
RHO_FIX_SIZE = 5


class LegGeometry(NamedTuple):
    """Per-leg fixed geometry, rho_fix stacked over legs.

    Attributes:
      rho_fix: (..., NUM_LEG, 5) = (offset_x, offset_y, motor_offset,
        upper_leg_length, lower_leg_length).
      rho_opt: (..., NUM_LEG, 3) = contact-point calibration (cx, cy, cz).
    """
    rho_fix: jnp.ndarray
    rho_opt: jnp.ndarray


def a1_leg_geometry(dtype=jnp.float32):
    """Gazebo/hardware A1/Go1 geometry (GazeboA1ROS.cpp:76-89).

    Leg order 0-FL 1-FR 2-RL 3-RR.
    """
    rho_fix = np.array(
        [[0.1881, 0.04675, 0.08, 0.213, 0.213],
         [0.1881, -0.04675, -0.08, 0.213, 0.213],
         [-0.1881, 0.04675, 0.08, 0.213, 0.213],
         [-0.1881, -0.04675, -0.08, 0.213, 0.213]])
    return LegGeometry(rho_fix=jnp.asarray(rho_fix, dtype),
                       rho_opt=jnp.zeros((4, 3), dtype))


def isaac_leg_geometry(dtype=jnp.float32):
    """Isaac-sim leg geometry variant (IsaacA1ROS.cpp:39-52)."""
    sign = np.array([1.0, -1.0, 1.0, -1.0])
    fb = np.array([1.0, 1.0, -1.0, -1.0])
    rho_fix = np.stack(
        [fb * 0.1805, sign * 0.047, sign * 0.0838,
         np.full(4, 0.22), np.full(4, 0.21)], axis=-1)
    return LegGeometry(rho_fix=jnp.asarray(rho_fix, dtype),
                       rho_opt=jnp.zeros((4, 3), dtype))


def fk(q, rho_opt, rho_fix):
    """Forward kinematics: joint angles -> foot position in body frame.

    Args:
      q: (..., 3) joint angles (hip roll, thigh pitch, calf pitch).
      rho_opt: (..., 3) contact offsets (cx, cy, cz).
      rho_fix: (..., 5) leg geometry (ox, oy, d, lt, lc).

    Returns:
      (..., 3) foot position relative to trunk center.
    """
    q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2]
    cx, cy, cz = rho_opt[..., 0], rho_opt[..., 1], rho_opt[..., 2]
    ox, oy, d, lt, lc = (rho_fix[..., 0], rho_fix[..., 1], rho_fix[..., 2],
                         rho_fix[..., 3], rho_fix[..., 4])
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s2, c2 = jnp.sin(q2), jnp.cos(q2)
    s23, c23 = jnp.sin(q2 + q3), jnp.cos(q2 + q3)
    calf = lc - cz          # effective calf length after contact offset
    hip = cy + d            # abduction offset along rolled y
    # In-plane coordinates before the hip roll.
    x_plane = cx * c23 - calf * s23 - lt * s2
    a = lt * c2 + calf * c23 + cx * s23  # downward leg extension
    px = ox + x_plane
    py = oy + hip * c1 + a * s1
    pz = hip * s1 - a * c1
    return jnp.stack([px, py, pz], axis=-1)


def jac(q, rho_opt, rho_fix):
    """Analytic foot Jacobian d fk / d q.

    Columns are derivatives w.r.t. (q1, q2, q3); matches
    A1Kinematics::jac output layout (A1Kinematics.cpp:13-17).

    Args:
      q: (..., 3), rho_opt: (..., 3), rho_fix: (..., 5) as in :func:`fk`.

    Returns:
      (..., 3, 3) Jacobian.
    """
    q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2]
    cx, cy, cz = rho_opt[..., 0], rho_opt[..., 1], rho_opt[..., 2]
    ox, oy, d, lt, lc = (rho_fix[..., 0], rho_fix[..., 1], rho_fix[..., 2],
                         rho_fix[..., 3], rho_fix[..., 4])
    del ox, oy
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s2, c2 = jnp.sin(q2), jnp.cos(q2)
    s23, c23 = jnp.sin(q2 + q3), jnp.cos(q2 + q3)
    calf = lc - cz
    hip = cy + d
    a = lt * c2 + calf * c23 + cx * s23        # leg extension
    da_dq2 = -lt * s2 - calf * s23 + cx * c23  # = x_plane
    da_dq3 = -calf * s23 + cx * c23            # = g
    b = calf * c23 + cx * s23                  # -d x_plane / d q3
    zero = jnp.zeros_like(a)
    col1 = jnp.stack([zero, -hip * s1 + a * c1, hip * c1 + a * s1], axis=-1)
    col2 = jnp.stack([-a, s1 * da_dq2, -c1 * da_dq2], axis=-1)
    col3 = jnp.stack([-b, s1 * da_dq3, -c1 * da_dq3], axis=-1)
    return jnp.stack([col1, col2, col3], axis=-1)


def _scalarized(fn, argnum):
    """jacfwd over a single-leg call, then re-broadcast over batch dims."""
    def wrapped(q, rho_opt, rho_fix):
        flat_fn = jax.jacfwd(fn, argnums=argnum)
        batch = jnp.broadcast_shapes(q.shape[:-1], rho_opt.shape[:-1],
                                     rho_fix.shape[:-1])
        q_b = jnp.broadcast_to(q, batch + (3,)).reshape(-1, 3)
        ro_b = jnp.broadcast_to(rho_opt, batch + (3,)).reshape(-1, 3)
        rf_b = jnp.broadcast_to(rho_fix, batch + (5,)).reshape(-1, 5)
        out = jax.vmap(flat_fn)(q_b, ro_b, rf_b)
        return out.reshape(batch + out.shape[1:])
    return wrapped


def dfk_drho(q, rho_opt, rho_fix):
    """d fk / d rho_opt, (..., 3, 3) — autodiff (A1Kinematics.cpp:19-23)."""
    return _scalarized(fk, 1)(q, rho_opt, rho_fix)


def dJ_dq(q, rho_opt, rho_fix):
    """d vec(J) / d q, (..., 9, 3), column-major vec to match the reference
    layout (A1Kinematics.cpp:25-29)."""
    out = _scalarized(jac, 0)(q, rho_opt, rho_fix)  # (..., 3, 3, 3)
    # vec column-major: index = col * 3 + row.
    return jnp.swapaxes(out, -3, -2).reshape(out.shape[:-3] + (9, 3))


def dJ_drho(q, rho_opt, rho_fix):
    """d vec(J) / d rho_opt, (..., 9, 3) (A1Kinematics.cpp:31-35)."""
    out = _scalarized(jac, 1)(q, rho_opt, rho_fix)
    return jnp.swapaxes(out, -3, -2).reshape(out.shape[:-3] + (9, 3))


def foot_positions_body(joint_pos, geometry):
    """All-leg FK: (..., 12) joint vector -> (..., 4, 3) foot positions.

    Equivalent to the per-leg fk loop in the adapters
    (GazeboA1ROS.cpp:266-288), vectorized over legs.
    """
    q = joint_pos.reshape(joint_pos.shape[:-1] + (4, 3))
    return fk(q, geometry.rho_opt, geometry.rho_fix)


def foot_jacobians(joint_pos, geometry):
    """All-leg Jacobians: (..., 12) joints -> (..., 4, 3, 3)."""
    q = joint_pos.reshape(joint_pos.shape[:-1] + (4, 3))
    return jac(q, geometry.rho_opt, geometry.rho_fix)


def inverse_kinematics(p_body, rho_fix):
    """Closed-form leg IK: body-frame foot position -> joint angles.

    The reference has no IK (it commands torques), but the on-device SRB
    simulator needs it to recover joint states from swing-foot targets.
    Assumes rho_opt = 0. Solves the 3-DOF chain exactly:

      q1 from the (y, z) circle of radius hip = oy_leg + d,
      q3 from the law of cosines on the thigh/calf triangle,
      q2 from the in-plane angle.

    Args:
      p_body: (..., 3) desired foot position in the body frame.
      rho_fix: (..., 5) leg geometry.

    Returns:
      (..., 3) joint angles (knee-bent-backward branch, q3 < 0).
    """
    ox, oy, d, lt, lc = (rho_fix[..., 0], rho_fix[..., 1], rho_fix[..., 2],
                         rho_fix[..., 3], rho_fix[..., 4])
    hip = d  # only the motor offset rotates with the hip roll (see fk)
    x = p_body[..., 0] - ox
    y = p_body[..., 1] - oy
    z = p_body[..., 2]
    # q1: rotate (y, z) so the hip offset aligns; a^2 = y^2 + z^2 - hip^2.
    r2 = y * y + z * z
    a = jnp.sqrt(jnp.maximum(r2 - hip * hip, 1e-12))
    # y = hip c1 + a s1, z = hip s1 - a c1  ->  solve the linear system.
    s1 = (hip * z + a * y) / jnp.maximum(r2, 1e-12)
    c1 = (hip * y - a * z) / jnp.maximum(r2, 1e-12)
    q1 = jnp.arctan2(s1, c1)
    # planar 2-link: (x, -a) reached by lt @ q2 and lc @ q2+q3.
    l2 = x * x + a * a
    cos_knee = jnp.clip((l2 - lt * lt - lc * lc) / (2 * lt * lc), -1.0, 1.0)
    q3 = -jnp.arccos(cos_knee)  # knee flexed backward, matching Go1 poses
    # x = -lt s2 - lc s23, -a = -(lt c2 + lc c23)
    k1 = lt + lc * jnp.cos(q3)
    k2 = lc * jnp.sin(q3)
    # x = -(k1 s2 + k2 c2), a = k1 c2 - k2 s2
    q2 = jnp.arctan2(-x * k1 - a * k2, a * k1 - x * k2)
    return jnp.stack([q1, q2, q3], axis=-1)
