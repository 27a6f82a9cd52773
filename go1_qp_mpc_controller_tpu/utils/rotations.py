"""Rotation / small linear-algebra utilities.

TPU-native equivalents of the reference's Utils namespace
(src/a1_cpp/src/utils/Utils.cpp:7-62). All functions are pure, jittable,
dtype-polymorphic and written for arbitrary leading batch dims where noted.
"""

import jax.numpy as jnp


def quat_to_euler(quat_wxyz):
    """Quaternion -> (roll, pitch, yaw), aerospace ZYX extraction.

    Matches Utils::quat_to_euler (Utils.cpp:7-33): roll = atan2 in [-pi, pi],
    pitch = asin of clamped argument, yaw = atan2 in [-pi, pi]. The custom
    convention exists because Eigen's eulerAngles() has a different range
    (documented by test_rotation.cpp:14-61).

    Args:
      quat_wxyz: (..., 4) quaternion as (w, x, y, z).

    Returns:
      (..., 3) euler angles (roll, pitch, yaw).
    """
    w, x, y, z = (quat_wxyz[..., 0], quat_wxyz[..., 1],
                  quat_wxyz[..., 2], quat_wxyz[..., 3])
    y_sqr = y * y
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y_sqr))
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y_sqr + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat_to_rot_mat(quat_wxyz):
    """Quaternion -> 3x3 rotation matrix (body -> world).

    Equivalent of Eigen::Quaterniond::toRotationMatrix used throughout the
    adapters (GazeboA1ROS.cpp:242-288).

    Args:
      quat_wxyz: (..., 4) quaternion as (w, x, y, z). Need not be normalized;
        normalization is applied.

    Returns:
      (..., 3, 3) rotation matrix.
    """
    q = quat_wxyz / jnp.linalg.norm(quat_wxyz, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    rows = [jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1)]
    return jnp.stack(rows, axis=-2)


def euler_to_rot_mat(euler_rpy):
    """(roll, pitch, yaw) -> rotation matrix R = Rz(yaw) @ Ry(pitch) @ Rx(roll)."""
    r, p, y = euler_rpy[..., 0], euler_rpy[..., 1], euler_rpy[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    r00 = cy * cp
    r01 = cy * sp * sr - sy * cr
    r02 = cy * sp * cr + sy * sr
    r10 = sy * cp
    r11 = sy * sp * sr + cy * cr
    r12 = sy * sp * cr - cy * sr
    r20 = -sp
    r21 = cp * sr
    r22 = cp * cr
    rows = [jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1)]
    return jnp.stack(rows, axis=-2)


def rot_z(yaw):
    """Yaw-only rotation matrix, the reference's root_rot_mat_z.

    Used for body-yaw-frame transforms (GazeboA1ROS.cpp:252-255).

    Args:
      yaw: (...) yaw angle.

    Returns:
      (..., 3, 3) rotation about +z.
    """
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(c)
    one = jnp.ones_like(c)
    rows = [jnp.stack([c, -s, zero], axis=-1),
            jnp.stack([s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1)]
    return jnp.stack(rows, axis=-2)


def skew(vec):
    """3-vector -> skew-symmetric cross-product matrix (Utils.cpp:35-41).

    Args:
      vec: (..., 3).

    Returns:
      (..., 3, 3) with rows [[0,-z,y],[z,0,-x],[-y,x,0]].
    """
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    zero = jnp.zeros_like(x)
    rows = [jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1)]
    return jnp.stack(rows, axis=-2)


def pseudo_inverse_3x3(mat, rcond_scale=None):
    """SVD pseudo-inverse of a 3x3 matrix (Utils.cpp:44-52).

    The reference uses tolerance = eps * max(rows, cols) * sigma_max, i.e.
    numpy-style rcond. jnp.linalg.pinv with an equivalent rcond reproduces it.

    Args:
      mat: (..., 3, 3).
      rcond_scale: override for the rcond multiplier; defaults to
        3 * dtype-eps matching the reference tolerance.

    Returns:
      (..., 3, 3) pseudo-inverse.
    """
    if rcond_scale is None:
        rcond_scale = 3.0 * float(jnp.finfo(mat.dtype).eps)
    return jnp.linalg.pinv(mat, rtol=rcond_scale)


def solve_3x3(a, b):
    """Solve a x = b for 3x3 systems via the closed-form adjugate.

    Batched `jnp.linalg.solve` lowers tiny systems to LU + triangular
    solves, which serialize on TPU; the adjugate is pure elementwise
    arithmetic + one 3x3 matvec (the same trick models/srb.calculate_B_c
    uses for the inertia inverse). No pivoting: intended for the
    controller's well-conditioned leg Jacobians / inertia tensors — a
    singular input yields inf/nan, caught by the callers' NaN latches
    exactly like the reference's post-solve isnan guards
    (A1RobotControl.cpp:314-317).

    Args:
      a: (..., 3, 3); b: (..., 3).

    Returns:
      (..., 3).
    """
    c0 = jnp.cross(a[..., 1, :], a[..., 2, :])
    c1 = jnp.cross(a[..., 2, :], a[..., 0, :])
    c2 = jnp.cross(a[..., 0, :], a[..., 1, :])
    det = jnp.sum(a[..., 0, :] * c0, axis=-1, keepdims=True)
    # rows of a^-1 (adjugate columns / det)
    inv_rows = jnp.stack([c0, c1, c2], axis=-2) / det[..., None]
    return jnp.einsum('...rc,...c->...r',
                      jnp.swapaxes(inv_rows, -1, -2), b)


def cal_dihedral_angle(coef_a, coef_b):
    """Angle between two planes given normal coefficients (Utils.cpp:54-62).

    Returns acos(|a . b| / (|a| |b|)), i.e. always in [0, pi/2].
    """
    num = jnp.abs(jnp.sum(coef_a * coef_b, axis=-1))
    den = jnp.linalg.norm(coef_a, axis=-1) * jnp.linalg.norm(coef_b, axis=-1)
    return jnp.arccos(jnp.clip(num / den, -1.0, 1.0))


def wrap_yaw_error(yaw_d, yaw):
    """Shortest-path yaw error used before the GRF solves.

    Mirrors the +-1.5*pi unwrap of A1RobotControl.cpp:325-332: if the naive
    error exceeds 1.5*pi the desired yaw is shifted by 2*pi toward the
    current yaw.
    """
    err = yaw_d - yaw
    two_pi = 2.0 * jnp.pi
    err = jnp.where(err > 1.5 * jnp.pi, err - two_pi, err)
    err = jnp.where(err < -1.5 * jnp.pi, err + two_pi, err)
    return err
