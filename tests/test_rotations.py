"""Rotation utility checks (reference semantics: Utils.cpp:7-62)."""

import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.utils import rotations


def _quat_from_euler(r, p, y):
    """ZYX (yaw-pitch-roll) composition, returns (w, x, y, z)."""
    cr, sr = np.cos(r / 2), np.sin(r / 2)
    cp, sp = np.cos(p / 2), np.sin(p / 2)
    cy, sy = np.cos(y / 2), np.sin(y / 2)
    return np.array([
        cy * cp * cr + sy * sp * sr,
        cy * cp * sr - sy * sp * cr,
        cy * sp * cr + sy * cp * sr,
        sy * cp * cr - cy * sp * sr,
    ])


@pytest.mark.parametrize("rpy", [
    (0.0, 0.0, 0.0),
    (0.3, -0.2, 1.1),
    (-0.4, 0.35, -2.9),
    (0.1, 0.0, 3.0),
])
def test_quat_euler_roundtrip(rpy):
    q = _quat_from_euler(*rpy)
    out = rotations.quat_to_euler(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rpy), atol=1e-12)


def test_quat_to_rot_mat_matches_euler():
    rpy = np.array([0.25, -0.12, 0.7])
    q = _quat_from_euler(*rpy)
    r_q = np.asarray(rotations.quat_to_rot_mat(jnp.asarray(q)))
    r_e = np.asarray(rotations.euler_to_rot_mat(jnp.asarray(rpy)))
    np.testing.assert_allclose(r_q, r_e, atol=1e-12)
    # proper rotation
    np.testing.assert_allclose(r_q @ r_q.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(r_q) > 0.999


def test_rot_z_is_yaw_only():
    rpy = np.array([0.25, -0.12, 0.7])
    r_z = np.asarray(rotations.rot_z(jnp.asarray(rpy[2])))
    r_full = np.asarray(rotations.euler_to_rot_mat(
        jnp.asarray([0.0, 0.0, rpy[2]])))
    np.testing.assert_allclose(r_z, r_full, atol=1e-12)


def test_skew_cross_product():
    a = np.array([1.0, -2.0, 0.5])
    b = np.array([0.3, 0.9, -1.4])
    s = np.asarray(rotations.skew(jnp.asarray(a)))
    np.testing.assert_allclose(s @ b, np.cross(a, b), atol=1e-12)
    np.testing.assert_allclose(s, -s.T, atol=1e-12)


def test_skew_batched():
    vs = np.random.default_rng(0).normal(size=(5, 3))
    out = np.asarray(rotations.skew(jnp.asarray(vs)))
    for i in range(5):
        np.testing.assert_allclose(
            out[i], np.asarray(rotations.skew(jnp.asarray(vs[i]))))


def test_pseudo_inverse():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(3, 3))
    pinv = np.asarray(rotations.pseudo_inverse_3x3(jnp.asarray(m)))
    np.testing.assert_allclose(pinv, np.linalg.pinv(m), atol=1e-10)
    # singular case: rank-2 plane-fit normal matrix
    w = np.array([[1.0, 0.2, 0.0], [1.0, 0.5, 0.0], [1.0, -0.1, 0.0]])
    g = w.T @ w
    pinv = np.asarray(rotations.pseudo_inverse_3x3(jnp.asarray(g)))
    np.testing.assert_allclose(pinv, np.linalg.pinv(g), atol=1e-8)


def test_dihedral_angle():
    a = jnp.asarray([0.0, 0.0, 1.0])
    b = jnp.asarray([0.0, 1.0, 1.0])
    ang = float(rotations.cal_dihedral_angle(a, b))
    np.testing.assert_allclose(ang, np.pi / 4, atol=1e-12)
    # sign-insensitive (abs in the reference)
    ang2 = float(rotations.cal_dihedral_angle(a, -b))
    np.testing.assert_allclose(ang2, np.pi / 4, atol=1e-12)


def test_wrap_yaw_error():
    # crossing +-pi: desired 3.1, current -3.1 -> error should be small
    err = float(rotations.wrap_yaw_error(jnp.asarray(3.1), jnp.asarray(-3.1)))
    np.testing.assert_allclose(err, 6.2 - 2 * np.pi, atol=1e-12)
    err = float(rotations.wrap_yaw_error(jnp.asarray(-3.1), jnp.asarray(3.1)))
    np.testing.assert_allclose(err, 2 * np.pi - 6.2, atol=1e-12)
    err = float(rotations.wrap_yaw_error(jnp.asarray(0.5), jnp.asarray(0.1)))
    np.testing.assert_allclose(err, 0.4, atol=1e-12)


def test_solve_3x3_matches_linalg_solve():
    """Adjugate 3x3 solve == jnp.linalg.solve on general (non-symmetric)
    batched systems."""
    import numpy as np

    from go1_qp_mpc_controller_tpu.utils import rotations

    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.normal(size=(7, 3, 3)) + 2 * np.eye(3))
    b = jnp.asarray(rng.normal(size=(7, 3)))
    out = rotations.solve_3x3(a, b)
    ref = jnp.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-10)
    # unbatched
    out1 = rotations.solve_3x3(a[0], b[0])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref[0]),
                               atol=1e-10)
