"""Leg kinematics checks.

The FK here is an independent re-derivation of the reference's
MATLAB-generated closed forms (A1Kinematics.cpp:39-130); these tests verify
it against autodiff, geometry invariants, and the IK round trip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.models import kinematics


RNG = np.random.default_rng(42)


def _rand_q(n=8):
    # realistic joint ranges: hip +-0.8, thigh -1..2, calf -2.7..-0.9
    q1 = RNG.uniform(-0.8, 0.8, n)
    q2 = RNG.uniform(-1.0, 2.0, n)
    q3 = RNG.uniform(-2.6, -0.95, n)
    return np.stack([q1, q2, q3], axis=-1)


def test_fk_zero_pose():
    """q = 0: leg fully extended straight down."""
    geom = kinematics.a1_leg_geometry(jnp.float64)
    q = jnp.zeros((4, 3), jnp.float64)
    p = kinematics.fk(q, geom.rho_opt, geom.rho_fix)
    np.testing.assert_allclose(p[0], [0.1881, 0.04675 + 0.08, -0.426],
                               atol=1e-12)
    np.testing.assert_allclose(p[1], [0.1881, -0.04675 - 0.08, -0.426],
                               atol=1e-12)
    np.testing.assert_allclose(p[3], [-0.1881, -0.04675 - 0.08, -0.426],
                               atol=1e-12)


def test_fk_pure_hip_roll():
    """Rolling the hip rotates the foot about the x axis through the hip."""
    geom = kinematics.a1_leg_geometry(jnp.float64)
    q1 = 0.3
    q = jnp.asarray([q1, 0.0, 0.0], jnp.float64)
    p = kinematics.fk(q, geom.rho_opt[0], geom.rho_fix[0])
    # only the motor offset d rotates with the hip; oy stays fixed
    hip, ext, oy = 0.08, 0.426, 0.04675
    np.testing.assert_allclose(
        np.asarray(p),
        [0.1881, oy + hip * np.cos(q1) + ext * np.sin(q1),
         hip * np.sin(q1) - ext * np.cos(q1)], atol=1e-12)


def test_jac_matches_autodiff():
    geom = kinematics.a1_leg_geometry(jnp.float64)
    qs = jnp.asarray(_rand_q(8), jnp.float64)
    for i in range(8):
        leg = i % 4
        analytic = kinematics.jac(qs[i], geom.rho_opt[leg], geom.rho_fix[leg])
        auto = jax.jacfwd(kinematics.fk)(qs[i], geom.rho_opt[leg],
                                         geom.rho_fix[leg])
        np.testing.assert_allclose(np.asarray(analytic), np.asarray(auto),
                                   atol=1e-10)


def test_jac_with_rho_opt_offsets():
    """Analytic Jacobian stays exact with nonzero contact offsets."""
    geom = kinematics.a1_leg_geometry(jnp.float64)
    rho_opt = jnp.asarray([0.01, -0.005, 0.02], jnp.float64)
    q = jnp.asarray([0.2, 0.7, -1.5], jnp.float64)
    analytic = kinematics.jac(q, rho_opt, geom.rho_fix[0])
    auto = jax.jacfwd(kinematics.fk)(q, rho_opt, geom.rho_fix[0])
    np.testing.assert_allclose(np.asarray(analytic), np.asarray(auto),
                               atol=1e-10)


def test_dfk_drho_matches_autodiff_shape():
    geom = kinematics.a1_leg_geometry(jnp.float64)
    q = jnp.asarray([0.1, 0.6, -1.3], jnp.float64)
    d = kinematics.dfk_drho(q, geom.rho_opt[0], geom.rho_fix[0])
    assert d.shape == (3, 3)
    # column 1 (d/dcy) at q1=0.1: moves foot along rolled-y direction
    auto = jax.jacfwd(kinematics.fk, argnums=1)(q, geom.rho_opt[0],
                                                geom.rho_fix[0])
    np.testing.assert_allclose(np.asarray(d), np.asarray(auto), atol=1e-10)


def test_dJ_dq_layout():
    """(9, 3) column-major vec layout matching A1Kinematics.cpp:25-29."""
    geom = kinematics.a1_leg_geometry(jnp.float64)
    q = jnp.asarray([0.15, 0.5, -1.2], jnp.float64)
    dj = kinematics.dJ_dq(q, geom.rho_opt[0], geom.rho_fix[0])
    assert dj.shape == (9, 3)
    eps = 1e-7
    j0 = kinematics.jac(q, geom.rho_opt[0], geom.rho_fix[0])
    for k in range(3):
        dq = q.at[k].add(eps)
        j1 = kinematics.jac(dq, geom.rho_opt[0], geom.rho_fix[0])
        fd = np.asarray((j1 - j0) / eps)
        # column-major vec: index = col * 3 + row
        np.testing.assert_allclose(
            np.asarray(dj[:, k]), fd.T.reshape(-1), atol=1e-5)


def test_fk_batched_all_legs():
    geom = kinematics.a1_leg_geometry(jnp.float64)
    qs = jnp.asarray(_rand_q(4), jnp.float64)
    batched = kinematics.fk(qs, geom.rho_opt, geom.rho_fix)
    for i in range(4):
        single = kinematics.fk(qs[i], geom.rho_opt[i], geom.rho_fix[i])
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), atol=1e-14)


@pytest.mark.parametrize("leg", [0, 1, 2, 3])
def test_ik_roundtrip(leg):
    """IK inverts FK on the physical branch (leg extended below the hip
    axis, a > 0); folded-above poses are outside the IK's branch."""
    geom = kinematics.a1_leg_geometry(jnp.float64)
    qs = _rand_q(64)
    ext = (0.213 * np.cos(qs[:, 1])
           + 0.213 * np.cos(qs[:, 1] + qs[:, 2]))
    qs = qs[ext > 0.02][:16]
    assert len(qs) >= 8
    q = jnp.asarray(qs, jnp.float64)
    p = kinematics.fk(q, geom.rho_opt[leg], geom.rho_fix[leg])
    q_rec = kinematics.inverse_kinematics(p, geom.rho_fix[leg])
    p_rec = kinematics.fk(q_rec, geom.rho_opt[leg], geom.rho_fix[leg])
    np.testing.assert_allclose(np.asarray(p_rec), np.asarray(p), atol=1e-9)
    np.testing.assert_allclose(np.asarray(q_rec), qs, atol=1e-9)
