"""Kalman-filter estimator tests (A1BasicEKF.cpp semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.ops import ekf


def _stationary_inputs(dtype=jnp.float64):
    """Robot standing at height 0.3, feet on the ground, perfect IMU."""
    rot = jnp.eye(3, dtype=dtype)
    foot_pos_rel = jnp.asarray(
        [[0.17, 0.15, -0.3], [0.17, -0.15, -0.3],
         [-0.17, 0.15, -0.3], [-0.17, -0.15, -0.3]], dtype)
    foot_vel_rel = jnp.zeros((4, 3), dtype)
    imu_acc = jnp.asarray([0.0, 0.0, 9.81], dtype)  # measures -gravity
    imu_ang_vel = jnp.zeros((3,), dtype)
    foot_force = jnp.full((4,), 200.0, dtype)
    return rot, foot_pos_rel, foot_vel_rel, imu_acc, imu_ang_vel, foot_force


def test_init_state_plants_feet():
    rot, fpr, *_ = _stationary_inputs()
    x, p = ekf.init_state(rot, fpr)
    np.testing.assert_allclose(np.asarray(x[:3]), [0, 0, 0.09])
    # foot world positions = root + R fk
    np.testing.assert_allclose(np.asarray(x[6:9]),
                               np.asarray(fpr[0]) + [0, 0, 0.09], atol=1e-12)
    np.testing.assert_allclose(np.asarray(p), 3 * np.eye(18))


def test_stationary_convergence():
    """Standing still: velocity -> 0, feet stay planted, height from
    flat-ground measurement."""
    rot, fpr, fvr, acc, gyro, force = _stationary_inputs()
    x, p = ekf.init_state(rot, fpr)
    dt = jnp.asarray(0.002, jnp.float64)
    step = jax.jit(lambda x, p: ekf.update_estimation(
        x, p, dt, rot, acc, gyro, fpr, fvr, force,
        jnp.asarray(0, jnp.int32)))
    for _ in range(500):
        res = step(x, p)
        x, p = res.x, res.P
    # velocity ~ 0
    np.testing.assert_allclose(np.asarray(x[3:6]), 0.0, atol=1e-6)
    # feet on the ground plane (flat-ground measurement pulls z -> 0)
    feet_z = np.asarray(x[6:]).reshape(4, 3)[:, 2]
    np.testing.assert_allclose(feet_z, 0.0, atol=1e-3)
    # root height consistent with fk: foot_z = root_z - 0.3 = 0
    np.testing.assert_allclose(float(x[2]), 0.3, atol=1e-3)
    assert np.all(np.asarray(res.estimated_contacts) == 1.0)


@pytest.mark.slow
def test_constant_velocity_tracking():
    """Walking forward at constant v: estimator tracks v from leg odometry."""
    rot, fpr, _, acc, gyro, force = _stationary_inputs()
    v = 0.4
    # feet sliding backward relative to body at -v (stance legs)
    fvr = jnp.asarray(np.tile([-v, 0.0, 0.0], (4, 1)))
    x, p = ekf.init_state(rot, fpr)
    dt = jnp.asarray(0.002, jnp.float64)
    for _ in range(300):
        res = ekf.update_estimation(x, p, dt, rot, acc, gyro, fpr, fvr,
                                    force, jnp.asarray(1, jnp.int32))
        x, p = res.x, res.P
    # the synthetic stream keeps FK constant while feet are pinned, which is
    # slightly inconsistent; the filter's steady-state compromise sits a few
    # percent under the odometry velocity.
    np.testing.assert_allclose(float(x[3]), v, atol=0.01)
    np.testing.assert_allclose(float(x[4]), 0.0, atol=1e-3)


def test_swing_leg_noise_inflation():
    """Zero-force legs get 1001x noise -> their measurements barely move the
    root estimate; contact estimate reflects forces."""
    rot, fpr, fvr, acc, gyro, _ = _stationary_inputs()
    force = jnp.asarray([200.0, 0.0, 200.0, 0.0])
    x, p = ekf.init_state(rot, fpr)
    dt = jnp.asarray(0.002, jnp.float64)
    # give swing feet inconsistent velocity measurements
    fvr_bad = fvr.at[1].set(jnp.asarray([5.0, 5.0, 5.0]))
    res = ekf.update_estimation(x, p, dt, rot, acc, gyro, fpr, fvr_bad,
                                force, jnp.asarray(1, jnp.int32))
    np.testing.assert_allclose(np.asarray(res.estimated_contacts),
                               [1.0, 0.0, 1.0, 0.0])
    # the bogus swing-leg velocity must not corrupt the root velocity
    assert np.abs(np.asarray(res.x[3:6])).max() < 0.05


def test_vmap_consistency():
    rot, fpr, fvr, acc, gyro, force = _stationary_inputs()
    x, p = ekf.init_state(rot, fpr)
    dt = jnp.asarray(0.002, jnp.float64)
    forces = jnp.stack([force, force * 0.5, force * 0.0])

    def one(f):
        return ekf.update_estimation(x, p, dt, rot, acc, gyro, fpr, fvr, f,
                                     jnp.asarray(1, jnp.int32)).x

    batched = jax.vmap(one)(forces)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(one(forces[i])), atol=1e-12)


def test_f32_runs():
    rot, fpr, fvr, acc, gyro, force = _stationary_inputs(jnp.float32)
    x, p = ekf.init_state(rot, fpr)
    res = ekf.update_estimation(x, p, jnp.asarray(0.002, jnp.float32), rot,
                                acc, gyro, fpr, fvr, force,
                                jnp.asarray(0, jnp.int32))
    assert res.x.dtype == jnp.float32
    assert np.isfinite(np.asarray(res.x)).all()


def test_go1_contact_force_normalizer():
    """Go1 RL/hardware stack foot-force normalizer (Go1BasicEKF.cpp:83):
    contact probability divides by 1000 on Go1 force units where the A1
    stack divides by 100. A Go1-scale partial contact (300) must NOT
    saturate under the Go1 norm, and the swing-leg measurement-noise
    inflation must engage on a light (30) Go1 reading exactly like a
    3 N A1 reading."""
    rot, fpr, fvr, acc, gyro, _ = _stationary_inputs()
    x, p = ekf.init_state(rot, fpr)
    dt = jnp.asarray(0.002, x.dtype)
    walk = jnp.asarray(1, jnp.int32)

    ff_go1 = jnp.asarray([1000.0, 300.0, 30.0, 0.0], x.dtype)
    res_go1 = ekf.update_estimation(x, p, dt, rot, acc, gyro, fpr, fvr,
                                    ff_go1, walk,
                                    contact_force_norm=1000.0)
    np.testing.assert_allclose(np.asarray(res_go1.estimated_contacts),
                               [1.0, 0.3, 0.03, 0.0], atol=1e-12)
    # with the A1 constant the same frame saturates 3 of 4 legs —
    # exactly the bug the parameter exists to prevent
    res_wrong = ekf.update_estimation(x, p, dt, rot, acc, gyro, fpr, fvr,
                                      ff_go1, walk,
                                      contact_force_norm=100.0)
    np.testing.assert_allclose(np.asarray(res_wrong.estimated_contacts),
                               [1.0, 1.0, 0.3, 0.0], atol=1e-12)
    # scale equivalence: Go1 reading / 1000 == A1 reading / 100 gives
    # bit-identical filter updates
    res_a1 = ekf.update_estimation(x, p, dt, rot, acc, gyro, fpr, fvr,
                                   ff_go1 / 10.0, walk,
                                   contact_force_norm=100.0)
    np.testing.assert_allclose(np.asarray(res_go1.x),
                               np.asarray(res_a1.x), atol=0)
    np.testing.assert_allclose(np.asarray(res_go1.P),
                               np.asarray(res_a1.P), atol=0)
