"""Fused observe+EKF lane kernel: interpreter-mode equivalence against
the per-scenario reference composition (controller.sensor_update's
internals: rotations + kinematics + ekf.update_estimation)."""

import jax
import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.models import kinematics
from go1_qp_mpc_controller_tpu.ops import ekf, pallas_ekf
from go1_qp_mpc_controller_tpu.utils import rotations

DTYPE = jnp.float32


def _random_inputs(batch, key):
    ks = jax.random.split(key, 10)
    quat = jax.random.normal(ks[0], (batch, 4), DTYPE) * 0.1
    quat = quat.at[:, 0].add(1.0)
    acc = jax.random.normal(ks[1], (batch, 3), DTYPE)
    gyro = 0.5 * jax.random.normal(ks[2], (batch, 3), DTYPE)
    qpos = (jnp.tile(jnp.asarray([0.0, 0.8, -1.6] * 4, DTYPE),
                     (batch, 1))
            + 0.2 * jax.random.normal(ks[3], (batch, 12), DTYPE))
    qvel = jax.random.normal(ks[4], (batch, 12), DTYPE)
    ffoot = 120.0 * jax.random.uniform(ks[5], (batch, 4), DTYPE)
    mode = (jax.random.uniform(ks[6], (batch,)) > 0.5).astype(jnp.int32)
    geom = kinematics.a1_leg_geometry(DTYPE)

    def init_one(q, qp):
        rot = rotations.quat_to_rot_mat(q)
        fpr = kinematics.foot_positions_body(qp, geom)
        return ekf.init_state(rot, fpr)

    x0, p0 = jax.vmap(init_one)(quat, qpos)
    # a few dense covariance entries so the update is non-trivial
    p0 = p0 + 0.01 * jax.random.normal(ks[7], (batch, 18, 18), DTYPE)
    p0 = 0.5 * (p0 + jnp.swapaxes(p0, 1, 2))
    p0 = p0 + 3.0 * jnp.eye(18, dtype=DTYPE)
    return x0, p0, quat, acc, gyro, qpos, qvel, ffoot, mode, geom


def _reference(x, P, quat, acc, gyro, qpos, qvel, ffoot, mode, geom, dt):
    rot = rotations.quat_to_rot_mat(quat)
    euler = rotations.quat_to_euler(quat)
    rot_z = rotations.rot_z(euler[2])
    q_legs = qpos.reshape(4, 3)
    dq_legs = qvel.reshape(4, 3)
    fpr = kinematics.fk(q_legs, geom.rho_opt, geom.rho_fix)
    jf = kinematics.jac(q_legs, geom.rho_opt, geom.rho_fix)
    fvr = jnp.einsum('lij,lj->li', jf, dq_legs)
    fpa = fpr @ rot.T
    wav = rot @ gyro
    res = ekf.update_estimation(x, P, dt, rot, acc, gyro, fpr, fvr,
                                ffoot, mode, innovation_solver="schulz")
    return rot, euler, rot_z, fpr, fpa, fvr, jf, wav, res.x, res.P, \
        res.estimated_contacts


def test_lane_kernel_matches_reference():
    batch = 24      # non-multiple of the lane tile: exercises padding
    x0, p0, quat, acc, gyro, qpos, qvel, ffoot, mode, geom = \
        _random_inputs(batch, jax.random.PRNGKey(0))
    dt = jnp.asarray(0.002, DTYPE)

    out = pallas_ekf.observe_ekf_lanes(
        x0, p0, quat, acc, gyro, qpos, qvel, ffoot, mode, dt,
        geom.rho_opt, geom.rho_fix, interpret=True)

    ref = jax.vmap(lambda *a: _reference(*a, geom, dt))(
        x0, p0, quat, acc, gyro, qpos, qvel, ffoot, mode)
    names = ("rot", "euler", "rot_z", "foot_pos_rel", "foot_pos_abs",
             "foot_vel_rel", "j_foot", "root_ang_vel", "x", "P",
             "est_contacts")
    # x/P: fp accumulation-order differences (lane FMA chains vs the
    # reference's MXU HIGHEST matmuls) measure up to ~2e-4 relative
    tols = {"x": 5e-4, "P": 5e-4}
    for name, r in zip(names, ref):
        got = np.asarray(out[name])
        want = np.asarray(r)
        atol = tols.get(name, 1e-5) * max(1.0, np.abs(want).max())
        np.testing.assert_allclose(got, want, atol=atol,
                                   err_msg=name)


def test_lane_kernel_contact_semantics():
    """Standing mode forces full contact; walking mode scales by force."""
    batch = 8
    x0, p0, quat, acc, gyro, qpos, qvel, ffoot, _, geom = \
        _random_inputs(batch, jax.random.PRNGKey(1))
    dt = jnp.asarray(0.002, DTYPE)
    mode0 = jnp.zeros((batch,), jnp.int32)
    out = pallas_ekf.observe_ekf_lanes(
        x0, p0, quat, acc, gyro, qpos, qvel, ffoot, mode0, dt,
        geom.rho_opt, geom.rho_fix, interpret=True)
    np.testing.assert_allclose(np.asarray(out["est_contacts"]), 1.0)
    mode1 = jnp.ones((batch,), jnp.int32)
    out1 = pallas_ekf.observe_ekf_lanes(
        x0, p0, quat, acc, gyro, qpos, qvel, ffoot, mode1, dt,
        geom.rho_opt, geom.rho_fix, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out1["est_contacts"]),
        np.clip(np.asarray(ffoot) / 100.0, 0.0, 1.0), atol=1e-6)
