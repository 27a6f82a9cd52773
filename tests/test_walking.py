"""Closed-loop trot-gait walking (configs[1]) on the on-device SRB sim.

The reference demonstrates forward/back/side trot in Gazebo
(README.md:29-33, doc/compare GIFs, no numbers); here the behavior is
asserted quantitatively: velocity tracking, height hold, attitude bounds,
and a proper alternating diagonal contact pattern.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.ctrl import controller
from go1_qp_mpc_controller_tpu.envs import rollout
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import admm

DTYPE = jnp.float64
SETTINGS = admm.ADMMSettings(seg_iters=25, segments=3)


def _walk_command(vel_xyz, yaw_rate=0.0, start=100):
    def command(i, ctrl):
        walk = i >= start
        return ctrl._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk, jnp.asarray(vel_xyz, DTYPE),
                                     jnp.zeros(3, DTYPE)),
            root_ang_vel_d=jnp.where(
                walk, jnp.asarray([0.0, 0.0, yaw_rate], DTYPE),
                jnp.zeros(3, DTYPE)))
    return command


def _run(command, steps=1200, estimate=False):
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, steps, dt, solver_type=controller.MPC,
        settings=SETTINGS, command_fn=command, estimate=estimate,
        use_terrain_adapt=False))
    return run(carry)


@pytest.mark.slow
def test_forward_trot():
    carry, trace = _run(_walk_command([0.3, 0.0, 0.0]))
    pos = np.asarray(trace.root_pos)
    vel = np.asarray(trace.root_lin_vel)
    eul = np.asarray(trace.root_euler)
    assert np.isfinite(pos).all()
    # velocity tracking within 10%
    np.testing.assert_allclose(vel[400:, 0].mean(), 0.3, rtol=0.1)
    # height held, attitude tight
    assert np.all(np.abs(pos[200:, 2] - 0.3) < 0.03)
    assert np.abs(eul[200:, :2]).max() < 0.05
    # lateral drift bounded
    assert np.abs(pos[-1, 1]) < 0.1
    # alternating diagonal trot: FL==RR, FR==RL, and both phases occur
    contacts = np.asarray(trace.contacts[200:]).astype(int)
    assert np.all(contacts[:, 0] == contacts[:, 3])
    assert np.all(contacts[:, 1] == contacts[:, 2])
    assert 0.3 < contacts[:, 0].mean() < 0.7


@pytest.mark.slow
def test_sideways_trot():
    carry, trace = _run(_walk_command([0.0, 0.2, 0.0]))
    pos = np.asarray(trace.root_pos)
    vel = np.asarray(trace.root_lin_vel)
    np.testing.assert_allclose(vel[400:, 1].mean(), 0.2, rtol=0.15)
    assert np.abs(pos[-1, 0]) < 0.1
    assert np.all(np.abs(pos[200:, 2] - 0.3) < 0.03)


@pytest.mark.slow
def test_backward_trot():
    carry, trace = _run(_walk_command([-0.2, 0.0, 0.0]))
    vel = np.asarray(trace.root_lin_vel)
    np.testing.assert_allclose(vel[400:, 0].mean(), -0.2, rtol=0.15)


@pytest.mark.slow
def test_forward_trot_with_ekf():
    """configs[3]: walking with the estimator closing the loop."""
    carry, trace = _run(_walk_command([0.25, 0.0, 0.0]), estimate=True)
    pos = np.asarray(trace.root_pos)
    vel = np.asarray(trace.root_lin_vel)
    assert np.isfinite(pos).all()
    np.testing.assert_allclose(vel[400:, 0].mean(), 0.25, rtol=0.15)
    assert np.all(np.abs(pos[200:, 2] - 0.3) < 0.05)
    # estimated velocity-integrated position stays close to the plant
    est_err = np.abs(np.asarray(trace.est_root_pos)[-1]
                     - np.asarray(trace.root_pos)[-1])
    assert est_err[2] < 0.05


def test_stand_qp_mode():
    """QP-mode stance control (stance_leg_control_type = 0) holds the
    trunk: the balance-QP slice of configs[0]."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, 400, dt, solver_type=controller.QP,
        settings=SETTINGS, estimate=False, use_terrain_adapt=False))
    carry, trace = run(carry)
    z = np.asarray(trace.root_pos[:, 2])
    assert np.isfinite(z).all()
    assert np.all(np.abs(z[150:] - 0.3) < 0.05), (z.min(), z.max())


@pytest.mark.slow
def test_forward_trot_h40_stagewise():
    """Closed-loop trot with the stagewise O(H) solver at H=40 — the
    long-horizon production path (VERDICT r2 item 4): warm stagewise
    ticks at steady cadence, cold re-solves on contact flips, through
    control_step(horizon=40)."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE,
                               horizon=40)
    dt = jnp.asarray(0.002, DTYPE)
    cold = admm.ADMMSettings(seg_iters=60, segments=3, polish=False)
    warm = admm.ADMMSettings(seg_iters=25, segments=1, polish=False)
    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, 700, dt, solver_type=controller.MPC,
        settings=cold, warm_settings=warm,
        command_fn=_walk_command([0.3, 0.0, 0.0]), estimate=False,
        use_terrain_adapt=False, horizon=40))
    carry, trace = run(carry)
    pos = np.asarray(trace.root_pos)
    vel = np.asarray(trace.root_lin_vel)
    eul = np.asarray(trace.root_euler)
    assert np.isfinite(pos).all()
    np.testing.assert_allclose(vel[400:, 0].mean(), 0.3, rtol=0.15)
    assert np.all(np.abs(pos[200:, 2] - 0.3) < 0.05)
    assert np.abs(eul[200:, :2]).max() < 0.08
    # contacts actually alternated (trot happened)
    con = np.asarray(trace.contacts)
    assert (con[150:].min(axis=0) == 0).any()
