"""Warm-started tick sequence: accuracy of the production solve cadence.

The reference reuses one OSQP instance across control ticks
(A1RobotControl.cpp:522-540); here the WarmState (primal/dual/rho/KKT
inverse) carries across ticks and each tick costs only a few Schulz
refinement matmuls + one short ADMM segment. These tests verify that the
warm path tracks the cold-solve answers through a drifting tick sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.compat import oracle
from go1_qp_mpc_controller_tpu.models import srb
from go1_qp_mpc_controller_tpu.ops import admm

DTYPE = jnp.float64
WARM = admm.ADMMSettings(seg_iters=60, segments=1, polish=False,
                         schulz_refine=4)


def _tick_qp(f, x0):
    return srb.condense(
        jnp.asarray(f["a_d"], DTYPE), jnp.asarray(f["b_d_list"], DTYPE),
        x0, jnp.asarray(f["x_ref"], DTYPE).reshape(10, 13),
        jnp.asarray(f["q_weights"], DTYPE),
        jnp.asarray(f["r_weights"], DTYPE),
        jnp.asarray(f["contacts"], DTYPE))


@pytest.mark.slow
def test_warm_ticks_track_cold_solutions():
    f = oracle.test_mpc_fixture()
    x0 = jnp.asarray(f["x0"], DTYPE)
    qp0 = _tick_qp(f, x0)
    cold_sol, warm = admm.mpc_solve(qp0, admm.ADMMSettings(),
                                    return_warm=True)
    drift = jnp.zeros(13, DTYPE).at[9].set(0.002).at[5].set(-0.0005)
    errs = []
    for k in range(20):
        x0 = x0 + drift          # ~mm-scale per-tick state drift
        qp_k = _tick_qp(f, x0)
        sol, warm = admm.mpc_solve_warm(qp_k, warm, WARM)
        ref = admm.mpc_solve(qp_k, admm.ADMMSettings())
        errs.append(np.abs(np.asarray(sol.x[:12]) -
                           np.asarray(ref.x[:12])).max())
    errs = np.array(errs)
    # warm ticks match full cold solves on the applied forces
    assert errs.max() < 1e-3, errs
    # and the solver state stays healthy
    assert float(sol.primal_res) < 5e-4
    assert float(sol.dual_res) < 5e-4


@pytest.mark.slow
def test_warm_tick_batch_consistency():
    """vmap over scenarios of the warm tick == per-scenario ticks."""
    f = oracle.test_mpc_fixture()
    n = 3
    rng = np.random.default_rng(0)
    x0s = jnp.asarray(np.tile(f["x0"], (n, 1))
                      + rng.normal(size=(n, 13)) * 0.01, DTYPE)

    def cold(x0):
        return admm.mpc_solve(_tick_qp(f, x0), admm.ADMMSettings(),
                              return_warm=True)

    def warm_tick(x0, warm):
        return admm.mpc_solve_warm(_tick_qp(f, x0), warm, WARM)

    _, warms = jax.vmap(cold)(x0s)
    x1s = x0s + 0.001
    batched, _ = jax.vmap(warm_tick)(x1s, warms)
    for i in range(n):
        _, w = cold(x0s[i])
        single, _ = warm_tick(x1s[i], w)
        # vmap reassociates float reductions and the ADMM tail wanders
        # within its residual band (~1e-4), so agreement is gated at the
        # solver tolerance, not bitwise
        np.testing.assert_allclose(np.asarray(batched.x[i]),
                                   np.asarray(single.x), atol=1e-3)


@pytest.mark.slow
def test_production_warm_path_tracks_cold_in_closed_loop():
    """The controller's default warm path (WarmState carry + fused lazy
    solve + basin-gated cold transitions, ctrl/controller.py
    compute_grf_mpc) produces the same GRFs as cold-solving every tick,
    evaluated teacher-forced at identical states through a walking
    rollout with gait transitions (A1RobotControl.cpp:522-540 cadence)."""
    import jax

    from go1_qp_mpc_controller_tpu.ctrl import controller
    from go1_qp_mpc_controller_tpu.envs import rollout, srb_sim
    from go1_qp_mpc_controller_tpu.models import types

    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    settings = admm.ADMMSettings(seg_iters=25, segments=3)
    vel = jnp.asarray([0.3, 0.0, 0.0], DTYPE)

    def tick(c, i):
        ctrl, sim = c.ctrl, c.sim
        walk = i >= 50
        ctrl = ctrl._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk, vel, jnp.zeros(3, DTYPE)))
        sensors = srb_sim.read_sensors(sim, model, ctrl.contacts,
                                       c.stance_forces_z, dt)
        ctrl = controller.sensor_update(ctrl, model, sensors, dt,
                                        estimate=False)
        ctrl = ctrl._replace(root_pos=sim.root_pos,
                             root_lin_vel=sim.root_lin_vel)
        warm = controller.control_step(ctrl, model, params, dt,
                                       settings=settings,
                                       use_terrain_adapt=False)
        cold = controller.control_step(ctrl, model, params, dt,
                                       settings=settings,
                                       use_terrain_adapt=False,
                                       warm_settings=None)
        sim2, fz = srb_sim.step(sim, model, warm.joint_torques,
                                warm.contacts,
                                warm.foot_pos_target_last_time, dt)
        diff = jnp.max(jnp.abs(warm.foot_forces_grf
                               - cold.foot_forces_grf))
        return (rollout.RolloutCarry(ctrl=warm, sim=sim2,
                                     stance_forces_z=fz), diff)

    _, diffs = jax.jit(
        lambda c: jax.lax.scan(tick, c, jnp.arange(400)))(carry)
    diffs = np.asarray(diffs)
    # warm path tracks the cold solutions on the applied forces: sub-N on
    # the typical tick. The tail is the gait-transition transient: the
    # 1-2 all-stance ticks at each trot hand-off pose a semi-degenerate
    # 4-leg load-distribution QP that NO fixed budget solves tightly
    # (measured: even 320 banded-rho iterations leave ~5 N vs the
    # KKT-certified oracle; the reference's OSQP pays the same character
    # of cost by iterating to tolerance) — bounded here and with no
    # closed-loop effect (height holds to mm, test_walking.py).
    assert np.isfinite(diffs).all()
    # median bar history: 0.5 N under the r3 drift tolerance (0.01),
    # which cold-solved ~95% of trot ticks — the median then mostly
    # measured the cold solver against itself. The r4 recalibration
    # (WARM_DRIFT_TOL = 0.2, see ctrl/controller.py) lets the steady
    # gait genuinely run the 20-iteration warm tick (drift p50 ~5e-2),
    # whose teacher-forced tracking is ~0.5 N median / ~1.5 N p95 on
    # TPU (NOTES_ROUND4) — the median bar moves to 1.0 N to gate THAT
    # program; the transient tail bars are unchanged.
    assert np.median(diffs) < 1.0, np.median(diffs)
    assert np.percentile(diffs, 95) < 10.0, np.percentile(diffs, 95)
    assert diffs.max() < 40.0, diffs.max()


def test_fused_lazy_warm_tick_matches_regular():
    """solve_warm_fused (unmaterialized-Hessian KKT build) is algebraically
    identical to solve_warm + condense_nilpotent_const: in float64 the two
    paths differ only by fp reassociation (~1e-10)."""
    f = oracle.test_mpc_fixture()
    a_d = jnp.asarray(f["a_d"], DTYPE)
    b_d = jnp.asarray(f["b_d_list"], DTYPE)[0]   # constant-B_d path
    x_ref = jnp.asarray(f["x_ref"], DTYPE).reshape(10, 13)
    qw = jnp.asarray(f["q_weights"], DTYPE)
    rw = jnp.asarray(f["r_weights"], DTYPE)
    contacts = jnp.asarray(f["contacts"], DTYPE)
    x0 = jnp.asarray(f["x0"], DTYPE)

    qp0 = srb.condense_nilpotent_const(a_d, b_d, x0, x_ref, qw, rw,
                                       contacts)
    _, warm = admm.mpc_solve(qp0, admm.ADMMSettings(), return_warm=True)
    # lazy form materializes to the identical QP
    lz0 = srb.condense_nilpotent_lazy(a_d, b_d, x0, x_ref, qw, rw,
                                      contacts)
    np.testing.assert_allclose(np.asarray(srb.lazy_hessian(lz0)),
                               np.asarray(qp0.hessian), rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(srb.lazy_hessian_diag(lz0)),
                               np.asarray(np.diag(np.asarray(qp0.hessian))),
                               rtol=0, atol=1e-12)
    # unmaterialized matvec (the warm tail's dual-residual path and the
    # transition-test diagnostics) matches H @ v
    v = jnp.asarray(np.random.default_rng(7).normal(size=120), DTYPE)
    np.testing.assert_allclose(np.asarray(srb.lazy_hessian_matvec(lz0, v)),
                               np.asarray(qp0.hessian @ v),
                               rtol=0, atol=1e-10)

    drift = jnp.zeros(13, DTYPE).at[9].set(0.002).at[5].set(-0.0005)
    warm_a = warm_b = warm
    for _ in range(6):
        x0 = x0 + drift
        qp_k = srb.condense_nilpotent_const(a_d, b_d, x0, x_ref, qw, rw,
                                            contacts)
        lz_k = srb.condense_nilpotent_lazy(a_d, b_d, x0, x_ref, qw, rw,
                                           contacts)
        sol_a, warm_a = admm.mpc_solve_warm(qp_k, warm_a, WARM)
        sol_b, warm_b = admm.mpc_solve_warm_fused(lz_k, warm_b, WARM)
        np.testing.assert_allclose(np.asarray(sol_b.x), np.asarray(sol_a.x),
                                   rtol=0, atol=1e-8)
        assert float(sol_b.dual_res) < 5e-4
