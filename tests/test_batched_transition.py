"""Batch-level transition routing (controller.control_step_batched).

VERDICT r2 item 3: under vmap the per-scenario warm/cold ``lax.cond``
becomes a select that pays the full cold solve for every scenario every
tick. The batched entry lifts the decision above the batch: the cond
predicate is ``jnp.any(transition)``, so non-flip ticks execute only the
warm program and flip ticks route the whole batch through the cold
branch (identical computation to warm_mode="cold" per scenario).
"""

import jax
import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.ctrl import controller
from go1_qp_mpc_controller_tpu.envs import rollout, srb_sim
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import admm

DTYPE = jnp.float64
SETTINGS = admm.ADMMSettings(seg_iters=25, segments=3)


def _batched_carry(batch, model, params, key=0):
    c = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    b = jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), c)
    kz, kv = jax.random.split(jax.random.PRNGKey(key))
    sim = b.sim._replace(
        root_pos=b.sim.root_pos.at[:, 2].add(
            0.005 * jax.random.normal(kz, (batch,), DTYPE)),
        root_lin_vel=(b.sim.root_lin_vel
                      + 0.01 * jax.random.normal(kv, (batch, 3), DTYPE)))
    return b._replace(sim=sim)


def _tick(c, model, params, dt, step_fn):
    """One observe -> control -> plant tick over a batched carry;
    step_fn(ctrl_batch) -> ctrl_batch does the control stage."""
    def observe(cs, sm, fz):
        sensors = srb_sim.read_sensors(sm, model, cs.contacts, fz, dt)
        return controller.sensor_update(cs, model, sensors, dt)

    ctrl = jax.vmap(observe)(c.ctrl, c.sim, c.stance_forces_z)
    ctrl = step_fn(ctrl)
    sim, fz = jax.vmap(
        lambda sm, tau, con, tgt: srb_sim.step(sm, model, tau, con, tgt,
                                               dt))(
        c.sim, ctrl.joint_torques, ctrl.contacts,
        ctrl.foot_pos_target_last_time)
    return rollout.RolloutCarry(ctrl=ctrl, sim=sim, stance_forces_z=fz)


def test_batched_matches_per_scenario_on_unmixed_ticks():
    """When every scenario takes the same branch (first tick: all cold;
    steady stand: all warm) the batched program computes exactly what the
    per-scenario auto program does."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    batch = 4
    c0 = _batched_carry(batch, model, params)

    batched = jax.jit(lambda cs: controller.control_step_batched(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False))
    per_scn = jax.jit(jax.vmap(lambda cs: controller.control_step(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False, warm_mode="auto")))

    cb = cp = c0
    for k in range(6):
        cb = _tick(cb, model, params, dt, batched)
        cp = _tick(cp, model, params, dt, per_scn)
        np.testing.assert_allclose(
            np.asarray(cb.ctrl.foot_forces_grf),
            np.asarray(cp.ctrl.foot_forces_grf), atol=1e-8,
            err_msg=f"tick {k}")
        np.testing.assert_allclose(
            np.asarray(cb.ctrl.joint_torques),
            np.asarray(cp.ctrl.joint_torques), atol=1e-8,
            err_msg=f"tick {k}")


def _mixed_carry(model, params, batch=4):
    """A steady-warm batched carry with scenario 0's carried contact
    pattern invalidated — one flagged scenario, the rest warm-viable."""
    dt = jnp.asarray(0.002, DTYPE)
    c = _batched_carry(batch, model, params)
    batched = jax.jit(lambda cs: controller.control_step_batched(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False))
    # warm the carries first (3 ticks -> steady warm cadence)
    for _ in range(3):
        c = _tick(c, model, params, dt, batched)
    qc = c.ctrl.qp_warm_contacts
    ctrl = c.ctrl._replace(qp_warm_contacts=qc.at[0].set(~qc[0]))
    return c._replace(ctrl=ctrl)


def test_mixed_tick_compaction_matches_per_scenario_auto():
    """VERDICT r3 item 1: a mixed batch must compute EXACTLY what the
    per-scenario auto routing computes — the flagged scenario gets the
    cold solve (gathered into the static-k sub-batch), every other
    scenario gets only the warm tick. This is the per-scenario analog of
    OSQP paying iterations only where the warm start is off
    (A1RobotControl.cpp:522-540)."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    c_mixed = _mixed_carry(model, params)

    batched = jax.jit(lambda cs: controller.control_step_batched(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False))          # default compact_k
    per_auto = jax.jit(jax.vmap(lambda cs: controller.control_step(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False, warm_mode="auto")))

    out_b = _tick(c_mixed, model, params, dt, batched)
    out_a = _tick(c_mixed, model, params, dt, per_auto)
    np.testing.assert_allclose(
        np.asarray(out_b.ctrl.foot_forces_grf),
        np.asarray(out_a.ctrl.foot_forces_grf), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(out_b.ctrl.joint_torques),
        np.asarray(out_a.ctrl.joint_torques), atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(out_b.ctrl.qp_warm_minv),
        np.asarray(out_a.ctrl.qp_warm_minv), atol=1e-8)


def test_mixed_tick_overflow_routes_whole_batch_cold():
    """When the per-tick transition count exceeds compact_k (and with
    compaction disabled, compact_k=0), the whole batch takes the cold
    branch — exactly the per-scenario warm_mode='cold' program."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    c = _mixed_carry(model, params)
    # flag a SECOND scenario so n_flag = 2 > compact_k = 1
    qc = c.ctrl.qp_warm_contacts
    ctrl = c.ctrl._replace(qp_warm_contacts=qc.at[1].set(~qc[1]))
    c_mixed = c._replace(ctrl=ctrl)

    all_cold = jax.jit(jax.vmap(lambda cs: controller.control_step(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False, warm_mode="cold")))
    out_c = _tick(c_mixed, model, params, dt, all_cold)

    for k in (1, 0):
        batched = jax.jit(lambda cs, kk=k: controller.control_step_batched(
            cs, model, params, dt, settings=SETTINGS,
            use_terrain_adapt=False, compact_k=kk))
        out_b = _tick(c_mixed, model, params, dt, batched)
        np.testing.assert_allclose(
            np.asarray(out_b.ctrl.foot_forces_grf),
            np.asarray(out_c.ctrl.foot_forces_grf), atol=1e-8,
            err_msg=f"compact_k={k}")
        np.testing.assert_allclose(
            np.asarray(out_b.ctrl.qp_warm_minv),
            np.asarray(out_c.ctrl.qp_warm_minv), atol=1e-8,
            err_msg=f"compact_k={k}")


def test_batched_trot_rollout_walks():
    """rollout_batched: a short batched trot (flip ticks genuinely occur
    and route through the batch-level cold branch) stays upright and
    tracks the commanded velocity."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    batch = 3
    c0 = _batched_carry(batch, model, params)

    def command(i, ctrl):
        walk = i >= 100
        return ctrl._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk, jnp.asarray([0.3, 0.0, 0.0],
                                                       DTYPE),
                                     jnp.zeros(3, DTYPE)))

    run = jax.jit(lambda c: rollout.rollout_batched(
        c, model, params, 700, dt, settings=SETTINGS,
        command_fn=command, estimate=False, use_terrain_adapt=False))
    carry, trace = run(c0)
    pos = np.asarray(trace.root_pos)        # (T, B, 3)
    vel = np.asarray(trace.root_lin_vel)
    assert np.isfinite(pos).all()
    assert np.all(np.abs(pos[200:, :, 2] - 0.3) < 0.05)
    np.testing.assert_allclose(vel[400:, :, 0].mean(), 0.3, rtol=0.15)
    # the trot genuinely flipped contacts during the run
    con = np.asarray(trace.contacts)        # (T, B, 4)
    assert (con[150:, 0].min(axis=0) == 0).any()


def test_robust_batched_tracks_cold_through_trot():
    """The uniform ROBUST warm program (no cold branch: scaled-Schulz
    rebuild per scenario) tracks teacher-forced cold solves through a
    walking sequence with DESYNCHRONIZED gait phases — the batch regime
    where any()-routing degenerates (some scenario transitions nearly
    every tick)."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    batch = 3
    c = _batched_carry(batch, model, params)
    # desynchronize the trot phases so contact flips never align
    offs = jnp.asarray([0.0, 37.0, 81.0], DTYPE)
    ctrl = c.ctrl._replace(
        gait_counter=(c.ctrl.gait_counter + offs[:, None]) % 240.0)
    c = c._replace(ctrl=ctrl)
    settings = admm.ADMMSettings(seg_iters=25, segments=3)
    vel = jnp.asarray([0.3, 0.0, 0.0], DTYPE)

    def tick(cc, i):
        ctrl, sim = cc.ctrl, cc.sim
        walk = i >= 50
        ctrl = jax.vmap(lambda cs: cs._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk, vel, jnp.zeros(3, DTYPE))))(
            ctrl)

        def observe(cs, sm, fz):
            sensors = srb_sim.read_sensors(sm, model, cs.contacts, fz, dt)
            cs = controller.sensor_update(cs, model, sensors, dt,
                                          estimate=False)
            return cs._replace(root_pos=sm.root_pos,
                               root_lin_vel=sm.root_lin_vel)

        ctrl = jax.vmap(observe)(ctrl, sim, cc.stance_forces_z)
        robust = controller.control_step_batched(
            ctrl, model, params, dt, settings=settings,
            use_terrain_adapt=False,
            warm_settings=controller.ROBUST_WARM_SETTINGS, robust=True)
        cold = jax.vmap(lambda cs: controller.control_step(
            cs, model, params, dt, settings=settings,
            use_terrain_adapt=False, warm_mode="cold"))(ctrl)
        sim2, fz = jax.vmap(
            lambda sm, tau, con, tgt: srb_sim.step(sm, model, tau, con,
                                                   tgt, dt))(
            sim, robust.joint_torques, robust.contacts,
            robust.foot_pos_target_last_time)
        diff = jnp.max(jnp.abs(robust.foot_forces_grf
                               - cold.foot_forces_grf))
        return rollout.RolloutCarry(ctrl=robust, sim=sim2,
                                    stance_forces_z=fz), diff

    _, diffs = jax.jit(
        lambda cc: jax.lax.scan(tick, cc, jnp.arange(400)))(c)
    diffs = np.asarray(diffs)
    assert np.isfinite(diffs).all()
    # sub-N typical ticks; the tail is the flip-tick transients'
    # semi-degenerate flat directions (measured p95 ~15 N at the robust
    # 40-iteration budget, ~11 at 60, ~8 for the full cold branch; even
    # 320 iterations leave ~5 — the test_warm_ticks notes document the
    # same character for the per-scenario path). Height/velocity
    # behavior under the robust program is gated by the closed-loop
    # test below.
    assert np.median(diffs) < 0.5, np.median(diffs)
    assert np.percentile(diffs, 95) < 18.0, np.percentile(diffs, 95)
    assert diffs.max() < 45.0, diffs.max()


def test_robust_batched_trot_walks_desynced():
    """Closed-loop health of the uniform robust program: a desynchronized
    batched trot holds height and tracks the commanded velocity."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    batch = 3
    c0 = _batched_carry(batch, model, params)
    offs = jnp.asarray([0.0, 37.0, 81.0], DTYPE)
    ctrl = c0.ctrl._replace(
        gait_counter=(c0.ctrl.gait_counter + offs[:, None]) % 240.0)
    c0 = c0._replace(ctrl=ctrl)

    def command(i, ctrl):
        walk = i >= 100
        return ctrl._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk, jnp.asarray([0.3, 0.0, 0.0],
                                                       DTYPE),
                                     jnp.zeros(3, DTYPE)))

    run = jax.jit(lambda c: rollout.rollout_batched(
        c, model, params, 700, dt, settings=SETTINGS,
        command_fn=command, estimate=False, use_terrain_adapt=False,
        warm_settings=controller.ROBUST_WARM_SETTINGS, robust=True))
    carry, trace = run(c0)
    pos = np.asarray(trace.root_pos)
    vel = np.asarray(trace.root_lin_vel)
    assert np.isfinite(pos).all()
    assert np.all(np.abs(pos[200:, :, 2] - 0.3) < 0.05)
    np.testing.assert_allclose(vel[400:, :, 0].mean(), 0.3, rtol=0.15)
