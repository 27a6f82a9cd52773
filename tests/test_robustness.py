"""Fault-injection robustness: the reference's safety scaffolding
(SURVEY.md section 5 — NaN guards, warmup, solver-failure containment)
must hold under corrupted inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.ctrl import controller
from go1_qp_mpc_controller_tpu.envs import rollout, srb_sim
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import admm

DTYPE = jnp.float64
SETTINGS = admm.ADMMSettings(seg_iters=25, segments=3)


def test_nan_grf_keeps_previous_torques():
    """A diverged/NaN solver output never reaches the motors
    (A1RobotControl.cpp:314-317, 558-561 semantics)."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    state = types.init_ctrl_state(model, DTYPE)
    good_tau = jnp.full((12,), 3.0, DTYPE)
    state = state._replace(
        mpc_init_counter=jnp.asarray(100, jnp.int32),
        contacts=jnp.ones(4, bool),
        joint_torques=good_tau,
        foot_forces_grf=jnp.full((4, 3), jnp.nan, DTYPE))
    from go1_qp_mpc_controller_tpu.ctrl import torque
    out = torque.compute_joint_torques(state, params)
    np.testing.assert_allclose(np.asarray(out.joint_torques), 3.0)


@pytest.mark.slow
def test_nan_sensor_spike_recovers():
    """One tick of NaN foot forces must not destabilize standing: the
    contact estimate clamps and the torque NaN-latch holds."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    dt = jnp.asarray(0.002, DTYPE)

    run = jax.jit(lambda c, n: rollout.rollout(
        c, model, params, n, dt, solver_type=controller.MPC,
        settings=SETTINGS, estimate=False, use_terrain_adapt=False),
        static_argnums=(1,))
    carry, _ = run(carry, 100)
    # inject a corrupted force reading for one tick through the sensor path
    bad = carry._replace(
        stance_forces_z=jnp.full((4,), jnp.nan, DTYPE))
    sensors = srb_sim.read_sensors(bad.sim, model, bad.ctrl.contacts,
                                   bad.stance_forces_z, dt)
    assert np.isnan(np.asarray(sensors.foot_force)).any()
    ctrl2 = controller.sensor_update(bad.ctrl, model, sensors, dt,
                                     estimate=False)
    ctrl2 = ctrl2._replace(root_pos=bad.sim.root_pos,
                           root_lin_vel=bad.sim.root_lin_vel)
    ctrl2 = controller.control_step(ctrl2, model, params, dt,
                                    solver_type=controller.MPC,
                                    settings=SETTINGS,
                                    use_terrain_adapt=False)
    # torques remain finite (latched or recomputed)
    assert np.isfinite(np.asarray(ctrl2.joint_torques)).all()
    # resume with clean sensors: still standing after another second
    carry = rollout.RolloutCarry(ctrl=ctrl2, sim=bad.sim,
                                 stance_forces_z=jnp.full(
                                     (4,), 36.75, DTYPE))
    carry, trace = run(carry, 400)
    z = np.asarray(trace.root_pos[:, 2])
    assert np.isfinite(z).all()
    assert abs(z[-1] - 0.3) < 0.05


@pytest.mark.slow
def test_solver_divergence_latch_in_batch():
    """A poisoned QP in a batch yields a zeroed, flagged solution without
    contaminating its neighbors."""
    from go1_qp_mpc_controller_tpu.compat import oracle
    from go1_qp_mpc_controller_tpu.models import srb
    f = oracle.test_mpc_fixture()

    def make_qp(scale):
        qp = srb.condense(
            jnp.asarray(f["a_d"], jnp.float32),
            jnp.asarray(f["b_d_list"], jnp.float32),
            jnp.asarray(f["x0"], jnp.float32),
            jnp.asarray(f["x_ref"], jnp.float32).reshape(10, 13),
            jnp.asarray(f["q_weights"], jnp.float32),
            jnp.asarray(f["r_weights"], jnp.float32),
            jnp.asarray(f["contacts"], jnp.float32))
        return qp._replace(gradient=qp.gradient * scale)

    scales = jnp.asarray([1.0, jnp.nan, 1.0], jnp.float32)
    qps = jax.vmap(make_qp)(scales)
    sols = jax.vmap(lambda qp: admm.mpc_solve(qp, SETTINGS))(qps)
    pr = np.asarray(sols.primal_res)
    # poisoned scenario flagged, not NaN
    assert pr[1] >= 1e6
    assert np.isfinite(np.asarray(sols.x)).all()
    # neighbors unaffected
    assert pr[0] < 1e-3 and pr[2] < 1e-3
    np.testing.assert_allclose(np.asarray(sols.x[0]),
                               np.asarray(sols.x[2]), atol=1e-6)


def test_ten_tick_zero_torque_warmup():
    """First 10 controller ticks command zero torque
    (A1RobotControl.cpp:292-295)."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, 12, jnp.asarray(0.002, DTYPE),
        solver_type=controller.MPC, settings=SETTINGS, estimate=False,
        use_terrain_adapt=False))
    _, trace = run(carry)
    tau = np.asarray(trace.joint_torques)
    np.testing.assert_allclose(tau[:8], 0.0)
    assert np.abs(tau[-1]).max() > 0.1


def test_health_gate_recovers_garbage_carry():
    """A finite-garbage primal/dual carry (post-latch state, no contact
    flip, no gradient drift — invisible to every a-priori flag) must be
    caught by the a-posteriori residual health gate
    (controller._unhealthy) and re-solved cold, in BOTH the per-scenario
    auto program and the batched compact overlay, and the two must
    agree per scenario."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    batch = 4
    c = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    c = jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), c)

    batched = jax.jit(lambda cs: controller.control_step_batched(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False))
    per_auto = jax.jit(jax.vmap(lambda cs: controller.control_step(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False, warm_mode="auto")))

    def tick(cc, step_fn):
        def observe(cs, sm, fz):
            sensors = srb_sim.read_sensors(sm, model, cs.contacts, fz, dt)
            return controller.sensor_update(cs, model, sensors, dt)
        ctrl = jax.vmap(observe)(cc.ctrl, cc.sim, cc.stance_forces_z)
        ctrl = step_fn(ctrl)
        sim, fz = jax.vmap(
            lambda sm, tau, con, tgt: srb_sim.step(sm, model, tau, con,
                                                   tgt, dt))(
            cc.sim, ctrl.joint_torques, ctrl.contacts,
            ctrl.foot_pos_target_last_time)
        return rollout.RolloutCarry(ctrl=ctrl, sim=sim, stance_forces_z=fz)

    for _ in range(3):
        c = tick(c, batched)
    # age the carry past the young-tick guard, like the sibling tests:
    # with mpc_init_counter < WARM_YOUNG_TICKS the a-priori transition
    # flag fires on EVERY scenario and both programs route cold before
    # _unhealthy is ever consulted — the r4 version of this test aged
    # the carry only 3 ticks and passed even with the gate deleted
    # (r4 advisor finding). A few settle ticks then let the stand-ramp
    # gradient drift decay below WARM_DRIFT_TOL.
    c = c._replace(ctrl=c.ctrl._replace(
        mpc_init_counter=jnp.full((batch,), 100, jnp.int32)))
    for _ in range(10):
        c = tick(c, batched)

    per_warm = jax.jit(jax.vmap(lambda cs: controller.control_step(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False, warm_mode="warm")))
    per_cold = jax.jit(jax.vmap(lambda cs: controller.control_step(
        cs, model, params, dt, settings=SETTINGS,
        use_terrain_adapt=False, warm_mode="cold")))

    # precondition (anti-vacuity): with the aged, settled carry and no
    # injection, the routed batched tick IS the pure warm program — no
    # a-priori flag fires and nothing is health-rejected
    clean_b = tick(c, batched)
    clean_w = tick(c, per_warm)
    np.testing.assert_allclose(
        np.asarray(clean_b.ctrl.foot_forces_grf),
        np.asarray(clean_w.ctrl.foot_forces_grf), atol=1e-10)

    # scenario 0: garbage primal/dual carry — measured to drive the warm
    # solve's normalized residuals decades above the health thresholds
    ctrl = c.ctrl
    ctrl = ctrl._replace(
        qp_warm_x=ctrl.qp_warm_x.at[0].set(500.0),
        qp_warm_y=ctrl.qp_warm_y.at[0].set(-300.0))
    c = c._replace(ctrl=ctrl)

    out_b = tick(c, batched)
    out_a = tick(c, per_auto)
    out_w = tick(c, per_warm)
    # the health-reject re-solve starts from a NEUTRALIZED carry (the
    # garbage x/y carry no information), so the always-cold comparator
    # gets scenario 0's x/y zeroed to match that semantics
    ctrl_n = c.ctrl._replace(
        qp_warm_x=c.ctrl.qp_warm_x.at[0].set(0.0),
        qp_warm_y=c.ctrl.qp_warm_y.at[0].set(0.0))
    out_c = tick(c._replace(ctrl=ctrl_n), per_cold)
    grf = np.asarray(out_b.ctrl.foot_forces_grf)
    # both production programs flag and cold-resolve scenario 0 and
    # agree per scenario
    np.testing.assert_allclose(
        grf, np.asarray(out_a.ctrl.foot_forces_grf), atol=1e-8)
    # scenario 0 took the COLD branch: identical to the always-cold
    # program, and NOT the garbage warm solve the gate rejected
    np.testing.assert_allclose(
        grf[0], np.asarray(out_c.ctrl.foot_forces_grf)[0], atol=1e-10)
    garbage_warm = np.asarray(out_w.ctrl.foot_forces_grf)
    assert np.abs(grf[0] - garbage_warm[0]).max() > 1e-4
    # the healthy scenarios took the WARM branch (the gate and the
    # a-priori flags did not over-fire on them)
    np.testing.assert_allclose(grf[1:], garbage_warm[1:], atol=1e-10)
    # and the recovered forces are sane: finite, upward, with total
    # vertical support in the physically plausible band. (The cold
    # re-solve and the warm neighbors are NOT force-compared: at this
    # state the first-step total-z direction is a near-flat valley of
    # the condensed objective — measured: a 19 N first-step z shift
    # costs 5.6e-4 of objective, and even 200 warm iterations move
    # along the valley rather than to the polished point — so two
    # near-optimal solvers legitimately land ~20 N apart. The
    # load-bearing equality check is the cold-comparator assert above.)
    assert np.isfinite(grf).all()
    weight = 15.0 * 9.8
    for i in range(batch):
        assert 0.5 * weight < grf[i, :, 2].sum() < 1.3 * weight, (
            i, grf[i, :, 2].sum())
