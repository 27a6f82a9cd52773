"""Sharded sweep tests on the virtual 8-device CPU mesh.

Validates the multi-chip program shape the driver dry-runs: scenario
sharding over the data axis, intra-solve Hessian psum over the mpc axis,
and consistency with the single-device path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.ops import admm
from go1_qp_mpc_controller_tpu.parallel import mesh as mesh_lib
from go1_qp_mpc_controller_tpu.parallel import sweep

SETTINGS = admm.ADMMSettings()  # 50 x 4 + polish


def _scenarios(batch, dtype=jnp.float64):
    key = jax.random.PRNGKey(0)
    return sweep.random_scenarios(key, batch, dtype)


@pytest.mark.slow
def test_data_parallel_sweep_matches_single_device():
    scn = _scenarios(16)
    m8 = mesh_lib.make_mesh(mpc_parallel=1)
    assert m8.shape[mesh_lib.DATA_AXIS] == 8
    fn8 = sweep.make_sweep_fn(m8, 0.0025, SETTINGS)
    out8 = fn8(scn)

    m1 = mesh_lib.make_mesh(mpc_parallel=1, devices=jax.devices()[:1])
    fn1 = sweep.make_sweep_fn(m1, 0.0025, SETTINGS)
    out1 = fn1(scn)

    np.testing.assert_allclose(np.asarray(out8.grf), np.asarray(out1.grf),
                               atol=1e-8)
    assert float(out8.stats["num_solves"]) == 16.0
    assert float(out8.stats["max_primal_res"]) < 0.1


@pytest.mark.slow
def test_mpc_axis_hessian_psum_matches():
    """(4 data x 2 mpc) mesh: sharded-contraction condensation equals the
    replicated one."""
    scn = _scenarios(8)
    m42 = mesh_lib.make_mesh(mpc_parallel=2)
    fn42 = sweep.make_sweep_fn(m42, 0.0025, SETTINGS)
    out42 = fn42(scn)

    m1 = mesh_lib.make_mesh(mpc_parallel=1, devices=jax.devices()[:1])
    fn1 = sweep.make_sweep_fn(m1, 0.0025, SETTINGS)
    out1 = fn1(scn)
    np.testing.assert_allclose(np.asarray(out42.grf), np.asarray(out1.grf),
                               atol=1e-6)


def test_sweep_solutions_are_physical():
    scn = _scenarios(32)
    m8 = mesh_lib.make_mesh()
    # extra iterations: physical assertions need the convergence tail of
    # the hardest randomized scenarios, not just typical accuracy
    fn = sweep.make_sweep_fn(m8, 0.0025,
                             admm.ADMMSettings(seg_iters=75, segments=5))
    out = fn(scn)
    grf = np.asarray(out.grf)
    contacts = np.asarray(scn.contacts)
    mu = np.asarray(scn.mu)
    # swing legs carry no force
    # 0.1 N = the fixed-budget solver tail on the hardest
    # scenario (4e-4 relative to the ~160 N force scale)
    assert np.abs(grf[~contacts]).max() < 0.1
    # friction cones hold per scenario
    fz = grf[..., 2]
    assert np.all(fz > -0.05)
    assert np.all(np.abs(grf[..., 0]) <= mu[:, None] * fz + 0.1)
    assert np.all(np.abs(grf[..., 1]) <= mu[:, None] * fz + 0.1)
    # stance legs together support a meaningful share of the weight
    total_fz = fz.sum(-1)
    weight = np.asarray(scn.mass) * 9.8
    assert np.all(total_fz > 0.2 * weight)


def test_chunked_sweep_matches_single_shot():
    """Chunked execution (the 100k+-scenario path) == one-shot results."""
    scn = _scenarios(32)
    m8 = mesh_lib.make_mesh()
    fn = sweep.make_sweep_fn(m8, 0.0025,
                             admm.ADMMSettings(seg_iters=10, segments=1,
                                               polish=False))
    one = fn(scn)
    chunked = sweep.run_chunked(fn, scn, 16)
    np.testing.assert_allclose(np.asarray(chunked.grf),
                               np.asarray(one.grf), atol=1e-7)
    assert chunked.stats["num_solves"] == 32.0


def test_horizon_sharded_lqr_matches_sequential():
    """Horizon-axis (sequence-parallel) LQR sweeps: the stagewise
    solver's per-iteration affine recurrences sharded over the mpc mesh
    axis must equal the single-device sequential scans (VERDICT r2
    item 5). H = 40 over 8 devices (5 stages each)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from go1_qp_mpc_controller_tpu.ops import stagewise
    from go1_qp_mpc_controller_tpu.parallel import horizon as hz

    h = 40
    dtype = jnp.float64
    rng = np.random.default_rng(11)
    # a stable random closed-loop system in the stagewise shapes
    a_d = jnp.asarray(np.eye(13) + 0.01 * rng.normal(size=(13, 13)),
                      dtype)
    b_d = jnp.asarray(0.02 * rng.normal(size=(h, 13, 12)), dtype)
    qs = jnp.asarray(rng.uniform(0.1, 2.0, 13), dtype)
    rbar = jnp.asarray(np.diag(rng.uniform(0.5, 2.0, 12)), dtype)
    g = jnp.asarray(rng.normal(size=(h, 12)), dtype)
    c_lin = jnp.asarray(rng.normal(size=(h, 13)), dtype)

    fac = stagewise._riccati_factor(a_d, b_d, qs, rbar)
    u_ref = stagewise._lqr_solve(fac, a_d, b_d, g, c_lin)
    u_ref_par = stagewise._lqr_solve(fac, a_d, b_d, g, c_lin,
                                     parallel=True)
    np.testing.assert_allclose(np.asarray(u_ref_par), np.asarray(u_ref),
                               atol=1e-8)

    mesh = mesh_lib.make_mesh(mpc_parallel=8)
    spec_h = P(mesh_lib.MPC_AXIS)          # shard the leading H axis

    def sharded(k, ginv, acl, bt, b_d_loc, g_loc, c_loc):
        fac_loc = {"k": k, "ginv": ginv, "acl": acl, "bt": bt}
        return hz.lqr_solve_sharded(fac_loc, a_d, b_d_loc, g_loc, c_loc,
                                    mesh_lib.MPC_AXIS)

    fn = shard_map(
        sharded, mesh=mesh,
        in_specs=(spec_h,) * 7, out_specs=spec_h, check_vma=False)
    u_shard = fn(fac["k"], fac["ginv"], fac["acl"], fac["bt"],
                 b_d, g, c_lin)
    np.testing.assert_allclose(np.asarray(u_shard), np.asarray(u_ref),
                               atol=1e-8)


@pytest.mark.slow
def test_sharded_control_step_matches_single_device():
    """VERDICT r3 item 5: the PRODUCTION batched controller program
    (control_step_batched: warm carry + three-way transition routing +
    plan/swing/torques) under the 8-device data mesh equals the
    single-device batched path exactly — including a mixed tick whose
    flagged scenario takes the compacted cold solve on its shard."""
    from go1_qp_mpc_controller_tpu.ctrl import controller
    from go1_qp_mpc_controller_tpu.envs import rollout, srb_sim
    from go1_qp_mpc_controller_tpu.models import types

    dtype = jnp.float64
    model = types.default_robot_model(dtype)
    params = types.default_ctrl_params(dtype)
    dt = jnp.asarray(0.002, dtype)
    batch = 16
    settings = admm.ADMMSettings(seg_iters=25, segments=3)

    c = rollout.init_carry(model, params, height=0.3, dtype=dtype)
    b = jax.tree.map(lambda a: jnp.broadcast_to(a, (batch,) + a.shape), c)
    kz, kv = jax.random.split(jax.random.PRNGKey(3))
    sim = b.sim._replace(
        root_pos=b.sim.root_pos.at[:, 2].add(
            0.005 * jax.random.normal(kz, (batch,), dtype)),
        root_lin_vel=(b.sim.root_lin_vel
                      + 0.01 * jax.random.normal(kv, (batch, 3), dtype)))
    c = b._replace(sim=sim)

    m8 = mesh_lib.make_mesh(mpc_parallel=1)
    sharded = mesh_lib.make_sharded_control_step(
        m8, model, params, dt, settings=settings, use_terrain_adapt=False)
    single = jax.jit(lambda cs: controller.control_step_batched(
        cs, model, params, dt, settings=settings,
        use_terrain_adapt=False))

    def tick(cc, step_fn):
        def observe(cs, sm, fz):
            sensors = srb_sim.read_sensors(sm, model, cs.contacts, fz, dt)
            return controller.sensor_update(cs, model, sensors, dt)

        ctrl = jax.vmap(observe)(cc.ctrl, cc.sim, cc.stance_forces_z)
        ctrl = step_fn(ctrl)
        sim2, fz = jax.vmap(
            lambda sm, tau, con, tgt: srb_sim.step(sm, model, tau, con,
                                                   tgt, dt))(
            cc.sim, ctrl.joint_torques, ctrl.contacts,
            ctrl.foot_pos_target_last_time)
        return rollout.RolloutCarry(ctrl=ctrl, sim=sim2,
                                    stance_forces_z=fz)

    cs, c1 = c, c
    for k in range(4):
        if k == 3:
            # mixed tick: invalidate one scenario's carried contacts so
            # its shard takes the compacted cold route
            for cc in ("cs", "c1"):
                cv = locals()[cc]
                qc = cv.ctrl.qp_warm_contacts
                ctrl2 = cv.ctrl._replace(
                    qp_warm_contacts=qc.at[5].set(~qc[5]))
                if cc == "cs":
                    cs = cv._replace(ctrl=ctrl2)
                else:
                    c1 = cv._replace(ctrl=ctrl2)
        cs = tick(cs, sharded)
        c1 = tick(c1, single)
        np.testing.assert_allclose(
            np.asarray(cs.ctrl.foot_forces_grf),
            np.asarray(c1.ctrl.foot_forces_grf), atol=1e-8,
            err_msg=f"tick {k}")
        np.testing.assert_allclose(
            np.asarray(cs.ctrl.joint_torques),
            np.asarray(c1.ctrl.joint_torques), atol=1e-8,
            err_msg=f"tick {k}")
        np.testing.assert_allclose(
            np.asarray(cs.ctrl.qp_warm_minv),
            np.asarray(c1.ctrl.qp_warm_minv), atol=1e-8,
            err_msg=f"tick {k}")
