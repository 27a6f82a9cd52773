"""Sharded scenario sweeps: pod-scale batched MPC over a device mesh.

Implements configs[2] (4096-scenario batch, 1 chip) and configs[4]
(100k+ scenario sweep over a multi-host slice). The program is one
shard_map: each device solves its scenario shard with the vmapped dense
ADMM; along the ``mpc`` axis the Hessian/gradient contraction over the
horizon-state rows is split and combined with a psum (an ICI block
reduction); summary statistics psum over ``data``.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from go1_qp_mpc_controller_tpu.config import params as CP
from go1_qp_mpc_controller_tpu.models import srb
from go1_qp_mpc_controller_tpu.ops import admm
from go1_qp_mpc_controller_tpu.parallel.mesh import DATA_AXIS, MPC_AXIS


class MpcScenario(NamedTuple):
    """One batched MPC problem instance (leading scenario axis on leaves)."""
    x0: jnp.ndarray           # (B, 13) current state
    x_ref: jnp.ndarray        # (B, H, 13) reference trajectory
    foot_pos: jnp.ndarray     # (B, 4, 3) feet relative to CoM
    contacts: jnp.ndarray     # (B, 4) contact flags
    root_rot: jnp.ndarray     # (B, 3, 3)
    mass: jnp.ndarray         # (B,)
    inertia: jnp.ndarray      # (B, 3, 3)
    q_weights: jnp.ndarray    # (B, 13)
    r_weights: jnp.ndarray    # (B, 12)
    mu: jnp.ndarray           # (B,) friction coefficients (randomizable)


class SweepResult(NamedTuple):
    grf: jnp.ndarray          # (B, 4, 3) first-step forces (world frame)
    forces_all: jnp.ndarray   # (B, 120) full horizon solution
    primal_res: jnp.ndarray   # (B,)
    dual_res: jnp.ndarray     # (B,)
    stats: dict               # global (replicated) summary statistics


def _solve_one(scn, mpc_dt, settings, mpc_axis_size):
    """Condense + solve one scenario; the Hessian/gradient contraction is
    sharded over the mpc axis and psum-combined when mpc_axis_size > 1.

    A single-segment ``settings`` on the unsharded-mpc path selects the
    r5 fused cold program (admm.solve_cold_fused: analytic rho0, fused
    balanced KKT, one scaled Schulz schedule) — the production fresh-
    sweep configuration; multi-segment settings keep the segmented
    rho-probing schedule (and the mpc-sharded condensation always does:
    its psum-combined Hessian has no lazy factored form)."""
    a_c = srb.calculate_A_c(scn.x0[0:3])
    b_c = srb.calculate_B_c(scn.mass, scn.inertia, scn.root_rot,
                            scn.foot_pos)
    a_d, b_d = srb.discretize(a_c, b_c, mpc_dt)

    if mpc_axis_size == 1:
        # polish/refine_f64 have no fused-cold implementation, so
        # polished single-segment settings keep the dense
        # admm.mpc_solve path instead of silently dropping them
        if (settings.segments == 1 and not settings.polish
                and not settings.refine_f64):
            lazy = srb.condense_nilpotent_lazy(
                a_d, b_d, scn.x0, scn.x_ref, scn.q_weights,
                scn.r_weights, scn.contacts)
            sol, _ = admm.mpc_solve_cold(lazy, settings, mu=scn.mu,
                                         contacts=scn.contacts,
                                         foot_pos=scn.foot_pos)
            return sol
        qp = srb.condense_nilpotent_const(a_d, b_d, scn.x0, scn.x_ref,
                                          scn.q_weights, scn.r_weights,
                                          scn.contacts)
    else:
        b_d_list = jnp.broadcast_to(b_d, (CP.PLAN_HORIZON,) + b_d.shape)
        qp = _condense_mpc_sharded(a_d, b_d_list, scn, mpc_axis_size)

    sol = admm.mpc_solve(qp, settings, mu=scn.mu)
    return sol


def _condense_mpc_sharded(a_d, b_d_list, scn, mpc_axis_size):
    """Condensation with the (130,) state-row contraction split over the
    mpc mesh axis: each member computes a partial B'QB / B'Q(Ax0 - xref)
    from its slice of horizon steps and psums the results (the intra-solve
    ICI block reduction of SURVEY.md section 2.5(c))."""
    h = CP.PLAN_HORIZON
    nx, nu = CP.MPC_STATE_DIM, CP.NUM_DOF
    dtype = a_d.dtype
    assert h % mpc_axis_size == 0, "horizon must divide the mpc axis"
    steps_local = h // mpc_axis_size
    k = jax.lax.axis_index(MPC_AXIS)

    # A powers A^0..A^H: H+1 small matmuls, replicated (negligible). Each
    # device then assembles ONLY its row slice of B_qp from
    # block(i, j) = A^(i-j) B_j — 1/n of the O(H^2) block assembly AND of
    # the O(H^2 n^2) contraction (VERDICT r2 item 5: the old version
    # built the full B_qp recursion on every device before slicing).
    def pow_step(a_pow, _):
        return a_pow @ a_d, a_pow

    _, a_pows = jax.lax.scan(pow_step, jnp.eye(nx, dtype=dtype), None,
                             length=h + 1)               # a_pows[p] = A^p
    start = k * steps_local
    i_loc = start + jnp.arange(steps_local)              # global row ids
    d = i_loc[:, None] - jnp.arange(h)[None, :]          # (s, H)
    valid = (d >= 0).astype(dtype)
    ap = a_pows[jnp.clip(d, 0, h - 1)]                   # (s, H, nx, nx)
    blocks = jnp.einsum('sjxy,jyu->sjxu', ap,
                        b_d_list) * valid[:, :, None, None]
    b_qp_loc = jnp.swapaxes(blocks, 1, 2)                # (s, nx, H, nu)
    a_qp_loc = a_pows[i_loc + 1]                         # A^(i+1)
    x_ref_loc = jax.lax.dynamic_slice_in_dim(scn.x_ref, start,
                                             steps_local, 0)

    qw = 2.0 * scn.q_weights                                 # (13,)
    b_flat = b_qp_loc.reshape(steps_local * nx, h * nu)
    qw_rows = jnp.tile(qw, steps_local)
    bq = b_flat * qw_rows[:, None]
    hess_part = b_flat.T @ bq
    resid = (a_qp_loc @ scn.x0 - x_ref_loc).reshape(-1)
    grad_part = bq.T @ resid
    hessian = jax.lax.psum(hess_part, MPC_AXIS) + jnp.diag(
        jnp.tile(2.0 * scn.r_weights, h))
    gradient = jax.lax.psum(grad_part, MPC_AXIS)

    inf = jnp.asarray(jnp.inf, dtype)
    c = scn.contacts.astype(dtype)
    lb_leg = jnp.stack([jnp.zeros_like(c), -inf * jnp.ones_like(c),
                        jnp.zeros_like(c), -inf * jnp.ones_like(c),
                        CP.MPC_FZ_MIN * c], axis=-1)
    ub_leg = jnp.stack([inf * jnp.ones_like(c), jnp.zeros_like(c),
                        inf * jnp.ones_like(c), jnp.zeros_like(c),
                        CP.MPC_FZ_MAX * c], axis=-1)
    return srb.CondensedQP(hessian=hessian, gradient=gradient,
                           lb=jnp.tile(lb_leg.reshape(-1), h),
                           ub=jnp.tile(ub_leg.reshape(-1), h))


def make_sweep_fn(mesh, mpc_dt, settings=admm.ADMMSettings(), jit=True):
    """Build the sharded sweep program for a mesh.

    Returns a function MpcScenario (global batch) -> SweepResult. The batch
    axis must divide the data-axis size.
    """
    mpc_size = mesh.shape[MPC_AXIS]

    def local_sweep(scn):
        solve = functools.partial(_solve_one, mpc_dt=mpc_dt,
                                  settings=settings,
                                  mpc_axis_size=mpc_size)
        sols = jax.vmap(solve)(scn)
        # global stats over the data axis
        n_local = scn.x0.shape[0]
        stats = {
            "num_solves": jax.lax.psum(
                jnp.asarray(n_local, jnp.float32), DATA_AXIS),
            "max_primal_res": jax.lax.pmax(
                jnp.max(sols.primal_res), DATA_AXIS),
            "max_dual_res": jax.lax.pmax(
                jnp.max(sols.dual_res), DATA_AXIS),
        }
        return SweepResult(
            grf=sols.x[:, :12].reshape(-1, 4, 3),
            forces_all=sols.x,
            primal_res=sols.primal_res,
            dual_res=sols.dual_res,
            stats=stats,
        )

    data_spec = P(DATA_AXIS)
    fn = shard_map(
        local_sweep, mesh=mesh,
        in_specs=(MpcScenario(*([data_spec] * len(MpcScenario._fields))),),
        out_specs=SweepResult(
            grf=data_spec, forces_all=data_spec, primal_res=data_spec,
            dual_res=data_spec,
            stats={"num_solves": P(), "max_primal_res": P(),
                   "max_dual_res": P()}),
        check_vma=False)
    return jax.jit(fn) if jit else fn


def random_scenarios(key, batch, dtype=jnp.float32):
    """Randomized stand/trot scenario batch (configs[2] distribution):
    velocity commands, friction, mass and height randomization."""
    import numpy as np
    rng = np.random.default_rng(int(jax.random.key_data(key)[-1]))
    mass = rng.uniform(10.0, 18.0, batch)
    heights = rng.uniform(0.22, 0.32, batch)
    vel_cmd = rng.uniform([-0.5, -0.3, 0.0], [0.5, 0.3, 0.0], (batch, 3))
    mu = rng.uniform(0.25, 0.7, batch)
    contacts = (rng.uniform(size=(batch, 4)) > 0.4)
    # at least two legs in stance
    contacts[contacts.sum(1) < 2] = True
    feet = np.tile(np.array([[0.17, 0.15, 0.0], [0.17, -0.15, 0.0],
                             [-0.17, 0.15, 0.0], [-0.17, -0.15, 0.0]]),
                   (batch, 1, 1))
    feet[..., 2] = -heights[:, None]
    x0 = np.zeros((batch, 13))
    x0[:, 5] = heights
    x0[:, 9:12] = vel_cmd * rng.uniform(0.5, 1.0, (batch, 1))
    x0[:, 12] = -9.8
    x_ref = np.zeros((batch, CP.PLAN_HORIZON, 13))
    x_ref[..., 5] = heights[:, None]
    x_ref[..., 9:11] = vel_cmd[:, None, :2]
    x_ref[..., 3] = vel_cmd[:, None, 0] * 0.0025 * np.arange(
        1, CP.PLAN_HORIZON + 1)
    x_ref[..., 4] = vel_cmd[:, None, 1] * 0.0025 * np.arange(
        1, CP.PLAN_HORIZON + 1)
    x_ref[..., 12] = -9.8
    inertia = np.tile(np.diag([0.0168, 0.0656, 0.0743]), (batch, 1, 1))
    inertia *= (mass / 15.0)[:, None, None]
    q_weights = np.tile(
        np.array([80.0, 80.0, 1.0, 0.0, 0.0, 270.0, 1.0, 1.0, 20.0,
                  20.0, 20.0, 20.0, 0.0]), (batch, 1))
    r_weights = np.full((batch, 12), 1e-5)
    r_weights[:, 2::3] = 1e-6
    return MpcScenario(
        x0=jnp.asarray(x0, dtype),
        x_ref=jnp.asarray(x_ref, dtype),
        foot_pos=jnp.asarray(feet, dtype),
        contacts=jnp.asarray(contacts),
        root_rot=jnp.broadcast_to(jnp.eye(3, dtype=dtype),
                                  (batch, 3, 3)),
        mass=jnp.asarray(mass, dtype),
        inertia=jnp.asarray(inertia, dtype),
        q_weights=jnp.asarray(q_weights, dtype),
        r_weights=jnp.asarray(r_weights, dtype),
        mu=jnp.asarray(mu, dtype),
    )


def run_chunked(fn, scenarios, chunk_size):
    """Run a sweep function over a large scenario set in bounded-memory
    chunks (configs[4]-scale sweeps on one chip: 100k+ scenarios exceed
    HBM if materialized at once; per-chunk QPs are ~60 KB/scenario).

    Args:
      fn: the jitted sweep function (fixed chunk-size batch).
      scenarios: MpcScenario with (N, ...) leaves, N % chunk_size == 0.
      chunk_size: static per-call batch.

    Returns:
      SweepResult with (N, ...) leaves; stats aggregated across chunks.
    """
    import numpy as np

    n = scenarios.x0.shape[0]
    assert n % chunk_size == 0, (n, chunk_size)
    outs = []
    for i in range(n // chunk_size):
        sl = slice(i * chunk_size, (i + 1) * chunk_size)
        chunk = jax.tree.map(lambda a: a[sl], scenarios)
        outs.append(fn(chunk))
    grf = jnp.concatenate([o.grf for o in outs])
    forces = jnp.concatenate([o.forces_all for o in outs])
    prim = jnp.concatenate([o.primal_res for o in outs])
    dual = jnp.concatenate([o.dual_res for o in outs])
    stats = {
        "num_solves": sum(float(o.stats["num_solves"]) for o in outs),
        "max_primal_res": max(float(o.stats["max_primal_res"])
                              for o in outs),
        "max_dual_res": max(float(o.stats["max_dual_res"]) for o in outs),
    }
    return SweepResult(grf=grf, forces_all=forces, primal_res=prim,
                       dual_res=dual, stats=stats)
