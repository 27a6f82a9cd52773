"""Pallas warm-tick kernel vs the XLA warm path (interpreter mode on CPU).

Same mathematics, two executions: the VMEM-resident kernel must agree with
admm.mpc_solve_warm to solver tolerance on a drifting tick sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.compat import oracle
from go1_qp_mpc_controller_tpu.models import srb
from go1_qp_mpc_controller_tpu.ops import admm, pallas_admm

DTYPE = jnp.float32
WARM = admm.ADMMSettings(seg_iters=40, segments=1, polish=False,
                         schulz_refine=4)


def _batched_qp(f, x0s):
    def one(x0):
        return srb.condense(
            jnp.asarray(f["a_d"], DTYPE), jnp.asarray(f["b_d_list"], DTYPE),
            x0, jnp.asarray(f["x_ref"], DTYPE).reshape(10, 13),
            jnp.asarray(f["q_weights"], DTYPE),
            jnp.asarray(f["r_weights"], DTYPE),
            jnp.asarray(f["contacts"], DTYPE))
    return jax.vmap(one)(x0s)


def test_plane_layout_roundtrip():
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=(4, 200)).astype(np.float32))
    w = pallas_admm._to_planes(v)
    assert w.shape == (4, 5, 64)
    np.testing.assert_allclose(np.asarray(pallas_admm._from_planes(w)),
                               np.asarray(v))


def test_selection_matrices_match_constraint_ops():
    rng = np.random.default_rng(1)
    u = rng.normal(size=(120,)).astype(np.float32)
    sx, sy, sz = pallas_admm._selection_matrices()
    up = np.pad(u, (0, 8))
    mu = 0.3
    px, py, pz = up @ sx, up @ sy, up @ sz
    rows = np.stack([px + mu * pz, px - mu * pz, py + mu * pz,
                     py - mu * pz, pz], axis=0)[:, :40]
    ref = np.asarray(srb.constraint_matvec(jnp.asarray(u))).reshape(40, 5).T
    np.testing.assert_allclose(rows, ref, atol=1e-6)


@pytest.mark.slow
def test_pallas_warm_tick_matches_xla():
    f = oracle.test_mpc_fixture()
    b = 8
    rng = np.random.default_rng(2)
    x0s = jnp.asarray(np.tile(f["x0"], (b, 1))
                      + rng.normal(size=(b, 13)) * 0.01, DTYPE)
    mus = jnp.full((b,), 0.3, DTYPE)

    cold = jax.vmap(lambda qp: admm.mpc_solve(
        qp, admm.ADMMSettings(polish=False), return_warm=True))
    _, warms = cold(_batched_qp(f, x0s))

    x1s = x0s + 0.002
    qps = _batched_qp(f, x1s)
    sol_p, warm_p = pallas_admm.mpc_solve_warm_batch(
        qps, warms, mus, WARM, interpret=True)

    sol_x = jax.vmap(lambda qp, w: admm.mpc_solve_warm(qp, w, WARM)[0])(
        qps, warms)

    err = np.abs(np.asarray(sol_p.x) - np.asarray(sol_x.x)).max()
    assert err < 1e-3, f"pallas vs xla warm tick: {err}"
    # absolute residual on ~180 N forces; the exact value is sensitive to
    # the Schulz cold-init convention (balanced vs Jacobi-left), both of
    # which give valid inverses — 0.2 N = ~1e-3 relative
    assert np.asarray(sol_p.primal_res).max() < 0.2
    # duals agree too (scaled consistently)
    yerr = np.abs(np.asarray(sol_p.y) - np.asarray(sol_x.y)).max()
    assert yerr < 1e-1 * (1 + np.abs(np.asarray(sol_x.y)).max())


def test_schulz_inverse_batch_matches_xla():
    """Batched VMEM Schulz kernel (balance + scaled schedule + basin
    safeguard + unbalance) == the XLA path on cold, warm-accept, and
    warm-reject, to bf16x3-vs-HIGH tolerance."""
    from go1_qp_mpc_controller_tpu.ops import admm as admm_mod

    rng = np.random.default_rng(3)
    b, n = 8, 120
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    m = jnp.asarray(a @ a.transpose(0, 2, 1) / n + 3.0 * np.eye(n))
    coeffs = admm_mod._scaled_schulz_coeffs(1e-6)

    def check(x_pal, x_ref):
        x_pal, x_ref = np.asarray(x_pal, np.float64), np.asarray(x_ref)
        scale = np.abs(x_ref).max()
        assert np.abs(x_pal - x_ref).max() < 1e-3 * scale
        resid = np.abs(np.einsum('bij,bjk->bik', np.asarray(m, np.float64),
                                 x_pal) - np.eye(n)).max()
        assert resid < 1e-4, resid

    x_ref = jax.vmap(lambda mm: admm_mod._schulz_inverse(
        mm, 0, coeffs=coeffs))(m)
    check(pallas_admm.schulz_inverse_batch(m, 0, coeffs=coeffs,
                                           interpret=True), x_ref)

    x0 = x_ref * (1.0 + 1e-3)
    xw_ref = jax.vmap(lambda mm, xx: admm_mod._schulz_inverse(
        mm, 0, x0=xx, coeffs=coeffs))(m, x0)
    check(pallas_admm.schulz_inverse_batch(m, 0, x0=x0, coeffs=coeffs,
                                           interpret=True), xw_ref)

    # per-scenario safeguard: garbage carry in half the batch falls back
    # to the scaled cold schedule without touching the good half
    x0_mix = x0.at[::2].set(5.0)
    xm_ref = jax.vmap(lambda mm, xx: admm_mod._schulz_inverse(
        mm, 0, x0=xx, coeffs=coeffs))(m, x0_mix)
    check(pallas_admm.schulz_inverse_batch(m, 0, x0=x0_mix, coeffs=coeffs,
                                           interpret=True), xm_ref)


def test_schulz_balanced_kernel_matches_xla():
    """VMEM-resident Schulz kernel == the XLA loop (same schedule, same
    basin safeguard) on cold, warm-accept, and warm-reject paths."""
    from go1_qp_mpc_controller_tpu.ops import admm as admm_mod

    n = 120
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float32)
    m = a @ a.T / n + 3.0 * jnp.eye(n)
    s = jax.lax.rsqrt(jnp.diagonal(m))
    mb = m * s[:, None] * s[None, :]
    unb = s[:, None] * s[None, :]

    x_pal = pallas_admm.schulz_balanced(mb, 20, interpret=True)
    x_ref = admm_mod._schulz_iterate_balanced(mb, s, 20) / unb
    np.testing.assert_allclose(np.asarray(x_pal), np.asarray(x_ref),
                               atol=5e-6)
    # inversion quality
    resid = np.abs(np.asarray(mb @ x_pal) - np.eye(n)).max()
    assert resid < 1e-5
    # warm accept
    x0_b = x_pal * (1.0 + 1e-3)
    xw_pal = pallas_admm.schulz_balanced(mb, 4, x0_b=x0_b, interpret=True)
    xw_ref = admm_mod._schulz_iterate_balanced(mb, s, 4, x0=x0_b * unb) / unb
    np.testing.assert_allclose(np.asarray(xw_pal), np.asarray(xw_ref),
                               atol=5e-6)
    # warm reject (garbage carry falls back to the cold schedule)
    xg = jnp.full((n, n), 5.0)
    xr_pal = pallas_admm.schulz_balanced(mb, 20, x0_b=xg, interpret=True)
    xr_ref = admm_mod._schulz_iterate_balanced(mb, s, 20, x0=xg * unb) / unb
    np.testing.assert_allclose(np.asarray(xr_pal), np.asarray(xr_ref),
                               atol=5e-6)


def test_schulz_custom_vmap_partial_batching():
    """The custom_vmap rules must handle vmaps that batch only SOME
    operands (e.g. a warm inverse shared across scenarios) by
    broadcasting the unbatched ones (ADVICE r2: the old rules assumed
    every argument carried the batch axis and failed at trace time)."""
    from go1_qp_mpc_controller_tpu.ops import admm as admm_mod

    n = 120
    b = 3
    a = jax.random.normal(jax.random.PRNGKey(7), (b, n, n), jnp.float32)
    ms = jnp.einsum('bij,bkj->bik', a, a) / n + 3.0 * jnp.eye(n)
    cold_fn, warm_fn = admm_mod._pallas_schulz_fns(None, 20)

    minv_b = jax.vmap(cold_fn)(ms)
    for i in range(b):
        resid = np.abs(np.asarray(ms[i] @ minv_b[i]) - np.eye(n)).max()
        assert resid < 1e-4, i

    # shared m, batched warm start (in_batched = (False, True))
    m0 = ms[0]
    out = jax.vmap(lambda x0: warm_fn(m0, x0))(minv_b)
    ref = np.linalg.inv(np.asarray(m0, np.float64))
    # the m0-matched warm start converges tightly; the others are
    # basin-tested and either refined toward inv(m0) or cold-restarted —
    # all outputs must be finite approximations of inv(m0)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-3)
    assert np.isfinite(np.asarray(out)).all()

    # batched m, shared warm start (in_batched = (True, False))
    out2 = jax.vmap(lambda m: warm_fn(m, minv_b[0]))(ms)
    np.testing.assert_allclose(
        np.asarray(out2[0]), np.asarray(minv_b[0]), atol=1e-4)
    assert np.isfinite(np.asarray(out2)).all()


def test_schulz_lanes_matches_xla():
    """Lane-batched VPU Schulz kernel (EKF innovation route) vs the XLA
    schedule, interpreter mode. Covers batch padding (b not a multiple
    of the lane tile) and the in-kernel balance/unbalance."""
    rng = np.random.default_rng(7)
    b, n = 9, 28
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    spd = a @ np.swapaxes(a, -1, -2) / n + 0.2 * np.eye(n, dtype=np.float32)
    # spread the diagonals so the Jacobi balance does real work
    d = np.exp(rng.uniform(-2, 2, size=(b, n))).astype(np.float32)
    spd = spd * d[:, :, None] * d[:, None, :]
    s_spd = jnp.asarray(spd)
    coeffs = admm._scaled_schulz_coeffs(1e-5)

    out_lanes = pallas_admm.schulz_inverse_lanes(s_spd, coeffs,
                                                 lane_tile=4,
                                                 interpret=True)
    out_xla = jax.vmap(
        lambda s: admm._schulz_inverse(s, 0, coeffs=coeffs))(s_spd)

    resid = np.einsum('bij,bjk->bik', spd, np.asarray(out_lanes)) \
        - np.eye(n, dtype=np.float32)
    assert np.max(np.abs(resid)) < 1e-3
    scale = np.max(np.abs(np.asarray(out_xla)))
    np.testing.assert_allclose(np.asarray(out_lanes), np.asarray(out_xla),
                               atol=5e-4 * scale)


def test_ekf_schulz_route_under_vmap():
    """ekf._schulz_sinv under vmap (the CPU fallback rule) equals the
    per-scenario XLA loop."""
    from go1_qp_mpc_controller_tpu.ops import ekf

    rng = np.random.default_rng(8)
    b, n = 5, 28
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    spd = jnp.asarray(a @ np.swapaxes(a, -1, -2) / n
                      + 0.3 * np.eye(n, dtype=np.float32))
    batched = jax.vmap(ekf._schulz_sinv)(spd)
    single = jnp.stack([ekf._schulz_sinv(spd[i]) for i in range(b)])
    np.testing.assert_allclose(np.asarray(batched), np.asarray(single),
                               rtol=0, atol=1e-5)


def test_fused_kkt_kernel_matches_xla_paths():
    """schulz_inverse_kkt_batch (KKT built IN the kernel from the lazy
    condensation factors) matches the XLA materialize->balance->schedule
    path, for the plain warm refine, the scaled robust refine, and the
    cold schedule — and the warm/cold fused solvers agree across
    impls (interpreter mode)."""
    import functools as ft

    from go1_qp_mpc_controller_tpu.parallel import sweep

    dtype = jnp.float32
    batch = 6
    scn = sweep.random_scenarios(jax.random.PRNGKey(3), batch, dtype)

    def lazy_of(s):
        a_c = srb.calculate_A_c(s.x0[0:3])
        b_c = srb.calculate_B_c(s.mass, s.inertia, s.root_rot,
                                s.foot_pos)
        a_d, b_d = srb.discretize(a_c, b_c, 0.0025)
        return srb.condense_nilpotent_lazy(a_d, b_d, s.x0, s.x_ref,
                                           s.q_weights, s.r_weights,
                                           s.contacts)

    lazies = jax.vmap(lazy_of)(scn)
    rho = jnp.full((batch,), 0.05, dtype)
    sigma = 1e-6

    def operands(lz, rho_s, mu_s):
        eq = jnp.isclose(lz.lb, lz.ub)
        rho_vec = jnp.where(eq, rho_s * 1e3, rho_s)
        return admm._kkt_kernel_operands(lz, rho_vec, sigma, mu_s), \
            rho_vec

    (tiled, dmain, off1, off2, cost), rho_vecs = jax.vmap(operands)(
        lazies, rho, scn.mu)

    # reference: materialized KKT + XLA schedule
    def m_ref(lz, rho_vec, mu_s, c):
        h = srb.lazy_hessian(lz)
        m = (c * h + sigma * jnp.eye(h.shape[-1], dtype=dtype)
             + admm._pyramid_ctc_dense(rho_vec, mu_s, dtype))
        return m

    m_mats = jax.vmap(lambda lz, rv, mu_s, c: m_ref(lz, rv, mu_s, c))(
        lazies, rho_vecs, scn.mu, cost)

    coeffs = admm._scaled_schulz_coeffs(1e-4)
    ref = jax.vmap(lambda m: admm._schulz_inverse(m, 0, coeffs=coeffs)
                   )(m_mats)
    got = pallas_admm.schulz_inverse_kkt_batch(
        tiled, dmain, off1, off2, cost, coeffs=coeffs, interpret=True,
        tile=2)
    scale = np.abs(np.asarray(ref)).max()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-4 * scale)

    # warm start path (plain refine, 2 steps)
    x0 = ref + 1e-3 * jax.random.normal(jax.random.PRNGKey(1),
                                        ref.shape, dtype)
    ref_w = jax.vmap(lambda m, x: admm._schulz_inverse(m, 2, x))(
        m_mats, x0)
    got_w = pallas_admm.schulz_inverse_kkt_batch(
        tiled, dmain, off1, off2, cost, x0=x0, iters=2, interpret=True,
        tile=2)
    np.testing.assert_allclose(np.asarray(got_w), np.asarray(ref_w),
                               atol=3e-4 * scale)

    # end-to-end: solve_warm_fused pallas(kkt-kernel) vs xla impl
    warm_p = admm.ADMMSettings(seg_iters=10, segments=1, polish=False,
                               schulz_refine=2, schulz_impl="pallas",
                               schulz_tile=2)
    warm_x = warm_p._replace(schulz_impl="xla")

    def solve_with(st):
        def one(lz, mu_s):
            w = admm.WarmState(
                x=jnp.zeros_like(lz.gradient),
                y=jnp.zeros_like(lz.lb), rho=jnp.asarray(0.05, dtype),
                minv=jnp.eye(120, dtype=dtype))
            sol, _ = admm.solve_warm_fused(lz, w, st, 0.3)
            return sol.x
        return jax.vmap(one)(lazies, scn.mu)

    xs = [np.asarray(solve_with(st)) for st in (warm_p, warm_x)]
    # cost normalization differs only in fp (max diag vs max abs for a
    # PSD matrix); f32 solutions of algebraically-identical
    # formulations legitimately differ at the ~0.1 N level on the
    # near-flat directions (see .claude/skills/verify numerics caveat)
    np.testing.assert_allclose(xs[0], xs[1], atol=2e-1)

    # cold fused program across impls
    cold_p = admm.ADMMSettings(seg_iters=15, segments=1, polish=False,
                               schulz_l0=1e-4, schulz_impl="pallas",
                               schulz_tile=2)

    def cold_with(st):
        def one(lz, s):
            sol, _ = admm.mpc_solve_cold(lz, st, mu=s.mu,
                                         contacts=s.contacts,
                                         foot_pos=s.foot_pos)
            return sol.x
        return jax.vmap(one)(lazies, scn)

    xc = [np.asarray(cold_with(st))
          for st in (cold_p, cold_p._replace(schulz_impl="xla"))]
    np.testing.assert_allclose(xc[0], xc[1], atol=2e-1)
