"""ADMM solver correctness: oracle convergence, JAX-vs-oracle parity,
warm starting, batching, float32 accuracy.

The headline parity gate (BASELINE.md): GRFs/torques within 1e-3 of the
converged reference QP solution on the test_mpc.cpp fixture.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.compat import oracle
from go1_qp_mpc_controller_tpu.models import srb
from go1_qp_mpc_controller_tpu.ops import admm, qp as balance_qp


@functools.lru_cache()
def _fixture_solution():
    grf, x, qp_ref, info = oracle.solve_test_mpc_fixture()
    return grf, x, qp_ref, info


def _fixture_jax_qp(dtype=jnp.float64):
    f = oracle.test_mpc_fixture()
    return srb.condense(
        jnp.asarray(f["a_d"], dtype), jnp.asarray(f["b_d_list"], dtype),
        jnp.asarray(f["x0"], dtype),
        jnp.asarray(f["x_ref"], dtype).reshape(10, 13),
        jnp.asarray(f["q_weights"], dtype), jnp.asarray(f["r_weights"], dtype),
        jnp.asarray(f["contacts"], dtype))


def test_oracle_solution_is_kkt_certified():
    grf, x, qp_ref, info = _fixture_solution()
    assert info["primal_res"] < 1e-8
    assert info["dual_res"] < 1e-8
    # swing legs (contacts FR/RR = 0) carry zero force
    np.testing.assert_allclose(grf[1], 0.0, atol=1e-8)
    np.testing.assert_allclose(grf[3], 0.0, atol=1e-8)
    # stance normal forces support the weight against q-weighted tracking
    assert grf[0, 2] > 10.0 and grf[2, 2] > 10.0
    # friction cone respected
    for i in (0, 2):
        assert abs(grf[i, 0]) <= 0.3 * grf[i, 2] + 1e-8
        assert abs(grf[i, 1]) <= 0.3 * grf[i, 2] + 1e-8


def test_jax_admm_matches_oracle_f64():
    grf_ref, x_ref, _, _ = _fixture_solution()
    qp_jax = _fixture_jax_qp()
    sol = admm.mpc_solve(qp_jax, admm.ADMMSettings())
    err = np.abs(np.asarray(sol.x) - x_ref).max()
    assert err < 1e-3, f"max |x - x_ref| = {err}"
    grf = np.asarray(sol.x[:12]).reshape(4, 3)
    np.testing.assert_allclose(grf, grf_ref, atol=1e-3)


def test_jax_admm_f32_accuracy():
    """float32 (the TPU throughput path) accuracy.

    The fixture's r_weights = 1e-6 leave directions with ~2e-6 curvature;
    along them the solution error floor is (f32 residual noise ~3e-7) /
    curvature ~ 2e-2 N — 0.05% of the 43 N stance forces. Strict 1e-3
    parity is established by the float64 test above; the f32 path is gated
    at its noise floor here. (Future: double-word residual refinement to
    recover 1e-3 in f32.)
    """
    grf_ref, x_ref, _, _ = _fixture_solution()
    qp_jax = _fixture_jax_qp(jnp.float32)
    sol = admm.mpc_solve(qp_jax, admm.ADMMSettings(
        segments=6, polish_rho=1e2, polish_iters=6))
    err = np.abs(np.asarray(sol.x[:12]).reshape(4, 3) - grf_ref).max()
    assert err < 5e-2, f"f32 GRF error = {err}"


def test_jax_admm_f32_with_f64_refinement_hits_parity():
    """float32 inputs + one emulated-f64 active-set refinement recover the
    strict 1e-3 GRF parity budget (the flat-direction fp-noise floor is
    solved exactly on the detected active set)."""
    grf_ref, _, _, _ = _fixture_solution()
    qp_jax = _fixture_jax_qp(jnp.float32)
    sol = admm.mpc_solve(qp_jax, admm.ADMMSettings(refine_f64=True))
    err = np.abs(np.asarray(sol.x[:12]).reshape(4, 3) - grf_ref).max()
    assert err < 1e-3, f"f32+refine GRF error = {err}"


def test_refine_f64_raises_without_x64():
    """refine_f64 must fail loudly when jax x64 is off — a silent float32
    fallback would report the strict-parity refinement as done when it
    never ran (default TPU deployments disable x64)."""
    qp_jax = _fixture_jax_qp(jnp.float32)
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(RuntimeError, match="refine_f64 requires"):
            admm.mpc_solve(qp_jax, admm.ADMMSettings(refine_f64=True))
    finally:
        jax.config.update("jax_enable_x64", True)


def test_warm_start_converges_faster():
    qp_jax = _fixture_jax_qp()
    cold = admm.mpc_solve(qp_jax, admm.ADMMSettings())
    # perturb the gradient slightly (next-tick QP) and warm start
    qp2 = qp_jax._replace(gradient=qp_jax.gradient * 1.01)
    warm = admm.mpc_solve(qp2, admm.ADMMSettings(seg_iters=10, segments=1, polish=False),
                          warm_x=cold.x, warm_y=cold.y)
    cold2 = admm.mpc_solve(qp2, admm.ADMMSettings(seg_iters=10, segments=1, polish=False))
    assert float(warm.primal_res) <= float(cold2.primal_res)
    assert float(warm.dual_res) < 1e-2


@pytest.mark.slow
def test_batched_solve_consistency():
    """vmap over scenarios == per-scenario solves."""
    f = oracle.test_mpc_fixture()
    n = 3
    rng = np.random.default_rng(2)
    x0s = np.tile(f["x0"], (n, 1))
    x0s[:, 5] += rng.uniform(-0.02, 0.02, n)  # vary height

    def solve_one(x0):
        qp_i = srb.condense(
            jnp.asarray(f["a_d"]), jnp.asarray(f["b_d_list"]), x0,
            jnp.asarray(f["x_ref"]).reshape(10, 13),
            jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
            jnp.asarray(f["contacts"]))
        return admm.mpc_solve(qp_i, admm.ADMMSettings()).x

    batched = jax.vmap(solve_one)(jnp.asarray(x0s))
    for i in range(n):
        single = solve_one(jnp.asarray(x0s[i]))
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), atol=1e-10)


def test_all_stance_configuration():
    """configs[0]: stand-mode solve, 4 feet in stance, forces ~ mg/4."""
    f = oracle.test_mpc_fixture()
    contacts = np.ones(4)
    qp_ref = oracle.condense(f["a_d"], f["b_d_list"], f["x0"], f["x_ref"],
                             f["q_weights"], f["r_weights"], contacts)
    x_ref, _, _ = oracle.solve_qp(qp_ref)
    qp_jax = srb.condense(
        jnp.asarray(f["a_d"]), jnp.asarray(f["b_d_list"]),
        jnp.asarray(f["x0"]), jnp.asarray(f["x_ref"]).reshape(10, 13),
        jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
        jnp.asarray(contacts))
    sol = admm.mpc_solve(qp_jax, admm.ADMMSettings())
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-3)
    grf = np.asarray(sol.x[:12]).reshape(4, 3)
    # total normal force approximately supports the robot near steady state
    assert 0.3 * 15 * 9.8 < grf[:, 2].sum() < 2.0 * 15 * 9.8


def test_balance_qp_solver():
    """The 12-var balance QP (A1RobotControl.cpp:377-444) against the oracle
    on the same problem data."""
    rng = np.random.default_rng(9)
    acc = np.array([5.0, -3.0, 15 * 9.8, 0.5, -0.2, 0.1])
    feet = np.array([[0.17, 0.15, -0.33], [0.17, -0.15, -0.33],
                     [-0.17, 0.15, -0.33], [-0.17, -0.15, -0.33]])
    contacts = np.array([1.0, 1.0, 1.0, 1.0])
    qp_j = balance_qp.build_balance_qp(
        jnp.asarray(acc, jnp.float64), jnp.eye(3, dtype=jnp.float64),
        jnp.asarray(feet, jnp.float64), jnp.asarray(contacts, jnp.float64))
    grf, sol = balance_qp.solve_balance_qp(
        qp_j, admm.ADMMSettings())
    # oracle solve of the identical QP
    c = balance_qp.balance_constraint_matrix()
    oq = oracle.OracleQP(hessian=np.asarray(qp_j.hessian),
                         gradient=np.asarray(qp_j.gradient), C=c,
                         lb=np.asarray(qp_j.lb), ub=np.asarray(qp_j.ub))
    x_ref, _, _ = oracle.solve_qp(oq)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-3)
    # wrench balance: total fz tracks the gravity feedforward
    np.testing.assert_allclose(np.asarray(grf)[:, 2].sum(), acc[2], rtol=0.05)


def test_pyramid_kkt_fused_matches_dense_build():
    """The single-pass fused KKT build == pbar + sigma I + C'diag(w)C."""
    rng = np.random.default_rng(7)
    for dtype in (jnp.float32, jnp.float64):
        w = jnp.asarray(rng.uniform(0.1, 100.0, 200), dtype)
        p = rng.normal(size=(120, 120))
        pbar = jnp.asarray(p @ p.T, dtype)
        mu = 0.3
        ref = (pbar + 1e-6 * jnp.eye(120, dtype=dtype)
               + admm._pyramid_ctc_dense(w, mu, dtype))
        fused = admm._pyramid_kkt_fused(pbar, 1e-6, w, mu)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   atol=1e-12 if dtype == jnp.float64
                                   else 1e-5)


def test_scaled_schulz_schedule_matches_plain():
    """The endpoint-balanced scaled schedule (14 steps for l0=1e-6)
    converges like the plain 20-step schedule: cold, warm-accept (a
    converged carry must NOT be destroyed by the scaled coefficients),
    and safeguarded fallback."""
    coeffs = admm._scaled_schulz_coeffs(1e-6)
    assert len(coeffs) <= 15
    rng = np.random.default_rng(9)
    a = rng.normal(size=(120, 120)) * 0.1
    scale = np.exp(rng.uniform(0, 7, 120))
    m_np = a @ a.T + np.diag(scale)
    m = jnp.asarray(m_np, jnp.float32)

    x_cold = admm._schulz_inverse(m, 0, coeffs=coeffs)
    r = np.abs(np.eye(120) - m_np @ np.asarray(x_cold, np.float64))
    assert r.max() < 1e-4, r.max()

    x0 = jnp.asarray(np.linalg.inv(m_np), jnp.float32)
    x_warm = admm._schulz_inverse(m, 0, x0=x0, coeffs=coeffs)
    r = np.abs(np.eye(120) - m_np @ np.asarray(x_warm, np.float64))
    assert r.max() < 1e-4, r.max()

    x_bad = jnp.asarray(rng.normal(size=(120, 120)) * 100, jnp.float32)
    x_fb = admm._schulz_inverse(m, 0, x0=x_bad, coeffs=coeffs)
    r = np.abs(np.eye(120) - m_np @ np.asarray(x_fb, np.float64))
    assert np.isfinite(np.asarray(x_fb)).all()
    assert r.max() < 1e-4, r.max()


def test_scaled_pallas_cold_settings_match_oracle_f32():
    """The production/bench cold configuration (scaled Schulz schedule,
    optionally the Pallas VMEM kernel) vs the oracle fixture in f32, and
    batched == single through the custom_vmap route."""
    grf_ref, _, _, _ = _fixture_solution()
    qp_jax = _fixture_jax_qp(jnp.float32)
    for impl in ("xla", "pallas"):
        st = admm.ADMMSettings(seg_iters=30, segments=2, polish=False,
                               schulz_l0=1e-6, schulz_l0_refine=1e-4,
                               schulz_impl=impl)
        sol = admm.mpc_solve(qp_jax, st)
        err = np.abs(np.asarray(sol.x[:12]).reshape(4, 3) - grf_ref).max()
        assert err < 5e-2, f"{impl}: GRF error {err}"
        # batched path (the custom_vmap rule hits the tiled kernel)
        qp_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (8,) + a.shape),
                            qp_jax)
        sol_b = jax.jit(jax.vmap(lambda q: admm.mpc_solve(q, st).x))(qp_b)
        # gate below the fixture's flat-direction noise floor (~2e-2,
        # see test_jax_admm_f32_accuracy): single and batched take
        # different kernel paddings, so agreement is solver-tolerance,
        # not bitwise
        np.testing.assert_allclose(np.asarray(sol_b),
                                   np.tile(np.asarray(sol.x), (8, 1)),
                                   atol=1e-2)


def test_schulz_inverse_balanced_cold_and_warm():
    """Balanced Newton-Schulz: converged inverse cold, refined warm, and
    safeguarded fallback on an out-of-basin warm start."""
    rng = np.random.default_rng(8)
    # SPD with a rho_eq-like badly scaled diagonal (1e3 spread)
    a = rng.normal(size=(120, 120)) * 0.1
    scale = np.exp(rng.uniform(0, 7, 120))
    m_np = a @ a.T + np.diag(scale)
    m = jnp.asarray(m_np, jnp.float32)

    x_cold = admm._schulz_inverse(m, 20)
    r_cold = np.abs(np.eye(120) - m_np @ np.asarray(x_cold, np.float64))
    assert r_cold.max() < 1e-4, r_cold.max()

    # warm: perturbed true inverse refines in few steps
    x0 = jnp.asarray(np.linalg.inv(m_np)
                     * (1 + 1e-3 * rng.normal(size=(120, 120))), jnp.float32)
    x_warm = admm._schulz_inverse(m, 2, x0)
    r_warm = np.abs(np.eye(120) - m_np @ np.asarray(x_warm, np.float64))
    assert r_warm.max() < 1e-4, r_warm.max()

    # garbage warm start: safeguard must fall back to the cold schedule
    x_bad = jnp.asarray(rng.normal(size=(120, 120)) * 100, jnp.float32)
    x_fb = admm._schulz_inverse(m, 20, x_bad)
    r_fb = np.abs(np.eye(120) - m_np @ np.asarray(x_fb, np.float64))
    assert np.isfinite(np.asarray(x_fb)).all()
    assert r_fb.max() < 1e-4, r_fb.max()


def test_first_seg_iters_cold_schedule():
    """Asymmetric cold schedules (short rho-probing first segment) stay
    near oracle optimum — the one-shot sweep configuration (see
    bench.py notes: NOT used where the carry seeds warm chains)."""
    from go1_qp_mpc_controller_tpu.compat import oracle

    grf_ref, x_ref, qp, _ = oracle.solve_test_mpc_fixture()
    h = jnp.asarray(qp.hessian)
    g = jnp.asarray(qp.gradient)
    lb = jnp.asarray(qp.lb)
    ub = jnp.asarray(qp.ub)
    st = admm.ADMMSettings(first_seg_iters=15, seg_iters=60, segments=3,
                           polish=True, polish_solver="chol")
    sol = admm.mpc_solve(
        srb.CondensedQP(hessian=h, gradient=g, lb=lb, ub=ub), st)
    np.testing.assert_allclose(np.asarray(sol.x[:12]).reshape(4, 3),
                               grf_ref, atol=2e-3)


def test_adapt_warm_rho_tracks_and_rescales():
    """adapt_warm_rho: the warm tick applies the banded residual-ratio
    rho rule and rescales the carried inverse consistently — a drifting
    warm chain stays accurate and rho stays inside the band."""
    from go1_qp_mpc_controller_tpu.compat import oracle
    from go1_qp_mpc_controller_tpu.models import srb as srb_mod

    f = oracle.test_mpc_fixture()
    a_d = jnp.asarray(f["a_d"])
    b_d = jnp.asarray(f["b_d_list"][0])
    x_ref10 = jnp.asarray(f["x_ref"]).reshape(10, 13)
    q = jnp.asarray(f["q_weights"])
    r = jnp.asarray(f["r_weights"])
    con = jnp.asarray(f["contacts"])
    x0 = jnp.asarray(f["x0"])

    cold = admm.ADMMSettings(seg_iters=40, segments=3, polish=False)
    warm_st = admm.ADMMSettings(seg_iters=20, segments=1, polish=False,
                                schulz_l0_refine=1e-4,
                                adapt_warm_rho=True, rho_min=0.02,
                                rho_max=50.0)
    tight = admm.ADMMSettings(seg_iters=80, segments=4, polish=True,
                              polish_solver="chol")

    qp0 = srb_mod.condense_nilpotent_const(a_d, b_d, x0, x_ref10, q, r,
                                           con)
    sol, warm = admm.mpc_solve(qp0, cold, return_warm=True)
    drift = jnp.zeros(13, x0.dtype).at[9].add(0.002)
    for k in range(6):
        x0 = x0 + drift
        lazy = srb_mod.condense_nilpotent_lazy(a_d, b_d, x0, x_ref10, q,
                                               r, con)
        sol_w, warm = admm.mpc_solve_warm_fused(lazy, warm, warm_st)
        assert float(warm.rho) >= 0.02 and float(warm.rho) <= 50.0
        qp_k = srb_mod.condense_nilpotent_const(a_d, b_d, x0, x_ref10, q,
                                                r, con)
        ref = admm.mpc_solve(qp_k, tight)
        d = np.abs(np.asarray(sol_w.x[:12]) - np.asarray(ref.x[:12]))
        assert d.max() < 1.0, (k, d.max())


def test_analytic_rho0_structure():
    """mpc_rho0_analytic: floor for balanceable patterns (3/4 stance and
    diagonal pairs), fitted mu/height law inside [1e-3, 1] for side
    pairs (see the r5 calibration notes in ops/admm.py)."""
    feet = jnp.asarray([[0.17, 0.15, -0.3], [0.17, -0.15, -0.3],
                        [-0.17, 0.15, -0.3], [-0.17, -0.15, -0.3]])
    mu = jnp.asarray(0.4)
    for pattern in ([1, 1, 1, 1], [1, 1, 1, 0], [1, 0, 0, 1],
                    [0, 1, 1, 0]):
        r = admm.mpc_rho0_analytic(jnp.asarray(pattern, bool), mu, feet)
        np.testing.assert_allclose(float(r), 1e-3, rtol=1e-5)
    for pattern in ([1, 1, 0, 0], [0, 0, 1, 1], [1, 0, 1, 0],
                    [0, 1, 0, 1]):
        r = float(admm.mpc_rho0_analytic(jnp.asarray(pattern, bool), mu,
                                         feet))
        assert 1e-3 <= r <= 1.0
        # the fitted law: 10^(4.2 - 6 mu - 9.9 h)
        np.testing.assert_allclose(
            r, 10.0 ** (4.2 - 6.0 * 0.4 - 9.9 * 0.3), rtol=1e-4)
    # higher friction -> lower rho for side pairs
    r_lo = float(admm.mpc_rho0_analytic(jnp.asarray([1, 1, 0, 0], bool),
                                        jnp.asarray(0.3), feet))
    r_hi = float(admm.mpc_rho0_analytic(jnp.asarray([1, 1, 0, 0], bool),
                                        jnp.asarray(0.7), feet))
    assert r_lo > r_hi


def test_fused_cold_program_matches_oracle():
    """solve_cold_fused (single segment at the analytic rho0, fused
    balanced KKT, one scaled Schulz schedule) solves the test_mpc
    fixture within the cold-solve tolerance, and its carry seeds warm
    ticks (the bench warmchain protocol, VERDICT r5 item 1)."""
    f = oracle.test_mpc_fixture()
    grf_ref, x_ref, _, _ = _fixture_solution()
    dtype = jnp.float64
    a_d = jnp.asarray(f["a_d"], dtype)
    b_d = jnp.asarray(f["b_d_list"][0], dtype)
    x0 = jnp.asarray(f["x0"], dtype)
    x_ref10 = jnp.asarray(f["x_ref"], dtype).reshape(10, 13)
    q = jnp.asarray(f["q_weights"], dtype)
    r = jnp.asarray(f["r_weights"], dtype)
    con = jnp.asarray(f["contacts"], dtype)
    feet = jnp.asarray(f["foot_pos"], dtype) if "foot_pos" in f else (
        jnp.asarray([[0.17, 0.15, -0.15], [0.17, -0.15, -0.15],
                     [-0.17, 0.15, -0.15], [-0.17, -0.15, -0.15]], dtype))

    lazy = srb.condense_nilpotent_lazy(a_d, b_d, x0, x_ref10, q, r, con)
    settings = admm.ADMMSettings(seg_iters=40, segments=1, polish=False,
                                 schulz_l0=1e-6, schulz_hi_tail=1)
    sol, warm = admm.mpc_solve_cold(lazy, settings,
                                    contacts=con.astype(bool),
                                    foot_pos=feet)
    grf = np.asarray(sol.x[:12]).reshape(4, 3)
    # cold tolerance (the bench gate is statistical; the fixture is a
    # well-conditioned diagonal stance — sub-N here)
    np.testing.assert_allclose(grf, grf_ref, atol=1.0)
    # swing legs pinned by the rho_eq-boosted equality rows (the
    # unpolished 40-iteration segment leaves ~1e-2 N of primal residual
    # there; the segmented+polished path drives it to ~0)
    np.testing.assert_allclose(grf[1], 0.0, atol=0.05)
    np.testing.assert_allclose(grf[3], 0.0, atol=0.05)
    # the carry seeds a warm tick that converges toward the oracle
    warm_st = admm.ADMMSettings(seg_iters=15, segments=1, polish=False,
                                schulz_refine=1)
    drift = jnp.zeros(13, dtype).at[9].add(0.001)
    lazy2 = srb.condense_nilpotent_lazy(a_d, b_d, x0 + drift, x_ref10,
                                        q, r, con)
    sol2, _ = admm.mpc_solve_warm_fused(lazy2, warm, warm_st)
    assert np.isfinite(np.asarray(sol2.x)).all()
    # the fixture is a SIDE-pair stance whose analytic rho0 (1.0) sits
    # ~2 decades above the adapted optimum — the capped carry
    # adaptation (2x/solve, see solve_cold_fused) keeps the warm tick
    # converging (primal ~2e-3 and falling) instead of collapsing (an
    # uncapped 100x rescale measured forces -> 0.5 N garbage)
    assert float(sol2.primal_res) < 0.01
    # batched == per-scenario (vmap closure over the custom_vmap route)
    lazies = jax.tree.map(lambda a: jnp.stack([a, a]), lazy)
    sols, _ = jax.vmap(
        lambda lz: admm.mpc_solve_cold(lz, settings,
                                       contacts=con.astype(bool),
                                       foot_pos=feet))(lazies)
    np.testing.assert_allclose(np.asarray(sols.x[0]),
                               np.asarray(sol.x), atol=1e-9)


def test_auto_impl_resolution_guards_dtype():
    """schulz_impl="auto" must NEVER resolve to the Mosaic kernel for a
    non-f32 dtype (Mosaic supports only 32-bit types; the f64
    oracle-parity configuration crashed on TPU otherwise — the same
    hazard class as the r4 ekf.py advisor finding)."""
    st = admm.ADMMSettings(schulz_impl="auto")
    assert admm._resolved_impl(st, jnp.dtype("float64")) == "xla"
    # f32 resolves per backend (xla on this CPU test host)
    assert admm._resolved_impl(st, jnp.dtype("float32")) in ("xla",
                                                             "pallas")
    # explicit values pass through untouched
    st_p = admm.ADMMSettings(schulz_impl="pallas")
    assert admm._resolved_impl(st_p, jnp.dtype("float64")) == "pallas"


def test_mpc_solve_cold_requires_rho_inputs():
    f = oracle.test_mpc_fixture()
    lazy = srb.condense_nilpotent_lazy(
        jnp.asarray(f["a_d"]), jnp.asarray(f["b_d_list"][0]),
        jnp.asarray(f["x0"]), jnp.asarray(f["x_ref"]).reshape(10, 13),
        jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
        jnp.asarray(f["contacts"]))
    with pytest.raises(ValueError, match="contacts"):
        admm.mpc_solve_cold(lazy, admm.ADMMSettings(segments=1))


def test_segmented_fused_matches_dense_solve():
    """solve_segmented_fused (the controller's transition program on the
    lazy factors) matches solve() on the dense QP: same segments, same
    warm start, same adaptation rule — only the cost normalization
    (max diag vs max abs, equal for PSD) and fp order differ."""
    from go1_qp_mpc_controller_tpu.parallel import sweep

    dtype = jnp.float64
    scn = sweep.random_scenarios(jax.random.PRNGKey(11), 5, dtype)
    st = admm.ADMMSettings(seg_iters=25, segments=3, polish=False)

    def lazy_of(s):
        a_c = srb.calculate_A_c(s.x0[0:3])
        b_c = srb.calculate_B_c(s.mass, s.inertia, s.root_rot,
                                s.foot_pos)
        a_d, b_d = srb.discretize(a_c, b_c, 0.0025)
        return srb.condense_nilpotent_lazy(a_d, b_d, s.x0, s.x_ref,
                                           s.q_weights, s.r_weights,
                                           s.contacts)

    def both(s):
        lz = lazy_of(s)
        warm = admm.WarmState(
            x=jnp.zeros_like(lz.gradient), y=jnp.zeros_like(lz.lb),
            rho=jnp.asarray(0.1, dtype), minv=jnp.eye(120, dtype=dtype))
        sol_f, w_f = admm.solve_segmented_fused(lz, st, s.mu, warm)
        qp = srb.CondensedQP(hessian=srb.lazy_hessian(lz),
                             gradient=lz.gradient, lb=lz.lb, ub=lz.ub)
        sol_d, w_d = admm.mpc_solve(qp, st, mu=s.mu, warm_rho=warm.rho,
                                    return_warm=True)
        return sol_f.x, sol_d.x, w_f.rho, w_d.rho

    xf, xd, rf, rd = jax.vmap(both)(scn)
    # f64: the two formulations track to solver tolerance (fp order and
    # the cost definition differ; both converge to the same optimum)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(xd),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rd),
                               rtol=1e-6)
    # polish demand fails loudly
    with pytest.raises(ValueError, match="polish"):
        lz = jax.tree.map(lambda a: a[0], jax.vmap(lazy_of)(scn))
        warm = admm.WarmState(
            x=jnp.zeros_like(lz.gradient), y=jnp.zeros_like(lz.lb),
            rho=jnp.asarray(0.1, dtype), minv=jnp.eye(120, dtype=dtype))
        admm.solve_segmented_fused(
            lz, st._replace(polish=True), 0.3, warm)
