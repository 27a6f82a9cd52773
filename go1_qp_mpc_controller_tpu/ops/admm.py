"""Batched dense ADMM QP solver with OSQP semantics, in pure JAX.

TPU-native replacement for OSQP + osqp-eigen
(src/a1_cpp/src/A1RobotControl.cpp:416-441, 522-555; docker/Dockerfile:74-114).
OSQP's sparse LDL' does not map to the MXU, so the solver is re-designed
dense and fixed-shape:

- cost scaling (the QP Hessian of this problem family is ~1e-2-scale while
  forces are ~1e2 N; normalizing |P| to 1 is what lets a generic rho work),
- a segmented ADMM loop with OSQP's adaptive-rho rule between segments:
  each segment refactorizes M = P + sigma I + C' diag(rho) C with a batched
  Cholesky and runs a fixed number of iterations (lax.fori_loop) whose
  per-iteration work is two triangular solves plus structured constraint
  matvecs — fully batchable with vmap, no data-dependent control flow,
- OSQP's over-relaxation (alpha = 1.6) and 1e3 rho boost on equality rows
  (lb == ub), which pins swing-leg forces fast,
- an optional active-set polish (OSQP "polish", osqp/src/polish.c semantics)
  via masked augmented-Lagrangian refinement, giving near-exact optima on
  the low-curvature directions the r_weights ~ 1e-6 barely regularize.

The friction-pyramid constraint matrix is never materialized: `matvec` /
`rmatvec` callables exploit its block-diagonal structure (ConvexMpc.cpp:46-58).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.models import srb
from go1_qp_mpc_controller_tpu.utils.precision import f32_matmuls


class ADMMSettings(NamedTuple):
    """Solver hyperparameters (OSQP defaults unless noted).

    Total iteration count = segments * seg_iters; rho adapts between
    segments (each segment refactorizes once).

    kkt_solver selects how the (n, n) ADMM linear systems are solved:
      - "chol": Cholesky factor + triangular solves per iteration. Exact,
        but triangular solves serialize on TPU (the 634-solves/s profile).
      - "inv": explicit M^-1 once per segment; iterations become batched
        matvecs (MXU-friendly).
      - "schulz": M^-1 by Newton-Schulz iteration — pure matmuls end to
        end, the TPU-native path. Refines the previous segment's inverse
        after rho updates, so later segments converge in a few matmuls.
    """
    seg_iters: int = 50
    segments: int = 4
    # iteration count for the FIRST segment only (0 = seg_iters). The
    # cold path spends segment 1 at the generic rho0 = 0.1 — most of its
    # iterations contribute nothing once rho adapts (measured: 30+30 and
    # 20+30 cold schedules give identical accuracy). A short first
    # segment (~10 iterations) is enough for the OSQP residual-ratio
    # rule to find the per-scenario rho; the second segment then does
    # the real work at the right step size.
    first_seg_iters: int = 0
    # bound on the PER-SEGMENT rho change factor (OSQP's rule is
    # unclipped beyond [1e-2, 1e2]). A tighter bound keeps the
    # rho-rescaled carried inverse near the Schulz basin, letting the
    # later segments run a shorter refine schedule (schulz_l0_refine
    # can rise toward 1e-3).
    adapt_factor_max: float = 100.0
    # adapt rho at the END of a warm tick and carry the adapted value
    # (the carried inverse is rescaled by the rho ratio; the next tick's
    # Schulz refinement absorbs the rest). OSQP's periodic adaptation at
    # tick cadence — needed by warm programs that never take a cold
    # segment (the batched ROBUST walking path), harmless on the steady
    # cadence (the adapt_tol freeze guard stops it at convergence).
    adapt_warm_rho: bool = False
    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    rho_eq_scale: float = 1e3   # rho boost for lb == ub rows
    # tighter than OSQP's [1e-6, 1e6]: keeps the cost-scaled KKT matrix
    # well-conditioned for float32 Newton-Schulz inversion
    rho_min: float = 1e-3
    rho_max: float = 1e3
    # adapt rho only while the iterate is genuinely unconverged: at a
    # (warm-started) near-optimal point both relative residuals are fp
    # noise and their RATIO is meaningless — ungated, the sqrt(prim/dual)
    # rule random-walks rho into the rho_min absorbing state across carried
    # ticks, where a 25-iteration warm segment no longer contracts
    # (measured: standing rollout forces decay 36.8 N -> 3 N in 20 ticks,
    # then oscillating divergence). OSQP never hits this because it
    # terminates on convergence instead of iterating past it.
    adapt_tol: float = 1e-5
    polish: bool = True
    polish_rho: float = 1e3     # AL penalty (x |P|) for the polish solves
    polish_iters: int = 2
    # float64 terminal refinement: float32 inputs floor at ~2e-2 N on the
    # r_weights~1e-6 flat directions (fp noise / curvature); one masked
    # active-set solve in emulated f64 recovers strict 1e-3 parity.
    # Requires jax x64 to be enabled; raises at trace time otherwise.
    refine_f64: bool = False
    kkt_solver: str = "schulz"
    polish_solver: str = "chol"  # polish matrix is worse-conditioned
    schulz_iters: int = 20      # Newton-Schulz steps (Jacobi-scaled init)
    schulz_refine: int = 6      # warm-tick refinement steps (solve_warm)
    # HIGHEST-precision steps at the end of the pallas scaled schedule
    # (bf16x3 middle steps). 2 squares the bf16x3 residual floor twice —
    # the parity-grade default; 1 trades the last squaring (~1e-6 vs
    # ~1e-3 interval residual on the inverse) for ~1.2 ms per schedule
    # at batch 4096, acceptable exactly when the cold/warm accuracy
    # gates say so.
    schulz_hi_tail: int = 2
    # scenarios per pallas program in the Schulz kernel. 8 is the VMEM
    # ceiling in practice: the kernel's per-tile intermediates (masks,
    # balanced matrix, iterate, inner product) put tile=16 over the
    # 16 MB scoped VMEM limit (measured OOM at compile).
    schulz_tile: int = 8
    # Scaled (endpoint-balanced) cold Newton-Schulz: when > 0, solve()'s
    # per-segment inversions replace the plain fixed-count schedule with a
    # coefficient schedule computed for a worst-case balanced spectrum
    # lower edge of schulz_l0 (see _scaled_schulz_coeffs) — ~14 steps
    # instead of 20 for l0 = 1e-6, and MORE robust (the plain 20-step
    # schedule only lifts a lower edge of ~4e-5). Warm-start branches run
    # plain Newton (coefficient 1) per scenario; only the cold/fallback
    # branch is scaled, so a converged carry is never destroyed.
    schulz_l0: float = 0.0
    # FIRST-segment-only variant of schulz_l0 for the segmented cold
    # path (applies when no warm inverse is carried in): segment 1
    # exists to estimate rho — first_seg_iters probing iterations at
    # the generic rho0 — and its inverse is discarded when segment 2
    # re-inverts at the adapted rho, so it tolerates a friendlier
    # worst-case edge than the full 1e-6 schedule. Measured (r4, TPU,
    # batch 4096 random scenarios): 1e-3 (9+tail steps instead of
    # 14+tail) lifts cold solves 73.1k -> 77.7k/s with cold-vs-tight
    # p50/p90 and the warmchain accuracy fields bit-unchanged and zero
    # non-finite latches; 1e-2 gains another 1.5k/s but nudges the
    # cold p90 8.42 -> 8.59 N, declined. (Contrast: relaxing the
    # LATER-segment edge schulz_l0_refine 1e-4 -> 1e-3 is catastrophic
    # — cold p50 18.7 N — because basin-REJECTED second segments
    # restart cold on that schedule and genuinely need the margin.)
    # 0 = use schulz_l0.
    schulz_l0_first: float = 0.0
    # Later-segment variant of schulz_l0: segments after the first carry
    # the previous segment's inverse (rescaled by the rho ratio), which
    # the basin test accepts for all but pathological rho jumps — those
    # accepted warm starts re-converge in ~8 plain steps, so the shared
    # schedule can assume a friendlier lower edge (e.g. 1e-3 -> 10 steps
    # instead of 14). The rare basin-rejected scenario then restarts on an
    # under-provisioned cold schedule — acceptable exactly when the
    # cold-vs-tight GRF accuracy gate says so. 0 = use schulz_l0.
    schulz_l0_refine: float = 0.0
    # "xla" = per-step matmul loop (HBM-bound: ~1.65 GB of m_b/x traffic
    # per step at batch 4096 = 2.5 ms/step). "pallas" = VMEM-resident
    # kernel (pallas_admm.schulz_inverse_batch): M crosses HBM once and
    # the whole schedule runs on-chip. "auto" = pallas on a TPU backend,
    # xla elsewhere (production defaults use this so CPU test runs stay
    # off the interpreter). Batched calls reach the kernel through a
    # custom_vmap rule, so solve() stays per-scenario.
    schulz_impl: str = "xla"
    # NOTE (r4 negative result): dropping the per-iteration KKT matvec
    # (minv @ rhs) from HIGHEST (6-pass bf16) to HIGH (3-pass) measured
    # EXACTLY neutral in BOTH the full warm chain (25.460 vs 25.474
    # ms/tick) and the cold solve (73.1k vs 72.1k solves/s, identical
    # accuracy fields) at batch 4096 — the batched matvec is HBM-bound on the 58 KB
    # inverse stream, not MXU-pass-bound, so the precision knob buys
    # nothing and was removed.
    # NOTE (r4 negative result): storing the per-segment KKT inverse in
    # bfloat16 for the iteration matvecs halves the loop's dominant HBM
    # stream and saved a real ~8 ms/cold-solve — but the bf16-perturbed
    # trajectory contaminates the CARRIED duals (the rho_eq-boosted
    # equality rows carry O(1e3)-scale multipliers whose 4e-3 rounding
    # the 15-iteration warm budget cannot re-converge): warmchain p90
    # 3.8 N -> 133 N, and an f32 tail of 5-8 final iterations per
    # segment only brought it back to 86-140 N. Removed; the iteration
    # loop's f32 HBM traffic is load-bearing for the warm cadence.
    # NOTE: an Anderson(1) acceleration of the warm loop was implemented
    # and measured in r3 (TPU v5e, batch 4096, drifting warm chains vs a
    # tight polished reference): at EQUAL iteration budgets it matched
    # plain ADMM within noise (aa15 med 0.102 N / p90 3.14 vs plain15
    # 0.116 / 3.28; aa12 == plain12) and its vector bookkeeping cost
    # ~1-2% throughput — the warm iterates are dominated by the
    # projection's active-set discovery, which secant extrapolation of
    # the smooth part cannot shortcut. Removed rather than shipped as an
    # untested branch (VERDICT r2 item 6).


class WarmState(NamedTuple):
    """Cross-tick solver carry — the TPU analog of the reference's
    persistent warm-started OSQP instance (A1RobotControl.cpp:522-540).

    Attributes:
      x: (n,) primal warm start.
      y: (m,) dual warm start (unscaled units).
      rho: () adapted step size.
      minv: (n, n) KKT inverse from the previous tick (Schulz-refined).
    """
    x: jnp.ndarray
    y: jnp.ndarray
    rho: jnp.ndarray
    minv: jnp.ndarray


class ADMMSolution(NamedTuple):
    x: jnp.ndarray           # (n,) primal solution
    y: jnp.ndarray           # (m,) dual solution
    z: jnp.ndarray           # (m,) projected constraint values
    rho: jnp.ndarray         # () final adapted rho (for warm restarts)
    primal_res: jnp.ndarray  # () max |Cx - z|
    dual_res: jnp.ndarray    # () max |Px + q + C'y|


@functools.lru_cache(maxsize=None)
def _scaled_schulz_coeffs(l0, tail=2, margin=1e-3):
    """Endpoint-balanced scaled Newton-Schulz coefficient schedule.

    Plain Newton-Schulz on a balanced SPD matrix spends most of its
    budget doubling the small eigenvalues of M_b X up toward 1. The
    scaled iteration X <- a X (2I - a M X) with a = 2/(l+u) maps the
    spectral interval [l, u] of M_b X to [4lu/(l+u)^2, 1] — both
    endpoints land on the common minimum, the interior on <= 1 — which
    QUADRUPLES the lower edge per step while u stays pinned at 1 (plain
    Newton only doubles it). The schedule is computed statically from a
    worst-case lower edge l0 and is valid for ANY actual spectrum inside
    [l0, 1/1.05]: a better-conditioned matrix simply converges sooner
    (f(y) <= 1 for all y, positivity needs a y < 2 which a = 2/(l+u)
    guarantees). Ends with `tail` plain (a = 1) Newton steps that square
    the ~1e-3 interval residual to the f32 floor — run at HIGHEST
    precision by the caller, like the plain schedule's tail.

    Noise margin (measured hazard): exact endpoint balancing puts the
    top edge at a u = 2 - 2l/(l+u) — within ~1e-6 of the positivity
    cliff once l < 1e-6. Matmul noise then pushes a top eigenvalue past
    2, f maps it NEGATIVE, and negative eigenvalues grow ~4x/step into
    overflow (measured: one scenario in 4096 at 7e17). Balancing on the
    inflated interval [l, u (1 + margin)] keeps 4x lower-edge growth
    (the cap f(u') = 4 l u'/(l+u')^2 is the same balanced form) while
    giving the top edge a margin/noise ~ 1000x safety factor. Step 0's
    top edge 1/1.05 is an exact bound (norminf >= lambda_max), but its
    OUTPUT carries product noise, so u = 1 + margin from step 1 on.

    ``margin`` must exceed the per-step matmul noise by ~10x: 1e-3 for
    the bf16x3 default (~1e-6 product error, 1000x factor); 4e-2 when
    single-pass-bf16 steps are enabled (bf16 OPERAND rounding ~4e-3 —
    measured: margin 1e-3 + bf16x1 steps overflows to 1e31 through the
    positivity cliff, exactly the hazard note above). A larger margin
    costs at most one extra step (the balanced cap 4 l u'/(l+u')^2 is
    insensitive to u' for l << 1).
    """
    l, u = float(l0), 1.0 / 1.05
    coeffs = []
    while l < 0.99 and len(coeffs) < 60:
        u_eff = u * (1.0 + margin) if coeffs else u
        coeffs.append(2.0 / (l + u_eff))
        l = 4.0 * l * u_eff / ((l + u_eff) ** 2)
        u = 1.0
    return tuple(coeffs) + (1.0,) * tail


def _schulz_inverse(m_mat, iters, x0=None, coeffs=None):
    """Newton-Schulz matrix inverse on the Jacobi-BALANCED matrix.

    Computes M^-1 as S (M_b)^-1 S with S = diag(M)^-1/2 and
    M_b = S M S (unit diagonal). The balancing buys two things:

    - the cold start X0 = I / (1.05 ||M_b||_inf) has eigs(M_b X0) in
      (1/cond(M_b), 0.96], and cond(M_b) is far below cond(M) for the
      rho_eq-boosted KKTs (the 5% margin matters: lambda_max can round a
      hair above the norm bound, and 2^k squarings amplify it);
    - M_b has O(1) entries, so the quadratically-self-correcting middle
      iterations can run at HIGH matmul precision (3-pass bf16 on TPU,
      ~2x cheaper than HIGHEST's 6 passes, product error ~1e-6): the
      final two HIGHEST steps square any residual floor away. Two
      measured hazards bound this choice: (a) single-pass-bf16 (DEFAULT)
      middle steps pass the random-scenario KKT distribution but NaN the
      closed-loop rollout — the controller presets produce cond(M_b)
      large enough that 4e-3 product noise flips small eigenvalues of
      M_b X negative, which the doubling phase amplifies to overflow;
      HIGH's ~1e-6 noise keeps a >=10x margin to 1/cond. (b) On the
      UNbalanced KKT even the final-step precision cannot recover — the
      1e3 row imbalance scales product error to O(1) (see
      _schulz_refine_warm's negative results).

    A warm x0 (previous segment/tick inverse) is safeguarded: accept only
    inside the convergence basin (balanced-residual Frobenius < 0.9,
    computed at HIGHEST precision — a bf16 safeguard is noise-swamped),
    else fall back to the guaranteed cold init.
    """
    s = jax.lax.rsqrt(jnp.diagonal(m_mat))
    m_b = m_mat * s[:, None] * s[None, :]
    return _schulz_iterate_balanced(m_b, s, iters, x0, coeffs)


def _schulz_iterate_balanced(m_b, s, iters, x0=None, coeffs=None):
    """Newton-Schulz on an already-balanced matrix (see _schulz_inverse).

    Args:
      m_b: (n, n) Jacobi-balanced matrix (unit diagonal).
      s: (n,) the balancing scale diag(M)^-1/2.
      x0: optional UNBALANCED warm inverse (basin-safeguarded).
      coeffs: optional scaled-step schedule (_scaled_schulz_coeffs);
        overrides `iters` with its length. Scaling applies to the
        cold/fallback branch only — a basin-accepted warm start runs
        plain Newton (a scaled step maps a converged inverse's unit
        spectrum to ~0, destroying it), selected per scenario.

    Returns:
      The UNBALANCED inverse S (M_b)^-1 S.
    """
    if coeffs is not None:
        iters = len(coeffs)
    n = m_b.shape[-1]
    dtype = m_b.dtype
    eye = jnp.eye(n, dtype=dtype)
    eye2 = 2.0 * eye
    hi = jax.lax.Precision.HIGHEST
    lo = jax.lax.Precision.HIGH

    norminf = jnp.max(jnp.sum(jnp.abs(m_b), axis=-1))
    cold = eye / (1.05 * norminf)

    hi_tail = min(iters, 2)
    start = 0
    ok = None
    if x0 is not None:
        # balance the warm start: X ~ M^-1  =>  X_b = S^-1 X S^-1.
        # The basin test shares the first Schulz step's inner product
        # M_b X_b (resid = I - inner), so the safeguard costs no extra
        # matmul. Both select branches consume that first step: the cold
        # init is a SCALAR multiple of identity (unit-diagonal balanced
        # matrix), so its first step c (2I - c M_b) is pure elementwise
        # arithmetic — the fallback runs the mathematically identical
        # full-iters cold schedule. (Without this, a fallback at
        # schulz_refine=1 returned the raw un-iterated init, whose
        # Frobenius residual always re-fails the basin test — the warm
        # solver then never recovered.)
        x0_b = x0 / (s[:, None] * s[None, :])
        inner = jnp.matmul(m_b, x0_b, precision=hi)
        # Basin test on the spectral SIGNATURE of the step's own inner
        # product M_b X_b (elementwise only, no extra matmul): strictly
        # positive diagonal and row sums < 3.0. This accepts the normal
        # warm cadence (inner ~ I), a partially converged inverse from our
        # own lineage (e.g. rebuilt cold after a contact flip), whose
        # rho(I - M_b X_b) < 1 but norm ~ 1 - 2/cond — NO norm bound can
        # accept it, and rejecting it froze the warm path in per-tick cold
        # restarts forever (the 1-step-from-cold inverse can never pass a
        # norm test; measured: residual bit-frozen at 0.44 over ticks) —
        # AND a drift-perturbed good inverse: for the walking controller's
        # cond~700 KKTs, E = dM_b X_b from a per-tick drift of only 4e-3
        # has DIFFUSE rows whose 1-norms reach ~1 while the spectral
        # radius stays tiny (Schulz re-converges in 2 steps); a 1.9 row
        # bound sat exactly on that cliff and stochastically rejected a
        # resid-1e-6 inverse every few ticks, each rejection costing ~4
        # garbage-solve ticks at short refine schedules (measured walking
        # limit cycle: heal 0.96 -> 1e-6 -> reject -> 0.96). A false
        # accept (adversarial indefinite x0 passing the signature)
        # diverges into the solver's non-finite latch.
        row_inner = jnp.sum(jnp.abs(inner), axis=-1)
        d = jnp.diagonal(inner)
        ok = (jnp.min(d) > 1e-4) & (jnp.max(row_inner) < 3.0)
        if iters == 0:
            x = jnp.where(ok, x0_b, cold)
        else:
            stepped = jnp.matmul(x0_b, eye2 - inner, precision=hi)
            c = 1.0 / (1.05 * norminf)
            if coeffs is not None:
                # scaled first step from the cold init: a c (2I - a c M_b)
                c = coeffs[0] * c
            stepped_cold = c * (eye2 - c * m_b)
            x = jnp.where(ok, stepped, stepped_cold)
            start = 1
    else:
        x = cold

    for k in range(start, iters):
        prec = hi if k >= iters - hi_tail else lo
        a = 1.0 if coeffs is None else coeffs[k]
        if a == 1.0:
            x = jnp.matmul(x, eye2 - jnp.matmul(m_b, x, precision=prec),
                           precision=prec)
        else:
            # scaled step X <- a X (2I - a M X), as X @ (2a I - a^2 M X);
            # warm-accepted scenarios run plain Newton (a = 1)
            aa = a if ok is None else jnp.where(ok, 1.0, a)
            inner_k = jnp.matmul(m_b, x, precision=prec)
            x = jnp.matmul(x, (2.0 * aa) * eye - (aa * aa) * inner_k,
                           precision=prec)
    return x * s[:, None] * s[None, :]


def _schulz_refine_warm(m_mat, x0, iters):
    """Warm-path Newton-Schulz refinement (balanced schedule).

    Delegates to :func:`_schulz_inverse` (Jacobi-balanced, HIGH-precision
    middle steps, HIGHEST tail, fused basin safeguard). Negative results
    from earlier precision-reduction attempts, kept as a record:
    (a) a 2-probe safeguard estimate diverges — random probes catch only
    ~||E||_F/sqrt(n) of a spiky residual spectrum, accepting warm starts
    outside the basin that Schulz squares to overflow; (b) single-pass
    bf16 (DEFAULT) middle steps on the UNbalanced KKT stall — rows differ
    by ~1e3, so product error (relative to the *uncancelled* magnitudes)
    leaves an O(row-imbalance x 4e-3) residual floor (measured:
    warm-vs-cold GRF median 1 N -> 88 N); balanced-DEFAULT passes random
    scenarios but NaNs the closed-loop rollout (see _schulz_inverse).
    """
    return _schulz_inverse(m_mat, iters, x0)


@functools.lru_cache(maxsize=None)
def _pallas_schulz_fns(coeffs, iters, hi_tail=2, tile=8):
    """(cold_fn, warm_fn) pair routing Schulz inversion to the Pallas
    VMEM-resident kernel. Defined per-scenario with a custom_vmap rule:
    under a caller's vmap the whole batch lands in one pallas_call with
    scenario tiling (tile=8 keeps the MXU pipeline full across the
    sequential dot chain — tile=1 via the default pallas batching rule
    measured 1.7x slower). ``hi_tail`` picks how many final steps run
    HIGHEST (see ADMMSettings.schulz_hi_tail)."""
    from go1_qp_mpc_controller_tpu.ops import pallas_admm

    precisions = None
    if coeffs is not None:
        hi = jax.lax.Precision.HIGHEST
        n = len(coeffs)
        precisions = tuple(hi if k >= n - hi_tail else "bf16x3"
                           for k in range(n))

    @jax.custom_batching.custom_vmap
    def cold(m):
        return pallas_admm.schulz_inverse_batch(
            m[None], iters, coeffs=coeffs, precisions=precisions)[0]

    def _bcast(x, batched, axis_size):
        # a caller's vmap may batch only some operands (e.g. a shared warm
        # inverse across scenarios); materialize the broadcast so the
        # kernel always sees (B, n, n) operands
        return x if batched else jnp.broadcast_to(x, (axis_size,) + x.shape)

    @cold.def_vmap
    def _cold_rule(axis_size, in_batched, m):
        m = _bcast(m, in_batched[0], axis_size)
        return pallas_admm.schulz_inverse_batch(
            m, iters, coeffs=coeffs, precisions=precisions,
            tile=tile), True

    @jax.custom_batching.custom_vmap
    def warm(m, x0):
        return pallas_admm.schulz_inverse_batch(
            m[None], iters, x0=x0[None], coeffs=coeffs,
            precisions=precisions)[0]

    @warm.def_vmap
    def _warm_rule(axis_size, in_batched, m, x0):
        m = _bcast(m, in_batched[0], axis_size)
        x0 = _bcast(x0, in_batched[1], axis_size)
        return pallas_admm.schulz_inverse_batch(
            m, iters, x0=x0, coeffs=coeffs, precisions=precisions,
            tile=tile), True

    return cold, warm


@functools.lru_cache(maxsize=None)
def _pallas_kkt_schulz_fns(coeffs, iters, hi_tail=2, tile=8):
    """(cold_fn, warm_fn) pair with the KKT BUILT INSIDE the Schulz
    kernel (pallas_admm.schulz_inverse_kkt_batch): callers pass the
    lazy condensation factors (tiled quadrants, combined band
    diagonals, cost) and the (n, n) KKT matrix never exists in HBM.
    The XLA-side materialize -> cost-scale -> band -> Jacobi-balance
    chain this replaces measured ~3.4 ms per batch-4096 tick (~8x its
    byte roofline, r5) — the masked band/balance expressions lower
    poorly. custom_vmap routes a caller's vmap into one pallas_call."""
    from go1_qp_mpc_controller_tpu.ops import pallas_admm

    kw = dict(coeffs=coeffs, iters=iters, tile=tile, hi_tail=hi_tail)

    def _bcast(x, batched, axis_size):
        return x if batched else jnp.broadcast_to(x,
                                                  (axis_size,) + x.shape)

    @jax.custom_batching.custom_vmap
    def cold(tiled, dmain, off1, off2, cost):
        return pallas_admm.schulz_inverse_kkt_batch(
            tiled[None], dmain[None], off1[None], off2[None],
            cost[None], **kw)[0]

    @cold.def_vmap
    def _cold_rule(axis_size, in_batched, *a):
        a = [_bcast(x, bb, axis_size) for x, bb in zip(a, in_batched)]
        return pallas_admm.schulz_inverse_kkt_batch(*a, **kw), True

    @jax.custom_batching.custom_vmap
    def warm(tiled, dmain, off1, off2, cost, x0):
        return pallas_admm.schulz_inverse_kkt_batch(
            tiled[None], dmain[None], off1[None], off2[None],
            cost[None], x0=x0[None], **kw)[0]

    @warm.def_vmap
    def _warm_rule(axis_size, in_batched, *a):
        a = [_bcast(x, bb, axis_size) for x, bb in zip(a, in_batched)]
        return pallas_admm.schulz_inverse_kkt_batch(
            *a[:5], x0=a[5], **kw), True

    return cold, warm


def _kkt_kernel_operands(lazy, rho_vec, sigma, mu):
    """(tiled4, dmain, off1, off2, cost) for the fused-KKT kernel.

    cost = 1/max diag(H): for the PSD condensed Hessian max|H_ij| <=
    max_i H_ii, so this equals the max|H| normalization without
    materializing H. dmain carries everything of M's diagonal except
    H's own (which the kernel's quadrant build contributes)."""
    from go1_qp_mpc_controller_tpu.models import srb as srb_mod

    h_diag = srb_mod.lazy_hessian_diag(lazy)
    cost = 1.0 / jnp.maximum(jnp.max(h_diag), 1e-12)
    main, off1, off2 = _pyramid_band_diags(rho_vec, mu)
    dmain = cost * lazy.r_diag + sigma + main
    return lazy.tiled[:, 0], dmain, off1, off2, cost


def _schedule_precisions(coeffs, l0, bf16_edge, margin=1e-3):
    """DEAD LEVER, kept as a measured negative result (r4): TRUE
    single-pass-bf16 middle steps ("bf16x1") diverge to ~1e31 even with
    a noise-proportionate top-edge margin — the failure is NOT the
    positivity-cliff margin but CANCELLATION AMPLIFICATION: the iterate
    X ~ M_b^-1 has entries of size cond(M_b) (~1e3 on controller KKTs),
    so the 4e-3 bf16 OPERAND rounding produces O(1) ABSOLUTE error on
    the near-identity product M_b X, flipping eigenvalues far below any
    schedulable edge. bf16x3 works because its ~1e-6 product error times
    the same amplification stays under the small-eigenvalue scale. No
    precision schedule can rescue a 1-pass product here; the honest
    knobs are schulz_hi_tail and schulz_tile.
    """
    raise NotImplementedError("bf16x1 middle steps are a measured "
                              "negative result; see docstring")


def _resolved_impl(settings, dtype=None):
    """Schulz implementation selection: "auto" resolves per backend at
    trace time (pallas on TPU, xla elsewhere — the ekf lane-route
    pattern) AND per dtype: Mosaic supports only 32-bit types, so the
    f64 oracle-parity configuration must take the XLA loop even on TPU
    (the ekf.py r4-advisor hazard, same class). Explicit values pass
    through — an explicit "pallas" is the caller's assertion."""
    if settings.schulz_impl == "auto":
        if dtype is not None and dtype != jnp.float32:
            return "xla"
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return settings.schulz_impl


def _make_kkt_solve(m_mat, settings, warm_minv=None, solver=None):
    """Returns (solve_fn, carry_minv) for the configured kkt_solver."""
    solver = settings.kkt_solver if solver is None else solver
    if solver == "chol":
        chol = jnp.linalg.cholesky(m_mat)

        def solve_fn(rhs):
            w = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
            return jax.scipy.linalg.solve_triangular(chol.T, w, lower=False)

        return solve_fn, None
    if solver == "inv":
        minv = jnp.linalg.inv(m_mat)
    else:  # schulz
        # full iteration count even on warm starts: the safeguard may fall
        # back to the cold init, which needs the complete schedule — a
        # shortened warm-segment schedule (10 iters) was measured to break
        # oracle parity by ~30 N when inter-segment rho jumps trigger the
        # fallback. Warm starts inside the basin just converge long before
        # the end (the extra matmuls are the price of fixed shapes).
        l0 = settings.schulz_l0
        if warm_minv is not None and settings.schulz_l0_refine > 0:
            l0 = settings.schulz_l0_refine
        elif warm_minv is None and settings.schulz_l0_first > 0:
            l0 = settings.schulz_l0_first
        # single-pass-bf16 steps need the widened top-edge margin (see
        # _scaled_schulz_coeffs); only the pallas impl runs them
        coeffs = _scaled_schulz_coeffs(l0) if l0 > 0 else None
        if _resolved_impl(settings, m_mat.dtype) == "pallas":
            cold_fn, warm_fn = _pallas_schulz_fns(
                coeffs, settings.schulz_iters,
                hi_tail=settings.schulz_hi_tail,
                tile=settings.schulz_tile)
            minv = (cold_fn(m_mat) if warm_minv is None
                    else warm_fn(m_mat, warm_minv))
        else:
            minv = _schulz_inverse(m_mat, settings.schulz_iters, warm_minv,
                                   coeffs)
    return (lambda rhs: minv @ rhs), minv


@f32_matmuls
def solve(hessian, gradient, lb, ub, matvec, rmatvec, rmatvec_dense,
          settings, warm_x=None, warm_y=None, warm_rho=None,
          return_warm=False, kkt_fused=None):
    """Solve min 1/2 x'Px + q'x s.t. lb <= Cx <= ub for one QP.

    Args:
      hessian, gradient: (n, n), (n,).
      lb, ub: (m,) bounds; equality rows encoded as lb == ub.
      matvec: u (n,) -> C u (m,).
      rmatvec: y (m,) -> C' y (n,).
      rmatvec_dense: w (m,) -> C' diag(w) C (n, n) (structure-exploiting).
      settings: ADMMSettings (loop bounds are static).
      warm_x, warm_y, warm_rho: optional warm starts from a previous tick.
      kkt_fused: optional (pbar, sigma, rho_vec) -> M builder that fuses
        the band construction into one output pass (the friction-pyramid
        _pyramid_kkt_fused) — the unfused ``pbar + sigma I +
        rmatvec_dense(rho_vec)`` costs ~7 HBM passes per SEGMENT at
        batch 4096 (~3 ms extra per cold solve, measured r4).

    Returns:
      ADMMSolution (duals in unscaled units).
    """
    n = gradient.shape[-1]
    m = lb.shape[-1]
    dtype = gradient.dtype
    eye_n = jnp.eye(n, dtype=dtype)

    # --- cost scaling: |P| -> 1 --------------------------------------
    cost = 1.0 / jnp.maximum(jnp.max(jnp.abs(hessian)), 1e-12)
    pbar = cost * hessian
    qbar = cost * gradient

    eq = jnp.isclose(lb, ub)
    # make bounds finite for arithmetic; clip keeps semantics
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    lb_f = jnp.maximum(lb, -big)
    ub_f = jnp.minimum(ub, big)

    alpha = settings.alpha
    sigma = settings.sigma

    x0 = jnp.zeros((n,), dtype) if warm_x is None else warm_x
    y0 = jnp.zeros((m,), dtype) if warm_y is None else warm_y * cost
    rho0 = (jnp.asarray(settings.rho, dtype) if warm_rho is None
            else warm_rho)
    z0 = jnp.clip(matvec(x0), lb_f, ub_f)

    def segment(carry, minv_prev, rho_of_minv, seg_iters):
        x, z, y, rho = carry
        rho_vec = jnp.where(eq, rho * settings.rho_eq_scale, rho)
        if kkt_fused is not None:
            m_mat = kkt_fused(pbar, sigma, rho_vec)
        else:
            m_mat = pbar + sigma * eye_n + rmatvec_dense(rho_vec)
        if minv_prev is not None:
            # M scales ~ rho when the constraint term dominates, so rescale
            # the warm inverse by the rho ratio before refining
            minv_prev = minv_prev * (rho_of_minv / rho)
        kkt_solve, minv = _make_kkt_solve(m_mat, settings, minv_prev)

        def make_body(solve_fn):
            def body(_, c4):
                x, z, y = c4
                rhs = sigma * x - qbar + rmatvec(rho_vec * z - y)
                x_t = solve_fn(rhs)
                z_t = matvec(x_t)
                x_new = alpha * x_t + (1.0 - alpha) * x
                z_mid = alpha * z_t + (1.0 - alpha) * z
                z_new = jnp.clip(z_mid + y / rho_vec, lb_f, ub_f)
                y_new = y + rho_vec * (z_mid - z_new)
                return x_new, z_new, y_new
            return body

        x, z, y = jax.lax.fori_loop(0, seg_iters,
                                    make_body(kkt_solve), (x, z, y))

        # adaptive rho (OSQP eq. 5.2): relative primal/dual residual ratio
        cx = matvec(x)
        eps = jnp.asarray(1e-15, dtype)
        prim = (jnp.max(jnp.abs(cx - z))
                / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(cx)),
                                          jnp.max(jnp.abs(z))), eps))
        px = pbar @ x
        cty = rmatvec(y)
        dual = (jnp.max(jnp.abs(px + qbar + cty))
                / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(px)),
                              jnp.maximum(jnp.max(jnp.abs(qbar)),
                                          jnp.max(jnp.abs(cty)))), eps))
        # OSQP guard: adapt only when residuals are >5x out of balance, and
        # bound the per-segment change (prevents rho collapse on problems
        # whose dual converges first)
        factor = jnp.sqrt(prim / jnp.maximum(dual, eps))
        fmax = settings.adapt_factor_max
        factor = jnp.clip(factor, 1.0 / fmax, fmax)
        factor = jnp.where((factor > 5.0) | (factor < 0.2), factor, 1.0)
        # freeze rho once converged (see adapt_tol)
        factor = jnp.where(jnp.maximum(prim, dual) > settings.adapt_tol,
                           factor, 1.0)
        rho_new = jnp.clip(rho * factor, settings.rho_min, settings.rho_max)
        return (x, z, y, rho_new), minv, rho

    # segments unrolled so the Schulz inverse warm-carries across the rho
    # updates (first segment cold, later ones a few refinement matmuls)
    carry = (x0, z0, y0, rho0)
    minv = None
    rho_of_minv = rho0
    for k in range(settings.segments):
        iters_k = (settings.first_seg_iters
                   if (k == 0 and settings.first_seg_iters > 0)
                   else settings.seg_iters)
        carry, minv, rho_of_minv = segment(carry, minv, rho_of_minv,
                                           iters_k)
    x, z, y, rho = carry

    # polish/refine are POST-processes on the returned solution; the warm
    # carry keeps the raw ADMM iterates, exactly like OSQP's polish never
    # overwrites the workspace iterates it warm-starts from (polish zeroes
    # inactive duals — restarting ADMM from those re-pays the dual search,
    # measured as a 10x warm-tick tracking lag on post-transition ticks)
    x_admm, y_admm = x, y
    if settings.polish:
        x, y = _polish(pbar, qbar, lb, ub, lb_f, ub_f, eq, matvec, rmatvec,
                       rmatvec_dense, x, y, settings, minv)
        z = jnp.clip(matvec(x), lb_f, ub_f)

    if settings.refine_f64 and dtype != jnp.float64:
        if jnp.zeros((), "float64").dtype != jnp.dtype("float64"):
            # jax silently downcasts f64 arrays when x64 is off, which
            # would turn the "strict 1e-3 parity" refinement into a no-op
            # that reports success — fail loudly instead (trace time)
            raise RuntimeError(
                "ADMMSettings.refine_f64 requires jax x64 "
                "(jax.config.update('jax_enable_x64', True)); without it "
                "the float64 refinement would silently run in float32")
        else:
            x64, y64 = _polish(
                pbar.astype(jnp.float64), qbar.astype(jnp.float64),
                lb.astype(jnp.float64), ub.astype(jnp.float64),
                lb_f.astype(jnp.float64), ub_f.astype(jnp.float64), eq,
                matvec, rmatvec,
                lambda w: rmatvec_dense(w.astype(dtype)).astype(jnp.float64),
                x.astype(jnp.float64), y.astype(jnp.float64),
                settings._replace(polish_iters=4, polish_solver="inv"))
            x = x64.astype(dtype)
            y = y64.astype(dtype)
            z = jnp.clip(matvec(x), lb_f, ub_f)

    # non-finite latch: a diverged scenario in a batch must not poison
    # downstream consumers (the controller additionally NaN-guards,
    # A1RobotControl.cpp:558-561)
    finite = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    x = jnp.where(finite, x, jnp.zeros_like(x))
    y = jnp.where(finite, y, jnp.zeros_like(y))
    z = jnp.where(finite, z, jnp.zeros_like(z))

    y_out = y / cost
    primal = jnp.max(jnp.abs(matvec(x) - z))
    dual = jnp.max(jnp.abs(hessian @ x + gradient + rmatvec(y_out)))
    big = jnp.asarray(1e6, x.dtype)
    primal = jnp.where(finite, primal, big)
    dual = jnp.where(finite, dual, big)
    sol = ADMMSolution(x=x, y=y_out, z=z, rho=rho,
                       primal_res=primal, dual_res=dual)
    if return_warm:
        n = x.shape[-1]
        minv_out = (minv if minv is not None
                    else jnp.eye(n, dtype=x.dtype))
        if minv is not None:
            # the carried inverse must correspond to the carried rho: the
            # last segment's factorization was built at rho_of_minv, but
            # the final adaptation may have moved rho — rescale by the
            # ratio (valid where the constraint term dominates; the warm
            # path's Schulz safeguard absorbs the rest), mirroring the
            # inter-segment rescale above
            minv_out = minv_out * (rho_of_minv / rho)
        x_c = jnp.where(finite, x_admm, jnp.zeros_like(x_admm))
        y_c = jnp.where(finite, y_admm / cost, jnp.zeros_like(y_admm))
        return sol, WarmState(x=x_c, y=y_c, rho=rho, minv=minv_out)
    return sol


def _polish(pbar, qbar, lb, ub, lb_f, ub_f, eq, matvec, rmatvec,
            rmatvec_dense, x, y, settings, warm_minv=None):
    """Masked active-set refinement (fixed-shape OSQP polish).

    Detects the active set from dual signs, then runs a few
    augmented-Lagrangian passes of the equality-constrained problem
    restricted to those rows. The mask keeps shapes static so the whole
    thing vmaps. Scaled quantities in, scaled dual out.
    """
    dtype = x.dtype
    n = x.shape[-1]
    delta = 1e-6 * jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
    # a row is active only if BOTH the dual says so AND the ADMM iterate
    # sits near that bound — dual noise alone must not pin constraints
    cx = matvec(x)
    scale_b = 1.0 + jnp.maximum(jnp.abs(lb_f), jnp.abs(ub_f))
    near_lb = (cx - lb_f) < 1e-3 * scale_b
    near_ub = (ub_f - cx) < 1e-3 * scale_b
    act_low = (y < -delta) & jnp.isfinite(lb) & near_lb
    act_up = (y > delta) & jnp.isfinite(ub) & near_ub
    act = (act_low | act_up | eq)
    d = act.astype(dtype)
    bvals = jnp.where(act_up, ub_f, lb_f) * d   # masked: inactive rows -> 0

    rho_p = jnp.asarray(settings.polish_rho, dtype)
    m_mat = (pbar + settings.sigma * jnp.eye(n, dtype=dtype)
             + rmatvec_dense(rho_p * d))
    # the polish matrix (active-set penalty, rho_p x |P|) is much worse
    # conditioned than the ADMM KKT — solved with its own solver choice
    kkt_solve, _ = _make_kkt_solve(m_mat, settings, None,
                                   solver=settings.polish_solver)

    def body(carry, _):
        x, nu = carry
        rhs = -qbar + rmatvec(d * (rho_p * bvals - nu))
        x_new = kkt_solve(rhs + settings.sigma * x)
        nu_new = nu + rho_p * d * (matvec(x_new) - bvals)
        return (x_new, nu_new), None

    (x_p, nu), _ = jax.lax.scan(body, (x, jnp.zeros_like(y)), None,
                                length=settings.polish_iters)
    # accept polish only if it (a) did not lose feasibility (tolerance
    # scaled by the active bound magnitudes, NOT the inf-capped bounds) and
    # (b) did not regress the objective — a wrong, over-restrictive active
    # set yields a feasible but worse point that must be rejected
    viol_p = jnp.maximum(jnp.max(matvec(x_p) - ub_f),
                         jnp.max(lb_f - matvec(x_p)))
    viol_0 = jnp.maximum(jnp.max(matvec(x) - ub_f),
                         jnp.max(lb_f - matvec(x)))
    tol = 1e-5 * (1.0 + jnp.max(jnp.abs(bvals)))

    def obj(v):
        return 0.5 * v @ (pbar @ v) + qbar @ v

    obj_tol = 1e-6 * (1.0 + jnp.abs(obj(x)))
    ok = ((viol_p <= jnp.maximum(viol_0, tol))
          & (obj(x_p) <= obj(x) + obj_tol))
    x_out = jnp.where(ok, x_p, x)
    y_out = jnp.where(ok, d * nu, y)
    return x_out, y_out


@f32_matmuls
def solve_warm(hessian, gradient, lb, ub, matvec, rmatvec, rmatvec_dense,
               settings, warm, warm_mu=None):
    """One warm tick: refine the carried inverse, run one ADMM segment.

    The production cadence: consecutive control ticks solve nearly
    identical QPs (foot positions move millimeters at 500 Hz), so the
    previous tick's KKT inverse is a few Schulz refinement matmuls away
    from the new one, and the primal/dual warm starts put ADMM deep inside
    its convergence region. Mirrors how the reference reuses its OSQP
    instance with updateHessian/Gradient/Bounds (A1RobotControl.cpp:533-540).

    Args:
      warm: WarmState from the previous tick (build the first one with
        :func:`solve` + :func:`warm_state_from_solution`).
      rmatvec_dense: as in :func:`solve`; pass None to use the fused
        single-pass friction-pyramid KKT build (MPC problems only).
      warm_mu: friction coefficient for the fused build (rmatvec_dense
        is None); defaults to the package constant.

    Returns:
      (ADMMSolution, next WarmState).

    Caveat: a contact flip changes the equality pattern and hence the KKT
    matrix by the rho_eq boost; the Schulz safeguard then falls back to a
    cold start that ``schulz_refine`` steps cannot fully converge, so the
    tick AFTER a gait transition solves with a degraded inverse (self-heals
    over the next ticks). At trot cadence that is <1% of ticks; run a full
    :func:`solve` on transition ticks if that tick's accuracy matters.
    """
    n = gradient.shape[-1]
    dtype = gradient.dtype
    eye_n = jnp.eye(n, dtype=dtype)
    cost = 1.0 / jnp.maximum(jnp.max(jnp.abs(hessian)), 1e-12)
    pbar = cost * hessian
    qbar = cost * gradient
    eq = jnp.isclose(lb, ub)
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    lb_f = jnp.maximum(lb, -big)
    ub_f = jnp.minimum(ub, big)
    sigma = settings.sigma

    rho = warm.rho
    rho_vec = jnp.where(eq, rho * settings.rho_eq_scale, rho)
    if rmatvec_dense is None:   # MPC pyramid: fused single-pass KKT build
        from go1_qp_mpc_controller_tpu.config import params as P
        mu = P.MPC_MU if warm_mu is None else warm_mu
        m_mat = _pyramid_kkt_fused(pbar, sigma, rho_vec, mu)
    else:
        m_mat = pbar + sigma * eye_n + rmatvec_dense(rho_vec)
    minv = _schulz_refine_warm(m_mat, warm.minv, settings.schulz_refine)
    return _warm_finish(minv, hessian, gradient, cost, qbar, lb_f, ub_f,
                        rho, rho_vec, matvec, rmatvec, warm, settings)


def _warm_finish(minv, hessian, gradient, cost, qbar, lb_f, ub_f, rho,
                 rho_vec, matvec, rmatvec, warm, settings):
    """Shared warm-tick tail: fixed ADMM iterations + NaN latch + packaging.

    ``hessian`` may be a MATVEC callable v -> H v (LazyCondensedQP path)
    — it is only consumed by the dual-residual diagnostic (XLA dead-code-
    eliminates it when callers ignore the residuals) and the
    adapt_warm_rho adaptation, neither of which then materializes H.
    """
    alpha = settings.alpha
    sigma = settings.sigma
    x = warm.x
    y = warm.y * cost
    z = jnp.clip(matvec(x), lb_f, ub_f)

    def plain(x, z, y):
        rhs = sigma * x - qbar + rmatvec(rho_vec * z - y)
        x_t = minv @ rhs
        z_t = matvec(x_t)
        x_new = alpha * x_t + (1.0 - alpha) * x
        z_mid = alpha * z_t + (1.0 - alpha) * z
        z_new = jnp.clip(z_mid + y / rho_vec, lb_f, ub_f)
        y_new = y + rho_vec * (z_mid - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(
        0, settings.seg_iters, lambda _, c3: plain(*c3), (x, z, y))

    finite = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    x = jnp.where(finite, x, jnp.zeros_like(x))
    y = jnp.where(finite, y, jnp.zeros_like(y))
    z = jnp.where(finite, z, jnp.zeros_like(z))

    y_out = y / cost
    cx = matvec(x)
    cty = rmatvec(y_out)
    # `hessian` may be a matvec callable (the LazyCondensedQP path: the
    # dual-residual diagnostic and the adapt_warm_rho program then never
    # materialize the (n, n) Hessian) or a dense matrix
    px = hessian(x) if callable(hessian) else hessian @ x
    primal = jnp.max(jnp.abs(cx - z))
    dual = jnp.max(jnp.abs(px + gradient + cty))
    sol = ADMMSolution(x=x, y=y_out, z=z, rho=rho,
                       primal_res=jnp.where(finite, primal, 1e6),
                       dual_res=jnp.where(finite, dual, 1e6))
    rho_out = rho
    minv_out = minv
    if settings.adapt_warm_rho:
        # OSQP's residual-ratio adaptation at tick cadence (see the
        # ADMMSettings flag): same rule/guards as solve()'s inter-segment
        # adaptation; the carried inverse is rescaled by the rho ratio
        # and the next tick's Schulz refinement absorbs the rest
        eps = jnp.asarray(1e-15, x.dtype)
        prim_rel = (primal
                    / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(cx)),
                                              jnp.max(jnp.abs(z))), eps))
        dual_rel = (dual
                    / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(px)),
                                  jnp.maximum(jnp.max(jnp.abs(gradient)),
                                              jnp.max(jnp.abs(cty)))),
                                  eps))
        # deadband on the RAW ratio, then clip: with a tight
        # adapt_factor_max (the cold-carry cap, < 5) the old
        # clip-then-deadband order would gate every clipped factor
        # through the (>5 | <0.2) test and freeze adaptation entirely;
        # for fmax >= 5 the two orders are equivalent
        raw = jnp.sqrt(prim_rel / jnp.maximum(dual_rel, eps))
        fmax = settings.adapt_factor_max
        factor = jnp.where((raw > 5.0) | (raw < 0.2),
                           jnp.clip(raw, 1.0 / fmax, fmax), 1.0)
        factor = jnp.where(
            jnp.maximum(prim_rel, dual_rel) > settings.adapt_tol,
            factor, 1.0)
        factor = jnp.where(finite, factor, 1.0)
        rho_out = jnp.clip(rho * factor, settings.rho_min,
                           settings.rho_max)
        minv_out = minv * (rho / rho_out)
    return sol, WarmState(x=x, y=y_out, rho=rho_out, minv=minv_out)


# NOTE (r4): the a-priori `warm_basin_ok` probe (a controller-facing
# twin of the in-solver Schulz safeguard: one fused KKT build + one
# HIGHEST (n, n) matmul per scenario per tick) was removed — the
# controller now health-checks the warm solve's OWN residuals after the
# fact (ctrl/controller.py _unhealthy) and re-solves flagged scenarios
# cold through the compact overlay, which costs nothing on healthy
# ticks (the probe cost ~2.7 ms/tick at batch 4096 to guard a p50
# 1-3 scenarios/tick failure mode) and additionally catches
# finite-garbage solutions the acceptance signature cannot see.


def _fused_balanced_kkt(lazy, rho_vec, sigma, mu):
    """Jacobi-balanced KKT of a LazyCondensedQP in one fused output pass.

    Returns (m_b, s, cost): the balanced KKT, the balancing scale, and the
    cost normalization (see solve_warm_fused).
    """
    from go1_qp_mpc_controller_tpu.models import srb as srb_mod

    dtype = lazy.gradient.dtype
    n = lazy.gradient.shape[-1]
    hess = srb_mod.lazy_hessian(lazy)
    cost = 1.0 / jnp.maximum(jnp.max(jnp.abs(hess)), 1e-12)
    main, off1, off2 = _pyramid_band_diags(rho_vec, mu)
    h_diag = srb_mod.lazy_hessian_diag(lazy)
    s = jax.lax.rsqrt(cost * h_diag + main + sigma)
    band = _band_expr(main, off1, off2, sigma, n, dtype)
    m_b = (cost * hess + band) * s[:, None] * s[None, :]
    return m_b, s, cost


@f32_matmuls
def solve_warm_fused(lazy, warm, settings, mu):
    """Warm tick over a LazyCondensedQP: the Hessian is NEVER materialized.

    Fuses condensation output -> cost scaling -> friction-pyramid KKT band
    -> Jacobi balancing into a single (n, n) output write (the balanced
    KKT M_b), where :func:`solve_warm` pays separate HBM round trips for
    the hessian, pbar, m_mat, and the balance. Same mathematics as
    :func:`solve_warm` with the fused pyramid build (rmatvec_dense=None);
    only fp reassociation differs.
    """
    from go1_qp_mpc_controller_tpu.models import srb as srb_mod

    dtype = lazy.gradient.dtype
    hess = lambda v: srb_mod.lazy_hessian_matvec(lazy, v)
    eq = jnp.isclose(lazy.lb, lazy.ub)
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    lb_f = jnp.maximum(lazy.lb, -big)
    ub_f = jnp.minimum(lazy.ub, big)

    matvec = functools.partial(srb_mod.constraint_matvec, mu=mu)
    rmatvec = functools.partial(srb_mod.constraint_rmatvec, mu=mu)

    rho = warm.rho
    rho_vec = jnp.where(eq, rho * settings.rho_eq_scale, rho)
    # schulz_l0_refine > 0 selects the ROBUST warm tick: the refinement
    # runs the full scaled schedule for that lower edge, so a
    # basin-REJECTED carry (contact flip changed the eq-boost pattern,
    # post-latch garbage) rebuilds a proper inverse inside the same
    # fixed-shape program — per scenario, while accepted carries run
    # plain Newton and converge immediately. The short schulz_refine
    # schedule stays the steady-cadence fast path.
    if _resolved_impl(settings, dtype) == "pallas":
        # fused-KKT kernel route: the KKT never exists in HBM — the
        # kernel builds it from the lazy factors and runs the schedule
        # VMEM-resident (see _pallas_kkt_schulz_fns)
        tiled4, dmain, off1, off2, cost = _kkt_kernel_operands(
            lazy, rho_vec, settings.sigma, mu)
        qbar = cost * lazy.gradient
        coeffs = (_scaled_schulz_coeffs(settings.schulz_l0_refine)
                  if settings.schulz_l0_refine > 0
                  else (1.0,) * settings.schulz_refine)
        _, warm_fn = _pallas_kkt_schulz_fns(
            coeffs, 0, hi_tail=settings.schulz_hi_tail,
            tile=settings.schulz_tile)
        minv = warm_fn(tiled4, dmain, off1, off2, cost, warm.minv)
        return _warm_finish(minv, hess, lazy.gradient, cost, qbar, lb_f,
                            ub_f, rho, rho_vec, matvec, rmatvec, warm,
                            settings)
    m_b, s, cost = _fused_balanced_kkt(lazy, rho_vec, settings.sigma, mu)
    qbar = cost * lazy.gradient
    if settings.schulz_l0_refine > 0:
        coeffs = _scaled_schulz_coeffs(settings.schulz_l0_refine)
        minv = _schulz_iterate_balanced(m_b, s, 0, warm.minv,
                                        coeffs=coeffs)
    else:
        minv = _schulz_iterate_balanced(m_b, s, settings.schulz_refine,
                                        warm.minv)
    return _warm_finish(minv, hess, lazy.gradient, cost, qbar, lb_f, ub_f,
                        rho, rho_vec, matvec, rmatvec, warm, settings)


def mpc_rho0_analytic(contacts, mu, foot_pos):
    """Analytic per-scenario ADMM rho0 for FRESH condensed-MPC solves.

    Replaces the rho-probing first segment of the r2-r4 cold schedule
    (20 iterations at the generic rho = 0.1, whose Schulz inverse was
    then discarded) with a closed-form estimate, enabling the
    single-segment :func:`solve_cold_fused` program (VERDICT r5 item 1).

    Structure, measured on TPU (batch-4096 random sweep scenarios, r5;
    validated on a held-out seed):

    - For statically BALANCEABLE contact patterns — 3-4 stance legs, or
      the two diagonal pairs (FL+RR / FR+RL, the trot stances) — OSQP's
      residual-ratio rule drives rho to the 1e-3 floor in >76% of
      scenarios (91% for diagonal pairs): after cost scaling the active
      curvature is dominated by the r_weights ~1e-6 flat directions, so
      the dual residual rules. rho0 = rho_min = 1e-3.
    - For SIDE pairs (front/rear/left/right two-leg stances — statically
      unbalanceable, so the fz caps and friction cones activate and the
      primal residual matters) the adapted rho spreads over [1e-3, 3]
      with log10(rho) ~= 4.2 - 6.0 mu - 9.9 height (residual 0.6
      decades; mu is by far the strongest feature, r = -0.76). These
      patterns never occur in trot production; they exist in the random
      sweep distribution.

    Single-segment accuracy at this rho0 vs a tight polished reference
    (batch 4096, 40 iterations): p50 0.35 / p90 4.2 N overall — better
    than the 2-segment probing schedule's 1.08 / 8.9 — with the side-
    pair subclass at p50 2.9 / p90 24 (vs 1.8 / 12.6; the predictor's
    0.6-decade scatter) bounded by the fz <= 180 N box.

    Args:
      contacts: (4,) bool, leg order FL, FR, RL, RR (A1CtrlStates.h
        convention).
      mu: () friction coefficient.
      foot_pos: (4, 3) foot positions relative to CoM (world-aligned).

    Returns:
      () rho0 in [1e-3, 1].
    """
    cb = contacts.astype(bool)
    cf = contacts.astype(foot_pos.dtype)
    balanceable = ((jnp.sum(cb) >= 3) | (cb[0] & cb[3]) | (cb[1] & cb[2]))
    height = -jnp.sum(foot_pos[:, 2] * cf) / jnp.maximum(jnp.sum(cf), 1.0)
    side = jnp.power(jnp.asarray(10.0, foot_pos.dtype),
                     4.2 - 6.0 * mu - 9.9 * height)
    return jnp.where(balanceable, jnp.asarray(1e-3, foot_pos.dtype),
                     jnp.clip(side, 1e-3, 1.0))


@f32_matmuls
def solve_cold_fused(lazy, settings, mu, rho0):
    """Fresh cold MPC solve as ONE fused single-segment program.

    The r2-r4 cold path (segmented :func:`solve`) spent a 20-iteration
    probing segment at a generic rho0 plus a second Schulz schedule to
    re-invert at the adapted rho, with the Hessian materialized and the
    KKT built/balanced in separate HBM passes. With
    :func:`mpc_rho0_analytic` supplying a per-scenario rho0, the whole
    solve collapses to:

      fused condensation -> balanced KKT (one output pass,
      :func:`_fused_balanced_kkt`) -> ONE scaled Newton-Schulz schedule
      in the VMEM Pallas kernel -> seg_iters ADMM iterations ->
      end-of-solve rho adaptation for the carry (the same OSQP rule the
      segmented path applies between segments).

    Measured (TPU v5e, batch 4096, scan-amortized): ~31 ms per cold
    solve (131.9k solves/s with the fused-KKT kernel route) vs the
    segmented schedule's ~52 ms, with accuracy BETTER than the
    segmented schedule (see mpc_rho0_analytic).
    Models the reference's fresh-ConvexMpc-per-call + first-init OSQP
    cadence (A1RobotControl.cpp:447, :522-531).

    Args:
      lazy: srb.LazyCondensedQP.
      settings: ADMMSettings; seg_iters is the single segment's budget,
        schulz_l0 the cold schedule edge (1e-6 default provisioning).
      mu: () friction coefficient.
      rho0: () initial rho (from :func:`mpc_rho0_analytic`).

    Returns:
      (ADMMSolution, WarmState) — carry semantics as :func:`solve` with
      return_warm=True.
    """
    from go1_qp_mpc_controller_tpu.models import srb as srb_mod

    dtype = lazy.gradient.dtype
    hess = lambda v: srb_mod.lazy_hessian_matvec(lazy, v)
    eq = jnp.isclose(lazy.lb, lazy.ub)
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    lb_f = jnp.maximum(lazy.lb, -big)
    ub_f = jnp.minimum(lazy.ub, big)
    matvec = functools.partial(srb_mod.constraint_matvec, mu=mu)
    rmatvec = functools.partial(srb_mod.constraint_rmatvec, mu=mu)

    rho = jnp.asarray(rho0, dtype)
    rho_vec = jnp.where(eq, rho * settings.rho_eq_scale, rho)

    l0 = settings.schulz_l0 if settings.schulz_l0 > 0 else 1e-6
    coeffs = _scaled_schulz_coeffs(l0)
    if _resolved_impl(settings, dtype) == "pallas":
        # fused-KKT kernel route: condensation factors in, inverse out
        # (see _pallas_kkt_schulz_fns) — the (n, n) KKT never exists in
        # HBM and the XLA band/balance chain is gone
        tiled4, dmain, off1, off2, cost = _kkt_kernel_operands(
            lazy, rho_vec, settings.sigma, mu)
        qbar = cost * lazy.gradient
        cold_fn, _ = _pallas_kkt_schulz_fns(
            coeffs, 0, hi_tail=settings.schulz_hi_tail,
            tile=settings.schulz_tile)
        minv = cold_fn(tiled4, dmain, off1, off2, cost)
    else:
        m_b, s, cost = _fused_balanced_kkt(lazy, rho_vec, settings.sigma,
                                           mu)
        qbar = cost * lazy.gradient
        minv = _schulz_iterate_balanced(m_b, s, 0, None, coeffs=coeffs)

    warm0 = WarmState(x=jnp.zeros_like(lazy.gradient),
                      y=jnp.zeros_like(lazy.lb), rho=rho, minv=minv)
    # End-of-solve rho adaptation for the CARRY, capped at 2x per solve:
    # the carried inverse is rescaled by the rho ratio, and a 2x-off
    # inverse sits safely inside the warm tick's Schulz basin (row-sum
    # signature < 3.0) where one plain refine step absorbs it — an
    # uncapped jump (the residual-ratio rule asks for up to 100x when
    # the analytic rho0 missed, e.g. mispredicted side pairs) rescales
    # minv far outside the basin and poisons the whole warm chain
    # (measured: forces collapse to ~0.5 N within one 15-iteration
    # tick). CONSISTENCY of the (rho, minv) pair beats rho optimality:
    # ADMM converges at any rho, just slower, and the next ticks'
    # capped adaptations walk rho the rest of the way.
    return _warm_finish(minv, hess, lazy.gradient, cost, qbar, lb_f,
                        ub_f, rho, rho_vec, matvec, rmatvec, warm0,
                        settings._replace(
                            adapt_warm_rho=True,
                            adapt_factor_max=min(settings.adapt_factor_max,
                                                 2.0)))


@f32_matmuls
def solve_segmented_fused(lazy, settings, mu, warm):
    """SEGMENTED transition solve over a LazyCondensedQP.

    The mathematics of :func:`solve` (warm-started primal/dual,
    per-segment KKT refactorization at the adapting rho, OSQP's
    inter-segment residual-ratio rule) restructured on the lazy
    condensation factors: on the pallas route each segment's KKT is
    built INSIDE the Schulz kernel (_pallas_kkt_schulz_fns) and never
    exists in HBM — the controller's gait-transition / compact-overlay
    cold branch is the consumer (ctrl/controller.py _grf_branches),
    where :func:`solve` paid a materialized Hessian plus ~7 HBM passes
    of KKT build per segment. Polish is NOT implemented (the production
    transition settings run polish=False; polished settings keep the
    dense :func:`solve` path).

    Args:
      lazy: srb.LazyCondensedQP.
      settings: ADMMSettings (polish must be False; refine_f64 ignored).
      mu: () friction coefficient.
      warm: WarmState carry — x/y/rho are consumed like solve()'s
        warm_x/warm_y/warm_rho (the carried minv is NOT: a transition
        changed the equality pattern, so each segment re-inverts, first
        segment cold exactly like solve()).

    Returns:
      (ADMMSolution, WarmState) matching solve(..., return_warm=True).
    """
    from go1_qp_mpc_controller_tpu.models import srb as srb_mod

    if settings.polish:
        raise ValueError("solve_segmented_fused does not implement "
                         "polish; use mpc_solve on the dense QP")
    dtype = lazy.gradient.dtype
    eq = jnp.isclose(lazy.lb, lazy.ub)
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    lb_f = jnp.maximum(lazy.lb, -big)
    ub_f = jnp.minimum(lazy.ub, big)
    matvec = functools.partial(srb_mod.constraint_matvec, mu=mu)
    rmatvec = functools.partial(srb_mod.constraint_rmatvec, mu=mu)
    hess_mv = lambda v: srb_mod.lazy_hessian_matvec(lazy, v)

    h_diag = srb_mod.lazy_hessian_diag(lazy)
    cost = 1.0 / jnp.maximum(jnp.max(h_diag), 1e-12)
    qbar = cost * lazy.gradient
    alpha = settings.alpha
    sigma = settings.sigma
    impl = _resolved_impl(settings, dtype)

    x = warm.x
    y = warm.y * cost
    rho = warm.rho
    z = jnp.clip(matvec(x), lb_f, ub_f)
    minv = None
    rho_of_minv = rho
    eps = jnp.asarray(1e-15, dtype)

    for k in range(settings.segments):
        iters_k = (settings.first_seg_iters
                   if (k == 0 and settings.first_seg_iters > 0)
                   else settings.seg_iters)
        rho_vec = jnp.where(eq, rho * settings.rho_eq_scale, rho)
        # schedule-edge selection mirrors _make_kkt_solve
        if k == 0:
            l0 = settings.schulz_l0_first or settings.schulz_l0
        else:
            l0 = settings.schulz_l0_refine or settings.schulz_l0
        coeffs = (_scaled_schulz_coeffs(l0) if l0 > 0
                  else (1.0,) * settings.schulz_iters)
        if minv is not None:
            minv = minv * (rho_of_minv / rho)
        if impl == "pallas":
            tiled4, dmain, off1, off2, cost_k = _kkt_kernel_operands(
                lazy, rho_vec, sigma, mu)
            cold_fn, warm_fn = _pallas_kkt_schulz_fns(
                coeffs, 0, hi_tail=settings.schulz_hi_tail,
                tile=settings.schulz_tile)
            minv = (cold_fn(tiled4, dmain, off1, off2, cost_k)
                    if minv is None
                    else warm_fn(tiled4, dmain, off1, off2, cost_k,
                                 minv))
        else:
            n = lazy.gradient.shape[-1]
            hess = srb_mod.lazy_hessian(lazy)
            main, o1, o2 = _pyramid_band_diags(rho_vec, mu)
            m_mat = cost * hess + _band_expr(main, o1, o2, sigma, n,
                                             dtype)
            minv = _schulz_inverse(m_mat, settings.schulz_iters, minv,
                                   coeffs)
        rho_of_minv = rho

        def body(_, c3, minv=minv, rho_vec=rho_vec):
            x, z, y = c3
            rhs = sigma * x - qbar + rmatvec(rho_vec * z - y)
            x_t = minv @ rhs
            z_t = matvec(x_t)
            x_new = alpha * x_t + (1.0 - alpha) * x
            z_mid = alpha * z_t + (1.0 - alpha) * z
            z_new = jnp.clip(z_mid + y / rho_vec, lb_f, ub_f)
            y_new = y + rho_vec * (z_mid - z_new)
            return x_new, z_new, y_new

        x, z, y = jax.lax.fori_loop(0, iters_k, body, (x, z, y))

        # OSQP inter-segment adaptation (solve()'s rule)
        cx = matvec(x)
        prim = (jnp.max(jnp.abs(cx - z))
                / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(cx)),
                                          jnp.max(jnp.abs(z))), eps))
        px = cost * hess_mv(x)
        cty = rmatvec(y)
        dual = (jnp.max(jnp.abs(px + qbar + cty))
                / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(px)),
                              jnp.maximum(jnp.max(jnp.abs(qbar)),
                                          jnp.max(jnp.abs(cty)))), eps))
        factor = jnp.sqrt(prim / jnp.maximum(dual, eps))
        fmax = settings.adapt_factor_max
        factor = jnp.clip(factor, 1.0 / fmax, fmax)
        factor = jnp.where((factor > 5.0) | (factor < 0.2), factor, 1.0)
        factor = jnp.where(jnp.maximum(prim, dual) > settings.adapt_tol,
                           factor, 1.0)
        rho = jnp.clip(rho * factor, settings.rho_min, settings.rho_max)

    finite = jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(y))
    x = jnp.where(finite, x, jnp.zeros_like(x))
    y = jnp.where(finite, y, jnp.zeros_like(y))
    z = jnp.where(finite, z, jnp.zeros_like(z))
    y_out = y / cost
    primal = jnp.max(jnp.abs(matvec(x) - z))
    dual_r = jnp.max(jnp.abs(hess_mv(x) + lazy.gradient
                             + rmatvec(y_out)))
    bigr = jnp.asarray(1e6, dtype)
    sol = ADMMSolution(x=x, y=y_out, z=z, rho=rho,
                       primal_res=jnp.where(finite, primal, bigr),
                       dual_res=jnp.where(finite, dual_r, bigr))
    minv_out = minv * (rho_of_minv / rho)
    return sol, WarmState(x=x, y=y_out, rho=rho, minv=minv_out)


def mpc_solve_cold(lazy_qp, settings=ADMMSettings(), mu=None, rho0=None,
                   contacts=None, foot_pos=None):
    """Fresh cold MPC solve over a srb.LazyCondensedQP (see
    :func:`solve_cold_fused`). Computes the analytic rho0 from
    (contacts, mu, foot_pos) unless ``rho0`` is given directly."""
    from go1_qp_mpc_controller_tpu.config import params as P
    mu = P.MPC_MU if mu is None else mu
    if rho0 is None:
        if contacts is None or foot_pos is None:
            raise ValueError(
                "mpc_solve_cold needs either rho0 or BOTH contacts and "
                "foot_pos (to compute the analytic rho0)")
        rho0 = mpc_rho0_analytic(contacts, mu, foot_pos)
    return solve_cold_fused(lazy_qp, settings, mu, rho0)


def warm_state_from_solution(sol, minv_seed=None, n=None, dtype=None):
    """Build a WarmState after a cold :func:`solve`.

    The cold path does not expose its internal inverse, so seed with
    ``minv_seed`` if available, else identity (the first warm tick's
    Schulz refinement starts safeguarded-cold).
    """
    n = sol.x.shape[-1] if n is None else n
    dtype = sol.x.dtype if dtype is None else dtype
    minv = (jnp.eye(n, dtype=dtype) if minv_seed is None else minv_seed)
    return WarmState(x=sol.x, y=sol.y, rho=sol.rho, minv=minv)


# ------------------- MPC-specialized entry points -------------------------

def _pyramid_ctc_dense(w, mu, dtype):
    """C' diag(w) C for the friction pyramid: block-diag 3x3 per (step, leg).

    Rows per block: (fx±mu fz)x2, (fy±mu fz)x2, fz. For weights
    w = (w0..w4):
      [[w0+w1,      0,          mu(w0-w1)],
       [0,          w2+w3,      mu(w2-w3)],
       [mu(w0-w1),  mu(w2-w3),  mu^2(w0+w1+w2+w3) + w4]]
    """
    wb = w.reshape(-1, 5)               # (40, 5)
    w0, w1, w2, w3, w4 = (wb[:, 0], wb[:, 1], wb[:, 2], wb[:, 3], wb[:, 4])
    zero = jnp.zeros_like(w0)
    d_x = w0 + w1
    d_y = w2 + w3
    o_x = mu * (w0 - w1)
    o_y = mu * (w2 - w3)
    d_z = mu * mu * (w0 + w1 + w2 + w3) + w4
    # The 3x3 blocks live on three strided diagonals: main (dx, dy, dz
    # interleaved), +-1 (the yz coupling at offset (3k+1, 3k+2)), and +-2
    # (the xz coupling at (3k, 3k+2)). Three jnp.diag constructions beat a
    # 14k-element scatter by a wide margin on TPU.
    main = jnp.stack([d_x, d_y, d_z], axis=-1).reshape(-1)       # (120,)
    off1 = jnp.stack([zero, o_y, zero], axis=-1).reshape(-1)[:-1]
    off2 = jnp.stack([o_x, zero, zero], axis=-1).reshape(-1)[:-2]
    out = (jnp.diag(main) + jnp.diag(off1, 1) + jnp.diag(off1, -1)
           + jnp.diag(off2, 2) + jnp.diag(off2, -2))
    return out.astype(dtype)


def _pyramid_band_diags(w, mu):
    """The three diagonals of C' diag(w) C for the friction pyramid.

    Returns (main, off1, off2): the main diagonal, the (3k+1, 3k+2) yz
    coupling stored at its minimum index, and the (3k, 3k+2) xz coupling.
    """
    wb = w.reshape(-1, 5)
    w0, w1, w2, w3, w4 = (wb[:, 0], wb[:, 1], wb[:, 2], wb[:, 3], wb[:, 4])
    main = jnp.stack([w0 + w1, w2 + w3,
                      mu * mu * (w0 + w1 + w2 + w3) + w4],
                     axis=-1).reshape(-1)                       # (n,)
    off1 = jnp.stack([jnp.zeros_like(w0), mu * (w2 - w3),
                      jnp.zeros_like(w0)], axis=-1).reshape(-1)  # at min idx
    off2 = jnp.stack([mu * (w0 - w1), jnp.zeros_like(w0),
                      jnp.zeros_like(w0)], axis=-1).reshape(-1)
    return main, off1, off2


def _band_expr(main, off1, off2, sigma, n, dtype):
    """(n, n) band matrix sigma I + C' diag(w) C from its three diagonals,
    via broadcasted-iota masks (fuses into the consumer's output pass)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    band = (jnp.where(ii == jj, main[:, None] + sigma, 0.0)
            + jnp.where(jj == ii + 1, off1[:, None], 0.0)
            + jnp.where(ii == jj + 1, off1[None, :], 0.0)
            + jnp.where(jj == ii + 2, off2[:, None], 0.0)
            + jnp.where(ii == jj + 2, off2[None, :], 0.0))
    return band.astype(dtype)


def _pyramid_kkt_fused(pbar, sigma, w, mu):
    """M = pbar + sigma I + C' diag(w) C in ONE fused elementwise pass.

    Same mathematics as ``pbar + sigma*eye + _pyramid_ctc_dense(w, mu)``,
    but the band term is built from broadcasted-iota masks and the three
    diagonal vectors instead of five jnp.diag materializations — a single
    (n, n) output write instead of ~7 passes over HBM (measured 3.7 ms ->
    ~0.6 ms at batch 4096).
    """
    n = pbar.shape[-1]
    main, off1, off2 = _pyramid_band_diags(w, mu)
    return pbar + _band_expr(main, off1, off2, sigma, n, pbar.dtype)


def mpc_solve(qp, settings=ADMMSettings(), warm_x=None, warm_y=None,
              warm_rho=None, mu=None, return_warm=False):
    """Solve one condensed MPC QP (srb.CondensedQP) end to end."""
    from go1_qp_mpc_controller_tpu.config import params as P
    mu = P.MPC_MU if mu is None else mu
    dense = functools.partial(_pyramid_ctc_dense, mu=mu,
                              dtype=qp.hessian.dtype)
    matvec = functools.partial(srb.constraint_matvec, mu=mu)
    rmatvec = functools.partial(srb.constraint_rmatvec, mu=mu)
    fused = functools.partial(_pyramid_kkt_fused, mu=mu)
    return solve(qp.hessian, qp.gradient, qp.lb, qp.ub, matvec, rmatvec,
                 dense, settings, warm_x=warm_x, warm_y=warm_y,
                 warm_rho=warm_rho, return_warm=return_warm,
                 kkt_fused=lambda pb, sg, rv: fused(pb, sg, rv))


def mpc_solve_warm(qp, warm, settings=ADMMSettings(), mu=None):
    """Warm-tick MPC solve (see :func:`solve_warm`)."""
    from go1_qp_mpc_controller_tpu.config import params as P
    mu = P.MPC_MU if mu is None else mu
    matvec = functools.partial(srb.constraint_matvec, mu=mu)
    rmatvec = functools.partial(srb.constraint_rmatvec, mu=mu)
    return solve_warm(qp.hessian, qp.gradient, qp.lb, qp.ub, matvec,
                      rmatvec, None, settings, warm, warm_mu=mu)


def mpc_solve_warm_fused(lazy_qp, warm, settings=ADMMSettings(), mu=None):
    """Warm-tick MPC solve over a srb.LazyCondensedQP (see
    :func:`solve_warm_fused`): the production fast path — the condensed
    Hessian stays unmaterialized through the KKT build and balancing."""
    from go1_qp_mpc_controller_tpu.config import params as P
    mu = P.MPC_MU if mu is None else mu
    return solve_warm_fused(lazy_qp, warm, settings, mu)
