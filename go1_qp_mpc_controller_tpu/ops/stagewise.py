"""Stagewise (sparse, O(H)) long-horizon MPC solver.

The reference condenses the horizon into a dense 120-var QP and lets
OSQP's sparse LDL' cope (ConvexMpc.cpp:158-245) — fine at H=10, but the
condensed Hessian is O(H^2) memory and the KKT inversion O(H^3): the
"long-context" dimension the reference never forced (SURVEY.md section 5).
This module keeps the QP in its natural stagewise form and solves it with
the same OSQP-semantics ADMM as ops/admm.py, except the per-iteration KKT
solve

    (P + sigma I + C' diag(rho) C) u = rhs,   P = B_qp' Q B_qp + R

is performed WITHOUT materializing P: minimizing
1/2 u'Pu - rhs'u is an affine LQR problem

    min  sum_i 1/2 x_{i+1}' Q x_{i+1} + 1/2 u_i' Rbar u_i + g_i' u_i
    s.t. x_{i+1} = A x_i + B_i u_i,  x_0 = 0,   g = -rhs

with Rbar = R + sigma I + C' diag(rho) C (block-diagonal per leg), solved
by one discrete-Riccati backward factorization per rho segment (gains
K_i, G_i^-1 — independent of rhs) plus, per ADMM iteration, an affine
backward/forward `lax.scan` pair of 13-dim ops: O(H) work, O(H) memory.
Everything carries a leading scenario axis through vmap exactly like the
dense solver.

Cost scaling uses max diag(P) (= max |P| for PSD up to sqrt factors),
computed in the same factor pass via T_i = Q + A' T_{i+1} A.

Parity: at H=10 with constant B the iterates coincide with
admm.mpc_solve on the condensed QP (same splitting, same rho schedule);
tests/test_stagewise.py gates this against the float64 oracle fixture,
and checks KKT optimality directly at H=40 where no dense reference
exists.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.models import srb
from go1_qp_mpc_controller_tpu.ops import admm
from go1_qp_mpc_controller_tpu.utils.precision import f32_matmuls

NX = 13
NU = 12
NC = P.MPC_CONSTRAINT_DIM     # 20 pyramid rows per stage


class StagewiseSolution(NamedTuple):
    u: jnp.ndarray            # (H, 12) per-stage GRFs (u[0] applied)
    y: jnp.ndarray            # (H, 20) duals (unscaled)
    z: jnp.ndarray            # (H, 20) projected constraint values
    rho: jnp.ndarray          # () adapted rho
    primal_res: jnp.ndarray   # () max |Cu - z|
    dual_res: jnp.ndarray     # () max |Pu + q + C'y| (scaled units)


class StagewiseWarmState(NamedTuple):
    """Cross-tick carry for the stagewise solver — the long-horizon
    analog of admm.WarmState. No KKT inverse is carried: the per-tick
    "factorization" is the O(H) Riccati pass, re-run each tick against
    the drifted (A, B, rho) (it costs about two ADMM iterations, unlike
    the dense path's O(n^3) inversion).

    Attributes:
      u: (H, 12) primal carry; y: (H, 20) dual carry (unscaled).
      rho: () carried step size.
      q_lin: (H, 12) the linear term the carry solved (drift trigger).
    """
    u: jnp.ndarray
    y: jnp.ndarray
    rho: jnp.ndarray
    q_lin: jnp.ndarray


def _stage_matvec(u, mu):
    """(..., 12) -> (..., 20): per-stage friction-pyramid rows
    (srb.constraint_matvec structure, one stage)."""
    f = u.reshape(u.shape[:-1] + (4, 3))
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    rows = jnp.stack(
        [fx + mu * fz, fx - mu * fz, fy + mu * fz, fy - mu * fz, fz],
        axis=-1)
    return rows.reshape(u.shape[:-1] + (NC,))


def _stage_rmatvec(y, mu):
    """(..., 20) -> (..., 12): adjoint of :func:`_stage_matvec`."""
    r = y.reshape(y.shape[:-1] + (4, 5))
    fx = r[..., 0] + r[..., 1]
    fy = r[..., 2] + r[..., 3]
    fz = mu * (r[..., 0] - r[..., 1] + r[..., 2] - r[..., 3]) + r[..., 4]
    return jnp.stack([fx, fy, fz], axis=-1).reshape(y.shape[:-1] + (NU,))


def _ctc_dense(rho_vec, mu, dtype):
    """C' diag(rho_vec) C for ONE stage: (12, 12) block-diagonal per leg.

    Rows per leg: (fx+mu fz, fx-mu fz, fy+mu fz, fy-mu fz, fz) with
    weights r1..r5 (ConvexMpc.cpp:46-58 structure).
    """
    r = rho_vec.reshape(4, 5)
    blocks = []
    for leg in range(4):
        r1, r2, r3, r4, r5 = [r[leg, i] for i in range(5)]
        sxx = r1 + r2
        syy = r3 + r4
        sxz = mu * (r1 - r2)
        syz = mu * (r3 - r4)
        szz = mu * mu * (r1 + r2 + r3 + r4) + r5
        z = jnp.zeros((), dtype)
        blk = jnp.stack([
            jnp.stack([sxx, z, sxz]),
            jnp.stack([z, syy, syz]),
            jnp.stack([sxz, syz, szz]),
        ])
        blocks.append(blk)
    return jax.scipy.linalg.block_diag(*blocks)


def _riccati_factor(a_d, b_d, q_diag, rbar, r_diag=None):
    """Backward Riccati factorization (once per rho segment).

    Args:
      a_d: (13, 13); b_d: (H, 13, 12) per-stage B.
      q_diag: (13,) scaled state cost diagonal (applies to x_1..x_H).
      rbar: (12, 12) scaled augmented input cost (shared across stages).
      r_diag: optional (12,) pure input-cost diagonal added to the
        Hessian-diagonal bound (the condensed P diagonal is
        diag(B'TB) + diag(R); segment factorizations that only consume
        the gains may omit it).

    Returns dict of per-stage tensors:
      k:    (H, 12, 13) feedback gains G^-1 B' S A
      ginv: (H, 12, 12)
      acl:  (H, 13, 13) closed-loop A - B K
      bt:   (H, 12, 13) B'
      dmax: () max diag of the condensed Hessian (for cost scaling)
    """
    h = b_d.shape[0]
    dtype = a_d.dtype
    q_mat = jnp.diag(q_diag)
    rd = jnp.zeros((NU,), dtype) if r_diag is None else r_diag

    def step(carry, b_i):
        p_next, t_next, dmax = carry
        s = q_mat + p_next                       # cost on x_{i+1}
        bs = b_i.T @ s                           # (12, 13)
        g = rbar + bs @ b_i                      # (12, 12)
        # matmul-only SPD inverse: a batched 12x12 LU serializes on TPU
        # (the same tiny-decomposition poison as the EKF innovation and
        # the 3x3 leg solves — see NOTES_ROUND3)
        ginv = admm._schulz_inverse(
            g, 0, coeffs=admm._scaled_schulz_coeffs(1e-7))
        k = ginv @ (bs @ a_d)                    # (12, 13)
        acl = a_d - b_i @ k
        # Riccati update in Joseph-free form (exact for the minimizer)
        p = a_d.T @ s @ acl
        p = 0.5 * (p + p.T)
        # Hessian diagonal bound: T_i = Q + A' T_{i+1} A accumulates the
        # open-loop state-cost propagation; diag(B' T B) + diag(R) is the
        # condensed P diagonal for this stage's input
        t_cur = q_mat + a_d.T @ t_next @ a_d
        dmax = jnp.maximum(
            dmax, jnp.max(jnp.diagonal(b_i.T @ t_next @ b_i) + rd))
        return (p, t_cur, dmax), (k, ginv, acl, b_i.T)

    init = (jnp.zeros((NX, NX), dtype), q_mat,
            jnp.zeros((), dtype))
    (_, _, dmax), (k, ginv, acl, bt) = jax.lax.scan(
        step, init, b_d, reverse=True)
    return {"k": k, "ginv": ginv, "acl": acl, "bt": bt, "dmax": dmax}


def _lqr_solve(fac, a_d, b_d, g, c_lin, parallel=False):
    """Solve the affine LQR for given per-stage input linear terms g.

    min sum 1/2 x_{i+1}'Q x_{i+1} + c_{i+1}'x_{i+1} + 1/2 u'Rbar u + g'u
    s.t. x_{i+1} = A x_i + B u_i, x_0 = 0.

    Both passes are affine recurrences p <- E p + f with per-stage
    constant matrices. Two executions:

    - parallel=False (default): `lax.scan`, H sequential 13-dim steps.
    - parallel=True: `associative_scan` over affine-map compositions —
      O(log H) depth at O(H log H) work, the "parallel over the horizon"
      form of the classic LQR sweeps.

    Measured (TPU v5e, batch 1024, 60 ADMM iterations): the parallel
    form is ~20% SLOWER at H=40-120 — a production-size batch already
    fills the device, so the depth win cannot pay for the log-factor
    extra matmuls and their HBM traffic. Kept for the latency-sensitive
    small-batch regime and as the scaling-form reference.

    c_lin: (H, 13) linear state costs (constant across ADMM iterations).
    Returns u: (H, 12).
    """
    k, ginv, acl, bt = fac["k"], fac["ginv"], fac["acl"], fac["bt"]
    dtype = g.dtype
    if not parallel:
        def bwd(p_next, inp):
            k_i, acl_i, g_i, c_i = inp
            s = p_next + c_i                      # linear cost on x_{i+1}
            p_i = acl_i.T @ s - k_i.T @ g_i
            return p_i, s

        _, s_seq = jax.lax.scan(bwd, jnp.zeros((NX,), dtype),
                                (k, acl, g, c_lin), reverse=True)

        def fwd(x_i, inp):
            k_i, ginv_i, bt_i, s_i, g_i, b_i = inp
            u_i = -k_i @ x_i - ginv_i @ (bt_i @ s_i + g_i)
            return a_d @ x_i + b_i @ u_i, u_i

        _, u = jax.lax.scan(fwd, jnp.zeros((NX,), dtype),
                            (k, ginv, bt, s_seq, g, b_d))
        return u

    # backward: p_i = Acl_i' p_{i+1} + (Acl_i' c_i - K_i' g_i), p_H = 0;
    # the value consumed at stage i is s_i = p_{i+1} + c_i
    e_bwd = jnp.swapaxes(acl, -1, -2)                       # (H, 13, 13)
    f_bwd = (jnp.einsum('hxy,hy->hx', e_bwd, c_lin)
             - jnp.einsum('hux,hu->hx', k, g))

    def comb(a, b):
        # affine-map composition with b outer: (e_b o e_a)(x) =
        # E_b(E_a x + f_a) + f_b. associative_scan hands `b` the element
        # that must apply LAST in both directions (verified numerically
        # against the sequential recurrences): in a reverse scan `b` is
        # the lower original index (suffix composition), forward the
        # higher (prefix composition).
        return (jnp.einsum('...ij,...jk->...ik', b[0], a[0]),
                jnp.einsum('...ij,...j->...i', b[0], a[1]) + b[1])

    p_all = jax.lax.associative_scan(comb, (e_bwd, f_bwd),
                                     reverse=True, axis=0)[1]  # p_i
    p_next = jnp.concatenate([p_all[1:], jnp.zeros((1, NX), dtype)])
    s_next = p_next + c_lin                                  # (H, 13)

    # forward: x_{i+1} = Acl_i x_i + h_i, h_i = -B_i d_i, x_0 = 0
    d = jnp.einsum('huv,hv->hu', ginv,
                   jnp.einsum('hux,hx->hu', bt, s_next) + g)  # (H, 12)
    h_fwd = -jnp.einsum('hxu,hu->hx', b_d, d)

    x_all = jax.lax.associative_scan(comb, (acl, h_fwd), axis=0)[1]
    x = jnp.concatenate([jnp.zeros((1, NX), dtype), x_all[:-1]])  # x_i
    return -jnp.einsum('hux,hx->hu', k, x) - d


def _gradient(a_d, b_d, u, qs_diag, refs, r_diag):
    """Pu + q stagewise: one rollout + one adjoint pass.

    P u + q = R u_i + B'( lambda_{i+1} ) with
    lambda_i = A' lambda_{i+1} + Q (x_i - ref_i) (backward, lambda over
    x_1..x_H), x the rollout from the TRUE x0 folded into refs upstream
    (here x0 = 0 and refs already hold ref_i - A^i x0).
    """
    def roll(x_i, inp):
        b_i, u_i = inp
        x_next = a_d @ x_i + b_i @ u_i
        return x_next, x_next

    _, xs = jax.lax.scan(roll, jnp.zeros((NX,), u.dtype), (b_d, u))
    qx = qs_diag * (xs - refs)                    # (H, 13)

    def adj(lam_next, qx_i):
        lam_i = qx_i + a_d.T @ lam_next
        return lam_i, lam_i

    _, lams = jax.lax.scan(adj, jnp.zeros((NX,), u.dtype), qx,
                           reverse=True)
    return u * r_diag + jnp.einsum('hxu,hx->hu', b_d, lams)


def linear_term(a_d, b_d, x0, x_ref, q_weights, r_weights):
    """Unscaled condensed-gradient q in stagewise form (two O(H) scans).

    Equals the condensed path's ``2 B_qp' Qw (A_qp x0 - x_ref)`` per
    stage — the controller's warm/cold drift trigger for long horizons
    (the analog of LazyCondensedQP.gradient in the H=10 path).

    Returns:
      (H, 12).
    """
    h = x_ref.shape[0]
    if b_d.ndim == 2:
        b_d = jnp.broadcast_to(b_d, (h, NX, NU))

    def free(x_i, _):
        x_next = a_d @ x_i
        return x_next, x_next

    _, x_free = jax.lax.scan(free, x0, None, length=h)
    refs = x_ref - x_free
    return _gradient(a_d, b_d, jnp.zeros((h, NU), x_ref.dtype),
                     2.0 * q_weights, refs, 2.0 * r_weights)


def _problem_setup(a_d, b_d, x0, x_ref, q_weights, r_weights, contacts,
                   fz_min, fz_max):
    """Shared cold/warm preprocessing: reference folding, bounds, cost
    scale, and the constant linear term. Returns a dict of tensors."""
    h = x_ref.shape[0]
    dtype = x_ref.dtype
    if b_d.ndim == 2:
        b_d = jnp.broadcast_to(b_d, (h, NX, NU))

    qs = 2.0 * q_weights                          # matches condense()
    rs = 2.0 * r_weights

    # fold x0 into the state references: tracking (x_i - ref_i) with the
    # true dynamics == tracking (w_i - (ref_i - A^i x0)) with w_0 = 0
    def free(x_i, _):
        x_next = a_d @ x_i
        return x_next, x_next

    _, x_free = jax.lax.scan(free, x0, None, length=h)
    refs = x_ref - x_free                         # (H, 13)

    # one-stage bounds (shared across stages: contacts constant over the
    # horizon, A1RobotControl.cpp:498-514)
    lb1, ub1 = srb._pyramid_bounds(contacts, fz_min, fz_max, dtype)
    lb = jnp.broadcast_to(lb1[:NC], (h, NC))
    ub = jnp.broadcast_to(ub1[:NC], (h, NC))
    eq = jnp.isclose(lb, ub)
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    lb_f = jnp.maximum(lb, -big)
    ub_f = jnp.minimum(ub, big)

    # cost scale from the factor pass's Hessian-diagonal bound — the exact
    # condensed P diagonal max(diag(B'TB) + diag(R)) tracked in the scan,
    # mirroring solve()'s 1/max|P| (ADVICE r2: the earlier
    # max(dmax, max(rs)) bound was up to 2x off, shifting the effective
    # rho relative to the dense path)
    fac0 = _riccati_factor(a_d, b_d, qs, jnp.diag(rs), r_diag=rs)
    cost = 1.0 / jnp.maximum(fac0["dmax"], 1e-12)

    qs_s = cost * qs
    rs_s = cost * rs
    # constant linear term q = gradient at u = 0: lets the adaptive-rho
    # dual residual normalize by max(|Pu|, |q|, |C'y|) separately, exactly
    # like solve() (ADVICE r2: the combined |Pu + q| cancels near the
    # optimum and inflates the relative dual residual), and serves as the
    # warm path's drift trigger
    q_lin = _gradient(a_d, b_d, jnp.zeros((h, NU), dtype), qs_s, refs,
                      rs_s)
    return dict(h=h, dtype=dtype, b_d=b_d, qs_s=qs_s, rs_s=rs_s,
                refs_s=refs, cost=cost, q_lin=q_lin, eq=eq,
                lb_f=lb_f, ub_f=ub_f)


def _make_segment(pr, a_d, mu, settings, parallel_scan, adapt_rho=True):
    """One rho segment over the setup dict `pr`: Riccati refactorization +
    seg_iters fixed ADMM iterations (+ optional rho adaptation)."""
    h, dtype = pr["h"], pr["dtype"]
    b_d, eq = pr["b_d"], pr["eq"]
    lb_f, ub_f = pr["lb_f"], pr["ub_f"]
    qs_s, rs_s, refs_s, q_lin = (pr["qs_s"], pr["rs_s"], pr["refs_s"],
                                 pr["q_lin"])
    sigma = settings.sigma
    alpha = settings.alpha

    def segment(carry):
        u, z, y, rho = carry
        rho_vec1 = jnp.where(eq[0], rho * settings.rho_eq_scale, rho)
        rbar = (jnp.diag(rs_s) + sigma * jnp.eye(NU, dtype=dtype)
                + _ctc_dense(rho_vec1, mu, dtype))
        fac = _riccati_factor(a_d, b_d, qs_s, rbar)
        rho_vec = jnp.broadcast_to(rho_vec1, (h, NC))

        # constant linear terms: state tracking -Q ref (folded once)
        c_lin = -(qs_s * refs_s)                   # (H, 13)

        def body(_, c3):
            u, z, y = c3
            g = -(sigma * u + _stage_rmatvec(rho_vec * z - y, mu))
            u_t = _lqr_solve(fac, a_d, b_d, g, c_lin,
                             parallel=parallel_scan)
            z_t = _stage_matvec(u_t, mu)
            u_new = alpha * u_t + (1.0 - alpha) * u
            z_mid = alpha * z_t + (1.0 - alpha) * z
            z_new = jnp.clip(z_mid + y / rho_vec, lb_f, ub_f)
            y_new = y + rho_vec * (z_mid - z_new)
            return u_new, z_new, y_new

        u, z, y = jax.lax.fori_loop(0, settings.seg_iters, body, (u, z, y))

        # residuals (same rule AND same normalization as solve():
        # |Pu|, |q|, |C'y| enter the dual denominator separately)
        cu = _stage_matvec(u, mu)
        eps = jnp.asarray(1e-15, dtype)
        prim = (jnp.max(jnp.abs(cu - z))
                / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(cu)),
                                          jnp.max(jnp.abs(z))), eps))
        grad = _gradient(a_d, b_d, u, qs_s, refs_s, rs_s)   # P u + q
        pu = grad - q_lin
        cty = _stage_rmatvec(y, mu)
        dual = (jnp.max(jnp.abs(grad + cty))
                / jnp.maximum(jnp.maximum(jnp.max(jnp.abs(pu)),
                              jnp.maximum(jnp.max(jnp.abs(q_lin)),
                                          jnp.max(jnp.abs(cty)))), eps))
        if adapt_rho:
            factor = jnp.sqrt(prim / jnp.maximum(dual, eps))
            factor = jnp.clip(factor, 1e-2, 1e2)
            factor = jnp.where((factor > 5.0) | (factor < 0.2), factor,
                               1.0)
            factor = jnp.where(
                jnp.maximum(prim, dual) > settings.adapt_tol, factor, 1.0)
            rho = jnp.clip(rho * factor, settings.rho_min,
                           settings.rho_max)
        return (u, z, y, rho), (prim, dual)

    return segment


def _package(pr, u, z, y, rho, prim, dual):
    """NaN latch + unscale, shared by the cold and warm entries."""
    finite = (jnp.all(jnp.isfinite(u)) & jnp.all(jnp.isfinite(y)))
    u = jnp.where(finite, u, jnp.zeros_like(u))
    y = jnp.where(finite, y, jnp.zeros_like(y))
    z = jnp.where(finite, z, jnp.zeros_like(z))
    bigr = jnp.asarray(1e6, pr["dtype"])
    sol = StagewiseSolution(
        u=u, y=y / pr["cost"], z=z, rho=rho,
        primal_res=jnp.where(finite, prim, bigr),
        dual_res=jnp.where(finite, dual, bigr))
    warm = StagewiseWarmState(u=sol.u, y=sol.y, rho=rho,
                              q_lin=pr["q_lin"] / pr["cost"])
    return sol, warm


@f32_matmuls
def mpc_solve(a_d, b_d, x0, x_ref, q_weights, r_weights, contacts,
              mu=P.MPC_MU, settings=admm.ADMMSettings(),
              fz_min=P.MPC_FZ_MIN, fz_max=P.MPC_FZ_MAX,
              parallel_scan=False, return_warm=False):
    """Long-horizon MPC solve in stagewise form (O(H) per iteration).

    Args:
      a_d: (13, 13) discrete A.
      b_d: (13, 12) shared or (H, 13, 12) per-stage discrete B.
      x0: (13,) current state; x_ref: (H, 13) reference trajectory —
        H is taken from x_ref and may be arbitrary (the dense path's
        specialization to PLAN_HORIZON=10 does not apply here).
      settings: admm.ADMMSettings; seg_iters/segments/rho/sigma/alpha/
        rho_eq_scale/rho bounds/adapt_tol are honored, the dense-path
        KKT/polish knobs are not (the KKT solve is the Riccati pass).
      return_warm: also return a StagewiseWarmState for
        :func:`mpc_solve_warm` ticks.

    Returns:
      StagewiseSolution (or (solution, warm)). u[0] is the applied GRF
      (matches the condensed solver's x[:12] at H=10 with constant B).
    """
    pr = _problem_setup(a_d, b_d, x0, x_ref, q_weights, r_weights,
                        contacts, fz_min, fz_max)
    h, dtype = pr["h"], pr["dtype"]
    segment = _make_segment(pr, a_d, mu, settings, parallel_scan)

    rho0 = jnp.asarray(settings.rho, dtype)
    u = jnp.zeros((h, NU), dtype)
    z = jnp.clip(_stage_matvec(u, mu), pr["lb_f"], pr["ub_f"])
    y = jnp.zeros((h, NC), dtype)

    carry = (u, z, y, rho0)
    for _ in range(settings.segments):
        carry, (prim, dual) = segment(carry)
    u, z, y, rho = carry
    sol, warm = _package(pr, u, z, y, rho, prim, dual)
    return (sol, warm) if return_warm else sol


@f32_matmuls
def mpc_solve_warm(a_d, b_d, x0, x_ref, q_weights, r_weights, contacts,
                   warm, mu=P.MPC_MU, settings=admm.ADMMSettings(),
                   fz_min=P.MPC_FZ_MIN, fz_max=P.MPC_FZ_MAX,
                   parallel_scan=False):
    """One warm stagewise tick: refactorize the Riccati pass at the
    carried rho and run a single fixed-iteration segment from the carried
    primal/dual.

    The long-horizon production cadence (the analog of
    admm.solve_warm / A1RobotControl.cpp:522-540): consecutive ticks
    solve nearly identical LQR-constrained QPs, so the carried (u, y)
    sit deep inside the ADMM convergence region and one short segment
    tracks the drift. Unlike the dense path there is no KKT inverse to
    protect — the Riccati refactorization is exact for the CURRENT
    (A, B, rho) every tick (it costs ~2 ADMM iterations of the same
    O(H) scans) — so no basin safeguard is needed; the caller routes
    contact flips and large drifts to a cold :func:`mpc_solve` because
    those change the ACTIVE SET faster than one short segment converges.

    Args:
      warm: StagewiseWarmState from a previous tick (build with
        ``mpc_solve(..., return_warm=True)``).
      settings: seg_iters is the warm budget; segments is ignored (one
        segment, rho fixed at the carry).

    Returns:
      (StagewiseSolution, next StagewiseWarmState).
    """
    pr = _problem_setup(a_d, b_d, x0, x_ref, q_weights, r_weights,
                        contacts, fz_min, fz_max)
    segment = _make_segment(pr, a_d, mu, settings, parallel_scan,
                            adapt_rho=False)
    u = warm.u
    y = warm.y * pr["cost"]
    z = jnp.clip(_stage_matvec(u, mu), pr["lb_f"], pr["ub_f"])
    (u, z, y, rho), (prim, dual) = segment((u, z, y, warm.rho))
    return _package(pr, u, z, y, rho, prim, dual)
