"""Pallas TPU kernel: VMEM-resident ADMM iteration loop.

The warm-tick solve's remaining bottleneck is the ADMM loop re-reading the
per-scenario KKT inverse from HBM every iteration (~40 x 58 KB x batch per
tick). This kernel pins a tile of scenarios' inverses in VMEM and runs the
whole fixed-iteration loop on-chip:

- the per-scenario matvec x_t = Minv rhs runs as ONE stacked MXU matmul
  per iteration: [Minv_1; ...; Minv_T] (T*128, 128) @ RHS^T (128, T),
  taking the diagonal blocks (the off-diagonal waste buys full MXU
  pipelining and costs no HBM traffic),
- the friction-pyramid constraint operators act on "plane" vectors
  (fx | fy | fz and the 5 constraint rows as (T, 64) planes) produced by
  constant 0/1 selection matmuls — no lane gathers,
- projections/dual updates are elementwise VPU work on resident tiles.

Layout: variables padded 120 -> 128; per-plane constraint vectors padded
40 -> 64. The public entry converts from the dense solver's flat layout.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go1_qp_mpc_controller_tpu.config import params as P

NV = P.MPC_NV          # 120
NVP = 128              # padded variable dim
NLEGS = 4 * P.PLAN_HORIZON  # 40 (step, leg) pairs
NLP = 64               # padded plane width
TILE = 8               # default scenarios per program (see admm_iterations)


def _selection_matrices(dtype=np.float32):
    """S_x/S_y/S_z: (128, 64) 0/1 maps, u @ S = per-axis plane."""
    mats = []
    for axis in range(3):
        s = np.zeros((NVP, NLP), dtype)
        for k in range(NLEGS):
            s[3 * k + axis, k] = 1.0
        mats.append(s)
    return mats


def _kernel(mu_ref, minv_ref, q_ref, lb_ref, ub_ref, rho_ref,
            x_ref, y_ref, sx_ref, sy_ref, sz_ref,
            x_out, y_out, *, iters, alpha, sigma, tile):
    """One tile: TILE scenarios, full ADMM loop in VMEM.

    Plane tensors are (TILE, 5, NLP): rows (fx+mu fz, fx-mu fz, fy+mu fz,
    fy-mu fz, fz) per (step, leg). mu is (TILE, 1) in SMEM-style layout.
    """
    minv = minv_ref[:]                       # (tile, NVP, NVP)
    minv_stack = minv.reshape(tile * NVP, NVP)
    q = q_ref[:]                             # (TILE, NVP)
    lb = lb_ref[:]                           # (TILE, 5, NLP)
    ub = ub_ref[:]
    rho = rho_ref[:]
    mu = mu_ref[:]                           # (TILE, 1)
    sx = sx_ref[:]                           # (NVP, NLP)
    sy = sy_ref[:]
    sz = sz_ref[:]
    hi = jax.lax.Precision.HIGHEST

    def c_matvec(u):
        """(TILE, NVP) -> (TILE, 5, NLP)."""
        px = jnp.dot(u, sx, precision=hi)
        py = jnp.dot(u, sy, precision=hi)
        pz = jnp.dot(u, sz, precision=hi)
        mpz = mu * pz
        return jnp.stack([px + mpz, px - mpz, py + mpz, py - mpz, pz],
                         axis=1)

    def c_rmatvec(w):
        """(TILE, 5, NLP) -> (TILE, NVP)."""
        fx = w[:, 0] + w[:, 1]
        fy = w[:, 2] + w[:, 3]
        fz = mu * (w[:, 0] - w[:, 1] + w[:, 2] - w[:, 3]) + w[:, 4]
        return (jnp.dot(fx, sx.T, precision=hi)
                + jnp.dot(fy, sy.T, precision=hi)
                + jnp.dot(fz, sz.T, precision=hi))

    sel_diag = (jax.lax.broadcasted_iota(jnp.int32, (tile, NVP, tile), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (tile, NVP, tile),
                                            2))

    def minv_apply(rhs):
        """All-pairs stacked MXU matmul, diagonal blocks kept by mask.

        One (TILE*NVP, NVP) @ (NVP, TILE) matmul per iteration keeps the
        MXU pipelined; the off-diagonal waste is free compared to
        per-scenario matvecs, and the masked reduce is cheap VPU work.
        """
        y_all = jnp.dot(minv_stack, rhs.T, precision=hi)  # (tile*NVP, tile)
        y3 = y_all.reshape(tile, NVP, tile)
        return jnp.sum(jnp.where(sel_diag, y3, 0.0), axis=2)

    x0 = x_ref[:]
    y0 = y_ref[:]
    z0 = jnp.clip(c_matvec(x0), lb, ub)

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - q + c_rmatvec(rho * z - y)
        x_t = minv_apply(rhs)
        z_t = c_matvec(x_t)
        x_new = alpha * x_t + (1.0 - alpha) * x
        z_mid = alpha * z_t + (1.0 - alpha) * z
        z_new = jnp.clip(z_mid + y / rho, lb, ub)
        y_new = y + rho * (z_mid - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(0, iters, body, (x0, z0, y0))
    x_out[:] = x
    y_out[:] = y


def _to_planes(v):
    """(B, 200) constraint vector -> (B, 5, 64) planes.

    Flat order is (step, leg)-major with 5 rows per pair; plane order is
    row-major with the 40 pairs along the lane axis.
    """
    b = v.shape[0]
    rows = v.reshape(b, NLEGS, 5)
    planes = jnp.swapaxes(rows, 1, 2)          # (B, 5, 40)
    return jnp.pad(planes, ((0, 0), (0, 0), (0, NLP - NLEGS)))


def _from_planes(w):
    """(B, 5, 64) -> (B, 200)."""
    planes = w[:, :, :NLEGS]
    rows = jnp.swapaxes(planes, 1, 2)          # (B, 40, 5)
    return rows.reshape(w.shape[0], NLEGS * 5)


def mpc_solve_warm_batch(qps, warms, mus, settings, interpret=False,
                         tile=TILE):
    """Batched warm MPC tick with the VMEM-resident iteration kernel.

    The XLA path (admm.mpc_solve_warm under vmap) re-reads each scenario's
    KKT inverse from HBM on every ADMM iteration; this entry runs the same
    mathematics with the loop fused on-chip. Scaling + Schulz refinement
    stay in XLA (matmul-bound, already efficient).

    Measured reality (TPU v5e, batch 4096, honest distinct-input timing):
    this path does NOT beat the XLA loop — the all-pairs stacked matmul
    wastes tile-x MXU compute, and a VPU sublane/lane-reduce matvec lands
    at the same wall time as the HBM-bound XLA fori_loop. Re-measured in
    r4 isolated at 30 iterations: XLA loop 0.76 ms/iter vs this kernel
    1.48 (tile 8) / 1.56 (tile 32) ms/iter, VMEM OOM at tile 64 — the
    kernel is ~2x SLOWER at every feasible tile; per-iteration cost does
    not scale down with tile, so the bottleneck is the serial in-kernel
    dependency chain, not the stacked-matmul width. Kept as a reference
    implementation of the VMEM-resident pattern and exercised by tests;
    the production path is admm.mpc_solve_warm.

    Args:
      qps: batched srb.CondensedQP ((B, ...) leaves).
      warms: batched admm.WarmState.
      mus: (B,) friction coefficients.
      settings: admm.ADMMSettings (seg_iters/alpha/sigma/schulz_refine).
      interpret: Pallas interpreter mode (CPU tests).

    Returns:
      (admm.ADMMSolution batched, next WarmState batched).
    """
    from go1_qp_mpc_controller_tpu.models import srb
    from go1_qp_mpc_controller_tpu.ops import admm

    dtype = qps.hessian.dtype
    b = qps.hessian.shape[0]
    n = qps.hessian.shape[-1]
    cost = 1.0 / jnp.maximum(
        jnp.max(jnp.abs(qps.hessian), axis=(-2, -1)), 1e-12)   # (B,)
    pbar = cost[:, None, None] * qps.hessian
    qbar = cost[:, None] * qps.gradient
    eq = jnp.isclose(qps.lb, qps.ub)
    rho_vec = jnp.where(eq, warms.rho[:, None] * settings.rho_eq_scale,
                        warms.rho[:, None])
    m_mat = jax.vmap(
        lambda pb, rv, mu_s: admm._pyramid_kkt_fused(
            pb, settings.sigma, rv, mu_s))(pbar, rho_vec, mus)
    minv = jax.vmap(
        lambda m, x0: admm._schulz_refine_warm(m, x0,
                                               settings.schulz_refine)
    )(m_mat, warms.minv)

    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)
    lb_f = jnp.maximum(qps.lb, -big)
    ub_f = jnp.minimum(qps.ub, big)
    x, y_scaled = admm_iterations(
        minv, qbar, lb_f, ub_f, rho_vec, mus, warms.x,
        warms.y * cost[:, None], iters=settings.seg_iters,
        alpha=settings.alpha, sigma=settings.sigma, interpret=interpret,
        tile=tile)

    y = y_scaled / cost[:, None]
    finite = (jnp.all(jnp.isfinite(x), axis=-1)
              & jnp.all(jnp.isfinite(y), axis=-1))
    x = jnp.where(finite[:, None], x, 0.0)
    y = jnp.where(finite[:, None], y, 0.0)

    def residuals(h, g, xx, yy, mu_s, lbf, ubf):
        cx = srb.constraint_matvec(xx, mu_s)
        z = jnp.clip(cx, lbf, ubf)
        prim = jnp.max(jnp.abs(cx - z))
        dual = jnp.max(jnp.abs(h @ xx + g
                               + srb.constraint_rmatvec(yy, mu_s)))
        return prim, dual, z

    prim, dual, z = jax.vmap(residuals)(qps.hessian, qps.gradient, x, y,
                                        mus, lb_f, ub_f)
    sol = admm.ADMMSolution(
        x=x, y=y, z=z, rho=warms.rho,
        primal_res=jnp.where(finite, prim, 1e6),
        dual_res=jnp.where(finite, dual, 1e6))
    new_warm = admm.WarmState(x=x, y=y, rho=warms.rho, minv=minv)
    return sol, new_warm


def _schulz_batch_kernel(m_ref, *refs, coeffs, precisions, have_warm):
    """Full _schulz_inverse for a tile of scenarios, VMEM-resident.

    Per scenario: Jacobi-balance the UNBALANCED KKT matrix, run the
    (optionally scaled) Newton-Schulz schedule with the fused basin
    safeguard on a warm start, unbalance, write the inverse. The XLA
    loop pays ~3x n^2 HBM traffic per step (m_b + x read, x written,
    ~1.65 GB/step at batch 4096 = 2.5 ms/step, memory-bound); here M
    crosses HBM once and every iterate lives in VMEM.

    coeffs: per-step scalar schedule (1.0 = plain Newton); scaled steps
    apply only to the cold/fallback branch (see admm._scaled_schulz_coeffs).
    precisions: per-step jax.lax.Precision.
    """
    if have_warm:
        x0_ref, out_ref = refs
    else:
        (out_ref,) = refs
    out_ref[...] = _schulz_batch_body(
        m_ref[...], x0_ref[...] if have_warm else None, coeffs,
        precisions)


def _schulz_batch_body(m, x0_raw, coeffs, precisions):
    """Balance + basin-safeguarded (scaled) Newton-Schulz schedule +
    unbalance on (T, npd, npd) VMEM values — the body of
    :func:`_schulz_batch_kernel`, also inlined by the fused-KKT kernel
    (:func:`_schulz_kkt_kernel`)."""
    t, npd = m.shape[0], m.shape[-1]
    hi = jax.lax.Precision.HIGHEST

    rows = jax.lax.broadcasted_iota(jnp.int32, (t, npd, npd), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, npd, npd), 2)
    eye = (rows == cols).astype(m.dtype)      # (T, npd, npd)
    diag = jnp.sum(m * eye, axis=-1)          # (T, npd)
    s = jax.lax.rsqrt(diag)
    unb = s[:, :, None] * s[:, None, :]
    mb = m * unb

    dims = (((2,), (1,)), ((0,), (0,)))

    def dot(a, b, prec):
        if prec in ("bf16x3", "bf16x1"):
            # Mosaic has no Precision.HIGH lowering; emit the 3-pass
            # bf16 product manually (a_hi b_hi + a_hi b_lo + a_lo b_hi).
            # "bf16x1" keeps only the leading product — a TRUE single
            # MXU pass (Precision.DEFAULT on f32 operands measured NO
            # speedup here, so the cast is explicit); its ~4e-3 operand
            # rounding requires the widened top-edge margin in the
            # coefficient schedule (admm._scaled_schulz_coeffs margin
            # arg) — with the 1e-3 margin it overflows exactly like the
            # r2 hazard note predicts (measured 1e31 blowup).
            ah = a.astype(jnp.bfloat16)
            bh = b.astype(jnp.bfloat16)
            # explicit DEFAULT precision: an ambient f32_matmuls context
            # would otherwise stamp fp32 contract precision onto bf16
            # operands, which Mosaic rejects ("Bad lhs type")
            d = lambda x, y: jax.lax.dot_general(
                x, y, dims, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            if prec == "bf16x1":
                return d(ah, bh)
            al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
            bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
            return d(ah, bh) + d(ah, bl) + d(al, bh)
        return jax.lax.dot_general(a, b, dims, precision=prec)

    norminf = jnp.max(jnp.sum(jnp.abs(mb), axis=-1), axis=-1)  # (T,)
    c = (1.0 / (1.05 * norminf))[:, None, None]
    eye2 = 2.0 * eye
    iters = len(coeffs)
    start = 0
    ok = None
    if x0_raw is not None:
        x0b = x0_raw / unb
        inner = dot(mb, x0b, hi)
        row_inner = jnp.sum(jnp.abs(inner), axis=-1)            # (T, npd)
        d = jnp.sum(inner * eye, axis=-1)
        ok = ((jnp.min(d, axis=-1) > 1e-4)
              & (jnp.max(row_inner, axis=-1) < 3.0))[:, None, None]
        if iters == 0:
            x = jnp.where(ok, x0b, c * eye)
        else:
            stepped = dot(x0b, eye2 - inner, hi)
            ac = coeffs[0] * c
            stepped_cold = ac * (eye2 - ac * mb)
            x = jnp.where(ok, stepped, stepped_cold)
            start = 1
    else:
        x = c * eye
        if iters and coeffs[0] != 1.0:
            # fold the scaled first step analytically (x is scalar x I)
            ac = coeffs[0] * c
            x = ac * (eye2 - ac * mb)
            start = 1
    for k in range(start, iters):
        a = coeffs[k]
        prec = precisions[k]
        inner = dot(mb, x, prec)
        if a == 1.0:
            x = dot(x, eye2 - inner, prec)
        else:
            aa = a if ok is None else jnp.where(ok, 1.0, a)
            x = dot(x, (2.0 * aa) * eye - (aa * aa) * inner, prec)
    return x * unb


def _kkt_build_tile(tiled, dmain, off1, off2, cost, coef, n, npd):
    """Build the padded cost-scaled KKT for a tile of scenarios in VMEM.

    M = cost * H + sigma I + C' diag(rho_vec) C assembled from the lazy
    condensation factors: H's off-diagonal content is
    sum_k COEF[k] (x) tiled[k] (srb.lazy_hessian semantics), the
    diagonal/band terms arrive pre-combined as ``dmain`` (cost r_diag +
    sigma + band main; identity-padded past n) and the off1/off2 band
    diagonals (zero-padded). Replaces the XLA-side materialize ->
    cost-scale -> band -> balance chain, which measured ~8x off its
    byte roofline (r5) — here the (npd, npd) matrix never exists in HBM.

    Args:
      tiled: (T, 4, 12, npd) lane-padded Gram quadrants.
      dmain, off1, off2: (T, npd) band diagonals.
      cost: (T, 1) cost normalization 1/max diag(H) (2-D: a pure-1D
        lane operand trips an XLA-vs-Mosaic tiling mismatch).
      coef: (4, H, npd) padded _NILP_COEFFS_E constants.

    Returns:
      (T, npd, npd) the UNBALANCED scaled KKT (balance runs in the
      Schulz body).
    """
    t = tiled.shape[0]
    h_steps = coef.shape[1]
    acc = coef[0][None, :, None, :] * tiled[:, 0][:, None, :, :]
    for k in range(1, 4):
        acc = acc + coef[k][None, :, None, :] * tiled[:, k][:, None, :, :]
    h_rows = acc.reshape(t, h_steps * 12, npd)          # (T, n, npd)
    pad_rows = npd - h_steps * 12
    if pad_rows:
        h_rows = jnp.concatenate(
            [h_rows, jnp.zeros((t, pad_rows, npd), h_rows.dtype)],
            axis=1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (1, npd, npd), 1)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, npd, npd), 2)
    zero = jnp.zeros((), h_rows.dtype)
    band = (jnp.where(ii == jj, dmain[:, :, None], zero)
            + jnp.where(jj == ii + 1, off1[:, :, None], zero)
            + jnp.where(ii == jj + 1, off1[:, None, :], zero)
            + jnp.where(jj == ii + 2, off2[:, :, None], zero)
            + jnp.where(ii == jj + 2, off2[:, None, :], zero))
    return cost[:, :, None] * h_rows + band


def _schulz_kkt_kernel(tiled_ref, dmain_ref, off1_ref, off2_ref,
                       cost_ref, coef_ref, *refs, coeffs, precisions,
                       have_warm, n):
    """Fused KKT-build + Newton-Schulz schedule for a scenario tile."""
    if have_warm:
        x0_ref, out_ref = refs
    else:
        (out_ref,) = refs
    npd = tiled_ref.shape[-1]
    m = _kkt_build_tile(tiled_ref[...], dmain_ref[...], off1_ref[...],
                        off2_ref[...], cost_ref[...], coef_ref[...], n,
                        npd)
    out_ref[...] = _schulz_batch_body(
        m, x0_ref[...] if have_warm else None, coeffs, precisions)


def schulz_inverse_kkt_batch(tiled, dmain, off1, off2, cost, x0=None,
                             coeffs=None, iters=0, interpret=None,
                             tile=8, precisions=None, hi_tail=2):
    """Batched fused-KKT Newton-Schulz inverse (see _kkt_build_tile).

    Args:
      tiled: (B, 4, 12, n) lazy Gram quadrants (srb.LazyCondensedQP
        tiled with the singleton axis squeezed).
      dmain, off1, off2: (B, n) band diagonals — dmain = cost * r_diag
        + sigma + band_main (the full diagonal of M except H's
        off-diagonal part).
      cost: (B,) cost scaling (1 / max diag H; PSD makes that max|H|).
      x0: optional (B, n, n) unbalanced warm inverses.
      coeffs / iters / precisions / hi_tail: schedule selection as in
        :func:`schulz_inverse_batch`.

    Returns:
      (B, n, n) unbalanced inverses of cost*H + sigma I + C'diag(rho)C.
    """
    from go1_qp_mpc_controller_tpu.models import srb as srb_mod

    b, n = tiled.shape[0], tiled.shape[-1]
    dtype = tiled.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if coeffs is None:
        coeffs = (1.0,) * iters
    hi = jax.lax.Precision.HIGHEST
    hi_tail = min(len(coeffs), hi_tail)
    if precisions is None:
        precisions = tuple(hi if k >= len(coeffs) - hi_tail else "bf16x3"
                           for k in range(len(coeffs)))
    assert len(precisions) == len(coeffs)
    pad = (-n) % 128
    npd = n + pad
    h_steps = srb_mod._NILP_COEFFS_E.shape[1]
    coef = jnp.asarray(np.pad(srb_mod._NILP_COEFFS_E,
                              ((0, 0), (0, 0), (0, pad))), dtype)
    args = [jnp.pad(tiled, ((0, 0), (0, 0), (0, 0), (0, pad))),
            jnp.pad(dmain, ((0, 0), (0, pad)), constant_values=1.0),
            jnp.pad(off1, ((0, 0), (0, pad))),
            jnp.pad(off2, ((0, 0), (0, pad))),
            cost[:, None]]
    if x0 is not None:
        idx = jnp.arange(npd)
        pad_eye = jnp.where(
            (idx[:, None] == idx[None, :]) & (idx[:, None] >= n),
            jnp.ones((), dtype), jnp.zeros((), dtype))
        args.append(jnp.pad(x0, ((0, 0), (0, pad), (0, pad))) + pad_eye)
    if b % tile:
        reps = tile - b % tile
        args = [jnp.concatenate([a, jnp.repeat(a[-1:], reps, 0)])
                for a in args]
    bt = args[0].shape[0]
    kernel = functools.partial(_schulz_kkt_kernel, coeffs=tuple(coeffs),
                               precisions=precisions,
                               have_warm=x0 is not None, n=n)

    def bs(shape):
        nd = len(shape)
        return pl.BlockSpec((tile,) + shape,
                            lambda i, _nd=nd: (i,) + (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_specs = [bs((4, 12, npd)), bs((npd,)), bs((npd,)), bs((npd,)),
                bs((1,)),
                pl.BlockSpec((4, h_steps, npd), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if x0 is not None:
        in_specs.append(bs((npd, npd)))
    # operand order: per-tile args, shared coef constant, optional warm
    call_args = args[:5] + [coef] + args[5:]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bt, npd, npd), dtype),
        grid=(bt // tile,),
        in_specs=in_specs,
        out_specs=bs((npd, npd)),
        interpret=interpret,
    )(*call_args)
    return out[:b, :n, :n]


def schulz_inverse_batch(m_mat, iters, x0=None, coeffs=None,
                         interpret=None, tile=8, precisions=None):
    """Batched admm._schulz_inverse as a VMEM-resident Pallas kernel.

    Args:
      m_mat: (B, n, n) UNBALANCED SPD KKT matrices.
      iters: plain-Newton step count (used when coeffs is None; the tail
        2 steps run at HIGHEST like the XLA schedule).
      x0: optional (B, n, n) unbalanced warm inverses (basin-safeguarded).
      coeffs: optional scaled schedule (admm._scaled_schulz_coeffs).
      tile: scenarios per program — interleaves independent dot chains so
        the MXU pipeline stays full across the sequential dependency.
      precisions: optional per-step precision tuple overriding the
        default (bf16x3 middle steps, HIGHEST 2-step tail) — e.g. the
        static-edge-gated single-pass-bf16 schedule from
        admm._schedule_precisions.

    Returns:
      (B, n, n) unbalanced inverses, matching admm._schulz_inverse.
    """
    b, n = m_mat.shape[0], m_mat.shape[-1]
    dtype = m_mat.dtype
    if interpret is None:   # CPU (tests): run the Pallas interpreter
        interpret = jax.default_backend() != "tpu"
    if coeffs is None:
        coeffs = (1.0,) * iters
    hi = jax.lax.Precision.HIGHEST
    hi_tail = min(len(coeffs), 2)
    if precisions is None:
        precisions = tuple(hi if k >= len(coeffs) - hi_tail else "bf16x3"
                           for k in range(len(coeffs)))
    assert len(precisions) == len(coeffs)
    pad = (-n) % 128
    npd = n + pad
    idx = jnp.arange(npd)
    pad_eye = jnp.where((idx[:, None] == idx[None, :]) & (idx[:, None] >= n),
                        jnp.ones((), dtype), jnp.zeros((), dtype))
    args = [jnp.pad(m_mat, ((0, 0), (0, pad), (0, pad))) + pad_eye]
    if x0 is not None:
        args.append(jnp.pad(x0, ((0, 0), (0, pad), (0, pad))) + pad_eye)
    if b % tile:
        reps = tile - b % tile
        args = [jnp.concatenate([a, jnp.repeat(a[-1:], reps, 0)]) for a in args]
    bt = args[0].shape[0]
    kernel = functools.partial(_schulz_batch_kernel, coeffs=tuple(coeffs),
                               precisions=precisions,
                               have_warm=x0 is not None)
    bs = pl.BlockSpec((tile, npd, npd), lambda i: (i, 0, 0),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bt, npd, npd), dtype),
        grid=(bt // tile,),
        in_specs=[bs] * len(args),
        out_specs=bs,
        interpret=interpret,
    )(*args)
    return out[:b, :n, :n]


def _lane_matmul(a, b, n):
    """Lane-batched matmul: a, b (n, n, L) -> sum_k a[:, k, :] b[k, :, :].

    The batch lives in the LANE dimension, so every FMA uses all 128
    lanes regardless of n — the whole product is VPU work. The k-loop
    unrolls to n sublane-slice + broadcast + FMA macro-ops; a
    jnp.einsum('ikl,kjl->ijl') formulation does not lower in Mosaic,
    and a symmetric-slice variant (a[k] for a[:, k]) measured identical.
    """
    acc = a[:, 0:1, :] * b[0][None, :, :]
    for k in range(1, n):
        acc = acc + a[:, k:k + 1, :] * b[k][None, :, :]
    return acc


def schulz_lanes_body(m, coeffs):
    """Scaled Newton-Schulz inverse on (n, n, L) lane-layout values.

    The reusable body of :func:`_schulz_lanes_kernel`, also inlined by
    the fused sensor+EKF kernel (ops/pallas_ekf.py) for its innovation
    inverse. Balances, runs the scaled schedule, unbalances — all VPU
    FMA work at full lane occupancy, f32 throughout.
    """
    n = m.shape[0]
    dt = m.dtype
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    eye = (rows == cols).astype(dt)                 # (n, n, 1)
    diag = jnp.sum(m * eye, axis=1)                 # (n, L)
    s = jax.lax.rsqrt(diag)
    scale = s[:, None, :] * s[None, :, :]           # (n, n, L)
    mb = m * scale
    norminf = jnp.max(jnp.sum(jnp.abs(mb), axis=1), axis=0)   # (L,)
    c = 1.0 / (1.05 * norminf)
    a0 = coeffs[0]
    # first step folded analytically from the scalar-diagonal cold init
    ac = (a0 * c)[None, None, :]
    x = ac * (2.0 * eye - ac * mb)
    for k in range(1, len(coeffs)):
        a = coeffs[k]
        inner = _lane_matmul(mb, x, n)
        if a == 1.0:
            x = _lane_matmul(x, 2.0 * eye - inner, n)
        else:
            x = _lane_matmul(x, (2.0 * a) * eye - (a * a) * inner, n)
    return x * scale                                # unbalanced inverse


def _schulz_lanes_kernel(m_ref, out_ref, *, coeffs, n):
    """Scaled Newton-Schulz inverse, batch-in-lanes layout (n, n, L).

    For SMALL matrices (the EKF's 28-dim innovation) the MXU path wastes
    a full (padded) systolic pass per batch element: a batched 28x28
    matmul at batch 4096 measures ~0.35 ms (~7x its HBM floor), so the
    12-step schedule costs ~6 ms of the 9.4 ms EKF stage. This kernel
    keeps the batch in the lane dimension and runs the entire schedule
    (including the Jacobi balance and unbalance) as full-width VPU
    arithmetic: measured 2.76 ms vs 6.06 ms for the XLA loop at batch
    4096 (TPU v5e, scan-timed). All steps run at native f32 FMA
    precision — strictly tighter than the MXU path's bf16x3 middles, so
    the scaled-schedule hazard margins (admm._scaled_schulz_coeffs) hold
    a fortiori.
    """
    out_ref[...] = schulz_lanes_body(m_ref[...], coeffs)


def schulz_inverse_lanes(m_mat, coeffs, lane_tile=128, interpret=None):
    """Batched Newton-Schulz inverse for SMALL SPD matrices, VPU-only.

    Lane-batched counterpart of :func:`schulz_inverse_batch` for n << 128
    (EKF innovation matrices): instead of padding n -> 128 for the MXU
    (a ~(128/28)^2 = 21x compute waste), the batch rides the lane axis
    and all matmuls become k-loop FMAs at full lane occupancy.

    Args:
      m_mat: (B, n, n) UNBALANCED SPD matrices (balance runs in-kernel).
      coeffs: scaled-step schedule (admm._scaled_schulz_coeffs).
      lane_tile: scenarios per program (128 measured best; 512 overflows
        the 16 MB scoped VMEM on the unrolled 12-step live set).
      interpret: Pallas interpreter mode (defaults to True off-TPU).

    Returns:
      (B, n, n) approximate inverses (cold schedule, no warm start).
    """
    b, n = m_mat.shape[0], m_mat.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    pad = (-b) % lane_tile
    mt = jnp.transpose(m_mat, (1, 2, 0))            # (n, n, B)
    if pad:
        # identity-pad the batch: norminf 1, rsqrt(1) — numerically inert
        eye_pad = jnp.broadcast_to(
            jnp.eye(n, dtype=m_mat.dtype)[:, :, None], (n, n, pad))
        mt = jnp.concatenate([mt, eye_pad], axis=-1)
    kernel = functools.partial(_schulz_lanes_kernel, coeffs=tuple(coeffs),
                               n=n)
    bs = pl.BlockSpec((n, n, lane_tile), lambda i: (0, 0, i),
                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n, b + pad), m_mat.dtype),
        grid=((b + pad) // lane_tile,),
        in_specs=[bs],
        out_specs=bs,
        interpret=interpret,
    )(mt)
    return jnp.transpose(out[:, :, :b], (2, 0, 1))


def _schulz_kernel(mb_ref, *refs, iters, have_warm):
    """VMEM-resident Newton-Schulz loop (one matrix, fully on-chip).

    Same schedule as admm._schulz_iterate_balanced: cold init
    I/(1.05 ||M_b||_inf), fused basin safeguard on a warm start (the
    signature test shares the first step's inner product), HIGH middle
    steps, HIGHEST 2-step tail. Operates in BALANCED space end to end.
    """
    if have_warm:
        x0_ref, out_ref = refs
    else:
        (out_ref,) = refs
    mb = mb_ref[:]
    npd = mb.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (npd, npd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (npd, npd), 1)
    eye = (rows == cols).astype(mb.dtype)
    eye2 = 2.0 * eye
    hi = jax.lax.Precision.HIGHEST
    lo = jax.lax.Precision.HIGH

    norminf = jnp.max(jnp.sum(jnp.abs(mb), axis=-1))
    c = 1.0 / (1.05 * norminf)
    cold = c * eye
    hi_tail = min(iters, 2)
    start = 0
    if have_warm:
        x0 = x0_ref[:]
        inner = jnp.dot(mb, x0, precision=hi)
        row_inner = jnp.sum(jnp.abs(inner), axis=-1)
        d = jnp.sum(inner * eye, axis=-1)
        ok = (jnp.min(d) > 1e-4) & (jnp.max(row_inner) < 3.0)
        if iters == 0:
            x = jnp.where(ok, x0, cold)
        else:
            stepped = jnp.dot(x0, eye2 - inner, precision=hi)
            stepped_cold = c * (eye2 - c * mb)
            x = jnp.where(ok, stepped, stepped_cold)
            start = 1
    else:
        x = cold
    for k in range(start, iters):
        prec = hi if k >= iters - hi_tail else lo
        x = jnp.dot(x, eye2 - jnp.dot(mb, x, precision=prec),
                    precision=prec)
    out_ref[:] = x


def schulz_balanced(m_b, iters, x0_b=None, interpret=False):
    """Pallas Newton-Schulz inverse of a Jacobi-balanced matrix.

    VMEM-resident version of admm._schulz_iterate_balanced (identical
    schedule and basin safeguard), returning the BALANCED inverse — the
    caller unbalances with its own scale. Input/output padded n -> 128
    with an identity pad block: padded rows have row sum 1 <= the true
    inf-norm (M_b has unit diagonal), so the cold scaling, the safeguard
    signature and every iterate on the true block are bit-equivalent to
    the unpadded computation.

    Args:
      m_b: (n, n) balanced matrix (unit diagonal).
      iters: static step count.
      x0_b: optional (n, n) BALANCED warm start (safeguarded).
      interpret: Pallas interpreter mode (CPU tests).
    """
    n = m_b.shape[-1]
    dtype = m_b.dtype
    pad = (-n) % 128
    npd = n + pad
    idx = jnp.arange(npd)
    pad_eye = jnp.where((idx[:, None] == idx[None, :]) & (idx[:, None] >= n),
                        jnp.ones((), dtype), jnp.zeros((), dtype))
    args = [jnp.pad(m_b, ((0, pad), (0, pad))) + pad_eye]
    if x0_b is not None:
        args.append(jnp.pad(x0_b, ((0, pad), (0, pad))) + pad_eye)
    kernel = functools.partial(_schulz_kernel, iters=iters,
                               have_warm=x0_b is not None)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npd, npd), dtype),
        interpret=interpret,
    )(*args)
    return out[:n, :n]


@functools.partial(jax.jit, static_argnames=("iters", "alpha", "sigma",
                                             "interpret", "tile"))
def admm_iterations(minv, qbar, lb, ub, rho_vec, mu, x0, y0,
                    iters=40, alpha=1.6, sigma=1e-6, interpret=False,
                    tile=TILE):
    """Run the VMEM-resident ADMM loop for a batch.

    Args:
      minv: (B, 120, 120) scaled KKT inverses.
      qbar: (B, 120) scaled gradients.
      lb, ub, rho_vec: (B, 200) bounds / per-row rho (finite).
      mu: (B,) friction coefficients.
      x0, y0: (B, 120) warm starts (y in SCALED units).
      interpret: run the Pallas interpreter (CPU tests).

    Returns:
      (x, y): (B, 120) primal and scaled dual.
    """
    b = minv.shape[0]
    assert b % tile == 0, f"batch {b} must be a multiple of {tile}"
    dtype = minv.dtype
    minv_p = jnp.pad(minv, ((0, 0), (0, NVP - NV), (0, NVP - NV)))
    q_p = jnp.pad(qbar, ((0, 0), (0, NVP - NV)))
    x_p = jnp.pad(x0, ((0, 0), (0, NVP - NV)))
    y_pl = _to_planes(y0)
    lb_pl = _to_planes(lb)
    ub_pl = _to_planes(ub)
    # padded plane tail: lb=ub=0 keeps z=0 there; rho=1 avoids div-by-zero
    pad_mask = (jnp.arange(NLP) >= NLEGS)[None, None, :]
    rho_pl = jnp.where(pad_mask, 1.0, _to_planes(rho_vec))
    mu_col = mu[:, None].astype(dtype)

    sx, sy, sz = [jnp.asarray(m, dtype) for m in _selection_matrices()]

    grid = (b // tile,)
    kernel = functools.partial(_kernel, iters=iters, alpha=alpha,
                               sigma=sigma, tile=tile)
    bs = lambda shape: pl.BlockSpec(
        (tile,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    x, y_planes = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((b, NVP), dtype),
                   jax.ShapeDtypeStruct((b, 5, NLP), dtype)),
        grid=grid,
        in_specs=[bs((1,)), bs((NVP, NVP)), bs((NVP,)),
                  bs((5, NLP)), bs((5, NLP)), bs((5, NLP)),
                  bs((NVP,)), bs((5, NLP)),
                  const((NVP, NLP)), const((NVP, NLP)), const((NVP, NLP))],
        out_specs=(bs((NVP,)), bs((5, NLP))),
        interpret=interpret,
    )(mu_col, minv_p, q_p, lb_pl, ub_pl, rho_pl, x_p, y_pl, sx, sy, sz)
    return x[:, :NV], _from_planes(y_planes)
