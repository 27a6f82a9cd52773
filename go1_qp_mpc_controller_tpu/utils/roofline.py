"""Static flop/byte accounting for the benched solver modes.

The reference disciplines its stages with measured per-stage budgets
("~0.2 ms A_qp/B_qp", "~0.4 ms hessian" — ConvexMpc.cpp:180, 206); the
TPU analog is a reproducible roofline model: per benched mode, count the
MXU flops (with their precision pass multipliers), the VPU flops, and
the minimal HBM traffic implied by the static shapes, then compare the
measured rate against the per-device compute/bandwidth peaks. bench.py
emits the resulting ``mfu`` / ``hbm_frac`` / ``roofline_frac`` fields in
the BENCH JSON so every perf claim is regressable from the artifact
(VERDICT r4 item 2).

Conventions:
  - ``flops`` are USEFUL algorithmic flops (2mnk per matmul); the MXU
    pass multiplier (HIGHEST = 6 bf16 passes for an f32 product,
    HIGH/bf16x3 = 3, DEFAULT = 1) scales compute TIME, not flops, so
    ``mfu`` is the standard model-flops / peak-flops ratio while
    ``roofline_frac`` honestly charges the precision passes.
  - VPU (elementwise) flops are charged against the VPU peak, HBM bytes
    against the bandwidth peak; the roofline bound per mode is
    max(mxu_time, vpu_time, hbm_time).
  - Byte counts are the MINIMAL traffic of each stage's inputs/outputs
    (perfect fusion inside a stage, no reuse across stages) — an
    achieved fraction above ~1 means the model under-counts, and the
    test gates on that.
"""

from typing import NamedTuple

from go1_qp_mpc_controller_tpu.config import params as P

NV = P.MPC_NV            # 120 variables
NVP = 128                # Pallas-padded KKT dim
NCON = P.MPC_CONSTRAINT_DIM * P.PLAN_HORIZON   # 200 constraints
NX = P.MPC_STATE_DIM     # 13
H = P.PLAN_HORIZON       # 10
F32 = 4                  # bytes


class Stage(NamedTuple):
    """One accounted stage of a benched program (per scenario)."""
    name: str
    mxu_flops: float      # useful matmul flops
    mxu_passes: float     # pass multiplier (weighted mean over the stage)
    vpu_flops: float      # elementwise flops
    hbm_bytes: float      # minimal HBM traffic (reads + writes)


class DevicePeaks(NamedTuple):
    name: str
    bf16_flops: float     # peak MXU bf16 flops/s (one pass)
    vpu_flops: float      # peak VPU f32 flops/s
    hbm_bytes: float      # peak HBM bytes/s
    known: bool           # False -> nominal placeholder peaks


# Public per-chip peak numbers (cloud.google.com/tpu/docs system
# architecture tables). VPU peak is taken as bf16-peak / 16 (8 MXU-equiv
# lanes of 8x128 VPU at 4 FMA ports — the conventional ~1/16 ratio).
_PEAKS = {
    "v5lite": DevicePeaks("TPU v5e", 197e12, 197e12 / 16, 819e9, True),
    "v5p": DevicePeaks("TPU v5p", 459e12, 459e12 / 16, 2765e9, True),
    "v4": DevicePeaks("TPU v4", 275e12, 275e12 / 16, 1228e9, True),
    "v6": DevicePeaks("TPU v6e", 918e12, 918e12 / 16, 1640e9, True),
    "cpu": DevicePeaks("host CPU (nominal)", 1e12, 0.5e12, 100e9, False),
}


def device_peaks(device=None):
    """Resolve DevicePeaks for a jax device (default: jax.devices()[0])."""
    import jax
    if device is None:
        device = jax.devices()[0]
    kind = (getattr(device, "device_kind", "") or str(device)).lower()
    if "v5 lite" in kind or "v5e" in kind or "v5lite" in kind:
        return _PEAKS["v5lite"]
    if "v5p" in kind or "v5" in kind:
        return _PEAKS["v5p"]
    if "v4" in kind:
        return _PEAKS["v4"]
    if "v6" in kind or "trillium" in kind:
        return _PEAKS["v6"]
    if device.platform == "tpu":
        return _PEAKS["v5lite"]._replace(name=kind, known=False)
    return _PEAKS["cpu"]


# --------------------------------------------------------------------------
# stage builders (per scenario)

def _matmul(m, n, k):
    return 2.0 * m * n * k


def _schulz_schedule_stages(name, n_steps, first_cold_analytic, hi_tail,
                            warm_start, n=NVP, pallas=True,
                            fused_kkt=False):
    """Pallas VMEM-resident Newton-Schulz schedule (schulz_inverse_batch
    / schulz_inverse_kkt_batch).

    Matmul count: cold-analytic first step is elementwise (the iterate is
    a scalar multiple of I); every other step is 2 (n, n) matmuls; a warm
    start adds the basin inner product inside step 0 (2 matmuls total).
    Middle steps run bf16x3 (3 passes), the hi_tail tail at HIGHEST (6).
    HBM: M in + inverse out (+ x0 in when warm); iterates stay in VMEM.
    With ``fused_kkt`` the KKT is BUILT in-kernel from the lazy factors
    (r5): only tiled (4*12*n) + band diagonals cross HBM instead of the
    (n, n) matrix, and the build adds VPU work.
    """
    mm = _matmul(n, n, n)
    n_mm = 2.0 * n_steps
    if first_cold_analytic and not warm_start:
        n_mm -= 2.0          # step 0 costs no matmul from the scalar init
    hi_mm = 2.0 * min(hi_tail, n_steps)
    lo_mm = max(n_mm - hi_mm, 0.0)
    passes = (6.0 * hi_mm + 3.0 * lo_mm) / max(n_mm, 1.0)
    vpu = 10.0 * n * n       # balance/unbalance + masks
    if fused_kkt:
        m_in = (4 * 12 * n + 4 * n) * F32     # tiled + band diagonals
        vpu += 16.0 * n * n                    # in-kernel H + band build
    else:
        m_in = n * n * F32
    bytes_ = m_in + n * n * F32 + (n * n * F32 if warm_start else 0)
    if not pallas:
        # XLA loop: every step round-trips m_b and the iterate
        bytes_ = n_steps * 3 * n * n * F32
    return Stage(name, n_mm * mm, passes, vpu, bytes_)


def _admm_iter_stage(name, iters, n=NV, m=NCON):
    """XLA fori_loop ADMM segment: per iteration one (n, n) matvec at
    HIGHEST plus ~10 streamed vector passes (rhs build, constraint
    matvecs, projection, dual update) whose HBM traffic rides along."""
    matvec = _matmul(n, n, 1)
    vec_bytes = 16.0 * m * F32              # ~8 read + 8 write passes
    return Stage(name, iters * matvec, 6.0,
                 iters * 20.0 * m,
                 iters * (n * n * F32 + vec_bytes))


def _condense_lazy_stage(name="condense_lazy"):
    """condense_nilpotent_lazy: gram + expand matmuls + gradient suffix
    sums; writes the factored tiled (4, 12, 120) + gradient."""
    fl = (_matmul(24, 24, NX)          # gram
          + _matmul(48, H * P.NUM_DOF, P.NUM_DOF)   # quad expand
          + _matmul(H, P.NUM_DOF, 26)  # gradient contract
          + 3 * _matmul(NX, NX, NX))   # N products / residual polynomial
    bytes_ = (4 * P.NUM_DOF * NV + NV + 2 * NCON + H * NX) * F32
    return Stage(name, fl, 6.0, 2e3, bytes_)


def _fused_kkt_stage(name="fused_balanced_kkt"):
    """_fused_balanced_kkt: one fused elementwise (120, 120) output pass
    over the factored Hessian + band + Jacobi balance."""
    return Stage(name, 0.0, 1.0, 12.0 * NV * NV,
                 (NV * NV + 4 * P.NUM_DOF * NV) * F32)


def _residual_stage(name="residuals"):
    """Warm-finish diagnostics: lazy Hessian matvec (4x MAC overhead) +
    constraint matvecs."""
    return Stage(name, 4 * _matmul(NV, 1, NV), 6.0, 10.0 * NCON,
                 (4 * P.NUM_DOF * NV + 4 * NCON) * F32)


def warm_tick_stages(settings):
    """Production warm tick (mpc_solve_warm_fused), per scenario. The
    pallas impl builds the KKT inside the Schulz kernel (r5), so no
    separate KKT stage exists there."""
    from go1_qp_mpc_controller_tpu.ops import admm as _admm
    refine = settings.schulz_refine
    pallas = _admm._resolved_impl(settings) == "pallas"
    stages = [_condense_lazy_stage()]
    if not pallas:
        stages.append(_fused_kkt_stage())
    stages += [
        _schulz_schedule_stages(
            "schulz_refine", refine, first_cold_analytic=False,
            hi_tail=min(refine, 2), warm_start=True,
            pallas=pallas, fused_kkt=pallas),
        _admm_iter_stage("admm_iters", settings.seg_iters),
        _residual_stage(),
    ]
    return stages


def cold_solve_stages(settings):
    """Cold MPC solve, per scenario. segments == 1 models the r5 fused
    single-segment program (solve_cold_fused: fused balanced KKT, one
    scaled Schulz schedule at the analytic rho0); segments > 1 models
    the segmented admm.mpc_solve (dense condensation + per-segment KKT
    rebuild + Schulz + iteration block)."""
    from go1_qp_mpc_controller_tpu.ops import admm

    if settings.segments == 1:
        l0 = settings.schulz_l0 if settings.schulz_l0 > 0 else 1e-6
        n_steps = len(admm._scaled_schulz_coeffs(l0))
        pallas = admm._resolved_impl(settings) == "pallas"
        stages = [_condense_lazy_stage()]
        if not pallas:
            stages.append(_fused_kkt_stage())
        return stages + [
            _schulz_schedule_stages(
                "schulz_cold", n_steps, first_cold_analytic=True,
                hi_tail=settings.schulz_hi_tail, warm_start=False,
                pallas=pallas, fused_kkt=pallas),
            _admm_iter_stage("admm_iters", settings.seg_iters),
            _residual_stage(),
        ]

    stages = [
        _condense_lazy_stage(),
        # lazy_hessian materialization + cost scaling + fused KKT build:
        # ~3 passes over the (120, 120) output
        Stage("hessian+kkt", 0.0, 1.0, 30.0 * NV * NV,
              3 * NV * NV * F32),
    ]
    for seg in range(settings.segments):
        iters = (settings.first_seg_iters
                 if (seg == 0 and settings.first_seg_iters > 0)
                 else settings.seg_iters)
        if seg == 0:
            l0 = settings.schulz_l0_first or settings.schulz_l0
            warm = False
        else:
            l0 = settings.schulz_l0_refine or settings.schulz_l0
            warm = True
            stages.append(Stage(f"kkt_rebuild_{seg}", 0.0, 1.0,
                                20.0 * NV * NV, 2 * NV * NV * F32))
        if l0 > 0:
            n_steps = len(admm._scaled_schulz_coeffs(l0))
        else:
            n_steps = settings.schulz_iters
        stages.append(_schulz_schedule_stages(
            f"schulz_seg{seg}", n_steps, first_cold_analytic=True,
            hi_tail=settings.schulz_hi_tail, warm_start=warm,
            pallas=admm._resolved_impl(settings) == "pallas"))
        stages.append(_admm_iter_stage(f"admm_seg{seg}", iters))
    stages.append(_residual_stage())
    return stages


def ekf_stages(schulz_steps=11):
    """sensor_update: FK/quat/Jacobian observe stage + 18/28 EKF tick
    (predict, innovation Schulz inverse in the lane kernel, Joseph
    update), per scenario. The lane kernel's matmuls are VPU work."""
    ns, nm = 18, 28
    ekf_mm = (2 * _matmul(ns, ns, ns)       # A P A'
              + _matmul(nm, ns, ns) + _matmul(nm, nm, ns)   # C P C'
              + _matmul(ns, nm, nm)         # K = P C' Sinv
              + _matmul(ns, ns, nm)         # K C
              + 2 * _matmul(ns, ns, ns)     # Joseph ikc P ikc'
              + _matmul(ns, nm, ns))        # K R K' (diag R)
    lanes = 2 * schulz_steps * _matmul(nm, nm, nm)
    observe = 4 * (200.0 + 2 * _matmul(3, 3, 3) + _matmul(3, 1, 3))
    state_bytes = (ns * ns + nm * nm + 4 * ns + 3 * nm) * F32
    return [
        Stage("observe_fk", 0.0, 1.0, observe + 2000.0, 120 * F32),
        Stage("ekf_dense", ekf_mm, 6.0, 3000.0, 3 * state_bytes),
        Stage("ekf_schulz_lanes", 0.0, 1.0, lanes, 2 * nm * nm * F32),
    ]


def ctrl_tick_stages(warm_settings, ekf_schulz_steps=11):
    """Full controller tick: observe+EKF + plan/swing (elementwise) +
    warm MPC + torques + SRB plant step."""
    return (ekf_stages(ekf_schulz_steps)
            + [Stage("plan_swing_torque_plant", 4 * _matmul(3, 3, 3),
                     6.0, 5e3, 400 * F32)]
            + warm_tick_stages(warm_settings))


# --------------------------------------------------------------------------

def summarize(stages, items_per_s, peaks):
    """Roofline summary dict for a benched mode.

    Args:
      stages: list of per-item Stage entries.
      items_per_s: measured throughput (solves/s, ticks/s, ...).
      peaks: DevicePeaks.

    Returns:
      dict with per-item flop/byte totals, achieved fractions, and the
      modeled bound ("mxu" | "vpu" | "hbm").
    """
    mxu = sum(s.mxu_flops for s in stages)
    mxu_pass = sum(s.mxu_flops * s.mxu_passes for s in stages)
    vpu = sum(s.vpu_flops for s in stages)
    byts = sum(s.hbm_bytes for s in stages)
    t_mxu = mxu_pass / peaks.bf16_flops
    t_vpu = vpu / peaks.vpu_flops
    t_hbm = byts / peaks.hbm_bytes
    t_bound = max(t_mxu, t_vpu, t_hbm)
    bound = ("mxu", "vpu", "hbm")[[t_mxu, t_vpu, t_hbm].index(t_bound)]
    return {
        "flops_per_item": round(mxu + vpu, 1),
        "mxu_flops_per_item": round(mxu, 1),
        "hbm_bytes_per_item": round(byts, 1),
        "mfu": round((mxu + vpu) * items_per_s / peaks.bf16_flops, 5),
        "hbm_frac": round(byts * items_per_s / peaks.hbm_bytes, 4),
        "roofline_items_per_s": round(1.0 / t_bound, 1),
        "roofline_frac": round(items_per_s * t_bound, 4),
        "bound": bound,
        "device_peaks_known": peaks.known,
    }
