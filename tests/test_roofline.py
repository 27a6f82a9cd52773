"""The bench roofline model must be populated and sane: positive static
flop/byte counts, fractions in (0, 1] against the modeled peaks, and the
schedule lengths tracking the ADMMSettings they account (VERDICT r4
item 2 — the MFU/roofline claims must be regressable from artifacts)."""

import numpy as np

from go1_qp_mpc_controller_tpu.ops import admm
from go1_qp_mpc_controller_tpu.utils import roofline

COLD = admm.ADMMSettings(seg_iters=30, segments=2, first_seg_iters=20,
                         polish=False, schulz_l0=1e-6,
                         schulz_l0_first=1e-3, schulz_l0_refine=1e-4,
                         schulz_hi_tail=1, schulz_impl="pallas")
WARM = admm.ADMMSettings(seg_iters=15, segments=1, polish=False,
                         schulz_refine=1)


def test_stage_counts_positive():
    for stages in (roofline.warm_tick_stages(WARM),
                   roofline.cold_solve_stages(COLD),
                   roofline.ekf_stages(),
                   roofline.ctrl_tick_stages(WARM)):
        assert len(stages) >= 3
        for s in stages:
            assert s.hbm_bytes > 0, s.name
            assert s.mxu_flops >= 0 and s.vpu_flops >= 0, s.name
            assert 1.0 <= s.mxu_passes <= 6.0, s.name
        assert sum(s.mxu_flops + s.vpu_flops for s in stages) > 0


def test_cold_costs_more_than_warm():
    peaks = roofline._PEAKS["v5lite"]
    cold = roofline.summarize(roofline.cold_solve_stages(COLD), 1.0, peaks)
    warm = roofline.summarize(roofline.warm_tick_stages(WARM), 1.0, peaks)
    assert cold["flops_per_item"] > 2 * warm["flops_per_item"]
    assert cold["hbm_bytes_per_item"] > warm["hbm_bytes_per_item"]


def test_summarize_fields_sane():
    peaks = roofline._PEAKS["v5lite"]
    stages = roofline.warm_tick_stages(WARM)
    # at a plausibly-achievable rate every fraction lies in (0, 1]
    rate = 0.5 / max(
        sum(s.hbm_bytes for s in stages) / peaks.hbm_bytes,
        sum(s.mxu_flops * s.mxu_passes for s in stages) / peaks.bf16_flops)
    out = roofline.summarize(stages, rate, peaks)
    for key in ("mfu", "hbm_frac", "roofline_frac"):
        assert 0.0 < out[key] <= 1.0, (key, out)
    assert out["bound"] in ("mxu", "vpu", "hbm")
    assert out["roofline_items_per_s"] > rate
    assert out["device_peaks_known"]
    # fractions scale linearly with the measured rate
    out2 = roofline.summarize(stages, 2 * rate, peaks)
    np.testing.assert_allclose(out2["roofline_frac"],
                               2 * out["roofline_frac"], rtol=1e-3)


def test_schedule_length_tracks_settings():
    """The cold model's Schulz matmul count must respond to the
    configured schedule edges (guards against the model going stale
    when the solver schedule changes)."""
    base = roofline.cold_solve_stages(COLD)
    longer = roofline.cold_solve_stages(
        COLD._replace(schulz_l0_first=1e-6))
    fl = lambda st: sum(s.mxu_flops for s in st if "schulz" in s.name)
    assert fl(longer) > fl(base)
    more_iters = roofline.cold_solve_stages(COLD._replace(seg_iters=60))
    it = lambda st: sum(s.mxu_flops for s in st if "admm" in s.name)
    assert it(more_iters) > it(base)


def test_device_peaks_resolution():
    class FakeDev:
        device_kind = "TPU v5 lite"
        platform = "tpu"
    pk = roofline.device_peaks(FakeDev())
    assert pk.known and pk.name == "TPU v5e"

    class Cpu:
        device_kind = "cpu"
        platform = "cpu"
    assert not roofline.device_peaks(Cpu()).known


def test_fused_cold_model():
    """segments == 1 selects the fused single-segment cold model
    (solve_cold_fused): fused KKT stage, one cold Schulz schedule, and
    strictly fewer flops/bytes than the segmented program."""
    fused = admm.ADMMSettings(seg_iters=40, segments=1, polish=False,
                              schulz_l0=1e-6, schulz_hi_tail=1,
                              schulz_impl="pallas")
    st = roofline.cold_solve_stages(fused)
    names = [s.name for s in st]
    # pallas impl builds the KKT inside the Schulz kernel (r5): no
    # separate KKT stage, one cold schedule
    assert "schulz_cold" in names and "hessian+kkt" not in names
    assert "fused_balanced_kkt" not in names
    assert not any("seg1" in n for n in names)
    seg = roofline.cold_solve_stages(COLD)
    tot = lambda stages: sum(s.mxu_flops * s.mxu_passes for s in stages)
    byt = lambda stages: sum(s.hbm_bytes for s in stages)
    assert tot(st) < tot(seg)
    assert byt(st) < byt(seg)
