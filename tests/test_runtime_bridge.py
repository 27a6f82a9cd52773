"""C++ real-time bridge tests: build, blackboard exchange, safety clamps,
compensated-rate loop."""

import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.runtime import bridge


@pytest.fixture(scope="module")
def rtb():
    b = bridge.RtBridge(power_level=5)
    yield b
    b.close()


def test_sensor_roundtrip(rtb):
    quat = np.array([1.0, 0.0, 0.0, 0.0])
    acc = np.array([0.1, 0.2, 9.8])
    gyro = np.array([0.01, -0.02, 0.03])
    q = np.linspace(-1, 1, 12)
    dq = np.linspace(0, 2, 12)
    ff = np.array([10.0, 20.0, 30.0, 40.0])
    rtb.push_sensors(quat, acc, gyro, q, dq, ff)
    tick, s = rtb.read_sensors()
    assert tick >= 1
    np.testing.assert_allclose(s["quat"], quat)
    np.testing.assert_allclose(s["joint_pos"], q)
    np.testing.assert_allclose(s["foot_force"], ff)
    # ticks increase
    rtb.push_sensors(quat, acc, gyro, q, dq, ff)
    tick2, _ = rtb.read_sensors()
    assert tick2 == tick + 1


def test_command_safety_clamps(rtb):
    """PowerProtect: torque budget = power_level/10 * per-joint ceiling;
    PositionLimit: q clamped to joint limits; NaN zeroed
    (HardwareA1ROS.cpp:200-202 semantics)."""
    tau = np.full(12, 100.0)          # way over any ceiling
    tau[3] = np.nan
    q = np.full(12, 10.0)             # beyond joint limits
    rtb.push_command(tau, q, np.ones(12), np.ones(12))
    _, c = rtb.read_command()
    # power level 5 -> 50% budget of (23.7, 23.7, 35.55)
    np.testing.assert_allclose(c["tau"][0], 23.7 * 0.5)
    np.testing.assert_allclose(c["tau"][2], 35.55 * 0.5)
    assert c["tau"][3] == 0.0         # NaN zeroed
    np.testing.assert_allclose(c["q"][0], 0.9425)   # hip upper limit
    np.testing.assert_allclose(c["q"][1], 2.7855)   # thigh upper limit
    # negative direction
    rtb.push_command(-tau, -q, np.ones(12), np.ones(12))
    _, c = rtb.read_command()
    np.testing.assert_allclose(c["tau"][0], -23.7 * 0.5)
    np.testing.assert_allclose(c["q"][2], -2.6285)  # calf lower limit


def test_rate_keeper_timing():
    """Compensated 500 Hz loop holds its period within a loose CI bound."""
    worst = bridge.timing_self_test(period_s=0.002, iters=200)
    # non-RT kernel under CI load: only assert bounded jitter — the
    # compensated loop must never unbound-drift even when preempted
    assert worst < 0.05, f"worst period error {worst*1e3:.2f} ms"


def test_rate_keeper_object():
    import time
    rk = bridge.RateKeeper(0.001)
    t0 = time.perf_counter()
    for _ in range(50):
        rk.wait()
    elapsed = time.perf_counter() - t0
    assert 0.04 < elapsed < 0.5
    assert rk.overruns < 50
    rk.close()


def test_foot_force_ring_filter():
    """5-sample receive-side foot-force filter (HardwareA1ROS.cpp:300-312):
    the divisor is ALWAYS the full window, so the first pushes read low
    until the ring fills — the reference quirk, reproduced exactly."""
    b = bridge.RtBridge(power_level=5, foot_filter_window=5)
    try:
        quat = np.array([1.0, 0.0, 0.0, 0.0])
        z3, q12 = np.zeros(3), np.zeros(12)
        ff = np.array([10.0, 20.0, 30.0, 40.0])
        b.push_sensors(quat, z3, z3, q12, q12, ff)
        _, s = b.read_sensors()
        # one sample in a 5-divisor window
        np.testing.assert_allclose(s["foot_force"], ff / 5.0)
        for _ in range(4):
            b.push_sensors(quat, z3, z3, q12, q12, ff)
        _, s = b.read_sensors()
        np.testing.assert_allclose(s["foot_force"], ff)  # ring full
        # moving average: one outlier moves the mean by outlier/5
        b.push_sensors(quat, z3, z3, q12, q12, ff + 50.0)
        _, s = b.read_sensors()
        np.testing.assert_allclose(s["foot_force"], ff + 10.0)
    finally:
        b.close()


def test_sdk_leg_order_remap():
    """FR<->FL / RR<->RL wire-order remap (HardwareA1ROS.cpp:78-79,
    293-298, 190): an SDK-ordered sensor frame lands in controller order
    on the blackboard, and a controller-ordered command frame reads back
    in SDK wire order for the UDP send path."""
    swap_j = [3, 4, 5, 0, 1, 2, 9, 10, 11, 6, 7, 8]
    swap_f = [1, 0, 3, 2]
    b = bridge.RtBridge(power_level=10, sdk_leg_order=True)
    try:
        quat = np.array([1.0, 0.0, 0.0, 0.0])
        z3 = np.zeros(3)
        jp_ctrl = 0.01 * np.arange(12.0)      # inside position limits
        jv_ctrl = np.arange(12.0) + 100.0
        ff_ctrl = np.array([11.0, 22.0, 33.0, 44.0])
        # the SDK frame carries controller-leg i's values at wire slot
        # swap[i] (the swap is an involution)
        jp_sdk = jp_ctrl[swap_j]
        jv_sdk = jv_ctrl[swap_j]
        ff_sdk = ff_ctrl[swap_f]
        b.push_sensors(quat, z3, z3, jp_sdk, jv_sdk, ff_sdk)
        _, s = b.read_sensors()
        np.testing.assert_allclose(s["joint_pos"], jp_ctrl)
        np.testing.assert_allclose(s["joint_vel"], jv_ctrl)
        np.testing.assert_allclose(s["foot_force"], ff_ctrl)

        tau_ctrl = 0.1 * np.arange(12.0)
        b.push_command(tau_ctrl)
        _, c = b.read_command()
        np.testing.assert_allclose(c["tau"], tau_ctrl[swap_j])
    finally:
        b.close()


def test_sim_feeder_order_untouched():
    """Default bridges (sim feeders) pass frames through unpermuted."""
    b = bridge.RtBridge(power_level=10)
    try:
        quat = np.array([1.0, 0.0, 0.0, 0.0])
        z3 = np.zeros(3)
        jp = 0.01 * np.arange(12.0)
        b.push_sensors(quat, z3, z3, jp, jp, np.arange(4.0))
        _, s = b.read_sensors()
        np.testing.assert_allclose(s["joint_pos"], jp)
        np.testing.assert_allclose(s["foot_force"], np.arange(4.0))
    finally:
        b.close()
