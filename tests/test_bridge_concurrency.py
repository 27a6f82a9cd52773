"""Seqlock torn-read stress test for the C++ bridge.

The reference's threads race on a shared struct by design
(MainGazebo.cpp:42-126); our bridge replaces that with a seqlock that must
never deliver a torn frame. A writer hammers correlated payloads while
readers verify the correlation invariant on every read.
"""

import threading

import numpy as np

from go1_qp_mpc_controller_tpu.runtime import bridge


def test_seqlock_no_torn_reads():
    b = bridge.RtBridge(power_level=10)
    stop = threading.Event()
    errors = []

    def writer():
        k = 0
        while not stop.is_set():
            k += 1
            v = float(k % 1000)
            # correlated payload: every field carries the same value
            b.push_sensors(np.full(4, v), np.full(3, v), np.full(3, v),
                           np.full(12, v), np.full(12, v), np.full(4, v))

    def reader():
        for _ in range(20000):
            _, s = b.read_sensors()
            vals = np.concatenate([s["quat"], s["acc"], s["gyro"],
                                   s["joint_pos"], s["joint_vel"],
                                   s["foot_force"]])
            if not np.all(vals == vals[0]):
                errors.append(vals.copy())
                return

    try:
        wt = threading.Thread(target=writer, daemon=True)
        rts = [threading.Thread(target=reader, daemon=True)
               for _ in range(2)]
        wt.start()
        for t in rts:
            t.start()
        for t in rts:
            t.join(timeout=30)
        stop.set()
        wt.join(timeout=5)
        assert not errors, f"torn read detected: {errors[0][:6]}"
    finally:
        stop.set()
        b.close()
