"""Observability + host control-loop tests."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.config import presets
from go1_qp_mpc_controller_tpu.ctrl import controller
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import admm
from go1_qp_mpc_controller_tpu.runtime import loop as loop_lib
from go1_qp_mpc_controller_tpu.utils import metrics as metrics_lib


def test_metrics_logger_roundtrip():
    m = metrics_lib.MetricsLogger(capacity=10)
    for i in range(15):
        m.log("x", float(i), step=i)
    recs = m.records("x")
    assert len(recs) == 10           # bounded ring
    s = m.summary("x")
    assert s["count"] == 10
    assert s["max"] == 14.0
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.jsonl")
        m.dump_jsonl(path)
        assert len(open(path).readlines()) == 10


def test_controller_telemetry():
    model = types.default_robot_model(jnp.float64)
    state = types.init_ctrl_state(model, jnp.float64)
    t = metrics_lib.controller_telemetry(state)
    assert "terrain_angle_deg" in t
    assert len(t["joint_torques"]) == 12


def test_control_loop_against_bridge():
    """The host loop consumes bridge sensors and produces clamped torque
    commands — a miniature of the hardware main()."""
    model, params, static = presets.load_preset("gazebo_mpc", jnp.float32)
    ctrl = types.init_ctrl_state(model, jnp.float32)
    cl = loop_lib.ControlLoop(
        model, params, static, ctrl, main_period_s=0.01,
        settings=admm.ADMMSettings(seg_iters=10, segments=1, polish=False),
        power_level=5)
    try:
        # feed a standing-pose sensor frame
        quat = np.array([1.0, 0, 0, 0])
        acc = np.array([0.0, 0.0, 9.81])
        gyro = np.zeros(3)
        from go1_qp_mpc_controller_tpu.models import kinematics
        feet = np.asarray(model.default_foot_pos)
        q = np.asarray(kinematics.inverse_kinematics(
            jnp.asarray(feet), model.leg_geometry.rho_fix)).reshape(12)
        dq = np.zeros(12)
        ff = np.full(4, 40.0)
        cl.bridge.push_sensors(quat, acc, gyro, q, dq, ff)
        ticks = cl.run(num_ticks=3)
        assert ticks == 3
        cmd_tick, cmd = cl.bridge.read_command()
        assert cmd_tick >= 1
        # warmup keeps torques at zero for the first 10 controller ticks
        # (A1RobotControl.cpp:292-295); they must at least be clamped/finite
        assert np.isfinite(cmd["tau"]).all()
        assert np.abs(cmd["tau"]).max() <= 35.55 * 0.5 + 1e-9
        assert len(cl.metrics.records("cycle_ms")) >= 1
    finally:
        cl.close()


def test_control_loop_terminal_watchdog():
    """A joint past its limit trips the terminal-state watchdog and, with
    stop_on_terminal, halts the loop (GazeboA1ROS.cpp:233, 418-425)."""
    model, params, static = presets.load_preset("gazebo_mpc", jnp.float32)
    ctrl = types.init_ctrl_state(model, jnp.float32)
    cl = loop_lib.ControlLoop(
        model, params, static, ctrl, main_period_s=0.01,
        settings=admm.ADMMSettings(seg_iters=2, segments=1, polish=False),
        stop_on_terminal=True)
    try:
        quat = np.array([1.0, 0, 0, 0])
        q = np.array([0.0, 0.67, -1.3] * 4)
        q[0] = 1.5   # hip past the +1.047 limit
        cl.bridge.push_sensors(quat, np.array([0.0, 0.0, 9.81]),
                               np.zeros(3), q, np.zeros(12),
                               np.full(4, 40.0))
        ticks = cl.run(num_ticks=5)
        assert ticks == 0            # stopped on the first sensor frame
        recs = cl.metrics.records("terminal_state")
        assert recs and recs[-1]["value"] == 1.0
    finally:
        cl.close()
