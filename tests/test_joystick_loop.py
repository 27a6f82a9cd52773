"""Operator (joystick) path through the dual-cadence host loop.

VERDICT r2 item 7: a scripted joy sequence must drive stand -> walk ->
stand -> exit through ControlLoop.run_dual, mirroring the reference's
/joy -> desired state -> mode toggle -> joy_cmd_exit operator path
(GazeboA1ROS.cpp:117-188, 381-415).
"""

import threading
import time

import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.config import presets
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.runtime import feeder as feeder_lib
from go1_qp_mpc_controller_tpu.runtime import joystick
from go1_qp_mpc_controller_tpu.runtime import loop as loop_lib

TIME_SCALE = 0.25


def _axes(velx=0.0, toggle=False, exit_=False):
    raw_axes = np.zeros(8, np.float32)
    raw_axes[4] = velx                     # right stick vertical -> velx
    raw_buttons = np.zeros(5, np.int32)
    raw_buttons[0] = int(toggle)           # A button
    raw_buttons[4] = int(exit_)            # LB button
    return raw_axes, raw_buttons


def test_scripted_joy_drives_stand_walk_stop():
    model, params, static = presets.load_preset("hardware_qp")
    ctrl = types.init_ctrl_state(model, jnp.float32)

    ax_walk, btn_walk = _axes(velx=0.3, toggle=True)
    ax_vel, btn_none = _axes(velx=0.3)
    ax_stop, btn_stop = _axes(toggle=True)
    ax_exit, btn_exit = _axes(exit_=True)
    src = joystick.ScriptedJoySource([
        (250, ax_walk, btn_walk),      # A + forward stick -> walk
        (400, ax_vel, btn_none),       # keep walking
        (450, ax_stop, btn_stop),      # A again -> stand, stick released
        (650, ax_exit, btn_exit),      # LB -> exit
    ])

    cl = loop_lib.ControlLoop(model, params, static, ctrl,
                              main_period_s=0.001, grf_period_s=0.001,
                              time_scale=TIME_SCALE, command_source=src)
    feeder = feeder_lib.SimFeeder(cl.bridge, model, params, height=0.3,
                                  period_s=0.001, time_scale=TIME_SCALE)
    cl.state = feeder.initial_ctrl_state()
    cl.warmup(dual=True)
    try:
        feeder.start(duration_s=30.0)
        t = threading.Thread(target=cl.run_dual,
                             kwargs={"duration_s": 25.0}, daemon=True)
        t0 = time.time()
        t.start()
        # sample the live mode/commands while the loop runs
        seen_modes = []
        seen_vel = []
        while t.is_alive() and time.time() - t0 < 30.0:
            seen_modes.append(int(np.asarray(cl.state.movement_mode)))
            seen_vel.append(float(np.asarray(cl.state.root_lin_vel_d[0])))
            time.sleep(0.05)
        t.join(timeout=5.0)
        assert not t.is_alive()
        # LB exited the loop well before the 25 s wall budget
        assert time.time() - t0 < 20.0
    finally:
        feeder.stop()
        cl.close()

    modes = np.asarray(seen_modes)
    vels = np.asarray(seen_vel)
    # stand -> walk -> stand actually happened
    assert modes[0] == 0
    assert (modes == 1).any(), modes
    walk_idx = np.nonzero(modes == 1)[0]
    assert (modes[walk_idx[-1]:] == 0).any()
    # the commanded velocity followed the stick (scaled by VELX_MAX)
    from go1_qp_mpc_controller_tpu.config import params as P
    assert np.isclose(vels[walk_idx].max(), 0.3 * P.JOY_CMD_VELX_MAX,
                      atol=1e-5), vels[walk_idx]
    # back to zero once the stick was released
    assert abs(vels[-1]) < 1e-6
    # the plant survived the session
    assert np.isfinite(feeder.sim_root_pos).all()
