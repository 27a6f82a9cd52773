"""Host runtime: the dual-cadence real-time control loop.

TPU-native replacement for the reference's process entry points
(MainGazebo.cpp:47-121, MainHardware.cpp:85-129): two free-running loops —
a GRF/MPC loop and a main plan+torque loop — plus a sensor feed, all paced
by the C++ compensated-sleep rate keepers and exchanging state through the
lock-free bridge blackboard instead of a racy shared struct.

The device side stays persistent-jitted: one compiled control_step is
invoked per tick (donated state buffers keep it allocation-free). The MPC
solution is re-used across fast ticks exactly like the reference's thread
decoupling ("MPC thread solves while torque thread consumes the last GRF").
"""

import threading
import time

import jax
import numpy as np

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.ctrl import command as command_lib
from go1_qp_mpc_controller_tpu.ctrl import controller, gait, swing, torque
from go1_qp_mpc_controller_tpu.ops import admm
from go1_qp_mpc_controller_tpu.runtime import bridge as bridge_lib
from go1_qp_mpc_controller_tpu.utils import metrics as metrics_lib


class ControlLoop:
    """Drives a jitted controller against the RT bridge.

    Args:
      model, params: RobotModel / CtrlParams.
      static: presets.StaticConfig (solver branch etc.).
      ctrl_state: initial CtrlState.
      main_period_s: plan+torque cadence (reference: 0.5-2 ms).
      grf_period_s: MPC/GRF cadence.
      power_level: safety budget for the bridge clamps.
      command_source: optional joystick source with
        ``poll() -> list[(raw_axes (8,), raw_buttons (>=5,))]``
        (runtime/joystick.py). When set, :meth:`run_dual` maps every
        sample through the operator chain axes_from_raw -> clamp_axes ->
        latch_buttons -> apply_commands inside the jitted fast step —
        the reference's joy -> desired-state -> mode-toggle path
        (GazeboA1ROS.cpp:117-188, 381-415) — and the LB button stops the
        loop (joy_cmd_exit, :412-415).
    """

    def __init__(self, model, params, static, ctrl_state,
                 main_period_s=0.002, grf_period_s=0.002,
                 settings=admm.ADMMSettings(), power_level=5,
                 stop_on_terminal=False, time_scale=1.0,
                 command_source=None, estimate_in_feed=False,
                 sensor_period_s=0.001):
        self.model = model
        self.params = params
        self.static = static
        self.state = ctrl_state
        self.main_period = main_period_s
        self.grf_period = grf_period_s
        # real-time factor: wall period = sim period / time_scale while the
        # math dts stay in sim time — the reference's use_sim_time Gazebo
        # runs the same way when the simulator's RTF < 1
        # (MainGazebo.cpp:31-37 requires use_sim_time). Use < 1 when the
        # solve latency of the deployment host exceeds the real-time
        # budget (e.g. CPU-only demos; a co-located TPU runs at 1.0).
        self.time_scale = time_scale
        # the hardware receive path filters foot forces through a 5-sample
        # ring (HardwareA1ROS.cpp:300-312); Gazebo/Isaac feed raw values.
        # PowerProtect torque budgets likewise exist only on hardware
        # (HardwareA1ROS.cpp:200-202; GazeboA1ROS::send_cmd has no safety
        # layer) — sim envs get the full physical ceiling (level 10).
        hardware = static.environment == "hardware"
        self.bridge = bridge_lib.RtBridge(
            power_level=power_level if hardware else 10,
            foot_filter_window=5 if hardware else 0)
        self.metrics = metrics_lib.MetricsLogger()
        self._stop = threading.Event()
        self._lock = threading.Lock()
        # joint-limit terminal-state watchdog (GazeboA1ROS.cpp:233,418-425;
        # the reference prints it per send_cmd with the shutdown commented
        # out — stop_on_terminal=True enables the shutdown)
        self.stop_on_terminal = stop_on_terminal
        self._pos_limits = np.asarray(P.JOINT_POS_LIMITS)
        solver = (controller.MPC if static.solver == "mpc"
                  else controller.QP)
        self.command_source = command_source
        # estimate_in_feed: run the EKF in a dedicated thread consuming
        # EVERY bridge frame at the sensor cadence (the reference's
        # receive-thread estimation, HardwareA1ROS.cpp:343-378) instead
        # of inside the fast control step, which only sees the latest
        # frame per control tick and drops the rest
        self.estimate_in_feed = estimate_in_feed
        self.sensor_period = sensor_period_s

        # params is a DYNAMIC argument of every jitted step (not a closed-
        # over constant): the joystick path mutates kp_linear per tick
        # (apply_commands' translating-xy gain zeroing) without recompiles
        def full_step(state, sensors, dt, params):
            state = controller.sensor_update(state, model, sensors, dt)
            return controller.control_step(
                state, model, params, dt, solver_type=solver,
                settings=settings,
                use_terrain_adapt=static.use_terrain_adapt)

        # no donation: CtrlState legally aliases identical leaves (e.g.
        # several zero-vectors share one buffer after init), which donation
        # rejects at execute time
        self._step = jax.jit(full_step)

        # dual-cadence split (MainGazebo.cpp:47-121): the fast loop runs
        # plan + swing + torques against the LAST solved GRF; the slow
        # loop re-solves the GRF QP/MPC on a state snapshot
        def fast_step(state, sensors, dt, params):
            # with the estimator thread active, sensor_update only
            # refreshes kinematics; the merged thread estimate already
            # holds root_pos/root_lin_vel
            state = controller.sensor_update(state, model, sensors, dt,
                                             estimate=not estimate_in_feed)
            state = gait.update_plan(state, params, model)
            state = swing.generate_swing_legs_ctrl(state, params, dt)
            return torque.compute_joint_torques(state, params)

        def fast_step_joy(state, joy, params, ax_raw, btn, sensors, dt):
            # the operator chain runs INSIDE the jitted tick: one device
            # dispatch per fast tick whether or not a joystick is attached
            axes = command_lib.axes_from_raw(ax_raw, btn)
            axes = command_lib.clamp_axes(axes)
            joy = command_lib.latch_buttons(joy, axes)
            joy, state, params = command_lib.apply_commands(
                joy, axes, state, params, dt)
            state = fast_step(state, sensors, dt, params)
            return state, joy, params

        def grf_step(state, params):
            if solver == controller.MPC:
                return controller.compute_grf_mpc(
                    state, model, params, settings,
                    static.use_terrain_adapt)
            return controller.compute_grf_qp(state, model, params,
                                             settings)

        self._fast_step = jax.jit(fast_step)
        self._fast_step_joy = jax.jit(fast_step_joy)
        self._grf_step = jax.jit(grf_step)
        self.fast_ticks = 0
        self.grf_ticks = 0

    def warmup(self, dual=True):
        """Compile the jitted step(s) before entering the RT loops, so the
        first in-loop ticks are not multi-second compile stalls (results
        are discarded; only the jit cache matters)."""
        import jax.numpy as jnp
        dtype = self.state.root_pos.dtype
        dt = jnp.asarray(self.main_period, dtype)
        s = controller.SensorData(
            quat_wxyz=jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype),
            imu_acc=jnp.asarray([0.0, 0.0, 9.8], dtype),
            imu_ang_vel=jnp.zeros(3, dtype),
            joint_pos=self.state.joint_pos.astype(dtype),
            joint_vel=jnp.zeros(12, dtype),
            foot_force=jnp.full((4,), 50.0, dtype))
        if dual:
            if self.command_source is not None:
                joy = command_lib.init_joy_state(0.3, dtype)
                ax = jnp.zeros(8, dtype)
                btn = jnp.zeros(5, jnp.int32)
                st, _, _ = self._fast_step_joy(self.state, joy,
                                               self.params, ax, btn, s, dt)
            else:
                st = self._fast_step(self.state, s, dt, self.params)
            jax.block_until_ready(st.joint_torques)
            jax.block_until_ready(
                self._grf_step(st, self.params).foot_forces_grf)
        else:
            jax.block_until_ready(
                self._step(self.state, s, dt, self.params).joint_torques)

    def _read_sensor_data(self):
        tick, s = self.bridge.read_sensors()
        import jax.numpy as jnp
        dtype = self.state.root_pos.dtype
        return tick, controller.SensorData(
            quat_wxyz=jnp.asarray(s["quat"], dtype),
            imu_acc=jnp.asarray(s["acc"], dtype),
            imu_ang_vel=jnp.asarray(s["gyro"], dtype),
            joint_pos=jnp.asarray(s["joint_pos"], dtype),
            joint_vel=jnp.asarray(s["joint_vel"], dtype),
            foot_force=jnp.asarray(s["foot_force"], dtype))

    def run(self, num_ticks=None, duration_s=None):
        """Blocking main loop (single-loop fused variant: plan+solve+send
        each tick, the on-device fusion of the reference's two threads)."""
        rate = bridge_lib.RateKeeper(self.main_period / self.time_scale)
        import jax.numpy as jnp
        dt = jnp.asarray(self.main_period, self.state.root_pos.dtype)
        n = 0
        t_end = time.time() + duration_s if duration_s else None
        last_sensor_tick = -1
        while not self._stop.is_set():
            if num_ticks is not None and n >= num_ticks:
                break
            if t_end is not None and time.time() >= t_end:
                break
            tick, sensors = self._read_sensor_data()
            if tick > 0 and tick != last_sensor_tick:
                last_sensor_tick = tick
                q = np.asarray(sensors.joint_pos).reshape(4, 3)
                terminal = bool(np.any((q <= self._pos_limits[:, 0])
                                       | (q >= self._pos_limits[:, 1])))
                self.metrics.log("terminal_state", float(terminal))
                if terminal and self.stop_on_terminal:
                    self._stop.set()
                    break
                t0 = time.perf_counter()
                with self._lock:
                    self.state = self._step(self.state, sensors, dt,
                                            self.params)
                tau = np.asarray(self.state.joint_torques, np.float64)
                self.bridge.push_command(tau)
                self.metrics.log("cycle_ms",
                                 (time.perf_counter() - t0) * 1e3)
            rate.wait()
            n += 1
        self.metrics.log("overruns", rate.overruns)
        rate.close()
        return n

    # fields the GRF solve owns; merged into the live state whenever a
    # solve lands (the reference's GRF thread writes the same fields into
    # the shared A1CtrlStates without locks, A1RobotControl.cpp:321-564)
    _GRF_FIELDS = ("foot_forces_grf", "qp_warm_x", "qp_warm_y",
                   "qp_warm_rho", "qp_warm_minv", "qp_warm_contacts",
                   "qp_warm_grad", "terrain_angle_filter",
                   "terrain_pitch_angle", "root_euler_d")

    def run_dual(self, num_ticks=None, duration_s=None):
        """Dual-cadence variant of :meth:`run`: a GRF solver loop at
        ``grf_period_s`` and a fast plan+torque loop at ``main_period_s``
        consuming the last solution — the reference's two free-running
        threads (MainGazebo.cpp:47-121, MainHardware.cpp:85-129), each on
        its own C++ compensated rate keeper.

        Returns the number of fast ticks run; ``self.grf_ticks`` counts
        landed solves.
        """
        import jax.numpy as jnp
        grf_done = threading.Event()

        def grf_loop():
            rate = bridge_lib.RateKeeper(self.grf_period / self.time_scale)
            try:
                while not self._stop.is_set():
                    with self._lock:
                        snap = self.state
                        params_now = self.params
                    t0 = time.perf_counter()
                    solved = self._grf_step(snap, params_now)
                    jax.block_until_ready(solved.foot_forces_grf)
                    self.metrics.log(
                        "grf_ms", (time.perf_counter() - t0) * 1e3)
                    merged = {f: getattr(solved, f)
                              for f in self._GRF_FIELDS}
                    with self._lock:
                        self.state = self.state._replace(**merged)
                    self.grf_ticks += 1
                    rate.wait()
                self.metrics.log("grf_overruns", rate.overruns)
            finally:
                rate.close()
                grf_done.set()

        grf_thread = threading.Thread(target=grf_loop, daemon=True)
        rate = bridge_lib.RateKeeper(self.main_period / self.time_scale)
        dtype = self.state.root_pos.dtype
        dt = jnp.asarray(self.main_period, dtype)
        n = 0
        last_sensor_tick = -1
        # joystick bookkeeping: the last axes keep applying between
        # samples (the reference's main_update consumes the last
        # joy_cmd_* every tick); button presses OR-accumulate so a press
        # between two fast ticks is never lost
        joy = None
        if self.command_source is not None:
            h0 = float(np.asarray(self.state.root_pos_d[2]))
            joy = command_lib.init_joy_state(h0 if h0 > 0.05 else 0.3,
                                             dtype)
            last_axes = np.zeros(8, np.float32)
            btn_accum = np.zeros(5, np.int32)
        est = None
        if self.estimate_in_feed:
            from go1_qp_mpc_controller_tpu.runtime import (
                estimator as estimator_lib)
            est = estimator_lib.EstimatorThread(
                self.bridge, self.model, self.state.estimator_x,
                self.state.estimator_P,
                sensor_period_s=self.sensor_period,
                time_scale=self.time_scale)
            self.est_thread = est
            est.start()
        grf_thread.start()
        # duration clock starts AFTER estimator/joy construction (the
        # EstimatorThread's compile would otherwise eat the run window)
        t_end = time.time() + duration_s if duration_s else None
        try:
            while not self._stop.is_set():
                if num_ticks is not None and n >= num_ticks:
                    break
                if t_end is not None and time.time() >= t_end:
                    break
                tick, sensors = self._read_sensor_data()
                if tick > 0 and tick != last_sensor_tick:
                    last_sensor_tick = tick
                    q = np.asarray(sensors.joint_pos).reshape(4, 3)
                    terminal = bool(np.any((q <= self._pos_limits[:, 0])
                                           | (q >= self._pos_limits[:, 1])))
                    self.metrics.log("terminal_state", float(terminal))
                    if terminal and self.stop_on_terminal:
                        break
                    t0 = time.perf_counter()
                    with self._lock:
                        state = self.state
                    if est is not None and est.frames > 0:
                        # frames == 0 guard: the pre-update init_state
                        # carries the reference's crouched z = 0.09
                        # (A1BasicEKF.cpp:55-68) — consuming it before
                        # the first KF update hands the controller a
                        # 21 cm height error on tick 0
                        ex, ep, econ = est.snapshot()
                        state = state._replace(
                            estimator_x=ex, estimator_P=ep,
                            estimated_contacts=jnp.asarray(econ),
                            root_pos=ex[0:3], root_lin_vel=ex[3:6])
                    if self.command_source is not None:
                        for ax, bt in self.command_source.poll():
                            last_axes = np.asarray(ax, np.float32)
                            btn_accum = np.maximum(
                                btn_accum,
                                np.asarray(bt[:5], np.int32))
                        state, joy, params_new = self._fast_step_joy(
                            state, joy, self.params,
                            jnp.asarray(last_axes, dtype),
                            jnp.asarray(btn_accum), sensors, dt)
                        btn_accum = np.zeros(5, np.int32)
                        with self._lock:
                            self.params = params_new
                        if bool(np.asarray(joy.exit_request)):
                            self._stop.set()
                    else:
                        state = self._fast_step(state, sensors, dt,
                                                self.params)
                    tau = np.asarray(state.joint_torques, np.float64)
                    with self._lock:
                        # keep any GRF-solve fields that landed while the
                        # fast step ran
                        merged = {f: getattr(self.state, f)
                                  for f in self._GRF_FIELDS}
                        self.state = state._replace(**merged)
                    self.bridge.push_command(tau)
                    if est is not None:
                        est.set_movement_mode(
                            int(np.asarray(state.movement_mode)))
                    self.metrics.log("cycle_ms",
                                     (time.perf_counter() - t0) * 1e3)
                    self.fast_ticks += 1
                rate.wait()
                n += 1
        finally:
            self._stop.set()
            if est is not None:
                est.stop()
            grf_done.wait(timeout=5.0)
            self.metrics.log("overruns", rate.overruns)
            rate.close()
            self._stop.clear()
        return n

    def start(self, **kwargs):
        self._thread = threading.Thread(target=self.run, kwargs=kwargs,
                                        daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if hasattr(self, "_thread"):
            self._thread.join(timeout=5.0)

    def close(self):
        self.stop()
        self.bridge.close()
