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
from go1_qp_mpc_controller_tpu.ctrl import controller
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
    """

    def __init__(self, model, params, static, ctrl_state,
                 main_period_s=0.002, grf_period_s=0.002,
                 settings=admm.ADMMSettings(), power_level=5,
                 stop_on_terminal=False):
        self.model = model
        self.params = params
        self.static = static
        self.state = ctrl_state
        self.main_period = main_period_s
        self.grf_period = grf_period_s
        self.bridge = bridge_lib.RtBridge(power_level=power_level)
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

        def full_step(state, sensors, dt):
            state = controller.sensor_update(state, model, sensors, dt)
            return controller.control_step(
                state, model, params, dt, solver_type=solver,
                settings=settings,
                use_terrain_adapt=static.use_terrain_adapt)

        # no donation: CtrlState legally aliases identical leaves (e.g.
        # several zero-vectors share one buffer after init), which donation
        # rejects at execute time
        self._step = jax.jit(full_step)

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
        rate = bridge_lib.RateKeeper(self.main_period)
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
                    self.state = self._step(self.state, sensors, dt)
                tau = np.asarray(self.state.joint_torques, np.float64)
                self.bridge.push_command(tau)
                self.metrics.log("cycle_ms",
                                 (time.perf_counter() - t0) * 1e3)
            rate.wait()
            n += 1
        self.metrics.log("overruns", rate.overruns)
        rate.close()
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
