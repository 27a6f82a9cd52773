"""RL host loop: the hardware-mirror RL control process over the bridge.

TPU-native equivalent of Go1RLHardwareController + Go1HardwareObservation
(go1_rl_ctrl_cpp/src/Go1RLHardwareController.*, Go1HardwareObservation.hpp):
a real-time loop that reads raw sensor frames from the RtBridge (the UDP
receive path's role, including the hardware 5-sample foot-force filter and
PowerProtect clamps on the way out), runs the estimation + observation +
policy/servo step as ONE jitted program, and pushes position-mode motor
commands (q + kp/kd, tau=0 — Go1RLController.cpp:149-166).

The reference splits this across an estimation thread, an action thread
(2.5/4 ms) and a send thread (1/2 ms); here estimation+action fuse into one
jitted step at the action cadence and the bridge's command slot plays the
send thread (the consumer reads the latest command at its own rate —
position commands are stable across sends, unlike torques).
"""

import threading
import time

import jax
import numpy as np

from go1_qp_mpc_controller_tpu.ctrl import rl as rl_lib
from go1_qp_mpc_controller_tpu.models import kinematics
from go1_qp_mpc_controller_tpu.ops import ekf
from go1_qp_mpc_controller_tpu.runtime import bridge as bridge_lib
from go1_qp_mpc_controller_tpu.utils import rotations


class RLControlLoop:
    """Drives the jitted RL controller against the RT bridge.

    Args:
      model: RobotModel (leg geometry for FK + the estimation thread).
      policy_params: MLP actor params (models/policy.py layout).
      action_period_s: policy cadence (reference: 4 ms Gazebo / 2.5 ms
        hardware, config/parameters.yaml:9-11).
      hardware: True enables the hardware receive-path foot filter and
        PowerProtect budget on the bridge.
      time_scale: real-time factor (see runtime/loop.py).
      contact_force_norm: KF full-contact force scale. The Go1 RL stack
        normalizes by 1000 (Go1 hardware force units, Go1BasicEKF.cpp:83)
        where the A1 MPC stack uses 100 (A1BasicEKF.cpp:83) — the Go1
        default here matches the stack this loop mirrors.
    """

    def __init__(self, model, policy_params, action_period_s=0.004,
                 power_level=5, hardware=True, time_scale=1.0,
                 servo_only=False, contact_force_norm=1000.0):
        import jax.numpy as jnp

        self.model = model
        self.period = action_period_s
        self.time_scale = time_scale
        self.bridge = bridge_lib.RtBridge(
            power_level=power_level if hardware else 10,
            foot_filter_window=5 if hardware else 0)
        self._stop = threading.Event()
        self.ticks = 0
        self.command = np.zeros(3)      # (cmd_vx, cmd_vy, cmd_yaw_rate)
        self.toggle = False             # A-button press (one-shot)
        # servo_only mirrors the standalone GazeboServo/HardwareServo
        # stand processes (servo_stand_policy/): the mode switch is
        # disabled and the loop interpolates to the crouch pose forever
        self.servo_only = servo_only

        dtype = jnp.float32
        self._dtype = dtype
        self.rl_state = rl_lib.init_rl_state(dtype=dtype)
        self._est = None                # (x, P) after first frame

        def step(est_x, est_p, rl_state, sensors, command, toggle, dt):
            quat, acc, gyro, q, dq, ff = sensors
            rot = rotations.quat_to_rot_mat(quat)
            euler = rotations.quat_to_euler(quat)
            rot_z = rotations.rot_z(euler[2])
            geom = model.leg_geometry
            q_legs = q.reshape(4, 3)
            foot_pos_rel = kinematics.fk(q_legs, geom.rho_opt, geom.rho_fix)
            j_foot = kinematics.jac(q_legs, geom.rho_opt, geom.rho_fix)
            foot_vel_rel = jnp.einsum('lij,lj->li', j_foot,
                                      dq.reshape(4, 3))
            # the estimation thread's KF (Go1Observation.hpp:392-424),
            # shared with the MPC stack (Go1 copies the same A1BasicEKF)
            res = ekf.update_estimation(est_x, est_p, dt, rot, acc, gyro,
                                        foot_pos_rel, foot_vel_rel, ff,
                                        rl_state.movement_mode,
                                        contact_force_norm=contact_force_norm)
            rl_state = rl_lib.switch_mode(rl_state, toggle)
            rl_state, cmd, obs = rl_lib.rl_control_step(
                rl_state, policy_params, rot, rot_z, res.x[3:6], gyro,
                command, q, dq)
            return res.x, res.P, rl_state, cmd, obs

        self._step = jax.jit(step)

    def _read_sensors(self):
        import jax.numpy as jnp
        tick, s = self.bridge.read_sensors()
        dtype = self._dtype
        return tick, tuple(jnp.asarray(s[k], dtype) for k in
                           ("quat", "acc", "gyro", "joint_pos",
                            "joint_vel", "foot_force"))

    def warmup(self):
        import jax.numpy as jnp
        dtype = self._dtype
        sensors = (jnp.asarray([1.0, 0, 0, 0], dtype),
                   jnp.asarray([0.0, 0, 9.8], dtype),
                   jnp.zeros(3, dtype), jnp.zeros(12, dtype),
                   jnp.zeros(12, dtype), jnp.full((4,), 50.0, dtype))
        x0, p0 = ekf.init_state(jnp.eye(3, dtype=dtype),
                                jnp.zeros((4, 3), dtype))
        out = self._step(x0, p0, self.rl_state, sensors,
                         jnp.zeros(3, dtype), jnp.asarray(False),
                         jnp.asarray(self.period, dtype))
        jax.block_until_ready(out[3].q)

    def run(self, num_ticks=None, duration_s=None):
        import jax.numpy as jnp
        dtype = self._dtype
        rate = bridge_lib.RateKeeper(self.period / self.time_scale)
        dt = jnp.asarray(self.period, dtype)
        t_end = time.time() + duration_s if duration_s else None
        last_tick = -1
        try:
            while not self._stop.is_set():
                if num_ticks is not None and self.ticks >= num_ticks:
                    break
                if t_end is not None and time.time() >= t_end:
                    break
                tick, sensors = self._read_sensors()
                if tick > 0 and tick != last_tick:
                    last_tick = tick
                    if self._est is None:
                        # init the KF from the first real frame
                        rot = rotations.quat_to_rot_mat(sensors[0])
                        geom = self.model.leg_geometry
                        fp = kinematics.fk(sensors[3].reshape(4, 3),
                                           geom.rho_opt, geom.rho_fix)
                        self._est = ekf.init_state(rot, fp)
                    toggle = (not self.servo_only) and self.toggle
                    self.toggle = False
                    x, p, self.rl_state, cmd, _obs = self._step(
                        self._est[0], self._est[1], self.rl_state,
                        sensors, jnp.asarray(self.command, dtype),
                        jnp.asarray(toggle), dt)
                    self._est = (x, p)
                    self.bridge.push_command(
                        np.asarray(cmd.tau, np.float64),
                        np.asarray(cmd.q, np.float64),
                        np.asarray(cmd.kp, np.float64),
                        np.asarray(cmd.kd, np.float64))
                    self.ticks += 1
                rate.wait()
            self.overruns = rate.overruns
        finally:
            rate.close()
        return self.ticks

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
