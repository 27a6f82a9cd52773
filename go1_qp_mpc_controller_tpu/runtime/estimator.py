"""Sensor-cadence (1 kHz) state estimation thread.

The reference's hardware adapter runs the EKF + FK on EVERY 1 kHz sensor
frame, inside the UDP receive thread (HardwareA1ROS.cpp:343-378); the RL
stack gives estimation its own thread outright
(go1_rl_ctrl_cpp/src/observation/Go1Observation.hpp:392-424). Without
this, frames that arrive between control ticks never reach the
estimator — at a 2 ms control cadence against a 1 kHz feed, half the
measurements are dropped and fast transients are tracked loosely.

This module is that thread's TPU-native equivalent: a host-CPU jitted
EKF step consumed per bridge frame, publishing the latest estimate for
the control loop to merge (ControlLoop(estimate_in_feed=True)). The
math runs on the host CPU backend regardless of the default device — a
1 kHz loop cannot ride a remote-TPU dispatch tunnel, mirroring how the
reference keeps estimation on the PC next to the UDP socket.
"""

import threading

import numpy as np

from go1_qp_mpc_controller_tpu.models import kinematics
from go1_qp_mpc_controller_tpu.ops import ekf
from go1_qp_mpc_controller_tpu.utils import rotations


def make_estimator_step(model, dtype=None, contact_force_norm=100.0):
    """Jitted per-frame estimator: raw sensor sample -> EKF update.

    The per-frame work mirrors the reference's receive thread
    (HardwareA1ROS.cpp:343-378): quat -> rot, FK + Jacobian for the
    relative foot positions/velocities, then the 18/28 KF update.

    Returns:
      step(x, P, quat, acc, gyro, joint_pos, joint_vel, foot_force,
           movement_mode, dt) -> ekf result (x, P, estimated_contacts).
    """
    import jax

    geom = model.leg_geometry

    def step(x, P, quat, acc, gyro, joint_pos, joint_vel, foot_force,
             movement_mode, dt):
        rot = rotations.quat_to_rot_mat(quat)
        q_legs = joint_pos.reshape(4, 3)
        dq_legs = joint_vel.reshape(4, 3)
        foot_pos_rel = kinematics.fk(q_legs, geom.rho_opt, geom.rho_fix)
        j_foot = kinematics.jac(q_legs, geom.rho_opt, geom.rho_fix)
        import jax.numpy as jnp
        foot_vel_rel = jnp.einsum('lij,lj->li', j_foot, dq_legs)
        return ekf.update_estimation(x, P, dt, rot, acc, gyro,
                                     foot_pos_rel, foot_vel_rel,
                                     foot_force, movement_mode,
                                     contact_force_norm=contact_force_norm)

    return jax.jit(step)


class EstimatorThread:
    """Consumes every bridge sensor frame at its native cadence.

    Publishes the latest (x, P, contacts) under a lock; the control
    loop's fast step runs with ``estimate=False`` and merges this
    snapshot instead of running its own (frame-dropping) EKF.

    Args:
      bridge: RtBridge to poll.
      model: RobotModel.
      init_x, init_P: estimator initialization (ekf.init_state or the
        CtrlState's estimator fields).
      sensor_period_s: the feed cadence (reference: 1 ms, A1Params.h:12).
      time_scale: wall-clock slowdown factor (match the loop/feeder).
      contact_force_norm: KF full-contact force scale (100 A1 / 1000 Go1
        hardware units, Go1BasicEKF.cpp:83).
    """

    def __init__(self, bridge, model, init_x, init_P,
                 sensor_period_s=0.001, time_scale=1.0,
                 contact_force_norm=100.0):
        import jax
        import jax.numpy as jnp

        self.bridge = bridge
        self.period = sensor_period_s
        self.time_scale = time_scale
        self._stop = threading.Event()
        self._lock = threading.Lock()
        self.frames = 0
        self.movement_mode = 0

        cpu = jax.devices("cpu")[0]
        self._cpu = cpu
        dtype = jnp.asarray(init_x).dtype
        self._dtype = dtype
        with jax.default_device(cpu):
            self._x = jax.device_put(jnp.asarray(init_x), cpu)
            self._P = jax.device_put(jnp.asarray(init_P), cpu)
            self._step = make_estimator_step(
                model, contact_force_norm=contact_force_norm)
            # compile before the RT loop (result discarded)
            z3 = jnp.zeros(3, dtype)
            jax.block_until_ready(self._step(
                self._x, self._P, jnp.asarray([1.0, 0, 0, 0], dtype),
                z3, z3, jnp.zeros(12, dtype), jnp.zeros(12, dtype),
                jnp.zeros(4, dtype), jnp.zeros((), jnp.int32),
                jnp.asarray(sensor_period_s, dtype)).x)
        self._contacts = np.zeros(4, bool)

    def snapshot(self):
        """Latest estimate: (x (18,), P (18, 18), contacts (4,) bool)."""
        with self._lock:
            return self._x, self._P, self._contacts

    def set_movement_mode(self, mode):
        self.movement_mode = int(mode)

    def run(self, num_frames=None, duration_s=None):
        import time

        import jax
        import jax.numpy as jnp

        from go1_qp_mpc_controller_tpu.runtime import bridge as bridge_lib

        rate = bridge_lib.RateKeeper(self.period / self.time_scale)
        t_end = time.time() + duration_s if duration_s else None
        last_tick = -1
        dtype = self._dtype
        try:
            while not self._stop.is_set():
                if num_frames is not None and self.frames >= num_frames:
                    break
                if t_end is not None and time.time() >= t_end:
                    break
                tick, s = self.bridge.read_sensors()
                if tick > 0 and tick != last_tick:
                    # frame gaps advance the filter by the true elapsed
                    # sensor time (the reference's compensated receive
                    # loop has the same property, HardwareA1ROS.cpp:379)
                    gap = 1 if last_tick < 0 else tick - last_tick
                    last_tick = tick
                    with jax.default_device(self._cpu):
                        res = self._step(
                            self._x, self._P,
                            jnp.asarray(s["quat"], dtype),
                            jnp.asarray(s["acc"], dtype),
                            jnp.asarray(s["gyro"], dtype),
                            jnp.asarray(s["joint_pos"], dtype),
                            jnp.asarray(s["joint_vel"], dtype),
                            jnp.asarray(s["foot_force"], dtype),
                            jnp.asarray(self.movement_mode, jnp.int32),
                            jnp.asarray(gap * self.period, dtype))
                    with self._lock:
                        self._x, self._P = res.x, res.P
                        self._contacts = np.asarray(
                            res.estimated_contacts >= 0.5)
                    self.frames += 1
                rate.wait()
        finally:
            rate.close()
        return self.frames

    def start(self, **kwargs):
        self._thread = threading.Thread(target=self.run, kwargs=kwargs,
                                        daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if hasattr(self, "_thread"):
            self._thread.join(timeout=5.0)
