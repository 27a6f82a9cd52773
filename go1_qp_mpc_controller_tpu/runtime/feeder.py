"""Simulated 1 kHz sensor feed for the real-time host loop.

The reference's hardware adapter owns a dedicated receive thread that
unpacks UDP sensor frames at 1 kHz and publishes them into the shared
state (HardwareA1ROS.cpp:253-386). This module is that thread's sim-backed
stand-in: it steps the SRB plant with the latest commanded torques from
the bridge and pushes raw sensor frames through ``RtBridge.push_sensors``
— so ``main.py loop`` runs a genuine closed loop end to end (sensors in,
torques out) without a robot.

The plant math runs on the HOST CPU backend regardless of the default JAX
device: a 1 kHz feed cannot ride a remote-TPU dispatch tunnel, and the
reference's receive thread is likewise plain host code.
"""

import threading

import numpy as np

from go1_qp_mpc_controller_tpu.runtime import bridge as bridge_lib


class SimFeeder:
    """Feeds the bridge from an on-host SRB plant at a fixed cadence.

    The feeder holds the plant in a standing configuration schedule
    (all-stance contacts, feet pinned): the VERDICT/HighLevel-style
    "hold a stand" scenario. The controller sees exactly the hardware
    sensor layout (quat, IMU, joints, filtered foot forces).

    Args:
      bridge: RtBridge to push frames into (and read commands from).
      model, params: RobotModel / CtrlParams (dtype governs the plant).
      height: initial standing height.
      period_s: feed cadence (reference: 1 ms, A1Params.h:12).
    """

    def __init__(self, bridge, model, params, height=0.3, period_s=0.001,
                 time_scale=1.0):
        import jax
        import jax.numpy as jnp

        from go1_qp_mpc_controller_tpu.envs import rollout, srb_sim

        self.bridge = bridge
        self.period = period_s
        # real-time factor: plant advances period_s of SIM time every
        # period_s/time_scale of wall time (Gazebo's RTF; keep equal to
        # the ControlLoop's time_scale)
        self.time_scale = time_scale
        self._stop = threading.Event()
        self.ticks = 0
        self._engaged = False

        cpu = jax.devices("cpu")[0]
        self._cpu = cpu
        dtype = jnp.float32
        with jax.default_device(cpu):
            carry = rollout.init_carry(model, params, height=height,
                                       dtype=dtype)
            self._ctrl0 = carry.ctrl
            self._sim = jax.device_put(carry.sim, cpu)
            self._forces_z = jax.device_put(carry.stance_forces_z, cpu)
            feet_body = carry.sim.foot_pos_world - carry.sim.root_pos
            self._stand_targets = jax.device_put(feet_body, cpu)
            self._contacts = jax.device_put(jnp.ones(4, bool), cpu)
            dt = jnp.asarray(period_s, dtype)

            def read(sim, forces_z):
                return srb_sim.read_sensors(sim, model, self._contacts,
                                            forces_z, dt)

            def step(sim, tau):
                return srb_sim.step(sim, model, tau, self._contacts,
                                    self._stand_targets, dt)

            def step_pd(sim, q, kp, kd, tau):
                # position-mode commands (the RL stack's motor loop,
                # Go1RLController.cpp:149-166)
                return srb_sim.step_pd(sim, model, q, kp, kd, tau,
                                       self._contacts,
                                       self._stand_targets, dt)

            self._read = jax.jit(read)
            self._plant_step = jax.jit(step)
            self._plant_step_pd = jax.jit(step_pd)
            # compile before the RT loop starts (results discarded)
            jax.block_until_ready(
                self._read(self._sim, self._forces_z).joint_pos)
            jax.block_until_ready(self._plant_step(
                self._sim, jnp.zeros(12, dtype))[1])
            z12 = jnp.zeros(12, dtype)
            jax.block_until_ready(self._plant_step_pd(
                self._sim, z12, z12, z12, z12)[1])

    def initial_ctrl_state(self):
        """CtrlState synced to the plant's standing pose (what
        rollout.init_carry produces for the same scenario)."""
        return self._ctrl0

    def run(self, num_ticks=None, duration_s=None):
        """Blocking feed loop on the compensated C++ rate keeper."""
        import time

        import jax
        import jax.numpy as jnp

        rate = bridge_lib.RateKeeper(self.period / self.time_scale)
        t_end = time.time() + duration_s if duration_s else None
        dtype = np.float32
        try:
            while not self._stop.is_set():
                if num_ticks is not None and self.ticks >= num_ticks:
                    break
                if t_end is not None and time.time() >= t_end:
                    break
                cmd_tick, cmd = self.bridge.read_command()
                with jax.default_device(self._cpu):
                    sensors = self._read(self._sim, self._forces_z)
                    # the plant holds its pose until the controller
                    # ENGAGES (first nonzero torque): the robot stands
                    # legs-locked through the controller's jit warmup AND
                    # its 10-tick zero-torque warmup
                    # (A1RobotControl.cpp:292-295) — free-falling through
                    # those zeros would hand the engaged controller a
                    # large initial transient no hardware operator allows
                    if not self._engaged and cmd_tick > 0:
                        self._engaged = bool(np.any(cmd["tau"] != 0.0)
                                             or np.any(cmd["kp"] != 0.0))
                    if self._engaged:
                        tau = jnp.asarray(cmd["tau"], dtype)
                        if np.any(cmd["kp"] != 0.0):
                            # position-mode command (RL stack)
                            self._sim, self._forces_z = self._plant_step_pd(
                                self._sim, jnp.asarray(cmd["q"], dtype),
                                jnp.asarray(cmd["kp"], dtype),
                                jnp.asarray(cmd["kd"], dtype), tau)
                        else:
                            self._sim, self._forces_z = self._plant_step(
                                self._sim, tau)
                self.bridge.push_sensors(
                    np.asarray(sensors.quat_wxyz),
                    np.asarray(sensors.imu_acc),
                    np.asarray(sensors.imu_ang_vel),
                    np.asarray(sensors.joint_pos),
                    np.asarray(sensors.joint_vel),
                    np.asarray(sensors.foot_force))
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

    @property
    def sim_root_pos(self):
        """Current plant CoM (for asserting a held stand)."""
        return np.asarray(self._sim.root_pos)
