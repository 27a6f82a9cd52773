"""Sensor-log replay harness and signal recording.

TPU-native equivalents of two reference subsystems:

- the Gazebo adapter as an offline test harness (GazeboA1ROS.cpp:112-239):
  :func:`replay_rollout` feeds a recorded sensor stream through the full
  controller as one lax.scan — controller regression testing against logs
  without a simulator in the loop,
- the data_collection package's joint-signal logger and sine replay
  (src/data_collection/src/HighLevel.cpp:8-50, signal_sine.cpp):
  :class:`SignalLog` records named channels to .npz, and
  :func:`sine_joint_signal` generates the replay excitation pattern.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.ctrl import controller
from go1_qp_mpc_controller_tpu.ops import admm


class SensorLog(NamedTuple):
    """A time-stacked SensorData stream ((T, ...) leaves)."""
    quat_wxyz: jnp.ndarray
    imu_acc: jnp.ndarray
    imu_ang_vel: jnp.ndarray
    joint_pos: jnp.ndarray
    joint_vel: jnp.ndarray
    foot_force: jnp.ndarray


def sensor_log_from_arrays(**kw):
    return SensorLog(**{k: jnp.asarray(v) for k, v in kw.items()})


def replay_rollout(ctrl_state, model, params, log, dt,
                   solver_type=controller.MPC,
                   settings=admm.ADMMSettings(), use_terrain_adapt=True,
                   estimate=True):
    """Run the controller over a recorded sensor stream.

    Args:
      ctrl_state: initial CtrlState.
      model, params: RobotModel / CtrlParams.
      log: SensorLog with (T, ...) leaves.
      dt: () control period matching the log cadence.

    Returns:
      (final CtrlState, dict of (T, ...) traces: torques, grf, contacts).
    """

    def tick(state, sensors):
        state = controller.sensor_update(state, model, sensors, dt,
                                         estimate=estimate)
        state = controller.control_step(
            state, model, params, dt, solver_type=solver_type,
            settings=settings, use_terrain_adapt=use_terrain_adapt)
        out = {
            "joint_torques": state.joint_torques,
            "foot_forces_grf": state.foot_forces_grf,
            "contacts": state.contacts,
            "root_pos_est": state.root_pos,
        }
        return state, out

    sensors_stream = controller.SensorData(
        quat_wxyz=log.quat_wxyz, imu_acc=log.imu_acc,
        imu_ang_vel=log.imu_ang_vel, joint_pos=log.joint_pos,
        joint_vel=log.joint_vel, foot_force=log.foot_force)
    return jax.lax.scan(tick, ctrl_state, sensors_stream)


class SignalLog:
    """Named-channel signal recorder -> .npz (the data_collection logger).

    Collects per-tick values host-side; intended for low-rate debugging
    and hardware experiments, not the hot path.
    """

    def __init__(self):
        self._channels = {}

    def append(self, name, value):
        self._channels.setdefault(name, []).append(np.asarray(value))

    def stacked(self, name):
        return np.stack(self._channels[name])

    def save(self, path):
        np.savez_compressed(
            path, **{k: np.stack(v) for k, v in self._channels.items()})

    @staticmethod
    def load(path):
        data = np.load(path)
        log = SignalLog()
        for k in data.files:
            log._channels[k] = list(data[k])
        return log


def sine_joint_signal(num_steps, dt, amplitude=0.3, freq_hz=0.5,
                      base_pose=None):
    """Sinusoidal 12-joint excitation like data_collection's replayed
    qSineSignal.txt (src/data_collection/data): per-joint phase-offset
    sines around a base pose.

    Returns:
      (num_steps, 12) joint position targets.
    """
    base = (np.array([0.0, 0.9, -1.8] * 4) if base_pose is None
            else np.asarray(base_pose))
    t = np.arange(num_steps)[:, None] * dt
    phase = np.arange(12)[None, :] * (np.pi / 6)
    return base[None, :] + amplitude * np.sin(
        2 * np.pi * freq_hz * t + phase)


def load_recorded_signal(path, num_joints=12):
    """Load a recorded joint-signal log in the data_collection format.

    The reference ships an actual 799-sample x 12-joint recorded log
    (src/data_collection/data/qSineSignal.txt, written by
    signal_sine.cpp's saveSignalAsFile as whitespace-separated
    fixed-width columns) that its Lowlevel tool replays onto the robot.
    This loader parses that format.

    Returns:
      (T, num_joints) float64 array of joint positions.
    """
    q = np.loadtxt(path, dtype=np.float64)
    if q.ndim == 1:
        q = q.reshape(-1, num_joints)
    if q.shape[1] != num_joints:
        raise ValueError(
            f"expected {num_joints} columns, got {q.shape[1]} in {path}")
    return q


def save_recorded_signal(path, q_signal):
    """Write a joint-signal log in the data_collection fixed-width
    format (round-trips through :func:`load_recorded_signal` and the
    reference's own reader)."""
    np.savetxt(path, np.asarray(q_signal), fmt="%11.6f", delimiter=" ")


def replay_joint_signal(q_signal, model, dt, kp=180.0, kd=8.0,
                        height=0.3, dtype=jnp.float32):
    """Replay a recorded joint-position log onto the PD plant.

    The TPU-native equivalent of the data_collection Lowlevel replay
    (signal_sine.cpp semantics: position-mode commands through the motor
    PD loop at fixed gains) — one lax.scan over the log, entirely
    on-device.

    Args:
      q_signal: (T, 12) joint position targets (e.g. from
        :func:`load_recorded_signal`).
      model: RobotModel.
      dt: () replay period.

    Returns:
      dict with realized (T, 12) joint positions and (T, 3) root path.
    """
    from go1_qp_mpc_controller_tpu.envs import srb_sim

    sim = srb_sim.init_sim_state(model, height, dtype)
    contacts = jnp.ones(4, bool)
    stand_targets = sim.foot_pos_world - sim.root_pos
    kp_v = jnp.full((12,), kp, dtype)
    kd_v = jnp.full((12,), kd, dtype)
    zero_tau = jnp.zeros((12,), dtype)

    def tick(sm, q_t):
        sm_new, _ = srb_sim.step_pd(sm, model, q_t, kp_v, kd_v, zero_tau,
                                    contacts, stand_targets, dt)
        return sm_new, {"joint_pos": sm_new.prev_joint_pos,
                        "root_pos": sm_new.root_pos}

    _, trace = jax.lax.scan(tick, sim, jnp.asarray(q_signal, dtype))
    return trace


def motion_scheme(vel_magnitudes=(0.2,), directions=8, leg_seconds=3.0,
                  dt=0.002, body_heights=(0.0,), foot_heights=(0.2,)):
    """Scripted velocity "motion schemes" for data-collection sweeps.

    Mirrors HighLevel::initMotionScheme (data_collection/src/
    HighLevel.cpp:113-140): a grid of (body height, foot raise height,
    velocity magnitude) with 8 heading directions, every odd leg being the
    return trip (heading + pi).

    Returns:
      list of dicts with keys body_height, foot_height, and cmd — a
      (T, 3) array of (vx, vy, yaw_rate) commands for each leg.
    """
    steps = int(round(leg_seconds / dt))
    schemes = []
    for bh in body_heights:
        for fh in foot_heights:
            for mag in vel_magnitudes:
                heading = 0.0
                for k in range(directions):
                    if k % 2 != 0:
                        heading += np.pi     # return trip
                    else:
                        heading = k / directions * 2 * np.pi
                    cmd = np.zeros((steps, 3))
                    cmd[:, 0] = mag * np.cos(heading)
                    cmd[:, 1] = mag * np.sin(heading)
                    schemes.append({"body_height": bh, "foot_height": fh,
                                    "cmd": cmd})
    return schemes
