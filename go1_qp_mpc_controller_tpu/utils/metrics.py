"""Observability: structured metrics, timers, and profiler hooks.

The reference's observability is ad-hoc chrono prints and ROS debug topics
(SURVEY.md section 5: ConvexMpc.cpp:148-155 timing pairs, RViz markers,
terrain-angle topic). The TPU-native replacement:

- MetricsLogger: bounded in-memory ring of structured records with JSONL
  export (the PlotJuggler-able signal stream),
- timed(): wall-clock span capture with jax.block_until_ready semantics,
- trace(): jax.profiler wrapper producing TensorBoard-loadable traces,
- controller_telemetry(): pulls the reference's debug signals (terrain
  angle in degrees, foot positions, solver residuals) out of a CtrlState.
"""

import contextlib
import json
import time
from collections import deque

import jax
import numpy as np


class MetricsLogger:
    """Bounded structured-metrics ring with JSONL export."""

    def __init__(self, capacity=100000):
        self._records = deque(maxlen=capacity)

    def log(self, name, value, step=None, **tags):
        if hasattr(value, "item"):
            value = float(np.asarray(value))
        self._records.append(
            {"t": time.time(), "name": name, "value": value,
             "step": step, **tags})

    def records(self, name=None):
        if name is None:
            return list(self._records)
        return [r for r in self._records if r["name"] == name]

    def summary(self, name):
        vals = np.array([r["value"] for r in self.records(name)])
        if len(vals) == 0:
            return {}
        return {"count": len(vals), "mean": float(vals.mean()),
                "p50": float(np.percentile(vals, 50)),
                "p99": float(np.percentile(vals, 99)),
                "max": float(vals.max())}

    def dump_jsonl(self, path):
        with open(path, "w") as f:
            for r in self._records:
                f.write(json.dumps(r) + "\n")


@contextlib.contextmanager
def timed(logger, name, sync=None, **tags):
    """Wall-clock span; pass a jax array as ``sync`` to block on it first
    (device work is async — unsynced timings lie)."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    logger.log(name, (time.perf_counter() - t0) * 1000.0, unit="ms", **tags)


@contextlib.contextmanager
def trace(log_dir):
    """jax.profiler trace span -> TensorBoard/Perfetto-loadable dump.

    The TPU-native successor to the reference's chrono print pairs
    (MainGazebo.cpp:65-72): one trace covers every kernel with real device
    timelines instead of host wall-clock guesses.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def controller_telemetry(state):
    """Extract the reference's debug signals from a CtrlState
    (terrain angle deg: A1RobotControl.cpp:367-369; foot/torque states)."""
    return {
        "terrain_angle_deg": float(np.asarray(state.terrain_pitch_angle))
        * 180.0 / np.pi,
        "root_pos": np.asarray(state.root_pos).tolist(),
        "root_euler": np.asarray(state.root_euler).tolist(),
        "contacts": np.asarray(state.contacts).astype(int).tolist(),
        "joint_torques": np.asarray(state.joint_torques).tolist(),
        "foot_forces_grf": np.asarray(state.foot_forces_grf).tolist(),
    }


def swing_path_points(foot_pos_start, foot_pos_target, num_points=10):
    """Sampled swing-foot Bezier paths for visualization.

    The RViz foot-path marker analog (A1RobotControl.cpp:120-143 publishes
    a fixed 10-point LINE_STRIP per leg).

    Args:
      foot_pos_start: (4, 3) liftoff points (yaw frame).
      foot_pos_target: (4, 3) planned footholds.
      num_points: samples along each curve.

    Returns:
      (4, num_points, 3) numpy array of path points.
    """
    import jax.numpy as jnp

    from go1_qp_mpc_controller_tpu.utils import bezier

    ts = np.linspace(0.0, 1.0, num_points)
    pts = [np.asarray(bezier.swing_foot_pos(
        float(t), jnp.asarray(foot_pos_start), jnp.asarray(foot_pos_target)))
        for t in ts]
    return np.stack(pts, axis=1)
