"""Device mesh and sharding definitions for scenario sweeps.

The reference has no distributed layer at all (SURVEY.md section 2.5:
single process, thread-level pipelining, lock-free shared struct). The TPU
design introduces two first-class parallel axes:

- ``data``: scenarios (gait phase x command x physics randomization) are
  embarrassingly parallel; shards ride ICI within a slice and DCN across
  hosts.
- ``mpc``: intra-solve block parallelism — the condensation contraction
  H = B_qp' Q B_qp reduces over horizon-state rows, which shard across this
  axis and combine with a psum (the "QP block reductions over ICI" of
  BASELINE.json's north star).

A (N, 1) mesh degrades gracefully to pure scenario parallelism.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MPC_AXIS = "mpc"


def make_mesh(mpc_parallel=1, devices=None):
    """Build a (data, mpc) mesh over the available devices.

    Args:
      mpc_parallel: size of the intra-solve reduction axis (must divide the
        device count). 1 = scenario-parallel only.
      devices: explicit device list (defaults to jax.devices()).

    Returns:
      jax.sharding.Mesh with axes (data, mpc).
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % mpc_parallel != 0:
        raise ValueError(f"{n} devices not divisible by mpc={mpc_parallel}")
    arr = np.array(devices).reshape(n // mpc_parallel, mpc_parallel)
    return Mesh(arr, (DATA_AXIS, MPC_AXIS))


def scenario_sharding(mesh):
    """Sharding for scenario-batched arrays: batch split over the data axis,
    replicated over the mpc axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())


def make_sharded_control_step(mesh, model, params, dt, settings=None,
                              warm_settings=None, compact_k=None,
                              robust=False, use_terrain_adapt=True):
    """The PRODUCTION batched controller tick under the mesh.

    Shards ``controller.control_step_batched`` — sensors-to-torques with
    the warm carry and the three-way transition routing — over the data
    axis with ``shard_map``: every scenario-sharded CtrlState leaf
    (including the carried KKT inverse) lives on its own shard, and the
    routing decisions (``jnp.any``-style predicates, the top_k cold
    compaction) are SHARD-LOCAL, so no collective crosses ICI at all on
    any tick: each device routes its own scenarios warm/compact/cold
    independently. Because the compaction computes exactly the
    per-scenario warm/cold semantics (tests/test_batched_transition.py),
    per-shard routing is numerically identical to the single-device
    program whenever no shard overflows its local ``compact_k``
    (tests/test_sharding.py asserts the equality on the 8-device mesh).

    Args:
      mesh: device mesh with a ``data`` axis (the mpc axis, if present,
        computes replicas — pass an (N, 1) mesh for controller sweeps).
      model, params: unbatched RobotModel / CtrlParams (replicated).
      dt: () control period.
      compact_k: per-SHARD cold sub-batch size (default 256, clamped to
        the local batch).

    Returns:
      jitted fn: CtrlState batch (sharded over data) -> updated batch.
    """
    from jax import shard_map

    from go1_qp_mpc_controller_tpu.ctrl import controller
    from go1_qp_mpc_controller_tpu.ops import admm

    settings = admm.ADMMSettings() if settings is None else settings
    if warm_settings is None:
        warm_settings = controller.WARM_SETTINGS
    k = 256 if compact_k is None else compact_k
    spec = P(DATA_AXIS)

    def local_step(states):
        return controller.control_step_batched(
            states, model, params, dt, settings=settings,
            use_terrain_adapt=use_terrain_adapt,
            warm_settings=warm_settings, robust=robust, compact_k=k)

    return jax.jit(shard_map(local_step, mesh=mesh, in_specs=spec,
                             out_specs=spec, check_vma=False))
