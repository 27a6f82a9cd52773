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
