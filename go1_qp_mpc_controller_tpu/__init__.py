"""TPU-native convex-MPC locomotion framework for the Unitree Go1/A1 quadruped.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
Go1-QP-MPC-Controller reference stack (C++/Eigen/ROS/OSQP):

- single-rigid-body (SRB) convex MPC over a 10-step horizon solving for
  ground-reaction forces under friction-pyramid constraints,
- a single-step balance QP,
- Raibert-heuristic foot placement with degree-4 Bezier swing trajectories,
- an 18-state / 28-measurement Kalman-filter state estimator,
- Jacobian-transpose whole-body torque mapping,
- an RL policy-inference path (MLP observation -> joint position targets).

Everything is pure-functional, batched by construction (vmap over scenarios),
and sharded over TPU meshes via shard_map for pod-scale sweeps.

Reference behavior citations use file:line paths into the upstream C++ repo
(e.g. ``src/a1_cpp/src/ConvexMpc.cpp:110``) so parity can be audited.
"""

__version__ = "0.1.0"

from go1_qp_mpc_controller_tpu.config import params  # noqa: F401
