"""Config presets: YAML -> (RobotModel, CtrlParams, StaticConfig).

TPU-native replacement for the reference's ROS-parameter-server config
system (launch/a1_ctrl.launch:2-7 selecting {env}_a1_{solver}.yaml,
consumed by A1CtrlStates::resetFromROSParam, A1CtrlStates.h:135-321). The
presets under ``config/presets/`` carry the same parameter values in a
structured schema; missing keys fall back to the reference's code-side
defaults exactly like nh.param's default arguments.

StaticConfig carries trace-time flags (solver branch, terrain adaptation);
the array-valued parts go into the CtrlParams / RobotModel pytrees so
scenario batches can randomize them.
"""

import dataclasses
import os

import jax.numpy as jnp
import numpy as np
import yaml

from go1_qp_mpc_controller_tpu.models import kinematics, types

PRESET_DIR = os.path.join(os.path.dirname(__file__), "presets")


@dataclasses.dataclass(frozen=True)
class StaticConfig:
    """Trace-time controller flags (hashable, jit-static)."""
    solver: str = "mpc"            # "mpc" | "qp"
    use_sim_time: bool = True
    use_terrain_adapt: bool = True
    power_level: int = 2
    environment: str = "gazebo"    # gazebo | hardware | isaac


@dataclasses.dataclass(frozen=True)
class RLConfig:
    """RL-stack preset (go1_rl_ctrl_cpp/config/parameters.yaml /
    hardware_parameters.yaml fields)."""
    weights: str = "mass.pt"
    stand_weights: str = "stand_cpp_model.pt"
    action_period: float = 0.004    # action_update_frequency (s)
    deploy_period: float = 0.002    # deployment_frequency (s)
    stiffness: float = 18.0
    damping: float = 10.0
    power_level: int = 10           # go1_hardware_power_level
    use_sim_time: bool = True
    # KF contact-probability normalizer: the Go1 stack's EKF copy divides
    # foot forces by 1000 (Go1 hardware units, Go1BasicEKF.cpp:83) where
    # the A1 MPC stack divides by 100 (A1BasicEKF.cpp:83)
    contact_force_norm: float = 1000.0


def available_presets(stack=None):
    """Preset names; ``stack`` filters to "mpc" (controller presets,
    incl. qp solver variants) or "rl"."""
    names = sorted(p[:-5] for p in os.listdir(PRESET_DIR)
                   if p.endswith(".yaml"))
    if stack is None:
        return names
    rl = {n for n in names if n.startswith("rl_")}
    return sorted(rl) if stack == "rl" else sorted(set(names) - rl)


def load_rl_preset(name):
    """Load an RL-stack preset (e.g. "rl_gazebo") -> RLConfig."""
    path = os.path.join(PRESET_DIR, name + ".yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)
    if cfg.get("stack") != "rl":
        raise ValueError(f"{name} is not an RL preset (use load_preset)")
    fields = {f.name for f in dataclasses.fields(RLConfig)}
    return RLConfig(**{k: v for k, v in cfg.items() if k in fields})


def load_preset(name, dtype=jnp.float32, mpc_dt=None, control_dt=0.002):
    """Load a preset by name (e.g. "gazebo_mpc").

    Args:
      mpc_dt: explicit MPC discretization step; None selects the
        reference's rule (A1RobotControl.cpp:458-467): hardware uses the
        fixed 2.5 ms budget (a slowed thread must not inflate dt and
        overshoot forces), simulation uses the control-thread dt.
      control_dt: the host control-loop period, consumed by the sim rule.

    Returns:
      (RobotModel, CtrlParams, StaticConfig).
    """
    path = os.path.join(PRESET_DIR, name + ".yaml")
    with open(path) as f:
        cfg = yaml.safe_load(f)

    robot = cfg["robot"]
    diag = robot["trunk_inertia_diag"]
    off = robot.get("trunk_inertia_off", [0.0, 0.0, 0.0])
    inertia = np.array([[diag[0], off[0], off[1]],
                        [off[0], diag[1], off[2]],
                        [off[1], off[2], diag[2]]])
    environment = name.split("_")[0]
    geometry = (kinematics.isaac_leg_geometry(dtype)
                if environment == "isaac"
                else kinematics.a1_leg_geometry(dtype))
    model = types.RobotModel(
        mass=jnp.asarray(robot["mass"], dtype),
        trunk_inertia=jnp.asarray(inertia, dtype),
        leg_geometry=geometry,
        default_foot_pos=jnp.asarray(robot["default_foot_pos"], dtype),
    )

    use_sim = bool(cfg.get("use_sim_time", True))
    if mpc_dt is None:
        # hardware uses the fixed 2.5 ms dt; sim uses the thread dt
        # (A1RobotControl.cpp:458-467)
        mpc_dt = control_dt if use_sim else 0.0025
    base = types.default_ctrl_params(dtype)
    params = base._replace(
        q_weights=jnp.asarray(cfg["mpc"]["q_weights"], dtype),
        r_weights=jnp.asarray(cfg["mpc"]["r_weights"], dtype),
        kp_foot=jnp.tile(jnp.asarray(cfg["swing"]["kp_foot"], dtype),
                         (4, 1)),
        kd_foot=jnp.tile(jnp.asarray(cfg["swing"]["kd_foot"], dtype),
                         (4, 1)),
        km_foot=jnp.asarray(cfg["swing"]["km_foot"], dtype),
        kp_linear=jnp.asarray(cfg["balance_qp"]["kp_linear"], dtype),
        kd_linear=jnp.asarray(cfg["balance_qp"]["kd_linear"], dtype),
        kp_angular=jnp.asarray(cfg["balance_qp"]["kp_angular"], dtype),
        kd_angular=jnp.asarray(cfg["balance_qp"]["kd_angular"], dtype),
        gait_counter_speed=jnp.asarray(cfg["gait"]["counter_speed"], dtype),
        mpc_dt=jnp.asarray(mpc_dt, dtype),
    )

    static = StaticConfig(
        solver=cfg.get("solver", "mpc"),
        use_sim_time=use_sim,
        use_terrain_adapt=bool(cfg.get("use_terrain_adapt", True)),
        power_level=int(cfg.get("power_level", 2)),
        environment=environment,
    )
    return model, params, static
