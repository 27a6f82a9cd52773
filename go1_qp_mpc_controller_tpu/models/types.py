"""Core pytree types: robot model, control parameters, controller state.

The reference funnels every signal through one mutable C++ blackboard struct
(src/a1_cpp/src/A1CtrlStates.h:13-448) shared race-ily between threads. The
TPU-native design replaces it with immutable NamedTuple pytrees threaded
through pure step functions — which makes every controller function
trivially batchable (vmap adds a leading scenario axis to every leaf) and
shardable (shard_map over the same axis).

Layout note: the reference stores foot quantities as Eigen (3, NUM_LEG)
matrices; here they are (NUM_LEG, 3) leg-major arrays, which vectorizes
per-leg math along the leading axis.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.models import kinematics
from go1_qp_mpc_controller_tpu.utils import filters


class RobotModel(NamedTuple):
    """Physical robot description (A1CtrlStates.h:40-47, GazeboA1ROS.cpp:76-89).

    Attributes:
      mass: () trunk mass in kg.
      trunk_inertia: (3, 3) trunk inertia in the body frame.
      leg_geometry: per-leg rho_fix/rho_opt (kinematics.LegGeometry).
      default_foot_pos: (4, 3) nominal stance feet in the body frame.
    """
    mass: jnp.ndarray
    trunk_inertia: jnp.ndarray
    leg_geometry: kinematics.LegGeometry
    default_foot_pos: jnp.ndarray


class CtrlParams(NamedTuple):
    """Controller gains / weights / gait parameters.

    Mirrors the tunable portion of A1CtrlStates::reset() and
    resetFromROSParam() (A1CtrlStates.h:20-321). All leaves are arrays so a
    scenario batch can randomize any of them.
    """
    q_weights: jnp.ndarray        # (13,) MPC state weights
    r_weights: jnp.ndarray        # (12,) MPC force weights
    kp_foot: jnp.ndarray          # (4, 3) swing foot P gains
    kd_foot: jnp.ndarray          # (4, 3) swing foot D gains
    km_foot: jnp.ndarray          # (3,) swing torque scaling
    kp_linear: jnp.ndarray        # (3,) balance-QP linear P gains
    kd_linear: jnp.ndarray        # (3,)
    kp_angular: jnp.ndarray       # (3,)
    kd_angular: jnp.ndarray       # (3,)
    torques_gravity: jnp.ndarray  # (12,) gravity-compensation torques
    gait_counter_speed: jnp.ndarray  # (4,) phase increments per tick
    counter_per_gait: jnp.ndarray    # () gait cycle length in counts
    counter_per_swing: jnp.ndarray   # () stance/swing split in counts
    control_dt: jnp.ndarray          # () main-loop period (s)
    mpc_dt: jnp.ndarray              # () MPC discretization step (s)


class CtrlState(NamedTuple):
    """Dynamic controller state — the functional A1CtrlStates.

    Only genuinely dynamic signals live here; static params are in
    RobotModel / CtrlParams.
    """
    # mode / scheduling
    movement_mode: jnp.ndarray        # () int32: 0 stand, 1 walk
    counter: jnp.ndarray              # () int32 tick counter
    mpc_init_counter: jnp.ndarray     # () int32 warmup counter
    gait_counter: jnp.ndarray         # (4,) per-leg phase counters

    # command / desired root state
    root_pos_d: jnp.ndarray           # (3,)
    root_euler_d: jnp.ndarray         # (3,)
    root_lin_vel_d: jnp.ndarray       # (3,) body frame
    root_ang_vel_d: jnp.ndarray       # (3,)

    # estimated / measured root state
    root_pos: jnp.ndarray             # (3,)
    root_euler: jnp.ndarray           # (3,)
    root_rot_mat: jnp.ndarray         # (3, 3)
    root_rot_mat_z: jnp.ndarray       # (3, 3) yaw-only
    root_lin_vel: jnp.ndarray         # (3,) world frame
    root_ang_vel: jnp.ndarray         # (3,) body frame
    imu_acc: jnp.ndarray              # (3,)
    imu_ang_vel: jnp.ndarray          # (3,)

    # joints / feet
    joint_pos: jnp.ndarray            # (12,)
    joint_vel: jnp.ndarray            # (12,)
    foot_force: jnp.ndarray           # (4,) contact sensor normal force
    foot_pos_rel: jnp.ndarray         # (4, 3) body frame (FK)
    foot_pos_abs: jnp.ndarray         # (4, 3) world-aligned, body-centered
    foot_vel_rel: jnp.ndarray         # (4, 3)
    j_foot: jnp.ndarray               # (4, 3, 3) per-leg Jacobians

    # plan / swing bookkeeping
    foot_pos_target_rel: jnp.ndarray      # (4, 3)
    foot_pos_target_abs: jnp.ndarray      # (4, 3)
    foot_pos_target_world: jnp.ndarray    # (4, 3)
    foot_pos_start: jnp.ndarray           # (4, 3) swing liftoff points
    foot_pos_rel_last_time: jnp.ndarray   # (4, 3)
    foot_pos_target_last_time: jnp.ndarray  # (4, 3)
    foot_pos_recent_contact: jnp.ndarray  # (4, 3) filtered contact points
    contacts: jnp.ndarray             # (4,) bool actual contact schedule
    plan_contacts: jnp.ndarray        # (4,) bool planned schedule
    early_contacts: jnp.ndarray       # (4,) bool swing-interrupt flags

    # forces / torques
    foot_forces_kin: jnp.ndarray      # (4, 3) swing PD forces
    foot_forces_grf: jnp.ndarray      # (4, 3) stance GRFs (body frame)
    joint_torques: jnp.ndarray        # (12,)

    # terrain
    terrain_pitch_angle: jnp.ndarray  # ()
    terrain_angle_filter: filters.MovingWindowState     # window 100
    recent_contact_filter: filters.MovingWindowState    # stacked x4, (3,)

    # estimator (18-state KF)
    estimator_x: jnp.ndarray          # (18,)
    estimator_P: jnp.ndarray          # (18, 18)
    estimated_contacts: jnp.ndarray   # (4,) bool

    # persistent warm-started solver carry across ticks — the TPU analog
    # of the reference's long-lived OSQP instance updated in place every
    # tick (A1RobotControl.cpp:522-540)
    qp_warm_x: jnp.ndarray            # (120,) primal
    qp_warm_y: jnp.ndarray            # (200,) dual
    qp_warm_rho: jnp.ndarray          # () adapted ADMM step size
    qp_warm_minv: jnp.ndarray         # (120, 120) carried KKT inverse
    qp_warm_contacts: jnp.ndarray     # (4,) contact pattern the carry was
                                      # built for (a flip = KKT equality
                                      # pattern change -> cold re-solve)
    qp_warm_grad: jnp.ndarray         # (120,) gradient the carry solved
                                      # (drift trigger for cold re-solves)


def default_robot_model(dtype=jnp.float32):
    """A1CtrlStates::reset() physical defaults (A1CtrlStates.h:40-47)."""
    inertia = np.diag([0.0168352186, 0.0656071082, 0.0742720659])
    default_foot = np.array([[0.17, 0.15, -0.35],
                             [0.17, -0.15, -0.35],
                             [-0.17, 0.15, -0.35],
                             [-0.17, -0.15, -0.35]])
    return RobotModel(
        mass=jnp.asarray(15.0, dtype),
        trunk_inertia=jnp.asarray(inertia, dtype),
        leg_geometry=kinematics.a1_leg_geometry(dtype),
        default_foot_pos=jnp.asarray(default_foot, dtype),
    )


def default_ctrl_params(dtype=jnp.float32):
    """A1CtrlStates::reset() gain/weight defaults (A1CtrlStates.h:49-133)."""
    q_weights = np.array([80.0, 80.0, 1.0, 0.0, 0.0, 270.0,
                          1.0, 1.0, 20.0, 20.0, 20.0, 20.0, 0.0])
    r_weights = np.array([1e-5, 1e-5, 1e-6] * 4)
    kp_foot = np.tile(np.array([300.0, 400.0, 400.0]), (4, 1))
    kd_foot = np.full((4, 3), 8.0)
    torques_gravity = np.array([0.80, 0, 0, -0.80, 0, 0,
                                0.80, 0, 0, -0.80, 0, 0])
    return CtrlParams(
        q_weights=jnp.asarray(q_weights, dtype),
        r_weights=jnp.asarray(r_weights, dtype),
        kp_foot=jnp.asarray(kp_foot, dtype),
        kd_foot=jnp.asarray(kd_foot, dtype),
        km_foot=jnp.asarray([0.1, 0.1, 0.1], dtype),
        kp_linear=jnp.asarray([1000.0, 1000.0, 1000.0], dtype),
        kd_linear=jnp.asarray([200.0, 70.0, 120.0], dtype),
        kp_angular=jnp.asarray([650.0, 35.0, 1.0], dtype),
        kd_angular=jnp.asarray([4.5, 4.5, 30.0], dtype),
        torques_gravity=jnp.asarray(torques_gravity, dtype),
        gait_counter_speed=jnp.full((4,), 2.0, dtype),
        counter_per_gait=jnp.asarray(240.0, dtype),
        counter_per_swing=jnp.asarray(120.0, dtype),
        control_dt=jnp.asarray(P.MAIN_UPDATE_PERIOD_MS / 1000.0, dtype),
        mpc_dt=jnp.asarray(P.HARDWARE_MPC_DT, dtype),
    )


def init_ctrl_state(model, dtype=jnp.float32, horizon=P.PLAN_HORIZON):
    """Fresh controller state in the default stand pose.

    Gait counters start at the trot offsets (0, 120, 120, 0)
    (A1CtrlStates.h:323-327).

    Args:
      horizon: MPC horizon the warm-carry fields are sized for. The
        default PLAN_HORIZON=10 selects the condensed solver's shapes
        (120/200 + the carried KKT inverse); any other value sizes the
        primal/dual/gradient carries for the stagewise long-horizon
        solver (controller.compute_grf_mpc_stagewise), which carries no
        KKT inverse — qp_warm_minv becomes a (1, 1) placeholder.
    """
    eye3 = jnp.eye(3, dtype=dtype)
    z3 = jnp.zeros((3,), dtype)
    z43 = jnp.zeros((4, 3), dtype)
    return CtrlState(
        movement_mode=jnp.zeros((), jnp.int32),
        counter=jnp.zeros((), jnp.int32),
        mpc_init_counter=jnp.zeros((), jnp.int32),
        gait_counter=jnp.asarray([0.0, 120.0, 120.0, 0.0], dtype),
        root_pos_d=z3,
        root_euler_d=z3,
        root_lin_vel_d=z3,
        root_ang_vel_d=z3,
        root_pos=z3,
        root_euler=z3,
        root_rot_mat=eye3,
        root_rot_mat_z=eye3,
        root_lin_vel=z3,
        root_ang_vel=z3,
        imu_acc=z3,
        imu_ang_vel=z3,
        joint_pos=jnp.zeros((12,), dtype),
        joint_vel=jnp.zeros((12,), dtype),
        foot_force=jnp.zeros((4,), dtype),
        foot_pos_rel=model.default_foot_pos,
        foot_pos_abs=model.default_foot_pos,
        foot_vel_rel=z43,
        j_foot=jnp.broadcast_to(eye3, (4, 3, 3)),
        foot_pos_target_rel=model.default_foot_pos,
        foot_pos_target_abs=model.default_foot_pos,
        foot_pos_target_world=model.default_foot_pos,
        foot_pos_start=model.default_foot_pos,
        foot_pos_rel_last_time=z43,
        foot_pos_target_last_time=z43,
        foot_pos_recent_contact=model.default_foot_pos,
        contacts=jnp.zeros((4,), bool),
        plan_contacts=jnp.zeros((4,), bool),
        early_contacts=jnp.zeros((4,), bool),
        foot_forces_kin=z43,
        foot_forces_grf=z43,
        joint_torques=jnp.zeros((12,), dtype),
        terrain_pitch_angle=jnp.zeros((), dtype),
        terrain_angle_filter=filters.moving_window_init(100, (), dtype),
        recent_contact_filter=filters.moving_window_init_stacked(
            4, 60, (3,), dtype),
        estimator_x=jnp.zeros((18,), dtype),
        estimator_P=3.0 * jnp.eye(18, dtype=dtype),
        estimated_contacts=jnp.zeros((4,), bool),
        qp_warm_x=jnp.zeros((P.NUM_DOF * horizon,), dtype),
        qp_warm_y=jnp.zeros((P.MPC_CONSTRAINT_DIM * horizon,), dtype),
        qp_warm_rho=jnp.asarray(0.1, dtype),
        qp_warm_minv=(jnp.eye(P.MPC_NV, dtype=dtype)
                      if horizon == P.PLAN_HORIZON
                      else jnp.zeros((1, 1), dtype)),
        # all-false differs from every reachable schedule (stand = all
        # stance), so the first MPC tick always takes the cold branch
        qp_warm_contacts=jnp.zeros((4,), bool),
        qp_warm_grad=jnp.zeros((P.NUM_DOF * horizon,), dtype),
    )
