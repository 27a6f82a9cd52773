"""Closed-loop rollout: controller + SRB plant as one lax.scan program.

This is the TPU-native stand-in for the Gazebo integration tests
(README.md:27-36): whole trajectories run on-device, batched over scenarios
with vmap and sharded with shard_map. One scan step = one 500 Hz control
tick (sensor ingestion + estimation + plan + MPC/QP solve + torques) plus
one plant step.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.ctrl import controller
from go1_qp_mpc_controller_tpu.ctrl import rl as rl_lib
from go1_qp_mpc_controller_tpu.envs import srb_sim
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import admm, ekf
from go1_qp_mpc_controller_tpu.utils import rotations


class RolloutCarry(NamedTuple):
    ctrl: types.CtrlState
    sim: srb_sim.SimState
    stance_forces_z: jnp.ndarray  # (4,) last applied normal forces


class RolloutTrace(NamedTuple):
    root_pos: jnp.ndarray       # (T, 3)
    root_euler: jnp.ndarray     # (T, 3)
    root_lin_vel: jnp.ndarray   # (T, 3)
    joint_torques: jnp.ndarray  # (T, 12)
    foot_forces_grf: jnp.ndarray  # (T, 4, 3)
    contacts: jnp.ndarray       # (T, 4)
    est_root_pos: jnp.ndarray   # (T, 3) estimator output
    terrain_pitch: jnp.ndarray  # (T,) estimated terrain pitch
    foot_pos_abs: jnp.ndarray   # (T, 4, 3) feet rel. root, world-aligned
                                # (world foot = root_pos + foot_pos_abs;
                                # feeds the swing-path visualization that
                                # stands in for the reference's RViz
                                # markers, A1RobotControl.cpp:65-146)


def init_carry(model, params, height=0.3, movement_mode=0,
               dtype=jnp.float32, ground_coef=None,
               horizon=None):
    """Standing start: plant at ``height``, controller state synced to it.

    ``horizon`` sizes the warm-carry fields (types.init_ctrl_state);
    non-default values select the stagewise long-horizon controller path.
    """
    sim = srb_sim.init_sim_state(model, height, dtype,
                                 ground_coef=ground_coef)
    kw = {} if horizon is None else {"horizon": horizon}
    ctrl = types.init_ctrl_state(model, dtype, **kw)
    feet_body = sim.foot_pos_world - sim.root_pos
    ekf_x, ekf_p = ekf.init_state(sim.root_rot, feet_body)
    ctrl = ctrl._replace(
        movement_mode=jnp.asarray(movement_mode, jnp.int32),
        root_pos=sim.root_pos,
        root_pos_d=sim.root_pos,
        foot_pos_start=feet_body,
        foot_pos_rel_last_time=feet_body,
        foot_pos_target_last_time=feet_body,
        foot_pos_recent_contact=feet_body,
        estimator_x=ekf_x,
        estimator_P=ekf_p,
    )
    weight = model.mass * 9.8 / 4.0
    return RolloutCarry(ctrl=ctrl, sim=sim,
                        stance_forces_z=jnp.full((4,), weight, dtype))


def rollout(carry, model, params, num_steps, dt,
            solver_type=controller.MPC,
            settings=admm.ADMMSettings(),
            command_fn=None, estimate=True, use_terrain_adapt=True,
            ground_coef=None, warm_settings=controller.WARM_SETTINGS,
            warm_mode="auto", horizon=None):
    """Run ``num_steps`` closed-loop ticks; returns (carry, RolloutTrace).

    Args:
      carry: RolloutCarry from :func:`init_carry`.
      model, params: RobotModel / CtrlParams.
      num_steps: static int.
      dt: () control/plant period (the reference's 2 ms main loop).
      solver_type: controller.MPC or controller.QP (static).
      settings: ADMM settings for the GRF solves.
      command_fn: optional (step_idx, ctrl_state) -> ctrl_state to inject
        desired velocities / modes (the joystick path,
        GazeboA1ROS.cpp:124-188).
      estimate: static — True runs the EKF in the loop (configs[3]);
        False feeds plant ground truth (isolates control from estimation).
      horizon: static MPC horizon; non-default routes the GRF solve to
        the stagewise O(H) path (carry must come from
        ``init_carry(horizon=...)``).
    """

    def tick(c, step_idx):
        ctrl, sim = c.ctrl, c.sim
        if command_fn is not None:
            ctrl = command_fn(step_idx, ctrl)

        # observe the current plant, estimate, control
        sensors = srb_sim.read_sensors(sim, model, ctrl.contacts,
                                       c.stance_forces_z, dt)
        ctrl = controller.sensor_update(ctrl, model, sensors, dt,
                                        estimate=estimate)
        if not estimate:
            ctrl = ctrl._replace(root_pos=sim.root_pos,
                                 root_lin_vel=sim.root_lin_vel)

        ctrl = controller.control_step(
            ctrl, model, params, dt, solver_type=solver_type,
            settings=settings, use_terrain_adapt=use_terrain_adapt,
            warm_settings=warm_settings, warm_mode=warm_mode,
            horizon=horizon)

        sim_new, forces_z = srb_sim.step(
            sim, model, ctrl.joint_torques, ctrl.contacts,
            ctrl.foot_pos_target_last_time, dt, ground_coef=ground_coef)

        trace = RolloutTrace(
            root_pos=sim_new.root_pos,
            root_euler=ctrl.root_euler,
            root_lin_vel=sim_new.root_lin_vel,
            joint_torques=ctrl.joint_torques,
            foot_forces_grf=ctrl.foot_forces_grf,
            contacts=ctrl.contacts,
            est_root_pos=ctrl.root_pos,
            terrain_pitch=ctrl.terrain_pitch_angle,
            foot_pos_abs=ctrl.foot_pos_abs,
        )
        return RolloutCarry(ctrl=ctrl, sim=sim_new,
                            stance_forces_z=forces_z), trace

    return jax.lax.scan(tick, carry, jnp.arange(num_steps))


def rollout_batched(carry, model, params, num_steps, dt,
                    settings=admm.ADMMSettings(), command_fn=None,
                    estimate=True, use_terrain_adapt=True,
                    ground_coef=None,
                    warm_settings=controller.WARM_SETTINGS,
                    robust=False, compact_k=128):
    """Batched closed-loop rollout with batch-level transition routing.

    The production batched-sweep program: where ``vmap(rollout)`` turns
    the per-scenario warm/cold ``lax.cond`` into a select that pays the
    full cold solve for every scenario every tick, this scan calls
    :func:`controller.control_step_batched` — the cold branch executes
    only on ticks where ANY scenario is at a gait transition (see
    compute_grf_mpc_batched). MPC solver type only.

    Args:
      carry: RolloutCarry with a leading batch axis on every leaf.
      command_fn: optional (step_idx, ctrl_state) -> ctrl_state, applied
        per scenario (vmapped over the batch).

    Returns:
      (carry, RolloutTrace) — trace leaves are (T, B, ...) (scan-major;
      ``vmap(rollout)`` yields (B, T, ...)).
    """

    def tick(c, step_idx):
        ctrl, sim = c.ctrl, c.sim
        if command_fn is not None:
            ctrl = jax.vmap(lambda cs: command_fn(step_idx, cs))(ctrl)

        def observe(cs, sm, fz):
            sensors = srb_sim.read_sensors(sm, model, cs.contacts, fz, dt)
            cs = controller.sensor_update(cs, model, sensors, dt,
                                          estimate=estimate)
            if not estimate:
                cs = cs._replace(root_pos=sm.root_pos,
                                 root_lin_vel=sm.root_lin_vel)
            return cs

        ctrl = jax.vmap(observe)(ctrl, sim, c.stance_forces_z)
        ctrl = controller.control_step_batched(
            ctrl, model, params, dt, settings=settings,
            use_terrain_adapt=use_terrain_adapt,
            warm_settings=warm_settings, robust=robust,
            compact_k=compact_k)
        sim_new, forces_z = jax.vmap(
            lambda sm, tau, con, tgt: srb_sim.step(
                sm, model, tau, con, tgt, dt, ground_coef=ground_coef)
        )(sim, ctrl.joint_torques, ctrl.contacts,
          ctrl.foot_pos_target_last_time)

        trace = RolloutTrace(
            root_pos=sim_new.root_pos,
            root_euler=ctrl.root_euler,
            root_lin_vel=sim_new.root_lin_vel,
            joint_torques=ctrl.joint_torques,
            foot_forces_grf=ctrl.foot_forces_grf,
            contacts=ctrl.contacts,
            est_root_pos=ctrl.root_pos,
            terrain_pitch=ctrl.terrain_pitch_angle,
            foot_pos_abs=ctrl.foot_pos_abs,
        )
        return RolloutCarry(ctrl=ctrl, sim=sim_new,
                            stance_forces_z=forces_z), trace

    return jax.lax.scan(tick, carry, jnp.arange(num_steps))


class RLRolloutCarry(NamedTuple):
    rl: rl_lib.RLControllerState
    sim: srb_sim.SimState
    stance_forces_z: jnp.ndarray  # (4,)


class RLRolloutTrace(NamedTuple):
    obs: jnp.ndarray          # (T, 48)
    target_q: jnp.ndarray     # (T, 12) commanded joint positions
    kp: jnp.ndarray           # (T, 12) commanded gains (mode-dependent)
    root_pos: jnp.ndarray     # (T, 3)
    movement_mode: jnp.ndarray  # (T,)


def init_rl_carry(model, height=0.3, dtype=jnp.float32):
    """Standing start for the RL stack (stand/servo mode)."""
    sim = srb_sim.init_sim_state(model, height, dtype)
    rl = rl_lib.init_rl_state(sim.prev_joint_pos, dtype)
    weight = model.mass * 9.8 / 4.0
    return RLRolloutCarry(rl=rl, sim=sim,
                          stance_forces_z=jnp.full((4,), weight, dtype))


def rl_rollout(carry, model, policy_params, num_steps, dt,
               command_fn=None, toggle_fn=None):
    """Closed-loop RL rollout: policy -> position PD plant, one scan.

    The TPU-native mirror of the reference's RL process
    (go1_rl_ctrl_cpp/src/MainGazebo.cpp:22-144): per tick — observe the
    plant, run SwitchController + Go1RLController::advance/advance_servo,
    and step the plant through the motor PD loop the position commands
    drive (Go1RLController.cpp:149-166). The plant keeps the all-stance
    schedule (the RL stack plans no explicit gait; physics owns contact).

    Args:
      carry: RLRolloutCarry from :func:`init_rl_carry`.
      model: RobotModel (Go1 geometry via the model's leg_geometry).
      policy_params: MLP params (models/policy.py layout).
      num_steps: static int.
      dt: () RL action period (reference: 4 ms Gazebo / 2.5 ms hardware,
        config/parameters.yaml:9-11).
      command_fn: optional step_idx -> (3,) (cmd_vx, cmd_vy, cmd_yaw_rate).
      toggle_fn: optional step_idx -> () bool A-button press
        (SwitchController.hpp:11-69).
    """
    dtype = carry.sim.root_pos.dtype
    contacts = jnp.ones(4, bool)
    stand_targets = carry.sim.foot_pos_world - carry.sim.root_pos

    def tick(c, step_idx):
        sensors = srb_sim.read_sensors(c.sim, model, contacts,
                                       c.stance_forces_z, dt)
        rot = rotations.quat_to_rot_mat(sensors.quat_wxyz)
        euler = rotations.quat_to_euler(sensors.quat_wxyz)
        rot_z = rotations.rot_z(euler[2])
        toggle = (toggle_fn(step_idx) if toggle_fn is not None
                  else jnp.asarray(False))
        command = (jnp.asarray(command_fn(step_idx), dtype)
                   if command_fn is not None else jnp.zeros(3, dtype))
        rl = rl_lib.switch_mode(c.rl, toggle)
        # plant ground-truth velocity: the estimation thread's role
        # (Go1Observation.hpp:392-424); the shared EKF is exercised by the
        # MPC-stack tests
        rl, cmd, obs = rl_lib.rl_control_step(
            rl, policy_params, rot, rot_z, c.sim.root_lin_vel,
            sensors.imu_ang_vel, command, sensors.joint_pos,
            sensors.joint_vel)
        sim, fz = srb_sim.step_pd(c.sim, model, cmd.q, cmd.kp, cmd.kd,
                                  cmd.tau, contacts, stand_targets, dt)
        trace = RLRolloutTrace(obs=obs, target_q=cmd.q, kp=cmd.kp,
                               root_pos=sim.root_pos,
                               movement_mode=rl.movement_mode)
        return RLRolloutCarry(rl=rl, sim=sim, stance_forces_z=fz), trace

    return jax.lax.scan(tick, carry, jnp.arange(num_steps))
