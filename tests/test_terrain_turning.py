"""Sloped-terrain walking (terrain adaptation end-to-end) and yaw-rate
turning on the on-device SRB sim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.ctrl import controller
from go1_qp_mpc_controller_tpu.envs import rollout
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import admm

DTYPE = jnp.float64
SETTINGS = admm.ADMMSettings(seg_iters=25, segments=3)


@pytest.mark.slow
def test_uphill_trot_with_terrain_adaptation():
    """Walking up a 10% grade: the plane fit + dihedral filter estimate a
    positive terrain angle and the trunk keeps a stable attitude
    (A1RobotControl.cpp:334-376 behavior)."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    slope = jnp.asarray([0.0, 0.1, 0.0], DTYPE)   # z = 0.1 x
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE,
                               ground_coef=slope)

    def command(i, ctrl):
        walk = i >= 100
        return ctrl._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk,
                                     jnp.asarray([0.25, 0.0, 0.0], DTYPE),
                                     jnp.zeros(3, DTYPE)),
            # track height above local terrain: raise the absolute target
            # as the robot advances (the joystick-height path)
            root_pos_d=ctrl.root_pos_d.at[2].set(
                0.3 + 0.1 * ctrl.root_pos[0]))

    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, 1200, jnp.asarray(0.002, DTYPE),
        solver_type=controller.MPC, settings=SETTINGS,
        command_fn=command, estimate=False, use_terrain_adapt=True,
        ground_coef=slope))
    carry, trace = run(carry)
    pos = np.asarray(trace.root_pos)
    assert np.isfinite(pos).all()
    # made forward progress and climbed
    assert pos[-1, 0] > 0.15
    assert pos[-1, 2] > 0.3 + 0.1 * pos[-1, 0] - 0.06
    # the terrain estimator converged to a positive pitch magnitude near
    # atan(0.1) ~ 0.0997 (the dihedral angle is sign-free, clamp 0.5)
    tp = np.asarray(trace.terrain_pitch)
    assert 0.03 < np.abs(tp[-200:]).mean() < 0.2, np.abs(tp[-200:]).mean()
    # attitude stays bounded while adapting
    assert np.abs(np.asarray(trace.root_euler)[200:, 0]).max() < 0.1


@pytest.mark.slow
def test_turning_trot():
    """Yaw-rate command: the robot turns while trotting (the MPC yaw
    reference integrates the commanded rate, A1RobotControl.cpp:477)."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)

    def command(i, ctrl):
        walk = i >= 100
        return ctrl._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk,
                                     jnp.asarray([0.2, 0.0, 0.0], DTYPE),
                                     jnp.zeros(3, DTYPE)),
            root_ang_vel_d=jnp.where(walk,
                                     jnp.asarray([0.0, 0.0, 0.4], DTYPE),
                                     jnp.zeros(3, DTYPE)))

    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, 1200, jnp.asarray(0.002, DTYPE),
        solver_type=controller.MPC, settings=SETTINGS,
        command_fn=command, estimate=False, use_terrain_adapt=False))
    carry, trace = run(carry)
    eul = np.asarray(trace.root_euler)
    pos = np.asarray(trace.root_pos)
    assert np.isfinite(eul).all()
    # yaw accumulated toward 0.4 rad/s * 2.2 s ~ 0.88 rad
    assert eul[-1, 2] > 0.5, eul[-1, 2]
    # trajectory curves (ended off the straight-ahead line)
    assert pos[-1, 1] > 0.02
    # height held through the turn
    assert np.all(np.abs(pos[200:, 2] - 0.3) < 0.04)
