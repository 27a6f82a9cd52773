"""Controller-layer tests: gait plan, swing control, torque mapping, and a
closed-loop standing rollout through the fused step.

Behavioral anchors cite A1RobotControl.cpp; the closed-loop test is the
stand-mode slice of configs[1] (Gazebo replaced by the on-device SRB sim).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from go1_qp_mpc_controller_tpu.ctrl import controller, gait, swing, torque
from go1_qp_mpc_controller_tpu.envs import rollout
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import admm

DTYPE = jnp.float64


def _setup():
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    state = types.init_ctrl_state(model, DTYPE)
    return model, params, state


def test_update_plan_stand_mode():
    model, params, state = _setup()
    out = gait.update_plan(state, params, model)
    assert np.all(np.asarray(out.plan_contacts))
    np.testing.assert_allclose(np.asarray(out.gait_counter),
                               [0, 120, 120, 0])
    # default footholds with zero velocity command
    np.testing.assert_allclose(np.asarray(out.foot_pos_target_rel),
                               np.asarray(model.default_foot_pos))


def test_update_plan_walk_gait_cycle():
    """Counters advance mod 240 with trot offsets; contact iff <= 120
    (A1RobotControl.cpp:156-164)."""
    model, params, state = _setup()
    state = state._replace(movement_mode=jnp.asarray(1, jnp.int32))
    contacts_seen = []
    for _ in range(130):
        state = gait.update_plan(state, params, model)
        contacts_seen.append(np.asarray(state.plan_contacts).copy())
    contacts_seen = np.stack(contacts_seen)
    # diagonal pairs (FL,RR) and (FR,RL) always alternate
    assert np.all(contacts_seen[:, 0] == contacts_seen[:, 3])
    assert np.all(contacts_seen[:, 1] == contacts_seen[:, 2])
    # legs starting at counter 0 stay in stance for the first 60 ticks
    assert np.all(contacts_seen[:59, 0])
    # legs starting at counter 120 lift off immediately (120+2 > 120)
    assert not contacts_seen[0, 1]


def test_raibert_foothold_shifts_with_velocity():
    model, params, state = _setup()
    state = state._replace(
        movement_mode=jnp.asarray(1, jnp.int32),
        root_lin_vel=jnp.asarray([0.5, 0.0, 0.0], DTYPE))
    out = gait.update_plan(state, params, model)
    delta_x = np.asarray(out.foot_pos_target_rel[:, 0]
                         - model.default_foot_pos[:, 0])
    expect = np.sqrt(0.35 / 9.8) * 0.5
    np.testing.assert_allclose(delta_x, expect, atol=1e-9)
    # clamp at +-0.1 (A1RobotControl.cpp:183-194)
    state2 = state._replace(root_lin_vel=jnp.asarray([5.0, 0.0, 0.0], DTYPE))
    out2 = gait.update_plan(state2, params, model)
    np.testing.assert_allclose(
        np.asarray(out2.foot_pos_target_rel[:, 0]
                   - model.default_foot_pos[:, 0]), 0.1)


def test_swing_stance_refreshes_start_and_zero_phase():
    model, params, state = _setup()
    state = state._replace(
        foot_pos_abs=model.default_foot_pos,
        gait_counter=jnp.asarray([0.0, 180.0, 180.0, 0.0], DTYPE))
    dt = jnp.asarray(0.002, DTYPE)
    out = swing.generate_swing_legs_ctrl(state, params, dt)
    # stance legs (counter <= 120): start = current pos
    np.testing.assert_allclose(np.asarray(out.foot_pos_start[0]),
                               np.asarray(model.default_foot_pos[0]))
    # swing legs keep their previous start
    np.testing.assert_allclose(np.asarray(out.foot_pos_start[1]),
                               np.asarray(state.foot_pos_start[1]))


def test_early_contact_detection():
    """Swing leg landing early (force > 30 N past 1.5x swing) becomes a
    contact (A1RobotControl.cpp:259-271)."""
    model, params, state = _setup()
    state = state._replace(
        movement_mode=jnp.asarray(1, jnp.int32),
        gait_counter=jnp.asarray([0.0, 200.0, 200.0, 0.0], DTYPE),
        plan_contacts=jnp.asarray([True, False, False, True]),
        foot_force=jnp.asarray([100.0, 50.0, 0.0, 100.0], DTYPE))
    dt = jnp.asarray(0.002, DTYPE)
    out = swing.generate_swing_legs_ctrl(state, params, dt)
    assert bool(out.early_contacts[1])       # force 50 > 30, late swing
    assert not bool(out.early_contacts[2])   # no force
    assert bool(out.contacts[1])
    assert not bool(out.contacts[2])


def test_torque_mapping_stance_and_swing():
    model, params, state = _setup()
    j = jnp.broadcast_to(2.0 * jnp.eye(3, dtype=DTYPE), (4, 3, 3))
    state = state._replace(
        j_foot=j,
        contacts=jnp.asarray([True, False, True, False]),
        foot_forces_grf=jnp.asarray(
            np.tile([1.0, 2.0, 30.0], (4, 1)), DTYPE),
        foot_forces_kin=jnp.asarray(np.tile([4.0, 5.0, 6.0], (4, 1)), DTYPE),
        mpc_init_counter=jnp.asarray(100, jnp.int32))
    out = torque.compute_joint_torques(state, params)
    tau = np.asarray(out.joint_torques).reshape(4, 3)
    grav = np.asarray(params.torques_gravity).reshape(4, 3)
    # stance: J^T(-f) = 2*(-f)
    np.testing.assert_allclose(tau[0], 2.0 * np.array([-1, -2, -30])
                               + grav[0])
    # swing: J^-1(km*f_kin) = (0.1*f)/2
    np.testing.assert_allclose(tau[1], 0.1 * np.array([4, 5, 6]) / 2.0
                               + grav[1])


def test_torque_warmup_and_nan_latch():
    model, params, state = _setup()
    state = state._replace(mpc_init_counter=jnp.asarray(0, jnp.int32))
    out = torque.compute_joint_torques(state, params)
    np.testing.assert_allclose(np.asarray(out.joint_torques), 0.0)
    # NaN GRF -> torque holds previous value
    state2 = state._replace(
        mpc_init_counter=jnp.asarray(50, jnp.int32),
        contacts=jnp.ones(4, bool),
        foot_forces_grf=jnp.full((4, 3), jnp.nan, DTYPE),
        joint_torques=jnp.full((12,), 7.0, DTYPE))
    out2 = torque.compute_joint_torques(state2, params)
    np.testing.assert_allclose(np.asarray(out2.joint_torques), 7.0)


@pytest.mark.slow
def test_closed_loop_standing_mpc():
    """Stand-mode MPC holds the trunk at the commanded height for 1 s of
    500 Hz closed loop (configs[0]/[1] stand slice)."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    settings = admm.ADMMSettings(seg_iters=25, segments=3)
    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, 500, dt, solver_type=controller.MPC,
        settings=settings, estimate=False, use_terrain_adapt=False))
    carry, trace = run(carry)
    z = np.asarray(trace.root_pos[:, 2])
    assert np.isfinite(z).all()
    # trunk stays within 5 cm of the 0.3 m target after warmup
    assert np.all(np.abs(z[100:] - 0.3) < 0.05), (z.min(), z.max())
    # roll/pitch bounded
    rp = np.asarray(trace.root_euler[:, :2])
    assert np.all(np.abs(rp[100:]) < 0.1)
    # stance forces near weight/4 at steady state
    fz = np.asarray(trace.foot_forces_grf[-1][:, 2])
    np.testing.assert_allclose(fz.sum(), 15 * 9.8, rtol=0.2)


def test_closed_loop_standing_with_ekf():
    """configs[3]: EKF in the loop; estimate tracks the plant."""
    model = types.default_robot_model(DTYPE)
    params = types.default_ctrl_params(DTYPE)
    carry = rollout.init_carry(model, params, height=0.3, dtype=DTYPE)
    dt = jnp.asarray(0.002, DTYPE)
    settings = admm.ADMMSettings(seg_iters=25, segments=3)
    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, 400, dt, solver_type=controller.MPC,
        settings=settings, estimate=True, use_terrain_adapt=False))
    carry, trace = run(carry)
    z = np.asarray(trace.root_pos[:, 2])
    assert np.isfinite(z).all()
    assert np.all(np.abs(z[150:] - 0.3) < 0.07)
    # estimator agrees with the plant to cm level at steady state
    est_err = np.abs(np.asarray(trace.est_root_pos[-1])
                     - np.asarray(trace.root_pos[-1]))
    assert est_err.max() < 0.03, est_err
