"""Preset system tests: all 8 presets load and match reference values."""

import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.config import presets


def test_all_presets_load():
    names = presets.available_presets(stack="mpc")
    assert len(names) == 9
    for name in names:
        model, params, static = presets.load_preset(name)
        assert float(model.mass) > 5.0
        assert params.q_weights.shape == (13,)
        assert static.solver in ("mpc", "qp")


def test_rl_presets_load():
    """RL-stack presets (go1_rl_ctrl_cpp/config/parameters.yaml /
    hardware_parameters.yaml parity)."""
    names = presets.available_presets(stack="rl")
    assert names == ["rl_gazebo", "rl_hardware"]
    sim = presets.load_rl_preset("rl_gazebo")
    assert sim.use_sim_time and sim.action_period == 0.004
    assert sim.deploy_period == 0.002
    assert sim.weights == "mass.pt"
    hw = presets.load_rl_preset("rl_hardware")
    assert not hw.use_sim_time
    assert hw.action_period == 0.0025   # 400 Hz
    assert hw.deploy_period == 0.001    # 1000 Hz
    assert hw.power_level == 6


def test_gazebo_mpc_values():
    """Spot-check against src/a1_cpp/config/gazebo_a1_mpc.yaml."""
    model, params, static = presets.load_preset("gazebo_mpc",
                                                jnp.float64)
    assert static.solver == "mpc"
    assert static.use_sim_time
    np.testing.assert_allclose(float(model.mass), 12.0)
    np.testing.assert_allclose(
        np.asarray(params.q_weights),
        [20.0, 10.0, 1.0, 0.0, 0.0, 420.0, 0.05, 0.05, 0.05,
         30.0, 30.0, 10.0, 0.0])
    np.testing.assert_allclose(np.asarray(params.r_weights), 1e-7)
    np.testing.assert_allclose(np.asarray(params.gait_counter_speed), 1.0)
    np.testing.assert_allclose(np.asarray(params.kp_foot[0]),
                               [200.0, 200.0, 150.0])


def test_hardware_mpc_values():
    model, params, static = presets.load_preset("hardware_mpc")
    assert not static.use_sim_time
    assert static.power_level == 10
    np.testing.assert_allclose(float(model.mass), 13.5)
    np.testing.assert_allclose(np.asarray(model.default_foot_pos[:, 2]),
                               -0.3)
    np.testing.assert_allclose(np.asarray(params.gait_counter_speed), 1.4)


def test_qp_preset_has_balance_gains():
    model, params, static = presets.load_preset("gazebo_qp")
    assert static.solver == "qp"
    np.testing.assert_allclose(np.asarray(params.kp_linear),
                               [100.0, 100.0, 300.0])
    np.testing.assert_allclose(np.asarray(params.kp_angular),
                               [150.0, 150.0, 1.0])


def test_mpc_dt_rule():
    """Sim presets discretize at the control dt, hardware at the fixed
    2.5 ms budget (A1RobotControl.cpp:458-467); explicit override wins."""
    _, params, _ = presets.load_preset("gazebo_mpc", control_dt=0.004)
    np.testing.assert_allclose(float(params.mpc_dt), 0.004)
    _, params, _ = presets.load_preset("isaac_mpc")
    np.testing.assert_allclose(float(params.mpc_dt), 0.002)
    _, params, _ = presets.load_preset("hardware_mpc", control_dt=0.004)
    np.testing.assert_allclose(float(params.mpc_dt), 0.0025)
    _, params, _ = presets.load_preset("hardware_mpc", mpc_dt=0.01)
    np.testing.assert_allclose(float(params.mpc_dt), 0.01)


def test_isaac_geometry_differs():
    model, _, static = presets.load_preset("isaac_mpc")
    assert static.environment == "isaac"
    assert not static.use_terrain_adapt
    np.testing.assert_allclose(
        float(model.leg_geometry.rho_fix[0, 0]), 0.1805)
    np.testing.assert_allclose(float(model.trunk_inertia[0, 0]), 0.0158533)
