"""SRB condensation parity: JAX impl vs float64 NumPy oracle.

The oracle replicates ConvexMpc.cpp:110-245 with explicit loops; the JAX
implementation uses a lax.scan block recursion. They must agree to fp
round-off on the test_mpc.cpp fixture and on randomized scenarios.
"""

import jax
import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.compat import oracle
from go1_qp_mpc_controller_tpu.models import srb


def _to_jax(f, dtype=jnp.float64):
    return {k: (jnp.asarray(v, dtype) if isinstance(v, np.ndarray)
                else v) for k, v in f.items()}


def test_A_c_structure():
    euler = jnp.asarray([0.1, -0.2, 0.7], jnp.float64)
    a = np.asarray(srb.calculate_A_c(euler))
    a_ref = oracle.calculate_A_c(np.asarray(euler))
    np.testing.assert_allclose(a, a_ref, atol=1e-15)
    # only yaw enters; the rpy-rate map is Rz(yaw)^T
    assert a[0, 6] == np.cos(0.7)
    assert a[11, 12] == 1.0
    np.testing.assert_allclose(a[3:6, 9:12], np.eye(3))


def test_B_c_matches_oracle():
    rng = np.random.default_rng(7)
    mass = 14.0
    inertia = np.diag([0.016, 0.064, 0.074]) + 1e-3 * np.eye(3)
    euler = rng.normal(size=3) * 0.2
    from go1_qp_mpc_controller_tpu.utils import rotations
    rot = np.asarray(rotations.euler_to_rot_mat(jnp.asarray(euler)))
    feet = rng.normal(size=(4, 3)) * 0.2
    b = np.asarray(srb.calculate_B_c(
        jnp.asarray(mass, jnp.float64), jnp.asarray(inertia, jnp.float64),
        jnp.asarray(rot, jnp.float64), jnp.asarray(feet, jnp.float64)))
    b_ref = oracle.calculate_B_c(mass, inertia, rot, feet)
    np.testing.assert_allclose(b, b_ref, atol=1e-12)


def test_condense_fixture_matches_oracle():
    f = oracle.test_mpc_fixture()
    qp_ref = oracle.condense(f["a_d"], f["b_d_list"], f["x0"], f["x_ref"],
                             f["q_weights"], f["r_weights"], f["contacts"])
    qp = srb.condense(
        jnp.asarray(f["a_d"]), jnp.asarray(f["b_d_list"]),
        jnp.asarray(f["x0"]), jnp.asarray(f["x_ref"]).reshape(10, 13),
        jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
        jnp.asarray(f["contacts"]))
    np.testing.assert_allclose(np.asarray(qp.hessian), qp_ref.hessian,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(qp.gradient), qp_ref.gradient,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(qp.lb), qp_ref.lb)
    np.testing.assert_allclose(np.asarray(qp.ub), qp_ref.ub)


def test_condense_randomized_matches_oracle():
    rng = np.random.default_rng(3)
    for _ in range(3):
        euler = rng.normal(size=3) * 0.3
        a_c = oracle.calculate_A_c(euler)
        mass = rng.uniform(10, 20)
        inertia = np.diag(rng.uniform(0.01, 0.09, 3))
        from go1_qp_mpc_controller_tpu.utils import rotations
        rot = np.asarray(rotations.euler_to_rot_mat(jnp.asarray(euler)))
        b_d_list = []
        for i in range(10):
            feet = rng.normal(size=(4, 3)) * 0.25
            b_c = oracle.calculate_B_c(mass, inertia, rot, feet)
            _, b_d = oracle.discretize(a_c, b_c, 0.0025)
            b_d_list.append(b_d)
        b_d_list = np.stack(b_d_list)
        a_d, _ = oracle.discretize(a_c, np.zeros((13, 12)), 0.0025)
        x0 = rng.normal(size=13)
        x_ref = rng.normal(size=130)
        qw = np.abs(rng.normal(size=13)) * 10
        rw = np.abs(rng.normal(size=12)) * 1e-5
        contacts = (rng.uniform(size=4) > 0.4).astype(float)
        qp_ref = oracle.condense(a_d, b_d_list, x0, x_ref, qw, rw, contacts)
        qp = srb.condense(jnp.asarray(a_d), jnp.asarray(b_d_list),
                          jnp.asarray(x0), jnp.asarray(x_ref).reshape(10, 13),
                          jnp.asarray(qw), jnp.asarray(rw),
                          jnp.asarray(contacts))
        np.testing.assert_allclose(np.asarray(qp.hessian), qp_ref.hessian,
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(qp.gradient), qp_ref.gradient,
                                   atol=1e-8)


def test_constraint_matvec_matches_dense():
    rng = np.random.default_rng(5)
    u = rng.normal(size=120)
    y = rng.normal(size=200)
    c = oracle.constraint_matrix()
    np.testing.assert_allclose(
        np.asarray(srb.constraint_matvec(jnp.asarray(u))), c @ u, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(srb.constraint_rmatvec(jnp.asarray(y))), c.T @ y,
        atol=1e-12)
    # also the in-repo dense builder agrees with the oracle
    np.testing.assert_allclose(srb.constraint_matrix_dense(), c)


def test_condense_vmap_consistency():
    """Batched condensation equals per-scenario condensation."""
    f = oracle.test_mpc_fixture()
    n = 4
    rng = np.random.default_rng(11)
    x0s = np.tile(f["x0"], (n, 1)) + rng.normal(size=(n, 13)) * 0.01
    batched = jax.vmap(
        lambda x0: srb.condense(
            jnp.asarray(f["a_d"]), jnp.asarray(f["b_d_list"]), x0,
            jnp.asarray(f["x_ref"]).reshape(10, 13),
            jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
            jnp.asarray(f["contacts"])))(jnp.asarray(x0s))
    for i in range(n):
        single = srb.condense(
            jnp.asarray(f["a_d"]), jnp.asarray(f["b_d_list"]),
            jnp.asarray(x0s[i]), jnp.asarray(f["x_ref"]).reshape(10, 13),
            jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
            jnp.asarray(f["contacts"]))
        np.testing.assert_allclose(np.asarray(batched.gradient[i]),
                                   np.asarray(single.gradient), atol=1e-12)


def test_condense_toeplitz_matches_general():
    """Constant-B_d specialization == general condensation exactly."""
    f = oracle.test_mpc_fixture()
    b_d = jnp.asarray(f["b_d_list"][0])
    b_d_list = jnp.broadcast_to(b_d, (10, 13, 12))
    common = (jnp.asarray(f["x0"]), jnp.asarray(f["x_ref"]).reshape(10, 13),
              jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
              jnp.asarray(f["contacts"]))
    qp1 = srb.condense(jnp.asarray(f["a_d"]), b_d_list, *common)
    qp2 = srb.condense_toeplitz(jnp.asarray(f["a_d"]), b_d, *common)
    np.testing.assert_allclose(np.asarray(qp2.hessian),
                               np.asarray(qp1.hessian), atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp2.gradient),
                               np.asarray(qp1.gradient), atol=1e-12)
    finite = np.isfinite(np.asarray(qp1.lb))
    np.testing.assert_allclose(np.asarray(qp2.lb)[finite],
                               np.asarray(qp1.lb)[finite])


def test_condense_nilpotent_matches_general():
    """Closed-form nilpotent condensation == scan condensation exactly.

    The closed form relies on N = A_d - I being nilpotent (N^3 = 0) with
    N^2 B_d = 0 — true by construction for the SRB A_c/B_c structure
    (ConvexMpc.cpp:110-143)."""
    f = oracle.test_mpc_fixture()
    a_d = jnp.asarray(f["a_d"])
    # structural preconditions
    n = np.asarray(a_d) - np.eye(13)
    assert np.abs(np.linalg.matrix_power(n, 3)).max() == 0.0
    assert np.abs(n @ n @ np.asarray(f["b_d_list"][0])).max() < 1e-18

    # per-step varying B_d exercises the general path
    b_d_list = jnp.asarray(f["b_d_list"]) * (
        1.0 + 0.01 * jnp.arange(10)[:, None, None])
    common = (jnp.asarray(f["x0"]), jnp.asarray(f["x_ref"]).reshape(10, 13),
              jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
              jnp.asarray(f["contacts"]))
    qp1 = srb.condense(a_d, b_d_list, *common)
    qp2 = srb.condense_nilpotent(a_d, b_d_list, *common)
    np.testing.assert_allclose(np.asarray(qp2.hessian),
                               np.asarray(qp1.hessian), atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp2.gradient),
                               np.asarray(qp1.gradient), atol=1e-12)
    finite = np.isfinite(np.asarray(qp1.lb))
    np.testing.assert_allclose(np.asarray(qp2.lb)[finite],
                               np.asarray(qp1.lb)[finite])


def test_condense_nilpotent_const_matches_general():
    """Constant-B_d nilpotent closed form (the production path) == scan."""
    f = oracle.test_mpc_fixture()
    b_d = jnp.asarray(f["b_d_list"][0])
    b_d_list = jnp.broadcast_to(b_d, (10, 13, 12))
    common = (jnp.asarray(f["x0"]), jnp.asarray(f["x_ref"]).reshape(10, 13),
              jnp.asarray(f["q_weights"]), jnp.asarray(f["r_weights"]),
              jnp.asarray(f["contacts"]))
    qp1 = srb.condense(jnp.asarray(f["a_d"]), b_d_list, *common)
    qp2 = srb.condense_nilpotent_const(jnp.asarray(f["a_d"]), b_d, *common)
    np.testing.assert_allclose(np.asarray(qp2.hessian),
                               np.asarray(qp1.hessian), atol=1e-12)
    np.testing.assert_allclose(np.asarray(qp2.gradient),
                               np.asarray(qp1.gradient), atol=1e-12)
    finite = np.isfinite(np.asarray(qp1.lb))
    np.testing.assert_allclose(np.asarray(qp2.lb)[finite],
                               np.asarray(qp1.lb)[finite])
    np.testing.assert_allclose(np.asarray(qp2.ub)[finite],
                               np.asarray(qp1.ub)[finite])


def test_receding_averaged_euler_variant_nonzero_velocity():
    """The averaged-euler A_c + receding-foot condensation variant
    (test/test_mpc.cpp:93-122) under NONZERO velocity, where it genuinely
    differs from the constant-B_d path: per-step B_d, condensed QP, and
    solved GRFs all match the oracle."""
    from go1_qp_mpc_controller_tpu.ops import admm
    from go1_qp_mpc_controller_tpu.utils import rotations

    mass = 14.0
    inertia = np.diag([0.016, 0.064, 0.074])
    root_euler = np.array([0.03, -0.05, 0.3])
    rot = np.asarray(rotations.euler_to_rot_mat(
        jnp.asarray(root_euler, jnp.float64)))
    root_pos = np.array([0.4, -0.1, 0.3])
    foot_pos = np.array([[0.17, 0.15, -0.3], [0.17, -0.15, -0.3],
                         [-0.17, 0.15, -0.3], [-0.17, -0.15, -0.3]])
    contacts = np.array([1.0, 0.0, 0.0, 1.0])
    dt = 0.0025
    vel_d = np.array([0.5, 0.1, 0.0])
    ang_vel_d = np.array([0.0, 0.0, 0.4])
    q_weights = np.array([20.0, 10.0, 1.0, 0.0, 0.0, 420.0,
                          0.05, 0.05, 0.05, 30.0, 30.0, 10.0, 0.0])
    r_weights = np.full(12, 1e-6)
    x0 = np.concatenate([root_euler, root_pos, [0.0, 0.0, 0.35],
                         [0.45, 0.08, 0.0], [-9.8]])

    # --- per-step B_d parity -------------------------------------------
    b_ref = oracle.receding_b_d_list(mass, inertia, rot, foot_pos, vel_d,
                                     dt)
    b_jax = srb.receding_b_d_list(
        jnp.asarray(mass, jnp.float64), jnp.asarray(inertia, jnp.float64),
        jnp.asarray(rot, jnp.float64), jnp.asarray(foot_pos, jnp.float64),
        jnp.asarray(vel_d, jnp.float64), jnp.asarray(dt, jnp.float64))
    np.testing.assert_allclose(np.asarray(b_jax), b_ref, atol=1e-13)
    # the recession must matter: step 9 differs from step 0
    assert np.abs(b_ref[9] - b_ref[0]).max() > 1e-5

    # --- averaged-euler linearization point ----------------------------
    e_avg_ref = oracle.averaged_euler(root_euler, ang_vel_d, dt)
    e_avg = srb.averaged_euler(jnp.asarray(root_euler, jnp.float64),
                               jnp.asarray(ang_vel_d, jnp.float64),
                               jnp.asarray(dt, jnp.float64))
    np.testing.assert_allclose(np.asarray(e_avg), e_avg_ref, atol=1e-14)
    assert abs(e_avg_ref[2] - root_euler[2]) > 1e-4  # actually averaged

    a_c = oracle.calculate_A_c(e_avg_ref)
    a_d, _ = oracle.discretize(a_c, np.zeros((13, 12)), dt)

    # simple constant-velocity reference trajectory
    x_ref = np.tile(x0, 10).reshape(10, 13).copy()
    for i in range(10):
        x_ref[i, 3:5] += vel_d[:2] * dt * (i + 1)
        x_ref[i, 2] += ang_vel_d[2] * dt * (i + 1)
        x_ref[i, 9:12] = vel_d
        x_ref[i, 6:9] = ang_vel_d

    qp_ref = oracle.condense(a_d, b_ref, x0, x_ref.reshape(-1), q_weights,
                             r_weights, contacts)
    qp = srb.condense_nilpotent(
        jnp.asarray(a_d), jnp.asarray(b_ref), jnp.asarray(x0),
        jnp.asarray(x_ref), jnp.asarray(q_weights),
        jnp.asarray(r_weights), jnp.asarray(contacts))
    np.testing.assert_allclose(np.asarray(qp.hessian), qp_ref.hessian,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(qp.gradient), qp_ref.gradient,
                               atol=1e-9)

    # --- solved GRFs hit the 1e-3 parity budget -------------------------
    x_star, _, _ = oracle.solve_qp(qp_ref)
    sol = admm.mpc_solve(qp, admm.ADMMSettings())
    err = np.abs(np.asarray(sol.x[:12]) - x_star[:12]).max()
    assert err < 1e-3, f"receding-variant GRF error vs oracle = {err}"


def test_controller_receding_horizon_option():
    """control_step(receding_horizon=True) runs end-to-end and pins swing
    forces to zero like the constant variant."""
    from go1_qp_mpc_controller_tpu.ctrl import controller
    from go1_qp_mpc_controller_tpu.models import types

    dtype = jnp.float64
    model = types.default_robot_model(dtype)
    params = types.default_ctrl_params(dtype)
    state = types.init_ctrl_state(model, dtype)
    state = state._replace(
        movement_mode=jnp.asarray(1, jnp.int32),
        root_lin_vel_d=jnp.asarray([0.4, 0.0, 0.0], dtype),
        contacts=jnp.asarray([True, False, False, True]))
    dt = jnp.asarray(0.002, dtype)
    step = jax.jit(lambda s: controller.control_step(
        s, model, params, dt, receding_horizon=True))
    for _ in range(5):
        state = step(state)
    tau = np.asarray(state.joint_torques)
    assert np.isfinite(tau).all()
    grf = np.asarray(state.foot_forces_grf)
    assert np.isfinite(grf).all()
    # stance legs push up, swing legs carry ~zero force
    assert grf[0, 2] > 10.0 and grf[3, 2] > 10.0
    assert np.abs(grf[1]).max() < 1e-6 and np.abs(grf[2]).max() < 1e-6
