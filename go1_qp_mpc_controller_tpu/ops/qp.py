"""Single-step balance QP (the reference's "QP mode" stance controller).

TPU-native equivalent of the type-0 branch of A1RobotControl::compute_grf
(src/a1_cpp/src/A1RobotControl.cpp:377-444): a 12-variable / 20-constraint QP
that tracks a PD-derived 6-dim root acceleration with world-frame contact
forces under a mu = 0.7 friction pyramid. The reference instantiates a fresh
OSQP solver every tick (no warm start); here the solve is the same dense ADMM
used for the MPC, with the small constraint matrix materialized.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.ops import admm
from go1_qp_mpc_controller_tpu.utils import rotations
from go1_qp_mpc_controller_tpu.utils.precision import f32_matmuls


class BalanceQP(NamedTuple):
    hessian: jnp.ndarray   # (12, 12)
    gradient: jnp.ndarray  # (12,)
    lb: jnp.ndarray        # (20,)
    ub: jnp.ndarray        # (20,)


def balance_constraint_matrix(mu=P.QP_MU, dtype=np.float64):
    """(20, 12): rows 0-3 extract fz_i; rows 4-19 the mu=0.7 pyramid
    (A1RobotControl.cpp:28-48)."""
    c = np.zeros((20, 12), dtype)
    for i in range(4):
        c[i, 3 * i + 2] = 1.0
        r = 4 + 4 * i
        c[r + 0, 3 * i + 0] = 1.0
        c[r + 0, 3 * i + 2] = -mu
        c[r + 1, 3 * i + 0] = -1.0
        c[r + 1, 3 * i + 2] = -mu
        c[r + 2, 3 * i + 1] = 1.0
        c[r + 2, 3 * i + 2] = -mu
        c[r + 3, 3 * i + 1] = -1.0
        c[r + 3, 3 * i + 2] = -mu
    return c


def desired_root_acc(ctrl, params, mass):
    """PD 6-dim acceleration target + gravity feedforward
    (A1RobotControl.cpp:378-391).

    Args:
      ctrl: CtrlState.
      params: CtrlParams.
      mass: () robot mass.

    Returns:
      (6,) [linear force target (world), angular moment target].
    """
    euler_err = ctrl.root_euler_d - ctrl.root_euler
    yaw_err = rotations.wrap_yaw_error(ctrl.root_euler_d[2],
                                       ctrl.root_euler[2])
    euler_err = euler_err.at[2].set(yaw_err)
    lin = params.kp_linear * (ctrl.root_pos_d - ctrl.root_pos)
    lin = lin + ctrl.root_rot_mat @ (
        params.kd_linear * (ctrl.root_lin_vel_d
                            - ctrl.root_rot_mat.T @ ctrl.root_lin_vel))
    lin = lin.at[2].add(mass * P.GRAVITY)
    ang = params.kp_angular * euler_err
    ang = ang + params.kd_angular * (
        ctrl.root_ang_vel_d - ctrl.root_rot_mat.T @ ctrl.root_ang_vel)
    return jnp.concatenate([lin, ang])


@f32_matmuls
def build_balance_qp(root_acc, root_rot_mat_z, foot_pos_abs, contacts,
                     q_weights=None, r_weight=P.QP_R_WEIGHT,
                     f_min=P.QP_F_MIN, f_max=P.QP_F_MAX):
    """Assemble the 12-var balance QP (A1RobotControl.cpp:393-413).

    The 6x12 map M has identity force blocks and yaw-frame torque arms
    Rz' skew(r_i); hessian = r I + M' Q M, gradient = -M' Q acc.

    Args:
      root_acc: (6,) desired wrench.
      root_rot_mat_z: (3, 3) yaw rotation.
      foot_pos_abs: (4, 3) world-aligned body-centered foot positions.
      contacts: (4,) bool/float — scales the fz box.

    Returns:
      BalanceQP.
    """
    dtype = root_acc.dtype
    if q_weights is None:
        q_weights = jnp.asarray(P.QP_Q_WEIGHTS, dtype)
    arms = jnp.einsum('ab,lbc->lac', root_rot_mat_z.T,
                      rotations.skew(foot_pos_abs))     # (4, 3, 3)
    eye = jnp.eye(3, dtype=dtype)
    m_mat = jnp.concatenate([
        jnp.concatenate([eye] * 4, axis=1),
        jnp.concatenate([arms[i] for i in range(4)], axis=1)], axis=0)
    mq = m_mat * q_weights[:, None]
    hessian = r_weight * jnp.eye(12, dtype=dtype) + m_mat.T @ mq
    gradient = -(mq.T @ root_acc)
    c = contacts.astype(dtype)
    inf = jnp.asarray(jnp.inf, dtype)
    lb = jnp.concatenate([f_min * c, jnp.full((16,), -inf, dtype)])
    ub = jnp.concatenate([f_max * c, jnp.zeros((16,), dtype)])
    return BalanceQP(hessian=hessian, gradient=gradient, lb=lb, ub=ub)


def solve_balance_qp(qp, settings=admm.ADMMSettings()):
    """Solve via dense ADMM; returns world-frame forces (4, 3) + solution."""
    c_mat = jnp.asarray(balance_constraint_matrix(), qp.hessian.dtype)

    def matvec(u):
        return c_mat @ u

    def rmatvec(y):
        return c_mat.T @ y

    def dense(w):
        return c_mat.T @ (w[:, None] * c_mat)

    sol = admm.solve(qp.hessian, qp.gradient, qp.lb, qp.ub, matvec, rmatvec,
                     dense, settings)
    return sol.x.reshape(4, 3), sol
