"""Whole-body joint-torque mapping.

TPU-native equivalent of A1RobotControl::compute_joint_torques
(src/a1_cpp/src/A1RobotControl.cpp:289-319): stance legs map GRFs through
the Jacobian transpose, swing legs invert the Jacobian against the scaled
kinematic PD force, plus gravity compensation, a NaN latch, and the 10-tick
zero-torque warmup. All four 3x3 solves are one batched solve.
"""

import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.utils import rotations


def compute_joint_torques(state, params):
    """Returns updated CtrlState with fresh joint_torques (12,)."""
    j = state.j_foot                                    # (4, 3, 3)
    # stance: tau = J' (-f_grf)   (A1RobotControl.cpp:303)
    tau_stance = jnp.einsum('lji,lj->li', j, -state.foot_forces_grf)
    # swing: J tau = km * f_kin   (A1RobotControl.cpp:306-307); adjugate
    # 3x3 solve — batched LU serializes on TPU (utils.rotations.solve_3x3)
    force_tgt = params.km_foot[None, :] * state.foot_forces_kin
    tau_swing = rotations.solve_3x3(j, force_tgt)
    tau = jnp.where(state.contacts[:, None], tau_stance, tau_swing)
    tau = tau.reshape(12) + params.torques_gravity

    # NaN latch: keep the previous value for any NaN entry
    # (A1RobotControl.cpp:314-317)
    tau = jnp.where(jnp.isnan(tau), state.joint_torques, tau)

    # first 10 ticks: zero torque warmup (A1RobotControl.cpp:292-295)
    counter = state.mpc_init_counter + 1
    tau = jnp.where(counter < 10, jnp.zeros_like(tau), tau)
    return state._replace(joint_torques=tau, mpc_init_counter=counter)
