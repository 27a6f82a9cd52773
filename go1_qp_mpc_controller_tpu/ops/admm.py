"""Batched dense ADMM QP solver with OSQP semantics, in pure JAX.

TPU-native replacement for OSQP + osqp-eigen
(src/a1_cpp/src/A1RobotControl.cpp:416-441, 522-555; docker/Dockerfile:74-114).
OSQP's sparse LDL' does not map to the MXU, so the solver is re-designed
dense and fixed-shape:

- one Cholesky factorization of M = P + sigma I + C' diag(rho) C per solve
  (re-used across warm-started ticks exactly like the reference's persistent
  solver, A1RobotControl.cpp:522-540),
- a fixed-iteration ADMM loop (lax.fori_loop) whose per-iteration work is
  two triangular solves plus structured constraint matvecs — fully batchable
  with vmap, no data-dependent control flow,
- OSQP's over-relaxation (alpha = 1.6) and the 1e3 rho boost on equality
  rows (lb == ub), which is what makes swing-leg force pinning converge fast.

The friction-pyramid constraint matrix is never materialized: `matvec` /
`rmatvec` callables exploit its block-diagonal structure (ConvexMpc.cpp:46-58).
"""

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.models import srb


class ADMMSettings(NamedTuple):
    """Solver hyperparameters (OSQP defaults unless noted)."""
    iters: int = 100
    rho: float = 0.1
    sigma: float = 1e-6
    alpha: float = 1.6
    rho_eq_scale: float = 1e3   # rho boost for lb == ub rows


class ADMMSolution(NamedTuple):
    x: jnp.ndarray          # (n,) primal solution
    y: jnp.ndarray          # (m,) dual solution
    z: jnp.ndarray          # (m,) projected constraint values
    primal_res: jnp.ndarray  # () max |Cx - z|
    dual_res: jnp.ndarray    # () max |Px + q + C'y|


def _rho_vec(lb, ub, settings):
    eq = jnp.isclose(lb, ub)
    return jnp.where(eq, settings.rho * settings.rho_eq_scale, settings.rho)


def factorize(hessian, lb, ub, rmatvec_dense, settings):
    """Cholesky of M = P + sigma I + C' diag(rho) C.

    Args:
      hessian: (n, n).
      lb, ub: (m,) bounds (determine per-row rho).
      rmatvec_dense: function building C' diag(w) C densely, signature
        (w: (m,)) -> (n, n). For the MPC pyramid this is block-diagonal and
        cheap.
      settings: ADMMSettings.

    Returns:
      (L, rho_vec): lower-triangular Cholesky factor and per-row rho.
    """
    rho_vec = _rho_vec(lb, ub, settings)
    n = hessian.shape[-1]
    m_mat = (hessian + settings.sigma * jnp.eye(n, dtype=hessian.dtype)
             + rmatvec_dense(rho_vec))
    return jnp.linalg.cholesky(m_mat), rho_vec


def solve(hessian, gradient, lb, ub, matvec, rmatvec, chol, rho_vec,
          settings, warm_x=None, warm_y=None):
    """Run fixed-iteration ADMM on one QP.

    Args:
      hessian, gradient: (n, n), (n,).
      lb, ub: (m,).
      matvec: u (n,) -> C u (m,).
      rmatvec: y (m,) -> C' y (n,).
      chol: (n, n) lower Cholesky factor from :func:`factorize`.
      rho_vec: (m,) per-row step sizes.
      settings: ADMMSettings (iters is static).
      warm_x, warm_y: optional warm starts.

    Returns:
      ADMMSolution.
    """
    n = gradient.shape[-1]
    m = lb.shape[-1]
    dtype = gradient.dtype
    x0 = jnp.zeros((n,), dtype) if warm_x is None else warm_x
    y0 = jnp.zeros((m,), dtype) if warm_y is None else warm_y
    z0 = jnp.clip(matvec(x0), lb, ub)
    alpha = settings.alpha
    sigma = settings.sigma

    def kkt_solve(rhs):
        w = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(chol.T, w, lower=False)

    def body(_, carry):
        x, z, y = carry
        rhs = sigma * x - gradient + rmatvec(rho_vec * z - y)
        x_t = kkt_solve(rhs)
        z_t = matvec(x_t)
        x_new = alpha * x_t + (1.0 - alpha) * x
        z_mid = alpha * z_t + (1.0 - alpha) * z
        z_new = jnp.clip(z_mid + y / rho_vec, lb, ub)
        y_new = y + rho_vec * (z_mid - z_new)
        return x_new, z_new, y_new

    x, z, y = jax.lax.fori_loop(0, settings.iters, body, (x0, z0, y0))
    primal = jnp.max(jnp.abs(matvec(x) - z))
    dual = jnp.max(jnp.abs(hessian @ x + gradient + rmatvec(y)))
    return ADMMSolution(x=x, y=y, z=z, primal_res=primal, dual_res=dual)


# ------------------- MPC-specialized entry points -------------------------

def _pyramid_ctc_dense(w, mu, dtype):
    """C' diag(w) C for the friction pyramid: block-diag 3x3 per (step, leg).

    Rows per block: (fx±mu fz)x2, (fy±mu fz)x2, fz. For weights
    w = (w0..w4):
      [[w0+w1,      0,          mu(w0-w1)],
       [0,          w2+w3,      mu(w2-w3)],
       [mu(w0-w1),  mu(w2-w3),  mu^2(w0+w1+w2+w3) + w4]]
    """
    wb = w.reshape(-1, 5)               # (40, 5)
    w0, w1, w2, w3, w4 = (wb[:, 0], wb[:, 1], wb[:, 2], wb[:, 3], wb[:, 4])
    zero = jnp.zeros_like(w0)
    d_x = w0 + w1
    d_y = w2 + w3
    o_x = mu * (w0 - w1)
    o_y = mu * (w2 - w3)
    d_z = mu * mu * (w0 + w1 + w2 + w3) + w4
    blocks = jnp.stack([
        jnp.stack([d_x, zero, o_x], axis=-1),
        jnp.stack([zero, d_y, o_y], axis=-1),
        jnp.stack([o_x, o_y, d_z], axis=-1),
    ], axis=-2)                          # (40, 3, 3)
    return jax.scipy.linalg.block_diag(*blocks).astype(dtype)


def mpc_factorize(qp, settings=ADMMSettings(), mu=None):
    """Factorize the MPC QP KKT matrix (friction-pyramid constraints)."""
    from go1_qp_mpc_controller_tpu.config import params as P
    mu = P.MPC_MU if mu is None else mu
    dense = functools.partial(_pyramid_ctc_dense, mu=mu,
                              dtype=qp.hessian.dtype)
    return factorize(qp.hessian, qp.lb, qp.ub, dense, settings)


def mpc_solve(qp, settings=ADMMSettings(), warm_x=None, warm_y=None):
    """Factorize + solve one condensed MPC QP (srb.CondensedQP)."""
    chol, rho_vec = mpc_factorize(qp, settings)
    return solve(qp.hessian, qp.gradient, qp.lb, qp.ub,
                 srb.constraint_matvec, srb.constraint_rmatvec,
                 chol, rho_vec, settings, warm_x=warm_x, warm_y=warm_y)
