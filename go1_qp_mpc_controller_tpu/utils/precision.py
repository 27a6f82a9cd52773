"""Matmul-precision guard for correctness-critical code paths.

On TPU, JAX's default matmul precision runs float32 operands through
single-pass bfloat16 MXU multiplications (~6e-3 relative error on the MPC
Hessian — measured on the test_mpc fixture), silently destroying the 1e-3
GRF parity budget. The solver/condensation/estimator paths therefore pin
true-float32 precision explicitly; callers can still trade accuracy for
speed by editing call sites, but never by accident.
"""

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace ``fn`` under float32 matmul precision."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapped
