"""O(1) moving-window average filter as a functional JAX state machine.

TPU-native equivalent of MovingWindowFilter
(src/a1_cpp/src/utils/filter.hpp:14-63): a ring buffer with a
Neumaier-compensated running sum. The reference divides by the *full* window
size even before the window fills (filter.hpp:38) — replicated here.

State is a pytree of arrays so filters batch/vmap transparently; the value
slot can itself be vector-shaped to run many filters in lockstep (e.g. the
per-leg (3, 4) recent-contact filters, A1RobotControl.cpp:53-57).
"""

from typing import NamedTuple

import jax.numpy as jnp


class MovingWindowState(NamedTuple):
    """Ring-buffer filter state.

    Attributes:
      buffer: (window, *value_shape) stored samples.
      sum: (*value_shape) Neumaier running sum.
      correction: (*value_shape) Neumaier compensation term.
      count: () int32, number of valid samples (saturates at window).
      head: () int32, next write slot.
    """
    buffer: jnp.ndarray
    sum: jnp.ndarray
    correction: jnp.ndarray
    count: jnp.ndarray
    head: jnp.ndarray


def moving_window_init(window_size, value_shape=(), dtype=jnp.float32):
    """Create an empty filter state for ``window_size`` samples."""
    return MovingWindowState(
        buffer=jnp.zeros((window_size,) + tuple(value_shape), dtype),
        sum=jnp.zeros(value_shape, dtype),
        correction=jnp.zeros(value_shape, dtype),
        count=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
    )


def _neumaier_add(s, c, value):
    """One Neumaier-compensated accumulation step (filter.hpp:53-62)."""
    new_sum = s + value
    big_s = jnp.abs(s) >= jnp.abs(value)
    c = c + jnp.where(big_s, (s - new_sum) + value, (value - new_sum) + s)
    return new_sum, c


def moving_window_init_stacked(num, window_size, value_shape=(),
                               dtype=jnp.float32):
    """``num`` independent filters stacked on a leading axis (e.g. the
    reference's 12 per-leg recent-contact filters, A1RobotControl.cpp:53-57).
    Update with vmap or :func:`moving_window_update_masked`."""
    import jax
    return jax.vmap(lambda _: moving_window_init(window_size, value_shape,
                                                 dtype))(jnp.arange(num))


def moving_window_update_masked(state, new_value, mask):
    """Per-row gated update of a stacked filter.

    Rows where ``mask`` is False keep their state and report their previous
    average — matching the reference's "only filter while in contact"
    pattern (A1RobotControl.cpp:274-281).

    Args:
      state: stacked MovingWindowState (leading axis N on every leaf).
      new_value: (N, *value_shape).
      mask: (N,) bool.

    Returns:
      (new_state, average (N, *value_shape)).
    """
    import jax
    upd, avg_new = jax.vmap(moving_window_update)(state, new_value)

    def sel(a, b):
        m = mask.reshape(mask.shape + (1,) * (a.ndim - mask.ndim))
        return jnp.where(m, a, b)

    new_state = jax.tree.map(sel, upd, state)
    window = state.buffer.shape[1]
    avg_old = (state.sum + state.correction) / window
    return new_state, sel(avg_new, avg_old)


def moving_window_update_if(state, new_value, pred):
    """Scalar-gated update: push only when ``pred`` (a 0-d bool) is true;
    otherwise the state is unchanged and the previous average is returned
    (the reference's height-gated terrain filter, A1RobotControl.cpp:340-345).
    """
    import jax
    upd, avg_new = moving_window_update(state, new_value)
    new_state = jax.tree.map(lambda a, b: jnp.where(pred, a, b), upd, state)
    window = state.buffer.shape[0]
    avg_old = (state.sum + state.correction) / window
    return new_state, jnp.where(pred, avg_new, avg_old)


def moving_window_update(state, new_value):
    """Push ``new_value``; returns (new_state, average).

    The average is (sum + correction) / window_size — matching the
    reference's constant divisor (filter.hpp:38).
    """
    window = state.buffer.shape[0]
    full = state.count >= window
    evicted = state.buffer[state.head % window]
    # Subtract the oldest sample only when the window is full.
    s, c = _neumaier_add(state.sum, state.correction,
                         jnp.where(full, -evicted, jnp.zeros_like(evicted)))
    s, c = _neumaier_add(s, c, new_value)
    buffer = state.buffer.at[state.head % window].set(new_value)
    new_state = MovingWindowState(
        buffer=buffer,
        sum=s,
        correction=c,
        count=jnp.minimum(state.count + 1, window),
        head=(state.head + 1) % window,
    )
    avg = (s + c) / window
    return new_state, avg
