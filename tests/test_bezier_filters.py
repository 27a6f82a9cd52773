"""Bezier swing curve + moving-window filter checks (Utils.cpp:64-107,
filter.hpp:14-63)."""

import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.utils import bezier, filters


def _bezier_scalar(t, pts):
    binom = [1, 4, 6, 4, 1]
    return sum(binom[i] * t ** i * (1 - t) ** (4 - i) * pts[i]
               for i in range(5))


def test_bernstein_endpoints():
    pts = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])
    np.testing.assert_allclose(float(bezier.bernstein4(0.0, pts)), 1.0)
    np.testing.assert_allclose(float(bezier.bernstein4(1.0, pts)), 5.0)


def test_swing_foot_pos_profile():
    """11-point sweep like test_bezier.cpp:11-27: endpoints exact, z bump."""
    start = jnp.asarray([0.0, 0.1, -0.3])
    final = jnp.asarray([0.2, 0.1, -0.3])
    ts = np.linspace(0.0, 1.0, 11)
    for t in ts:
        p = np.asarray(bezier.swing_foot_pos(float(t), start, final))
        # manual control points
        px = _bezier_scalar(t, [0.0, 0.0, 0.2, 0.2, 0.2])
        py = _bezier_scalar(t, [0.1] * 5)
        pz = _bezier_scalar(t, [-0.3, -0.3 + 0.0, -0.3 + 0.4, -0.3, -0.3])
        np.testing.assert_allclose(p, [px, py, pz], atol=1e-7)
    p0 = np.asarray(bezier.swing_foot_pos(0.0, start, final))
    p1 = np.asarray(bezier.swing_foot_pos(1.0, start, final))
    np.testing.assert_allclose(p0, np.asarray(start), atol=1e-7)
    np.testing.assert_allclose(p1, np.asarray(final), atol=1e-7)
    # mid-swing clears the line between start and end
    pm = np.asarray(bezier.swing_foot_pos(0.5, start, final))
    assert pm[2] > -0.3 + 0.05


def test_swing_foot_pos_terrain_pitch():
    start = jnp.asarray([0.0, 0.0, 0.0])
    final = jnp.asarray([0.0, 0.0, 0.0])
    pitch = 0.3
    pm = np.asarray(bezier.swing_foot_pos(0.5, start, final, pitch))
    pm0 = np.asarray(bezier.swing_foot_pos(0.5, start, final, 0.0))
    # P2 bump increases by 0.5 sin(pitch); basis weight at t=.5 is 6/16
    np.testing.assert_allclose(pm[2] - pm0[2], 6 / 16 * 0.5 * np.sin(pitch),
                               atol=1e-7)


def test_swing_foot_pos_batched_legs():
    starts = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)))
    finals = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)))
    ts = jnp.asarray([0.0, 0.25, 0.5, 1.0])
    batched = bezier.swing_foot_pos(ts, starts, finals)
    for i in range(4):
        single = bezier.swing_foot_pos(ts[i], starts[i], finals[i])
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(single), atol=1e-12)


def test_moving_window_filter_matches_reference_semantics():
    """Divides by full window size even before the window fills
    (filter.hpp:38), then becomes a true moving average."""
    window = 5
    state = filters.moving_window_init(window, (), jnp.float64)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    avgs = []
    for v in vals:
        state, avg = filters.moving_window_update(state, jnp.asarray(v))
        avgs.append(float(avg))
    # warmup: sum so far / window
    np.testing.assert_allclose(avgs[0], 1.0 / 5)
    np.testing.assert_allclose(avgs[2], 6.0 / 5)
    # full window
    np.testing.assert_allclose(avgs[4], 15.0 / 5)
    np.testing.assert_allclose(avgs[5], 20.0 / 5)
    np.testing.assert_allclose(avgs[6], 25.0 / 5)


def test_moving_window_filter_vector_values():
    state = filters.moving_window_init(3, (4, 3), jnp.float64)
    rng = np.random.default_rng(3)
    samples = rng.normal(size=(6, 4, 3))
    for k in range(6):
        state, avg = filters.moving_window_update(
            state, jnp.asarray(samples[k]))
    np.testing.assert_allclose(np.asarray(avg), samples[3:].mean(0),
                               atol=1e-12)
