"""Horizon-axis (sequence-parallel) sharding for the stagewise LQR sweeps.

The stagewise solver's per-ADMM-iteration work is two affine recurrences
over the horizon (ops/stagewise.py::_lqr_solve) — the MPC analog of
sequence parallelism (SURVEY section 5's long-context axis; the
reference's O(H^2) condensation, ConvexMpc.cpp:158-245, never had a
parallel-in-horizon form at all). This module distributes those
recurrences over the ``mpc`` mesh axis:

- each device holds H/n contiguous stages of the per-stage tensors,
- a local `associative_scan` composes the on-device affine maps,
- ONE all_gather of the n per-device composites (13x13 + 13 each — tiny,
  rides ICI) gives every device the cross-device prefix/suffix, applied
  locally: total depth O(H/n + log n) instead of O(H).

The Riccati FACTORIZATION pass stays replicated: it is a genuinely
nonlinear recursion (no affine composition exists), runs once per rho
segment, and costs about two LQR iterations — sharding the per-iteration
sweeps is where the horizon axis can actually win.

Virtual-mesh measurement (8 CPU devices, see tests/test_sharding.py):
equality holds to 1e-8. Measured wall-clock on the VIRTUAL mesh
(batch 1): H=128 sequential 0.48 ms vs sharded 6.2 ms; H=512 0.96 vs
8.8 ms — the virtual mesh's per-collective dispatch (all devices share
one host) swamps the depth win, so these numbers only demonstrate the
plumbing. On real hardware the crossover must be read from depth
arithmetic: at batch B filling the chip, the sequential scan is
B-parallel and the horizon shard only pays once H/n + log n collective
hops beat H sequential 13-dim steps with the batch UNDERfilled, i.e.
small-batch / very-long-horizon regimes (H >~ few hundred at B <~ 100),
matching the single-device associative_scan finding recorded in
ops/stagewise.py::_lqr_solve.
"""

import jax
import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.ops import stagewise

NX = stagewise.NX


def _comb(a, b):
    """Affine-map composition with ``b`` applied LAST (the stagewise
    convention, ops/stagewise.py::_lqr_solve)."""
    return (jnp.einsum('...ij,...jk->...ik', b[0], a[0]),
            jnp.einsum('...ij,...j->...i', b[0], a[1]) + b[1])


def affine_scan_sharded(e_loc, f_loc, axis_name, reverse=False):
    """Distributed inclusive affine scan over a sharded leading axis.

    Matches ``jax.lax.associative_scan(_comb, (e, f), reverse=reverse,
    axis=0)[1]`` on the concatenated global arrays, with the leading axis
    sharded in contiguous blocks over ``axis_name`` (device k holds
    stages [k*s, (k+1)*s)).

    Args:
      e_loc: (s, 13, 13) local map matrices.
      f_loc: (s, 13) local offsets.

    Returns:
      (s, 13) local slice of the global scan result.
    """
    n = jax.lax.axis_size(axis_name)
    k = jax.lax.axis_index(axis_name)
    loc_e, loc_f = jax.lax.associative_scan(_comb, (e_loc, f_loc),
                                            reverse=reverse, axis=0)
    # device composite: the composition of ALL local elements
    comp_e = loc_e[0] if reverse else loc_e[-1]
    comp_f = loc_f[0] if reverse else loc_f[-1]
    es = jax.lax.all_gather(comp_e, axis_name)      # (n, 13, 13)
    fs = jax.lax.all_gather(comp_f, axis_name)      # (n, 13)

    # cross-device exclusive prefix (forward: devices < k, applied FIRST)
    # or suffix (reverse: devices > k). n is tiny (mesh axis size), so a
    # host-unrolled loop over gathered composites is fine.
    eye = jnp.broadcast_to(jnp.eye(NX, dtype=e_loc.dtype), es.shape)
    zero = jnp.zeros_like(fs)
    if not reverse:
        pre = jax.lax.associative_scan(_comb, (es, fs), axis=0)
        pre_e = jnp.concatenate([eye[:1], pre[0][:-1]])
        pre_f = jnp.concatenate([zero[:1], pre[1][:-1]])
    else:
        pre = jax.lax.associative_scan(_comb, (es, fs), reverse=True,
                                       axis=0)
        pre_e = jnp.concatenate([pre[0][1:], eye[:1]])
        pre_f = jnp.concatenate([pre[1][1:], zero[:1]])
    my_e = pre_e[k]
    my_f = pre_f[k]
    # forward: global_i = comb(prefix, local_i) (prefix applied first);
    # reverse: global_i = comb(suffix, local_i) (suffix stages, which are
    # LATER in the horizon, applied first in the composition order)
    _, out_f = _comb((my_e, my_f), (loc_e, loc_f))
    return out_f


def lqr_solve_sharded(fac_loc, a_d, b_d_loc, g_loc, c_lin_loc, axis_name):
    """Horizon-sharded affine LQR solve (== stagewise._lqr_solve).

    Args:
      fac_loc: dict with local slices k (s, 12, 13), ginv (s, 12, 12),
        acl (s, 13, 13), bt (s, 12, 13) (from a replicated
        _riccati_factor, sliced per device).
      a_d: (13, 13) replicated.
      b_d_loc: (s, 13, 12); g_loc: (s, 12); c_lin_loc: (s, 13).

    Returns:
      (s, 12) local slice of the per-stage inputs u.
    """
    k, ginv, acl, bt = (fac_loc["k"], fac_loc["ginv"], fac_loc["acl"],
                        fac_loc["bt"])
    dtype = g_loc.dtype
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # backward: p_i = Acl_i' p_{i+1} + (Acl_i' c_i - K_i' g_i), p_H = 0
    e_bwd = jnp.swapaxes(acl, -1, -2)
    f_bwd = (jnp.einsum('hxy,hy->hx', e_bwd, c_lin_loc)
             - jnp.einsum('hux,hu->hx', k, g_loc))
    p_all = affine_scan_sharded(e_bwd, f_bwd, axis_name, reverse=True)
    # s_i = p_{i+1} + c_i: shift the scan result left by one across the
    # shard boundary (device k's last element needs device k+1's first)
    nxt = jax.lax.ppermute(p_all[0], axis_name,
                           [(j + 1, j) for j in range(n - 1)])
    last = jnp.where(idx == n - 1, jnp.zeros((NX,), dtype), nxt)
    p_next = jnp.concatenate([p_all[1:], last[None]])
    s_next = p_next + c_lin_loc

    # forward: x_{i+1} = Acl_i x_i - B_i d_i, x_0 = 0
    d = jnp.einsum('huv,hv->hu', ginv,
                   jnp.einsum('hux,hx->hu', bt, s_next) + g_loc)
    h_fwd = -jnp.einsum('hxu,hu->hx', b_d_loc, d)
    x_all = affine_scan_sharded(acl, h_fwd, axis_name, reverse=False)
    # x_i consumed at stage i is the PREVIOUS stage's scan output
    prev = jax.lax.ppermute(x_all[-1], axis_name,
                            [(j, j + 1) for j in range(n - 1)])
    first = jnp.where(idx == 0, jnp.zeros((NX,), dtype), prev)
    x = jnp.concatenate([first[None], x_all[:-1]])
    return -jnp.einsum('hux,hx->hu', k, x) - d
