"""Rollout trace dump + gait-health figure (VERDICT r3 item 9: the
RViz-marker / PlotJuggler stand-in, A1RobotControl.cpp:65-146)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.ctrl import controller
from go1_qp_mpc_controller_tpu.envs import rollout
from go1_qp_mpc_controller_tpu.models import types
from go1_qp_mpc_controller_tpu.ops import admm
from go1_qp_mpc_controller_tpu.utils import viz


def _short_trot_trace(steps=260):
    dtype = jnp.float32
    model = types.default_robot_model(dtype)
    params = types.default_ctrl_params(dtype)
    carry = rollout.init_carry(model, params, height=0.3, dtype=dtype)
    dt = jnp.asarray(0.002, dtype)

    def command(i, ctrl):
        walk = i >= 100
        return ctrl._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk,
                                     jnp.asarray([0.3, 0.0, 0.0], dtype),
                                     jnp.zeros(3, dtype)))

    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, steps, dt,
        settings=admm.ADMMSettings(seg_iters=25, segments=2,
                                   polish=False),
        command_fn=command, estimate=False, use_terrain_adapt=False))
    _, trace = run(carry)
    return trace, dt


def test_trace_roundtrip_and_figure(tmp_path):
    trace, dt = _short_trot_trace()
    npz = os.path.join(tmp_path, "trot.npz")
    png = os.path.join(tmp_path, "trot.png")
    viz.save_trace(npz, trace, dt)

    loaded = viz.load_trace(npz)
    assert loaded["root_pos"].shape == trace.root_pos.shape
    assert loaded["foot_pos_abs"].shape == (trace.root_pos.shape[0], 4, 3)
    np.testing.assert_allclose(loaded["foot_forces_grf"],
                               np.asarray(trace.foot_forces_grf))
    assert float(loaded["dt"]) == float(dt)

    out = viz.plot_rollout(loaded, png, title="test trot")
    assert os.path.exists(out)
    assert os.path.getsize(out) > 20_000   # a real rendered figure

    # svg works too (vector output for docs)
    svg = os.path.join(tmp_path, "trot.svg")
    viz.plot_rollout(loaded, svg)
    assert os.path.getsize(svg) > 10_000


def test_cli_module_entry(tmp_path):
    trace, dt = _short_trot_trace(steps=40)
    npz = os.path.join(tmp_path, "t.npz")
    viz.save_trace(npz, trace, dt)
    assert viz.main([npz, os.path.join(tmp_path, "t.png")]) == 0
    assert os.path.exists(os.path.join(tmp_path, "t.png"))
