"""Process entry point: preset-driven controller runs.

TPU-native equivalent of the reference's Main{Gazebo,Hardware,Isaac}.cpp
executables + roslaunch preset selection (launch/a1_ctrl.launch:1-8):

  python -m go1_qp_mpc_controller_tpu.main --preset gazebo_mpc rollout
  python -m go1_qp_mpc_controller_tpu.main --preset gazebo_mpc sweep
  python -m go1_qp_mpc_controller_tpu.main --preset hardware_mpc loop

Modes:
  rollout — closed-loop trot on the on-device SRB simulator (the Gazebo
            stand-in), printing tracking statistics.
  sweep   — batched randomized-scenario MPC sweep on the local mesh.
  loop    — the real-time host loop against the C++ bridge (sensor feed
            must be provided externally, e.g. a hardware I/O process).
"""

import argparse
import json


def cmd_rollout(args, model, params, static):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from go1_qp_mpc_controller_tpu.ctrl import controller
    from go1_qp_mpc_controller_tpu.envs import rollout
    from go1_qp_mpc_controller_tpu.ops import admm

    dtype = jnp.float32
    carry = rollout.init_carry(model, params, height=args.height,
                               dtype=dtype)
    dt = jnp.asarray(args.dt, dtype)
    vel = jnp.asarray([args.vx, args.vy, 0.0], dtype)

    def command(i, ctrl):
        walk = i >= 100
        return ctrl._replace(
            movement_mode=jnp.where(walk, 1, 0).astype(jnp.int32),
            root_lin_vel_d=jnp.where(walk, vel, jnp.zeros(3, dtype)))

    solver = controller.MPC if static.solver == "mpc" else controller.QP
    horizon = getattr(args, "horizon", None)
    if horizon is not None:
        # stagewise long-horizon path: re-init the carry with H-sized
        # warm fields and give the cold/warm solves stagewise schedules
        carry = rollout.init_carry(model, params, height=args.height,
                                   dtype=dtype, horizon=horizon)
        settings = admm.ADMMSettings(seg_iters=60, segments=3,
                                     polish=False)
        warm_settings = admm.ADMMSettings(seg_iters=25, segments=1,
                                          polish=False)
    else:
        settings = admm.ADMMSettings(seg_iters=25, segments=3)
        warm_settings = controller.WARM_SETTINGS
    run = jax.jit(lambda c: rollout.rollout(
        c, model, params, args.steps, dt, solver_type=solver,
        settings=settings, warm_settings=warm_settings,
        command_fn=command, estimate=not args.no_ekf,
        use_terrain_adapt=static.use_terrain_adapt, horizon=horizon))
    carry, trace = run(carry)
    if getattr(args, "trace", None):
        from go1_qp_mpc_controller_tpu.utils import viz
        viz.save_trace(args.trace, trace, args.dt)
        if getattr(args, "plot", None):
            viz.plot_rollout(viz.load_trace(args.trace), args.plot,
                             title=f"{args.preset} rollout "
                                   f"(vx={args.vx}, {args.steps} steps)")
    elif getattr(args, "plot", None):
        from go1_qp_mpc_controller_tpu.utils import viz
        viz.plot_rollout(dict(trace._asdict(), dt=args.dt), args.plot,
                         title=f"{args.preset} rollout (vx={args.vx}, "
                               f"{args.steps} steps)")
    pos = np.asarray(trace.root_pos)
    vel_tr = np.asarray(trace.root_lin_vel)
    print(json.dumps({
        "final_pos": pos[-1].round(4).tolist(),
        "mean_vx": round(float(vel_tr[args.steps // 3:, 0].mean()), 4),
        "height_range": [round(float(pos[100:, 2].min()), 4),
                         round(float(pos[100:, 2].max()), 4)],
        "max_tilt_rad": round(
            float(np.abs(np.asarray(trace.root_euler)[100:, :2]).max()), 4),
    }))


def cmd_sweep(args, model, params, static):
    import jax
    import jax.numpy as jnp

    from go1_qp_mpc_controller_tpu.ops import admm
    from go1_qp_mpc_controller_tpu.parallel import mesh as mesh_lib
    from go1_qp_mpc_controller_tpu.parallel import sweep

    mesh = mesh_lib.make_mesh(mpc_parallel=args.mpc_parallel)
    fn = sweep.make_sweep_fn(mesh, float(params.mpc_dt),
                             admm.ADMMSettings(seg_iters=25, segments=3))
    scn = sweep.random_scenarios(jax.random.PRNGKey(args.seed),
                                 args.batch, jnp.float32)
    out = fn(scn)
    jax.block_until_ready(out.grf)
    print(json.dumps({
        "num_solves": float(out.stats["num_solves"]),
        "max_primal_res": float(out.stats["max_primal_res"]),
        "max_dual_res": float(out.stats["max_dual_res"]),
        "mesh": dict(mesh.shape),
    }))


def cmd_loop(args, model, params, static):
    import jax.numpy as jnp

    from go1_qp_mpc_controller_tpu.models import types
    from go1_qp_mpc_controller_tpu.runtime import feeder as feeder_lib
    from go1_qp_mpc_controller_tpu.runtime import loop as loop_lib

    ctrl = types.init_ctrl_state(model, jnp.float32)
    source = None
    if args.joy_demo:
        # scripted operator session (stand -> walk -> stand -> LB exit),
        # the runnable equivalent of the reference's joystick path
        # (GazeboA1ROS.cpp:117-188)
        import numpy as np

        from go1_qp_mpc_controller_tpu.runtime import joystick

        def axes(velx=0.0, a=False, lb=False):
            ax = np.zeros(8, np.float32)
            ax[4] = velx
            bt = np.zeros(5, np.int32)
            bt[0], bt[4] = int(a), int(lb)
            return ax, bt

        t2 = int(args.duration / args.dt)
        src_events = [
            (t2 // 4,) + axes(velx=0.3, a=True),
            (t2 // 2,) + axes(a=True),
            (3 * t2 // 4,) + axes(lb=True),
        ]
        source = joystick.ScriptedJoySource(src_events)
    cl = loop_lib.ControlLoop(model, params, static, ctrl,
                              main_period_s=args.dt,
                              grf_period_s=args.grf_dt or args.dt,
                              power_level=static.power_level,
                              time_scale=args.time_scale,
                              command_source=source,
                              estimate_in_feed=args.estimate_in_feed,
                              sensor_period_s=args.feed_dt)
    feeder = None
    try:
        if not args.no_feeder:
            # sim-backed 1 kHz sensor feed (the HardwareA1ROS receive
            # thread's role); sync the controller to the plant's stand
            feeder = feeder_lib.SimFeeder(cl.bridge, model, params,
                                          height=args.height,
                                          period_s=args.feed_dt,
                                          time_scale=args.time_scale)
            cl.state = feeder.initial_ctrl_state()
            cl.warmup(dual=not args.single)
            feeder.start(duration_s=args.duration + 5.0)
        run = cl.run if args.single else cl.run_dual
        n = run(duration_s=args.duration)
        out = {"ticks": n,
               "grf_ticks": cl.grf_ticks,
               "time_scale": args.time_scale,
               "cycle_ms": cl.metrics.summary("cycle_ms"),
               "grf_ms": cl.metrics.summary("grf_ms")}
        if feeder is not None:
            feeder.stop()
            out["feeder_ticks"] = feeder.ticks
            # plant CoM: ~[0, 0, height] when the loop keeps up. On a
            # host whose grf solve exceeds the cadence (this remote-TPU
            # harness: ~25 ms vs 2 ms) run with time_scale <= 0.04 or
            # the starved solver loop destabilizes the stand (see
            # tests/test_dual_loop.py's time-scale ladder).
            out["plant_root_pos"] = [round(float(v), 4)
                                     for v in feeder.sim_root_pos]
            _, cmd = cl.bridge.read_command()
            out["max_abs_tau"] = round(float(abs(cmd["tau"]).max()), 3)
        print(json.dumps(out))
    finally:
        if feeder is not None:
            feeder.stop()
        cl.close()


def cmd_rl(args, model, params, static):
    """Closed-loop RL rollout on the PD joint plant (the reference's
    go1_rl_ctrl_cpp MainGazebo process, policy -> position commands)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from go1_qp_mpc_controller_tpu.ctrl import rl as rl_lib
    from go1_qp_mpc_controller_tpu.envs import rollout
    from go1_qp_mpc_controller_tpu.models import policy as policy_lib

    if args.weights:
        actor = policy_lib.load_torchscript_actor(args.weights)
    else:
        # no weights ship with the reference either (resource/*.pt are
        # binary artifacts); random weights still exercise the full loop
        actor = policy_lib.init_mlp(jax.random.PRNGKey(args.seed))

    dtype = jnp.float32
    carry = rollout.init_rl_carry(model, height=args.height, dtype=dtype)
    dt = jnp.asarray(args.dt, dtype)
    switch_at = args.switch_step

    def toggle_fn(i):
        return i == switch_at

    def command_fn(i):
        return jnp.where(i >= switch_at,
                         jnp.asarray([args.vx, args.vy, 0.0], dtype),
                         jnp.zeros(3, dtype))

    run = jax.jit(lambda c: rollout.rl_rollout(
        c, model, actor, args.steps, dt,
        command_fn=command_fn, toggle_fn=toggle_fn))
    _, trace = run(carry)
    obs = np.asarray(trace.obs)
    q = np.asarray(trace.target_q)
    print(json.dumps({
        "steps": args.steps,
        "finite": bool(np.isfinite(obs).all() and np.isfinite(q).all()),
        "obs_max_abs": round(float(np.abs(obs).max()), 3),
        "target_q_range": [round(float(q.min()), 3),
                           round(float(q.max()), 3)],
        "mode_tail": int(np.asarray(trace.movement_mode)[-1]),
        "final_root_pos": [round(float(v), 4)
                           for v in np.asarray(trace.root_pos)[-1]],
    }))


def cmd_rl_loop(args, model, params, static):
    """RL host loop over the RT bridge against the sim feeder — the
    hardware-mirror RL process (Go1RLHardwareController + estimation
    thread + servo stand), R2/R6 parity."""
    import jax
    import numpy as np

    from go1_qp_mpc_controller_tpu.config import presets
    from go1_qp_mpc_controller_tpu.models import policy as policy_lib
    from go1_qp_mpc_controller_tpu.runtime import feeder as feeder_lib
    from go1_qp_mpc_controller_tpu.runtime import rl_loop as rl_loop_lib

    rl_cfg = presets.load_rl_preset(args.rl_preset)
    if args.weights:
        actor = policy_lib.load_torchscript_actor(args.weights)
    else:
        actor = policy_lib.init_mlp(jax.random.PRNGKey(0))
    loop = rl_loop_lib.RLControlLoop(
        model, actor, action_period_s=rl_cfg.action_period,
        power_level=rl_cfg.power_level, hardware=not rl_cfg.use_sim_time,
        contact_force_norm=rl_cfg.contact_force_norm,
        time_scale=args.time_scale, servo_only=args.servo_only)
    feeder = None
    try:
        loop.warmup()
        feeder = feeder_lib.SimFeeder(loop.bridge, model, params,
                                      height=args.height,
                                      period_s=rl_cfg.deploy_period,
                                      time_scale=args.time_scale)
        feeder.start(duration_s=args.duration + 5.0)
        n = loop.run(duration_s=args.duration)
        feeder.stop()
        _, cmd = loop.bridge.read_command()
        print(json.dumps({
            "ticks": n,
            "feeder_ticks": feeder.ticks,
            "mode": int(loop.rl_state.movement_mode),
            "root_pos": [round(float(v), 4)
                         for v in feeder.sim_root_pos],
            "kp_head": [round(float(v), 1) for v in cmd["kp"][:3]],
        }))
    finally:
        if feeder is not None:
            feeder.stop()
        loop.close()


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", default="gazebo_mpc")
    sub = parser.add_subparsers(dest="mode", required=True)

    p = sub.add_parser("rollout")
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--dt", type=float, default=0.002)
    p.add_argument("--vx", type=float, default=0.3)
    p.add_argument("--vy", type=float, default=0.0)
    p.add_argument("--height", type=float, default=0.3)
    p.add_argument("--no-ekf", action="store_true")
    p.add_argument("--horizon", type=int, default=None,
                   help="MPC horizon; values != 10 route the GRF solve "
                        "to the stagewise O(H) solver")
    p.add_argument("--trace", default=None, metavar="OUT.npz",
                   help="dump the full RolloutTrace (npz) for offline "
                        "plotting (utils/viz.py)")
    p.add_argument("--plot", default=None, metavar="OUT.png",
                   help="render the gait-health figure (CoM path, foot "
                        "swing paths, GRF timelines, terrain pitch) — "
                        "the RViz/PlotJuggler stand-in "
                        "(A1RobotControl.cpp:65-146)")
    p.set_defaults(fn=cmd_rollout)

    p = sub.add_parser("sweep")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mpc-parallel", type=int, default=1)
    p.set_defaults(fn=cmd_sweep)

    p = sub.add_parser("loop")
    p.add_argument("--dt", type=float, default=0.002)
    p.add_argument("--grf-dt", type=float, default=None,
                   help="GRF solver cadence (default: --dt)")
    p.add_argument("--feed-dt", type=float, default=0.001,
                   help="sim sensor-feed cadence (reference: 1 ms)")
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--height", type=float, default=0.3)
    p.add_argument("--time-scale", type=float, default=0.25,
                   help="real-time factor (Gazebo RTF analog): wall "
                        "periods = sim periods / time_scale. Default "
                        "0.25 absorbs uncolocated solve latency; use "
                        "1.0 on a co-located accelerator")
    p.add_argument("--joy-demo", action="store_true",
                   help="drive a scripted joystick session (stand -> "
                        "walk -> stand -> LB exit) through the loop")
    p.add_argument("--estimate-in-feed", action="store_true",
                   help="run the EKF in a dedicated thread at the "
                        "sensor cadence (HardwareA1ROS receive-thread "
                        "estimation) instead of inside the fast step")
    p.add_argument("--no-feeder", action="store_true",
                   help="run against an externally fed bridge")
    p.add_argument("--single", action="store_true",
                   help="fused single-cadence loop (legacy)")
    p.set_defaults(fn=cmd_loop)

    p = sub.add_parser("rl-loop")
    p.add_argument("--rl-preset", default="rl_gazebo",
                   help="rl_gazebo | rl_hardware (RL-stack config)")
    p.add_argument("--duration", type=float, default=5.0)
    p.add_argument("--height", type=float, default=0.3)
    p.add_argument("--time-scale", type=float, default=0.25)
    p.add_argument("--servo-only", action="store_true",
                   help="standalone servo stand process "
                        "(servo_stand_policy parity)")
    p.add_argument("--weights", default=None)
    p.set_defaults(fn=cmd_rl_loop)

    p = sub.add_parser("rl")
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--dt", type=float, default=0.004)
    p.add_argument("--vx", type=float, default=0.3)
    p.add_argument("--vy", type=float, default=0.0)
    p.add_argument("--height", type=float, default=0.3)
    p.add_argument("--switch-step", type=int, default=400,
                   help="A-button press: servo-stand -> walk policy")
    p.add_argument("--weights", default=None,
                   help="TorchScript actor .pt (random weights if unset)")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_rl)

    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from go1_qp_mpc_controller_tpu.config import presets
    model, params, static = presets.load_preset(args.preset, jnp.float32)
    args.fn(args, model, params, static)


if __name__ == "__main__":
    main()
