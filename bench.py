"""Benchmark: batched horizon-10 MPC solves/s on one chip.

Prints ONE JSON line:
  {"metric": "mpc_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 100000, ...}

The headline number measures the production cadence: warm-started control
ticks, exactly how the reference runs its solver (a persistent OSQP
instance updated per tick, A1RobotControl.cpp:522-540). Each tick
re-condenses the QP from a drifted robot state and solves it with the
carried WarmState (primal/dual/rho/KKT-inverse). A cold-start solves/s
figure and the single-solve latency ride along as context fields.

The baseline divisor is the driver-set north star (BASELINE.md): >= 100k
batched horizon-10 MPC solves/s per chip.
"""

import json
import time


def _make_tick_fns(settings_cold, settings_warm):
    import jax
    import jax.numpy as jnp

    from go1_qp_mpc_controller_tpu.models import srb
    from go1_qp_mpc_controller_tpu.ops import admm

    def discretized(scn, x0):
        a_c = srb.calculate_A_c(x0[0:3])
        b_c = srb.calculate_B_c(scn.mass, scn.inertia, scn.root_rot,
                                scn.foot_pos)
        return srb.discretize(a_c, b_c, 0.0025)

    def cold_one(scn):
        # r5 fused cold program (VERDICT r5 item 1): single segment at
        # the analytic per-scenario rho0, balanced KKT in one fused
        # pass, one scaled Schulz schedule — replaces the r2-r4
        # probing-segment schedule (admm.solve_cold_fused docstring)
        a_d, b_d = discretized(scn, scn.x0)
        lazy = srb.condense_nilpotent_lazy(a_d, b_d, scn.x0, scn.x_ref,
                                           scn.q_weights, scn.r_weights,
                                           scn.contacts)
        sol, warm = admm.mpc_solve_cold(lazy, settings_cold, mu=scn.mu,
                                        contacts=scn.contacts,
                                        foot_pos=scn.foot_pos)
        return sol.x[:12], warm

    def warm_tick_one(scn, x0, warm):
        # fused lazy path: the condensed Hessian is never materialized —
        # condensation, cost scaling, KKT band and Jacobi balance are one
        # HBM pass (probed: 205.7k -> 214.3k solves/s at batch 4096)
        a_d, b_d = discretized(scn, x0)
        lazy = srb.condense_nilpotent_lazy(a_d, b_d, x0, scn.x_ref,
                                           scn.q_weights, scn.r_weights,
                                           scn.contacts)
        sol, warm = admm.mpc_solve_warm_fused(lazy, warm, settings_warm,
                                              mu=scn.mu)
        return sol.x[:12], warm

    cold = jax.jit(jax.vmap(cold_one))

    def ticks(scn, warms, drifts, num_ticks):
        def body(carry, k):
            x0, warms = carry
            x0 = x0 + drifts
            out, warms = jax.vmap(warm_tick_one)(scn, x0, warms)
            return (x0, warms), out[:, 2]

        (_, warms), fz = jax.lax.scan(body, (scn.x0, warms),
                                      jnp.arange(num_ticks))
        return fz, warms

    # tight polished reference at an arbitrary state (the warm-tick
    # accuracy gate, VERDICT r2 item 10)
    tight_settings = ADMMSettingsTight()

    def tight_one(scn, x0):
        a_d, b_d = discretized(scn, x0)
        qp = srb.condense_nilpotent_const(a_d, b_d, x0, scn.x_ref,
                                          scn.q_weights, scn.r_weights,
                                          scn.contacts)
        sol = admm.mpc_solve(qp, tight_settings, mu=scn.mu)
        return sol.x[:12]

    warm_tick = jax.jit(jax.vmap(warm_tick_one))
    tight = jax.jit(jax.vmap(tight_one))
    return cold, jax.jit(ticks, static_argnums=(3,)), warm_tick, tight


def ADMMSettingsTight():
    from go1_qp_mpc_controller_tpu.ops import admm
    return admm.ADMMSettings(seg_iters=80, segments=4, polish=True,
                             polish_solver="inv")


def controller_warm_settings():
    from go1_qp_mpc_controller_tpu.ctrl import controller
    return controller.WARM_SETTINGS


def _make_ctrl_bench(settings_cold, batch):
    """Full controller-tick chain: sensors -> EKF -> plan -> swing ->
    warm MPC -> torques -> SRB plant step (the reference's whole 0.5 ms
    loop, MainGazebo.cpp:47-121, fused into one on-device scan).

    Returns (init_batch, set_walk, perturb, chain_warm, chain_batched):
    - chain_warm: warm_mode="warm" — the steady-cadence program a
      production single-robot loop executes on non-transition ticks
      (lax.cond takes only the warm branch unbatched; vmap would pay
      both branches of a cond as a select, which no deployment does).
    - chain_batched: controller.control_step_batched — the production
      batched program with BATCH-LEVEL transition routing: the cold
      branch executes only on ticks where any scenario flips contacts
      (the cond sits outside vmap, so XLA runs one branch per tick).
      Used for the closed-loop walking metric and for warming the
      carried KKT inverse.
    """
    import jax
    import jax.numpy as jnp

    from go1_qp_mpc_controller_tpu.ctrl import controller
    from go1_qp_mpc_controller_tpu.envs import rollout, srb_sim
    from go1_qp_mpc_controller_tpu.models import types

    dtype = jnp.float32
    model = types.default_robot_model(dtype)
    params = types.default_ctrl_params(dtype)
    dt = jnp.asarray(0.002, dtype)

    def observe(cs, sm, fz):
        sensors = srb_sim.read_sensors(sm, model, cs.contacts, fz, dt)
        return controller.sensor_update(cs, model, sensors, dt)

    def plant(sm, ctrl):
        return srb_sim.step(sm, model, ctrl.joint_torques, ctrl.contacts,
                            ctrl.foot_pos_target_last_time, dt)

    def tick_batched(c, mode):
        ctrl = jax.vmap(observe)(c.ctrl, c.sim, c.stance_forces_z)
        # production warm schedule (controller.WARM_SETTINGS), cold
        # transition solves with the bench cold settings
        if mode == "batched":
            ctrl = controller.control_step_batched(
                ctrl, model, params, dt, settings=settings_cold)
        elif mode == "robust":
            ctrl = controller.control_step_batched(
                ctrl, model, params, dt, settings=settings_cold,
                warm_settings=controller.ROBUST_WARM_SETTINGS,
                robust=True)
        else:
            ctrl = jax.vmap(lambda x: controller.control_step(
                x, model, params, dt, settings=settings_cold,
                warm_mode=mode))(ctrl)
        sim, fz = jax.vmap(plant)(c.sim, ctrl)
        return (rollout.RolloutCarry(ctrl=ctrl, sim=sim,
                                     stance_forces_z=fz),
                ctrl.foot_forces_grf[:, 0, 2])

    def make_chain(mode):
        def chain(c, n):
            def body(cc, _k):
                return tick_batched(cc, mode)
            c, out = jax.lax.scan(body, c, jnp.arange(n))
            return out, c
        return jax.jit(chain, static_argnums=(1,))

    def init_batch(key):
        c = rollout.init_carry(model, params, height=0.3, dtype=dtype)
        b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (batch,) + a.shape), c)
        kz, kv = jax.random.split(key)
        sim = b.sim._replace(
            root_pos=b.sim.root_pos.at[:, 2].add(
                0.01 * jax.random.normal(kz, (batch,), dtype)),
            root_lin_vel=(b.sim.root_lin_vel
                          + 0.02 * jax.random.normal(kv, (batch, 3),
                                                     dtype)))
        return b._replace(sim=sim)

    def set_walk(c):
        vel = jnp.broadcast_to(jnp.asarray([0.25, 0.0, 0.0], dtype),
                               c.ctrl.root_lin_vel_d.shape)
        ctrl = c.ctrl._replace(
            movement_mode=jnp.ones_like(c.ctrl.movement_mode),
            root_lin_vel_d=vel)
        return c._replace(ctrl=ctrl)

    def perturb(c, k):
        sim = c.sim._replace(root_pos=c.sim.root_pos + 1e-4 * k)
        return c._replace(sim=sim)

    return (jax.jit(init_batch), jax.jit(set_walk), jax.jit(perturb),
            make_chain("warm"), make_chain("batched"),
            make_chain("robust"))


def _make_stagewise_fns(settings_cold, settings_warm, h):
    """Cold + warm-tick stagewise solvers at horizon ``h`` over the sweep
    scenario batch (VERDICT r2 item 4: stagewise throughput in the bench
    JSON, warm and cold)."""
    import jax
    import jax.numpy as jnp

    from go1_qp_mpc_controller_tpu.models import srb
    from go1_qp_mpc_controller_tpu.ops import stagewise

    def prep(scn):
        a_c = srb.calculate_A_c(scn.x0[0:3])
        b_c = srb.calculate_B_c(scn.mass, scn.inertia, scn.root_rot,
                                scn.foot_pos)
        a_d, b_d = srb.discretize(a_c, b_c, 0.0025)
        x_ref = jnp.tile(scn.x_ref[-1:], (h, 1))
        return a_d, b_d, x_ref

    def cold_one(scn):
        a_d, b_d, x_ref = prep(scn)
        sol, warm = stagewise.mpc_solve(
            a_d, b_d, scn.x0, x_ref, scn.q_weights, scn.r_weights,
            scn.contacts, mu=scn.mu, settings=settings_cold,
            return_warm=True)
        return sol.u[0], warm

    def warm_one(scn, x0, warm):
        a_d, b_d, x_ref = prep(scn)
        return stagewise.mpc_solve_warm(
            a_d, b_d, x0, x_ref, scn.q_weights, scn.r_weights,
            scn.contacts, warm, mu=scn.mu, settings=settings_warm)

    cold = jax.jit(jax.vmap(cold_one))

    def ticks(scn, warms, drifts, num_ticks):
        def body(carry, _k):
            x0, warms = carry
            x0 = x0 + drifts
            sol, warms = jax.vmap(warm_one)(scn, x0, warms)
            return (x0, warms), sol.u[:, 0, 2]

        (_, warms), fz = jax.lax.scan(body, (scn.x0, warms),
                                      jnp.arange(num_ticks))
        return fz, warms

    return cold, jax.jit(ticks, static_argnums=(3,))


def _mesh_ctrl_tick_bench(mesh, per_device, cpu, settings, reps=2):
    """Sharded PRODUCTION controller tick (make_sharded_control_step
    semantics: control_step_batched under shard_map, shard-local
    routing) timed on the real mesh, plus the identical unsharded
    program for the sharding-overhead comparison (VERDICT r4 item 4:
    the number configs[4] actually needs). Stand cadence, warmed carry,
    scan-chained ticks per dispatch to amortize dispatch overhead."""
    import time as _time

    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as PS

    from go1_qp_mpc_controller_tpu.ctrl import controller
    from go1_qp_mpc_controller_tpu.envs import rollout
    from go1_qp_mpc_controller_tpu.models import types
    from go1_qp_mpc_controller_tpu.parallel import mesh as mesh_lib

    dtype = jnp.float32
    model = types.default_robot_model(dtype)
    params = types.default_ctrl_params(dtype)
    dt = jnp.asarray(0.002, dtype)
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    batch = per_device * n_data
    ticks = 4 if cpu else 20

    def chain_local(states):
        def body(s, _):
            s = controller.control_step_batched(
                s, model, params, dt, settings=settings)
            return s, s.foot_forces_grf[:, 0, 2]
        return jax.lax.scan(body, states, None, length=ticks)

    spec = PS(mesh_lib.DATA_AXIS)
    chain_sharded = jax.jit(shard_map(
        chain_local, mesh=mesh, in_specs=spec,
        out_specs=(spec, PS(None, mesh_lib.DATA_AXIS)),
        check_vma=False))
    chain_plain = jax.jit(chain_local)

    c = rollout.init_carry(model, params, height=0.3, dtype=dtype)
    states = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (batch,) + a.shape), c.ctrl)
    states = jax.device_put(states, mesh_lib.scenario_sharding(mesh))
    # warm the carry: one young-cold chain, age past the young-tick
    # guard, one settling chain at the warm cadence
    states, _ = chain_sharded(states)
    states = states._replace(
        mpc_init_counter=jnp.full((batch,), 100, jnp.int32))
    states, _ = chain_sharded(states)
    jax.block_until_ready(states.qp_warm_minv)

    perturb = jax.jit(lambda s, k: s._replace(root_pos=s.root_pos
                                              + 1e-4 * k))
    s_reps = [perturb(states, jnp.asarray(float(r + 1), dtype))
              for r in range(reps)]
    out = {}
    for tag, fn in (("sharded", chain_sharded),
                    ("unsharded", chain_plain)):
        if cpu and tag == "unsharded":
            continue
        _, fz = fn(s_reps[0])
        jax.block_until_ready(fz)
        t0 = _time.perf_counter()
        outs = [fn(s)[1] for s in s_reps]
        jax.block_until_ready(outs)
        el = (_time.perf_counter() - t0) / reps
        out[f"ctrl_ticks_per_s_{tag}"] = round(batch * ticks / el, 1)
    return out


def main_mesh():
    """`bench.py --mesh`: weak-scaling sweep over mesh sizes {1, 2, 4, 8}
    (clipped to the available devices) — per-device batch held constant,
    scenario axis sharded over `data`. Prints ONE JSON line. On a single
    TPU chip this documents the size-1 point; run on a slice (or the
    virtual CPU mesh, JAX_PLATFORMS=cpu XLA_FLAGS=
    --xla_force_host_platform_device_count=8) for the scaling curve.
    Also benches the sharded PRODUCTION controller tick
    (make_sharded_control_step) against its unsharded twin.
    """
    import jax
    import jax.numpy as jnp

    from go1_qp_mpc_controller_tpu.ops import admm
    from go1_qp_mpc_controller_tpu.parallel import mesh as mesh_lib
    from go1_qp_mpc_controller_tpu.parallel import sweep

    dtype = jnp.float32
    devices = jax.devices()
    # CPU: small per-device batch + short schedule so the virtual-mesh
    # plumbing check runs in CI time; TPU: the production cold schedule
    cpu = devices[0].platform == "cpu"
    per_device = 32 if cpu else 4096
    # TPU: the r5 fused single-segment cold program (the sweep path
    # routes segments == 1 to admm.solve_cold_fused); CPU: a short
    # segmented schedule for the virtual-mesh plumbing check
    settings = (admm.ADMMSettings(seg_iters=10, segments=2, polish=False)
                if cpu else
                admm.ADMMSettings(seg_iters=40, segments=1, polish=False,
                                  schulz_l0=1e-6, schulz_hi_tail=1,
                                  schulz_impl="pallas"))
    reps = 2
    points = {}
    for n in [1, 2, 4, 8]:
        if n > len(devices):
            break
        mesh = mesh_lib.make_mesh(devices=devices[:n])
        fn = sweep.make_sweep_fn(mesh, 0.0025, settings)
        batch = per_device * n
        scn = sweep.random_scenarios(jax.random.PRNGKey(0), batch, dtype)
        scn = jax.device_put(
            scn, mesh_lib.scenario_sharding(mesh))
        perturb = jax.jit(
            lambda s, k: s._replace(x0=s.x0 + 1e-4 * k))
        scn_reps = [perturb(scn, jnp.asarray(float(k + 1), dtype))
                    for k in range(reps)]
        out = fn(scn)
        jax.block_until_ready((out.grf, scn_reps))
        t0 = time.perf_counter()
        outs = [fn(s).grf for s in scn_reps]
        jax.block_until_ready(outs)
        el = (time.perf_counter() - t0) / reps
        points[str(n)] = round(batch / el, 1)

    # sharded production controller tick on the largest mesh (VERDICT r4
    # item 4) — the ctrl settings are the bench cold settings on TPU, a
    # short schedule on the CPU plumbing check
    mesh = mesh_lib.make_mesh(devices=devices[:max(
        n for n in [1, 2, 4, 8] if n <= len(devices))])
    ctrl_pd = 32 if cpu else 4096
    # the controller's transition solves use the segmented program
    # (warm-started from carried primal/duals — a different cadence
    # than the fresh-sweep fused cold above)
    ctrl_settings = settings if cpu else admm.ADMMSettings(
        seg_iters=30, segments=2, first_seg_iters=20, polish=False,
        schulz_l0=1e-6, schulz_l0_first=1e-3, schulz_l0_refine=1e-4,
        schulz_hi_tail=1, schulz_impl="pallas")
    ctrl_out = _mesh_ctrl_tick_bench(mesh, ctrl_pd, cpu, ctrl_settings)

    sizes = sorted(int(k) for k in points)
    base = points[str(sizes[0])]
    result = {
        "metric": "mpc_mesh_scaling",
        "value": points[str(sizes[-1])],
        "unit": "solves/s",
        "vs_baseline": round(points[str(sizes[-1])] / 100000.0, 4),
        "mode": (f"weak scaling, per-device batch {per_device}, "
                 f"cold solves, data-axis sharding"),
        "solves_per_s_by_mesh": points,
        **ctrl_out,
        "ctrl_tick_mode": ("sharded production controller tick "
                           "(control_step_batched under shard_map, "
                           f"per-device batch {ctrl_pd}, stand cadence, "
                           "warmed carry) vs the identical unsharded "
                           "program"),
        "devices": [str(d) for d in devices[:sizes[-1]]],
    }
    if not cpu:
        # weak-scaling efficiency is meaningful only on real devices: a
        # virtual CPU mesh time-shares N fake devices over 2 vCPUs, and
        # its "efficiency" measures the harness, not ICI (r4 note —
        # dropped from the artifact to stop dashboards diffing noise)
        result["scaling_efficiency"] = {
            str(n): round(points[str(n)] / (base * n), 3) for n in sizes}
    print(json.dumps(result))


def main():
    import os

    import jax
    # persistent compile cache: repeat bench runs skip the slow remote
    # TPU compilation
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    import numpy as np

    from go1_qp_mpc_controller_tpu.ops import admm
    from go1_qp_mpc_controller_tpu.parallel import sweep

    dtype = jnp.float32
    # segments=2 keeps the unrolled cold program small: the axon remote
    # compiler does not hit jax's persistent cache, so bench compile time
    # is part of the wall-clock budget. Cold path r2: scaled Newton-Schulz
    # schedule (14 cold + 11 refine steps instead of 20+20) in the
    # VMEM-resident Pallas kernel (M crosses HBM once per segment instead
    # of every step) — measured 32.4k -> 71.5k cold solves/s at batch
    # 4096 with cold-vs-tight GRF accuracy unchanged (med 0.84 N,
    # p90 7.6 N, max 23 N — identical to the plain 20+20 XLA path).
    # r3 probing note: an asymmetric schedule (15-iteration rho-probing
    # first segment + 40-iteration second, schulz_l0 1e-5) reaches 68.9k
    # cold solves/s with the cold solve's OWN accuracy better than this
    # schedule's (med 0.72 N / p90 7.0 vs 1.0 / 9.4) — but the rho it
    # CARRIES (frozen at the value adapted from 15 noisy first-segment
    # residuals) poisons ~10% of subsequent warm-tick chains (warm
    # p90 2.4 N -> 80 N). Kept: the balanced 30+30 schedule, whose carry
    # seeds warm chains cleanly; first_seg_iters remains the right knob
    # for one-shot sweeps where no carry survives the solve.
    # Single-segment fixed-rho schedules fail catastrophically (med
    # 84 N) — per-scenario rho adaptation between segments is
    # load-bearing.
    # r4 trims (both measured carry-safe: warmchain accuracy unchanged,
    # NOTES_ROUND4): 20-iteration first segment (rho estimation needs no
    # more; 15 is the measured poison floor) and a single HIGHEST tail
    # step per Schulz schedule. 64.4 -> ~59.5 ms at batch 4096.
    # r4: schulz_l0_first=1e-3 — the rho-probing first segment runs a
    # 9+tail-step schedule instead of 14+tail (see ADMMSettings), cold
    # 73.1k -> 77.7k solves/s with accuracy fields unchanged.
    # r5: the fresh-cold metric moves to the FUSED single-segment
    # program at the analytic rho0 (admm.solve_cold_fused /
    # mpc_rho0_analytic): measured ~31 ms device time at batch 4096
    # (131.9k solves/s with the fused-KKT kernel route; 36.4 ms before
    # it) vs the segmented schedule's ~52 ms, with
    # cold-vs-tight accuracy BETTER (p50 0.34 / p90 4.2 vs 1.08 / 8.9)
    # and the cold-carry warmchain cleaner (p50 0.081 / p90 1.89 vs
    # 0.111 / 2.8). The segmented schedule remains the controller's
    # transition-solve program (settings_cold_ctrl below): those solves
    # warm-start from carried primal/duals, a different cadence.
    settings_cold = admm.ADMMSettings(seg_iters=40, segments=1,
                                      polish=False, schulz_l0=1e-6,
                                      schulz_hi_tail=1,
                                      schulz_impl="pallas")
    settings_cold_ctrl = admm.ADMMSettings(seg_iters=30, segments=2,
                                           first_seg_iters=20,
                                           polish=False, schulz_l0=1e-6,
                                           schulz_l0_first=1e-3,
                                           schulz_l0_refine=1e-4,
                                           schulz_hi_tail=1,
                                           schulz_impl="pallas")
    # accuracy at this config (r3 probe vs a tight polished reference over
    # 8 drifting ticks x 256 random scenarios on TPU): first-step GRF
    # median diff 0.12 N, p90 3.3 N on ~180 N forces — inside the ~5 N
    # p90 gate; 25 iters gives med 0.05 / p90 2.3 at 214k/s vs 270k/s
    # here, and the accuracy knee between them is gentle. The per-run
    # numbers are recorded as warm_vs_tight_grf_p50/p90_N in this JSON so
    # a regression is visible in the artifact. One Schulz step tracks the
    # per-tick KKT drift; more steps measured no accuracy change.
    # schulz_impl="pallas" (r5): the warm tick routes through the
    # fused-KKT Schulz kernel — the KKT build+balance chain (measured
    # ~3.4 ms/tick at batch 4096, ~8x its byte roofline in XLA) runs
    # inside the kernel and the (120, 120) matrix never crosses HBM
    settings_warm = admm.ADMMSettings(seg_iters=15, segments=1,
                                      polish=False, schulz_refine=1,
                                      schulz_impl="pallas")
    batch = 4096
    # 40 on-device ticks per dispatch: amortizes the axon tunnel's ~10 ms
    # per-call HTTP overhead (probed: 10 ticks 194.8k/s, 40 ticks 205.9k/s,
    # batch 8192 no further gain). Production runs exactly such long
    # uninterrupted warm chains.
    num_ticks = 40
    scn = sweep.random_scenarios(jax.random.PRNGKey(0), batch, dtype)
    drifts = (jnp.zeros((batch, 13), dtype)
              .at[:, 9].set(0.001).at[:, 3].set(0.0005))

    cold, ticks, warm_tick, tight = _make_tick_fns(settings_cold,
                                                   settings_warm)

    # NOTE: every timed rep gets DISTINCT inputs, pre-created ON DEVICE.
    # Two tunnel artifacts would otherwise corrupt the numbers: (a) the
    # axon remote executor caches repeated identical TPU executions
    # (measured: 0.06 ms reported for a 20 ms program), and (b) fresh
    # host-created inputs pay an HTTP upload per call (~tens of ms). An
    # on-device jitted perturbation sidesteps both.
    perturb = jax.jit(lambda scn, k: scn._replace(x0=scn.x0 + 1e-4 * k))
    reps = 2

    # --- cold solves ------------------------------------------------------
    # Scan-amortized like the warm chains: `cold_inner` fresh solves per
    # dispatch over distinct on-device perturbations — the production
    # sweep cadence (back-to-back batches on device). Per-dispatch
    # timing adds ~9 ms of host/tunnel overhead per call on this
    # harness (measured r5: 45 ms/dispatch vs 36.4 ms/solve amortized)
    # and is reported alongside as cold_dispatch_ms for transparency.
    out, warms = cold(scn)
    scn_reps = [perturb(scn, jnp.asarray(float(k + 1), dtype))
                for k in range(reps)]
    jax.block_until_ready((out, scn_reps))
    cold_inner = 4

    def _cold_sweep(scn, base):
        def body(carry, k):
            s = scn._replace(x0=scn.x0 + 1e-4 * (base + k))
            fz, _ = cold(s)
            return carry + jnp.sum(fz[:, 2]), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), dtype),
                              jnp.arange(1.0, cold_inner + 1.0,
                                         dtype=dtype))
        return acc

    cold_sweep_fn = jax.jit(_cold_sweep)
    bases = [jnp.asarray(float(100 * (k + 1)), dtype)
             for k in range(reps)]
    jax.block_until_ready(cold_sweep_fn(scn, bases[0]))
    t0 = time.perf_counter()
    outs = [cold_sweep_fn(s, b) for s, b in zip(scn_reps, bases)]
    jax.block_until_ready(outs)
    cold_elapsed = (time.perf_counter() - t0) / reps / cold_inner
    cold_rate = batch / cold_elapsed
    # single-dispatch latency (includes harness round trip)
    t0 = time.perf_counter()
    outs = [cold(s)[0] for s in scn_reps]
    jax.block_until_ready(outs)
    cold_dispatch_ms = (time.perf_counter() - t0) / reps * 1000.0

    # --- warm ticks (headline) -------------------------------------------
    fz, warms2 = ticks(scn, warms, drifts, num_ticks)
    jax.block_until_ready(fz)
    t0 = time.perf_counter()
    outs = [ticks(s, warms, drifts, num_ticks)[0] for s in scn_reps]
    jax.block_until_ready(outs)
    warm_elapsed = (time.perf_counter() - t0) / reps
    warm_rate = batch * num_ticks / warm_elapsed

    # --- warm single-tick latency (the actual control-cycle path; the
    # reference's 2.5 ms budget applies to warm-started cycles) ----------
    scn8 = jax.tree.map(lambda a: a[:8], scn)
    warms8 = jax.tree.map(lambda a: a[:8], warms)
    drifts8 = drifts[:8]
    # pipelined per-tick device time over 20 DISTINCT pre-created inputs.
    # A fully serialized measure adds ~40 ms of axon-tunnel HTTP round
    # trip per call — a tunnel artifact, not device latency; production
    # deploys co-locate the host loop with the chip.
    lat_reps = 20
    scn8_reps = [perturb(scn8, jnp.asarray(float(k + 1), dtype))
                 for k in range(lat_reps)]
    fz8, w8 = ticks(scn8, warms8, drifts8, 1)
    jax.block_until_ready((fz8, scn8_reps))
    t0 = time.perf_counter()
    outs = [ticks(s, warms8, drifts8, 1)[0] for s in scn8_reps]
    jax.block_until_ready(outs)
    warm_latency_ms = (time.perf_counter() - t0) / lat_reps * 1000.0

    # --- full controller tick (VERDICT #2: sensor update + EKF + plan +
    # swing + warm MPC + torques + plant, batch x 40-tick scan) -----------
    ctrl_batch = 4096
    ctrl_ticks = 40
    (init_batch, set_walk, perturb_c, chain_warm, chain_batched,
     chain_robust) = _make_ctrl_bench(settings_cold_ctrl, ctrl_batch)
    c0 = init_batch(jax.random.PRNGKey(2))
    # 6 batched ticks warm the carried KKT inverse (first ticks route to
    # the cold branch via the transition test, exactly like production)
    _, c_warm = chain_batched(c0, 6)
    jax.block_until_ready(c_warm.ctrl.qp_warm_minv)
    c_reps = [perturb_c(c_warm, jnp.asarray(float(k + 1), dtype))
              for k in range(reps)]
    out, _ = chain_warm(c_warm, ctrl_ticks)
    jax.block_until_ready((out, c_reps))
    t0 = time.perf_counter()
    outs = [chain_warm(c, ctrl_ticks)[0] for c in c_reps]
    jax.block_until_ready(outs)
    ctrl_elapsed = (time.perf_counter() - t0) / reps
    ctrl_rate = ctrl_batch * ctrl_ticks / ctrl_elapsed

    # --- closed-loop trot rollout (production batched program: routed
    # warm / post-flip window / compact / cold branches) ------------------
    # walk from the INITIAL batch (not the stand-warmed carry: switching
    # modes mid-zero-torque-warmup topples a ~5% tail of scenarios, and
    # one fallen robot forces the batch-level cold branch every tick),
    # then run through the onset transient into the steady trot limit
    # cycle: 130 ticks covers the onset plus a full gait cycle. The timed
    # span is ONE FULL half-gait cycle (60 ticks at the default trot
    # counters) so every routing regime appears at its production
    # frequency — flip tick, pre/post-flip cold sub-windows, the long
    # post-flip window segment, compact ticks, steady warm ticks. (The
    # r1-r4 40-tick span warmed to exactly 130 happened to sit BETWEEN
    # flips — flips land at walking ticks ~110/170 — so it sampled
    # almost no flip/window ticks and overstated the steady rate by
    # ~15%; a representative span is the honest production number.)
    roll_ticks = 60
    cw = set_walk(c0)
    _, cw = chain_batched(cw, 130)
    jax.block_until_ready(cw.ctrl.qp_warm_minv)
    cw_reps = [perturb_c(cw, jnp.asarray(float(k + 1), dtype))
               for k in range(reps)]
    out, _ = chain_batched(cw, roll_ticks)
    jax.block_until_ready((out, cw_reps))
    t0 = time.perf_counter()
    outs = [chain_batched(c, roll_ticks)[0] for c in cw_reps]
    jax.block_until_ready(outs)
    roll_elapsed = (time.perf_counter() - t0) / reps
    roll_rate = ctrl_batch * roll_ticks / roll_elapsed

    # --- robust rollout variant: the uniform no-cold-branch program
    # (controller.ROBUST_WARM_SETTINGS) for walking sweeps whose
    # per-scenario transitions desynchronize — trades the flip-tick
    # tracking tail (p95 ~15 N vs teacher-forced cold; median sub-N,
    # closed-loop behavior gated in tests) for deterministic tick cost
    out, _ = chain_robust(cw, roll_ticks)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [chain_robust(c, roll_ticks)[0] for c in cw_reps]
    jax.block_until_ready(outs)
    roll_robust_rate = (ctrl_batch * roll_ticks
                        / ((time.perf_counter() - t0) / reps))

    # --- warm-tick accuracy gate (VERDICT r2 item 10): p50/p90 GRF diff
    # vs a tight polished solve over 8 drifting ticks x 256 scenarios.
    # Recorded in the JSON so a regression of the ~5 N p90 tail is
    # visible in the artifact, not just prose. -------------------------
    acc_b = 256
    scn_acc = jax.tree.map(lambda a: a[:acc_b], scn)
    warms_acc = jax.tree.map(lambda a: a[:acc_b], warms)
    drifts_acc = drifts[:acc_b]
    x0_acc = scn_acc.x0
    acc_diffs = []
    for k in range(8):
        x0_acc = x0_acc + drifts_acc
        out_w, warms_acc = warm_tick(scn_acc, x0_acc, warms_acc)
        out_t = tight(scn_acc, x0_acc)
        acc_diffs.append(np.abs(np.asarray(out_w) - np.asarray(out_t))
                         .max(axis=1))
    acc = np.concatenate(acc_diffs[2:])     # skip the settle ticks
    warm_acc_p50 = float(np.median(acc))
    warm_acc_p90 = float(np.percentile(acc, 90))

    # --- stagewise long-horizon solver (H=40 warm/cold, H=120 cold) ------
    sw_batch = 1024
    scn_sw = jax.tree.map(lambda a: a[:sw_batch], scn)
    sw_cold_settings = admm.ADMMSettings(seg_iters=60, segments=3,
                                         polish=False)
    sw_warm_settings = admm.ADMMSettings(seg_iters=25, segments=1,
                                         polish=False)
    sw_reps = [perturb(scn_sw, jnp.asarray(float(k + 1), dtype))
               for k in range(reps)]
    sw_rates = {}
    for h in (40, 120):
        sw_cold, sw_ticks = _make_stagewise_fns(sw_cold_settings,
                                                sw_warm_settings, h)
        out, sw_warms = sw_cold(scn_sw)
        jax.block_until_ready((out, sw_reps))
        t0 = time.perf_counter()
        outs = [sw_cold(s)[0] for s in sw_reps]
        jax.block_until_ready(outs)
        sw_rates[f"stagewise_h{h}_cold_solves_per_s"] = round(
            sw_batch * reps / (time.perf_counter() - t0), 1)
        sw_nt = 10
        fz, _ = sw_ticks(scn_sw, sw_warms, drifts[:sw_batch], sw_nt)
        jax.block_until_ready(fz)
        t0 = time.perf_counter()
        outs = [sw_ticks(s, sw_warms, drifts[:sw_batch], sw_nt)[0]
                for s in sw_reps]
        jax.block_until_ready(outs)
        sw_rates[f"stagewise_h{h}_warm_solves_per_s"] = round(
            sw_batch * sw_nt * reps / (time.perf_counter() - t0), 1)

    # --- RL policy inference (context metric; R1/R3 stack) ---------------
    from go1_qp_mpc_controller_tpu.models import policy

    rl_batch = 16384
    mlp = policy.init_mlp(jax.random.PRNGKey(1))
    rl_step = jax.jit(jax.vmap(lambda o: policy.mlp_apply(mlp, o)))
    obs_reps = [jax.random.normal(jax.random.PRNGKey(k),
                                  (rl_batch, policy.OBS_DIM), dtype)
                for k in range(3)]
    # warm up on an input OUTSIDE the timed set (execution-cache protocol)
    warmup_obs = jax.random.normal(jax.random.PRNGKey(99),
                                   (rl_batch, policy.OBS_DIM), dtype)
    jax.block_until_ready(rl_step(warmup_obs))
    t0 = time.perf_counter()
    acts = [rl_step(o) for o in obs_reps]
    jax.block_until_ready(acts)
    rl_rate = rl_batch * len(obs_reps) / (time.perf_counter() - t0)

    # --- roofline accounting (VERDICT r4 item 2): static flop/byte model
    # per benched mode vs the device peaks, so MFU/roofline claims are
    # regressable from this artifact instead of living in prose ---------
    from go1_qp_mpc_controller_tpu.utils import roofline

    peaks = roofline.device_peaks()
    roofline_out = {
        "device": peaks.name,
        "peak_bf16_tflops": round(peaks.bf16_flops / 1e12, 1),
        "peak_hbm_gbps": round(peaks.hbm_bytes / 1e9, 1),
        "warm_tick": roofline.summarize(
            roofline.warm_tick_stages(settings_warm), warm_rate, peaks),
        "cold_solve": roofline.summarize(
            roofline.cold_solve_stages(settings_cold), cold_rate, peaks),
        "ctrl_tick": roofline.summarize(
            roofline.ctrl_tick_stages(controller_warm_settings()),
            ctrl_rate, peaks),
    }

    result = {
        "metric": "mpc_solves_per_s",
        "value": round(warm_rate, 1),
        "unit": "solves/s",
        "vs_baseline": round(warm_rate / 100000.0, 4),
        "mode": "warm ticks (reference cadence, A1RobotControl.cpp:522-540)",
        "cold_solves_per_s": round(cold_rate, 1),
        "cold_mode": ("fresh fused single-segment solves at the analytic "
                      "rho0 (A1RobotControl.cpp:447 cadence), "
                      f"{cold_inner} sweeps/dispatch scan-amortized like "
                      "the warm chains"),
        "cold_dispatch_ms": round(cold_dispatch_ms, 3),
        "batch": batch,
        "ticks_per_round": num_ticks,
        "warm_tick_batch_ms": round(warm_elapsed / num_ticks * 1000.0, 3),
        "warm_tick_latency_ms": round(warm_latency_ms, 3),
        "latency_budget_ms": 2.5,
        "ctrl_ticks_per_s": round(ctrl_rate, 1),
        "ctrl_tick_mode": ("full chain: sensors+EKF+plan+swing+warm MPC"
                           "+torques+plant, steady warm cadence"),
        "rollout_steps_per_s": round(roll_rate, 1),
        "rollout_mode": ("closed-loop trot, full half-gait-cycle span: "
                         "routed warm / post-flip window / compact / "
                         "cold branches at production frequency"),
        "rollout_span_ticks": roll_ticks,
        "rollout_steps_per_s_robust": round(roll_robust_rate, 1),
        "rollout_robust_mode": ("uniform robust warm program (no cold "
                                "branch; per-scenario scaled-Schulz "
                                "rebuild + tick-cadence rho adaptation)"),
        "rl_policy_inferences_per_s": round(rl_rate, 1),
        "warm_vs_tight_grf_p50_N": round(warm_acc_p50, 3),
        "warm_vs_tight_grf_p90_N": round(warm_acc_p90, 3),
        # VERDICT r4 item 6: the parity statement of the PRODUCTION
        # dtype, from the production program (the p50/p90 above), with
        # its scope made explicit — the strict 1e-3 contract is
        # demonstrated in the x64 (+refine_f64) configuration
        # (tests/test_admm.py); the f32 program floors at ~2e-2 N on
        # the r_weights~1e-6 flat directions (ops/admm.py:93-97)
        "f32_parity": {
            "grf_vs_tight_p50_N": round(warm_acc_p50, 3),
            "grf_vs_tight_p90_N": round(warm_acc_p90, 3),
            "floor_N": 0.02,
            "scope": ("f32 production program vs tight polished "
                      "reference; strict 1e-3 oracle parity holds in "
                      "the x64 refine_f64 configuration (tests)"),
        },
        **sw_rates,
        "stagewise_batch": sw_batch,
        "roofline": roofline_out,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    import os
    import sys
    # the axon TPU plugin ignores the JAX_PLATFORMS env var; honor an
    # explicit cpu request (or --cpu) via jax.config so the virtual-mesh
    # scaling mode actually runs on host devices
    if ("--cpu" in sys.argv
            or os.environ.get("JAX_PLATFORMS", "") == "cpu"):
        import jax
        jax.config.update("jax_platforms", "cpu")
    if "--mesh" in sys.argv:
        main_mesh()
    else:
        main()
