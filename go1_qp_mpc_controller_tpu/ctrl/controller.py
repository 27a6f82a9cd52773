"""The fused controller step: sensors -> estimation -> plan -> GRF -> torques.

TPU-native re-composition of the reference's per-tick work, which is spread
across ROS callbacks and two free-running threads
(GazeboA1ROS.cpp:112-239, MainGazebo.cpp:47-121):

- :func:`sensor_update` ingests raw sensor values and refreshes kinematic
  quantities + the Kalman filter (the reference's callback/receive-thread
  work, GazeboA1ROS.cpp:242-288 + HardwareA1ROS.cpp:253-386),
- :func:`compute_grf` solves for stance forces — MPC (horizon-10 condensed
  QP, A1RobotControl.cpp:446-561) or single-step balance QP (:377-444),
- :func:`control_step` chains plan -> swing -> grf -> torques, the fused
  equivalent of main_update + update_foot_forces_grf + send_cmd.

Everything is a pure function of (CtrlState, RobotModel, CtrlParams) and is
batched by vmapping over a leading scenario axis. The solver branch
(MPC vs QP) is a static Python flag — two separate compiled programs, like
the reference's launch-time solver_type selection (launch/a1_ctrl.launch:2).
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

from go1_qp_mpc_controller_tpu.config import params as P
from go1_qp_mpc_controller_tpu.ctrl import gait, swing, terrain, torque
from go1_qp_mpc_controller_tpu.models import kinematics, srb
from go1_qp_mpc_controller_tpu.ops import admm, ekf, qp as balance
from go1_qp_mpc_controller_tpu.ops import stagewise
from go1_qp_mpc_controller_tpu.utils import rotations

MPC = 1   # stance_leg_control_type values (A1CtrlStates.h:330)
QP = 0

# Production warm-tick solver schedule: one ADMM segment on the carried
# KKT inverse (Schulz-refined), exactly the benchmarked fast path. Cold
# solves (gait-transition ticks) use the caller's ``settings``. The
# budget is probed (r3, TPU, drifting warm chains vs a tight polished
# reference): 15 iterations give GRF diff med 0.12 N / p90 3.3 N at 270k
# solves/s vs med 0.05 / p90 2.3 at 25 iterations — but the closed-loop
# teacher-forced tracking gate (tests/test_warm_ticks.py, trot-transition
# tail p95 < 10 N) fails at 15 (p95 = 11.0) and holds at 20, so the
# production carry runs 20; the solver-only bench uses 15 with its
# accuracy fields recorded in the JSON.
# schulz_refine=1 (r4): one Schulz step per tick tracks the per-tick KKT
# drift — the swing-foot target substitution in compute_grf_mpc keeps the
# KKT ~constant between transitions, so the carried inverse's residual
# fixed point sits at the (tiny) per-tick drift and extra steps measured
# no accuracy change (the solver bench has run refine=1 since r3 with
# its warm_vs_tight fields recorded); refine=2 was a conservative r2
# default. Measured in the full controller chain (TPU, batch 4096):
# 40.1 -> 30.0 ms/tick (102k -> 136k ticks/s); accuracy gates
# (tests/test_warm_ticks.py, test_batched_transition.py,
# test_warm_accuracy.py) unchanged.
# schulz_impl="auto": on TPU the warm tick routes through the fused-KKT
# Schulz kernel (r5: the KKT build+balance measured ~3.4 ms/tick at
# batch 4096, ~8x its byte roofline, and the kernel removes it from the
# program entirely); CPU runs the XLA path so the test suite stays off
# the Pallas interpreter.
WARM_SETTINGS = admm.ADMMSettings(seg_iters=20, segments=1, polish=False,
                                  schulz_refine=1, schulz_impl="auto")

# Robust warm-tick schedule for BATCHED walking sweeps: the scaled-
# Schulz refinement (schulz_l0_refine) rebuilds basin-rejected carries
# (contact flips) per scenario inside the same fixed-shape program, the
# longer segment re-converges the restarted duals, and adapt_warm_rho
# keeps rho tracking at tick cadence — so no tick ever needs the cold
# branch. At batch 4096 trot, desynchronized per-scenario early contacts
# make SOME scenario transition nearly every tick, which degrades any
# batch-level any()-routing to cold-most-ticks; this uniform program
# costs ~2x the steady warm tick instead of the cold solve's ~4x.
# Tracking character vs teacher-forced cold solves (f64, desync trot,
# tests/test_batched_transition.py): median < 0.5 N, p95 ~15 N — the
# tail sits on the flip-tick transients' semi-degenerate flat
# directions (60 iterations bring it to ~11, a full cold solve to ~8;
# even 320 iterations leave ~5 — see tests/test_warm_ticks.py notes).
ROBUST_WARM_SETTINGS = admm.ADMMSettings(seg_iters=40, segments=1,
                                         polish=False,
                                         schulz_l0_refine=1e-4,
                                         schulz_impl="pallas",
                                         adapt_warm_rho=True,
                                         # == WARM_RHO_MIN/MAX below
                                         rho_min=0.02, rho_max=50.0)

# rho band for the warm cadence. The warm tick runs a FIXED iteration
# budget, so the carried rho must stay where 25 iterations contract well.
# An unbanded transition solve on an all-stance QP adapts rho to 1e-3
# (primal residual is exactly 0 from iteration 1, so the sqrt(prim/dual)
# rule floors out) — a rho at which the next warm ticks cannot track the
# fast post-warmup reference drift and tick-over-tick error compounds to
# divergence (measured: standing forces 37 -> 58 -> 80 -> 0.09 N by tick
# 3). OSQP tolerates tiny rho because it iterates to tolerance instead of
# a fixed budget (A1RobotControl.cpp:522-540 carries rho the same way).
WARM_RHO_MIN = 0.02
WARM_RHO_MAX = 50.0

# Gradient-drift trigger for cold re-solves: ticks whose QP gradient
# moved more than this relative threshold take the full cold solve —
# the fixed-budget analog of OSQP iterating to tolerance no matter how
# far the warm start is. Calibration history: r3 set 0.01 from an
# early-warm-path measurement ("lags by tens of N at drift 2e-2+"), but
# that predates the per-tick Schulz-refined inverse carry; the r4
# teacher-forced measurement (TPU, batch 4096, closed-loop trot at
# 0.25 m/s, whose per-tick drift is p50 4.6e-2 / p90 0.11 — the 0.01
# threshold routed ~95% of scenarios cold EVERY tick) shows the
# 20-iteration production warm tick tracks cold solves at p50 0.5 N /
# p95 1.5 N / max 6 N through that entire drift band. 0.2 keeps the
# cold route for genuine transients (mode switches / velocity steps /
# post-warmup ramps reach drift 0.2..0.35) while letting the steady
# gait run warm; closed-loop gates: tests/test_warm_ticks.py (teacher-
# forced transition tail), tests/test_batched_transition.py,
# tests/test_walking.py.
WARM_DRIFT_TOL = 0.2

# Young-carry guard: for the first ticks of a controller's life (the
# 10-tick zero-torque warmup + the stand force ramp, torque.py /
# A1RobotControl.cpp:292-295) the gradient legitimately moves 5-35% per
# tick while the carried duals have no converged history — the 20-
# iteration warm tick lags that ramp by up to ~50 N (measured r4,
# teacher-forced). Route those ticks cold unconditionally; after the
# ramp the drift trigger takes over. Steady-state programs (the bench's
# warmed chains, long rollouts) never see this branch.
WARM_YOUNG_TICKS = 40

# Post-flip window (ticks, in gait-counter units / counter speed): a
# contact flip restarts the carried duals (trot flips all four legs'
# constraint patterns at once), and the restarted duals need a few
# hundred ADMM iterations to re-converge on the semi-degenerate 4-leg
# load-distribution directions ("even 320 iterations leave ~5 N",
# tests/test_warm_ticks.py notes) — a 20-iteration warm tick lags cold
# by 20-30 N for ~10 ticks after each flip (measured r4, teacher-
# forced). Ticks within this window of a phase boundary route to the
# WINDOW program (below) — the window is derived from the gait
# counters (no new carry state), applies only while walking, and is
# synchronized across a batch that shares gait phase. This is the
# fixed-budget analog of OSQP spending more iterations right after
# contact flips.
WARM_POSTFLIP_TICKS = 10.0

# Post-flip WINDOW program: a long warm segment instead of the full
# cold solve. The flip tick itself and the first WARM_POSTFLIP_COLD_
# TICKS after it route cold (the KKT equality pattern changed -> the
# carried inverse must be rebuilt, and the restarted duals are farthest
# from the new fixed point), but the remaining window ticks hold a
# CONSTANT contact pattern with a freshly rebuilt inverse and a
# just-adapted rho — what they need is ADMM iterations for the
# restarted duals, not the cold path's two Schulz schedules +
# two-segment rho re-estimation. Budget calibration (teacher-forced vs
# a tight polished reference, TPU, batch 256, per-tick p95 on the first
# window ticks): 25 iters 15.4 N, 30 -> 14.5, 40 -> 13.4, 60 -> 11.1
# decaying to ~3 N by mid-window, 80 -> 9.3 — but 80 iterations cost as
# much wall time as the cold solve (the iteration loop, not the Schulz
# rebuild, is the wall). The closed-loop gate
# (tests/test_warm_ticks.py::test_production_warm_path_tracks_cold_in_
# closed_loop, p95 < 10 N over a 400-tick walking rollout) sits right
# at the knee: 60 iters measured p95 10.02-10.03 (fails by 0.3%) even
# with the first 3 post-flip ticks routed cold — the rollout's error
# distribution has a broad ~10 N band (mid-window, post-window decay,
# and mid-cycle warm ticks all contribute), so only the 80-iteration
# window clears the bar. 80 still saves ~18 ms/window-tick over the
# cold solve's ~64 ms GRF stage.
WARM_POSTFLIP_COLD_TICKS = 3.0
WINDOW_WARM_SETTINGS = admm.ADMMSettings(seg_iters=80, segments=1,
                                         polish=False, schulz_refine=1,
                                         schulz_impl="auto")


def _post_flip(state, params, ticks=WARM_POSTFLIP_TICKS):
    """() bool — within ``ticks`` control ticks after any leg's
    stance/swing hand-off (phase 0 or counter_per_swing)."""
    phase = jnp.mod(state.gait_counter, params.counter_per_gait)
    since = jnp.where(phase >= params.counter_per_swing,
                      phase - params.counter_per_swing, phase)  # counts
    speed = jnp.maximum(jnp.max(params.gait_counter_speed), 1e-6)
    return ((state.movement_mode != 0)
            & (jnp.min(since) < ticks * speed))


# Pre-flip cold guard (ticks before the next hand-off): the landing
# swing foot and the shifting reference move the gradient fast in the
# 1-2 ticks BEFORE a phase boundary — under the drift threshold, but
# fast enough that the 20-iteration warm tick lags the cold teacher by
# 15-31 N exactly there (measured: the per-cycle error spikes at ticks
# 109/229/289/349 of the closed-loop gate rollout sit one tick before
# each flip). Route those ticks cold, like the post-flip sub-window.
WARM_PREFLIP_TICKS = 2.0


def _pre_flip(state, params, ticks=WARM_PREFLIP_TICKS):
    """() bool — within ``ticks`` control ticks BEFORE any leg's next
    stance/swing hand-off."""
    phase = jnp.mod(state.gait_counter, params.counter_per_gait)
    until = jnp.where(phase >= params.counter_per_swing,
                      params.counter_per_gait - phase,
                      params.counter_per_swing - phase)   # counts to next
    speed = jnp.maximum(jnp.max(params.gait_counter_speed), 1e-6)
    return ((state.movement_mode != 0)
            & (jnp.min(until) <= ticks * speed))


class SensorData(NamedTuple):
    """Raw per-tick sensor sample (the adapters' callback payloads)."""
    quat_wxyz: jnp.ndarray    # (4,) IMU orientation
    imu_acc: jnp.ndarray      # (3,) body-frame accelerometer
    imu_ang_vel: jnp.ndarray  # (3,) body-frame gyro
    joint_pos: jnp.ndarray    # (12,)
    joint_vel: jnp.ndarray    # (12,)
    foot_force: jnp.ndarray   # (4,) contact sensor normal forces


import functools as _functools


@_functools.lru_cache(maxsize=None)
def _observe_ekf_fn(cfn):
    """custom_vmap'd observe+estimate core (keyed by the contact-force
    normalizer). Per scenario it is the reference composition below; a
    float32 TPU vmap routes the WHOLE batch into the fused lane-batched
    Pallas kernel (ops/pallas_ekf.py), which runs the quat/FK/Jacobian
    observe stage and the 18/28 EKF tick in one VMEM-resident program —
    the observe+estimate stage was the warmed tick's largest lane-
    padding tax (VERDICT r4 item 3)."""
    from go1_qp_mpc_controller_tpu.ops import pallas_ekf

    def ref(x, P, quat, acc, gyro, qpos, qvel, ffoot, mode, dt,
            rho_opt, rho_fix):
        rot = rotations.quat_to_rot_mat(quat)
        euler = rotations.quat_to_euler(quat)
        rot_z = rotations.rot_z(euler[2])
        q_legs = qpos.reshape(4, 3)
        dq_legs = qvel.reshape(4, 3)
        fpr = kinematics.fk(q_legs, rho_opt, rho_fix)
        jf = kinematics.jac(q_legs, rho_opt, rho_fix)
        fvr = jnp.einsum('lij,lj->li', jf, dq_legs)
        fpa = fpr @ rot.T
        wav = rot @ gyro       # world frame (HardwareA1ROS.cpp:284)
        res = ekf.update_estimation(x, P, dt, rot, acc, gyro, fpr, fvr,
                                    ffoot, mode,
                                    contact_force_norm=cfn)
        return {"rot": rot, "euler": euler, "rot_z": rot_z,
                "foot_pos_rel": fpr, "foot_pos_abs": fpa,
                "foot_vel_rel": fvr, "j_foot": jf, "root_ang_vel": wav,
                "x": res.x, "P": res.P,
                "est_contacts": res.estimated_contacts}

    @jax.custom_batching.custom_vmap
    def run(*args):
        return ref(*args)

    @run.def_vmap
    def _rule(axis_size, in_batched, *args):
        out_batched = {k: True for k in
                       ("rot", "euler", "rot_z", "foot_pos_rel",
                        "foot_pos_abs", "foot_vel_rel", "j_foot",
                        "root_ang_vel", "x", "P", "est_contacts")}
        main_batched = all(in_batched[:9])
        shared_ok = not any(in_batched[9:])
        if (jax.default_backend() == "tpu"
                and args[0].dtype == jnp.float32
                and main_batched and shared_ok):
            out = pallas_ekf.observe_ekf_lanes(
                *args[:9], args[9], args[10], args[11],
                contact_force_norm=cfn, interpret=False)
            return out, out_batched
        bc = [a if b else
              jnp.broadcast_to(a, (axis_size,) + jnp.shape(a))
              for a, b in zip(args, in_batched)]
        return jax.vmap(ref)(*bc), out_batched

    return run


def sensor_update(state, model, sensors, dt, estimate=True,
                  contact_force_norm=100.0):
    """Ingest sensors, refresh kinematics, and run the KF.

    Mirrors gt_pose_callback + main_update estimation
    (GazeboA1ROS.cpp:242-288, 190-198). With ``estimate`` the whole
    observe+EKF stage routes through :func:`_observe_ekf_fn` — under a
    float32 TPU vmap that is ONE fused lane-batched Pallas program
    (ops/pallas_ekf.py).

    Args:
      state: CtrlState.
      model: RobotModel.
      sensors: SensorData.
      dt: () estimator step.
      estimate: static bool — run the KF (False = trust root_pos/root_lin_vel
        already in the state, e.g. simulator ground truth).
      contact_force_norm: the KF's full-contact force scale — 100 for
        A1-unit sensors, 1000 for Go1 hardware (Go1BasicEKF.cpp:83; see
        ekf.update_estimation).

    Returns:
      updated CtrlState.
    """
    geom = model.leg_geometry
    if estimate:
        out = _observe_ekf_fn(float(contact_force_norm))(
            state.estimator_x, state.estimator_P, sensors.quat_wxyz,
            sensors.imu_acc, sensors.imu_ang_vel, sensors.joint_pos,
            sensors.joint_vel, sensors.foot_force, state.movement_mode,
            dt, geom.rho_opt, geom.rho_fix)
        return state._replace(
            root_rot_mat=out["rot"], root_euler=out["euler"],
            root_rot_mat_z=out["rot_z"],
            imu_acc=sensors.imu_acc, imu_ang_vel=sensors.imu_ang_vel,
            joint_pos=sensors.joint_pos, joint_vel=sensors.joint_vel,
            foot_force=sensors.foot_force,
            foot_pos_rel=out["foot_pos_rel"],
            foot_pos_abs=out["foot_pos_abs"],
            foot_vel_rel=out["foot_vel_rel"],
            j_foot=out["j_foot"], root_ang_vel=out["root_ang_vel"],
            estimator_x=out["x"], estimator_P=out["P"],
            estimated_contacts=out["est_contacts"] >= 0.5,
            root_pos=out["x"][0:3], root_lin_vel=out["x"][3:6])

    rot = rotations.quat_to_rot_mat(sensors.quat_wxyz)
    euler = rotations.quat_to_euler(sensors.quat_wxyz)
    rot_z = rotations.rot_z(euler[2])

    q_legs = sensors.joint_pos.reshape(4, 3)
    dq_legs = sensors.joint_vel.reshape(4, 3)
    foot_pos_rel = kinematics.fk(q_legs, geom.rho_opt, geom.rho_fix)
    j_foot = kinematics.jac(q_legs, geom.rho_opt, geom.rho_fix)
    foot_vel_rel = jnp.einsum('lij,lj->li', j_foot, dq_legs)
    foot_pos_abs = foot_pos_rel @ rot.T
    root_ang_vel = rot @ sensors.imu_ang_vel   # world frame
                                               # (HardwareA1ROS.cpp:284)

    return state._replace(
        root_rot_mat=rot, root_euler=euler, root_rot_mat_z=rot_z,
        imu_acc=sensors.imu_acc, imu_ang_vel=sensors.imu_ang_vel,
        joint_pos=sensors.joint_pos, joint_vel=sensors.joint_vel,
        foot_force=sensors.foot_force, foot_pos_rel=foot_pos_rel,
        foot_pos_abs=foot_pos_abs, foot_vel_rel=foot_vel_rel,
        j_foot=j_foot, root_ang_vel=root_ang_vel)


def compute_grf_mpc(state, model, params,
                    settings=admm.ADMMSettings(), use_terrain_adapt=True,
                    warm_settings=WARM_SETTINGS, receding_horizon=False,
                    warm_mode="auto", window_settings=None):
    """Horizon-10 condensed MPC solve (A1RobotControl.cpp:446-561).

    Runs the persistent warm-started solver pattern the reference uses (one
    OSQP instance updated in place per tick, A1RobotControl.cpp:522-540):
    the CtrlState carries primal/dual/rho AND the Schulz-refined KKT
    inverse, so steady-state ticks take the fused lazy path
    (condense_nilpotent_lazy + mpc_solve_warm_fused — the Hessian is never
    materialized). A contact flip changes the KKT equality pattern, which
    degrades the carried inverse (ops/admm.py solve_warm caveat), so
    gait-transition ticks run the full cold :func:`admm.mpc_solve` instead
    — under ``lax.cond``, which in the unbatched production loop executes
    only the taken branch (under vmap both branches run as a select; pass
    ``warm_settings=None`` there to keep the legacy cold-every-tick path,
    or accept the blend).

    Args:
      warm_settings: ADMMSettings for steady-state warm ticks, or None to
        solve cold every tick (legacy path; ``settings`` then applies to
        every solve, warm-started with primal/dual only).
      warm_mode: static. "auto" (default) routes transition ticks to a
        cold solve under ``lax.cond`` — the production semantics; in the
        unbatched loop only the taken branch executes. "warm" always takes
        the fused warm tick (no transition test, no cold branch): for
        BATCHED steady-cadence sweeps/benchmarks, where vmap turns the
        cond into a select that pays both branches every tick regardless
        of the predicate. Callers of "warm" own the cadence guarantees
        (warmed carry, no contact flips). "cold" always takes the
        transition branch (diagnostics; also the exact program
        compute_grf_mpc_batched routes mixed ticks to).
      receding_horizon: static flag selecting the averaged-euler A_c +
        receding-foot-position condensation variant the reference
        demonstrates (test/test_mpc.cpp:93-122; commented-out in
        A1RobotControl.cpp:505-509): A_c is linearized at the horizon-mean
        euler and each step's B uses foot positions displaced by
        -i v_d dt. Per-step B breaks the constant-B_d factorization the
        fused warm path needs, so this variant solves cold every tick
        with primal/dual warm starts (warm_settings is ignored).
    """
    state = terrain.terrain_adaptation(state, use_terrain_adapt)

    x0 = srb.mpc_state(state.root_euler, state.root_pos, state.root_ang_vel,
                       state.root_lin_vel)
    vel_d_world = state.root_rot_mat @ state.root_lin_vel_d
    x_ref = srb.reference_trajectory(
        state.root_pos, state.root_euler, state.root_pos_d,
        state.root_euler_d, state.root_ang_vel_d, vel_d_world,
        params.mpc_dt)

    if receding_horizon:
        euler_lin = srb.averaged_euler(state.root_euler,
                                       state.root_ang_vel_d, params.mpc_dt)
    else:
        euler_lin = state.root_euler
    a_c = srb.calculate_A_c(euler_lin)
    # Swing-leg forces are pinned to ZERO by the friction-pyramid rows
    # (contact=0 makes the fz row an equality and the four fx/fy rows then
    # sandwich those to 0), so swing columns of B never influence the
    # solved GRFs. Substituting the planned foothold for the fast-moving
    # swing foot is therefore solution-neutral — and it keeps the KKT
    # matrix ~constant between gait transitions, so the carried Schulz
    # inverse tracks with 1-2 refinement steps instead of being rejected
    # by the basin safeguard mid-swing (measured: ~5%/tick KKT drift from
    # Bezier swing motion trips the row-sum test and the fallback's short
    # schedule left a resid~1 inverse -> divergence). Also mirrors the
    # receding-foothold variant the reference demonstrates
    # (test_mpc.cpp:105-122: future steps use predicted footholds).
    foot_pos_mpc = jnp.where(state.contacts[:, None], state.foot_pos_abs,
                             state.foot_pos_target_abs)

    if receding_horizon:
        a_d = jnp.eye(srb.NX, dtype=a_c.dtype) + a_c * params.mpc_dt
        b_d_list = srb.receding_b_d_list(
            model.mass, model.trunk_inertia, state.root_rot_mat,
            foot_pos_mpc, vel_d_world, params.mpc_dt)
        qp = srb.condense_nilpotent(a_d, b_d_list, x0, x_ref,
                                    params.q_weights, params.r_weights,
                                    state.contacts)
        sol = admm.mpc_solve(qp, settings, warm_x=state.qp_warm_x,
                             warm_y=state.qp_warm_y)
        warm_out = admm.WarmState(x=sol.x, y=sol.y, rho=state.qp_warm_rho,
                                  minv=state.qp_warm_minv)
        return _finish_grf(state, sol.x, warm_out,
                           grad_carry=state.qp_warm_grad)

    b_c = srb.calculate_B_c(model.mass, model.trunk_inertia,
                            state.root_rot_mat, foot_pos_mpc)
    a_d, b_d = srb.discretize(a_c, b_c, params.mpc_dt)
    # the reference holds foot positions constant over the horizon
    # (A1RobotControl.cpp:498-514) -> identical B_d per step, which the
    # closed-form nilpotent condensation exploits (no A-power recursion)
    lazy = srb.condense_nilpotent_lazy(a_d, b_d, x0, x_ref,
                                       params.q_weights, params.r_weights,
                                       state.contacts)

    if warm_settings is None:
        qp = srb.CondensedQP(hessian=srb.lazy_hessian(lazy),
                             gradient=lazy.gradient, lb=lazy.lb, ub=lazy.ub)
        sol = admm.mpc_solve(qp, settings, warm_x=state.qp_warm_x,
                             warm_y=state.qp_warm_y)
        warm_out = admm.WarmState(x=sol.x, y=sol.y, rho=state.qp_warm_rho,
                                  minv=state.qp_warm_minv)
        return _finish_grf(state, sol.x, warm_out,
                           grad_carry=lazy.gradient)

    warm_in, transition, window = _transition_test(state, lazy, params)
    cold_branch, warm_branch, window_branch = _grf_branches(
        settings, warm_settings, window_settings)

    if warm_mode == "warm":
        x_sol, warm_out, _ = warm_branch(lazy, warm_in)
    elif warm_mode == "cold":
        # every tick takes the transition branch (diagnostics / the exact
        # program compute_grf_mpc_batched routes mixed ticks to)
        x_sol, warm_out, _ = cold_branch(lazy, warm_in)
    else:
        # 0 = steady warm tick, 1 = post-flip window (long warm segment),
        # 2 = cold (transition). In the unbatched production loop the
        # switch executes only the taken branch; a warm/window result
        # failing the a-posteriori health gate is re-solved cold (rare:
        # post-latch garbage carries, p50 1-3 per 4096 scenarios).
        branch = jnp.where(transition, 2,
                           jnp.where(window, 1, 0)).astype(jnp.int32)
        x_sol, warm_out, bad = jax.lax.switch(
            branch, [warm_branch, window_branch, cold_branch],
            lazy, warm_in)
        # a health-rejected carry is untrustworthy BY CONSTRUCTION (the
        # warm solve it fed produced garbage residuals), so the cold
        # re-solve starts neutral — warm-starting ADMM's fixed budget
        # from garbage duals measurably fails to re-converge (total
        # vertical support off by ~20 N at 75 iterations, r5 probe)
        neutral = warm_in._replace(x=jnp.zeros_like(warm_in.x),
                                   y=jnp.zeros_like(warm_in.y))
        x_sol, warm_out = jax.lax.cond(
            bad,
            lambda: cold_branch(lazy, neutral)[:2],
            lambda: (x_sol, warm_out))
    return _finish_grf(state, x_sol, warm_out, grad_carry=lazy.gradient)


def _transition_test(state, lazy, params):
    """Per-scenario cold-route test + warm-carry repair.

    A cold solve is forced when (a) the contact pattern flipped (the KKT
    equality pattern changed -> carried inverse invalid, the solve_warm
    caveat in ops/admm.py), (b) the gradient drifted beyond the warm
    tick's tracking range, or (c) the tick sits in the pre-flip /
    early-post-flip cold sub-windows. Unrefinable carries (post-latch
    garbage, large state jumps) are caught A POSTERIORI by the
    residual health check on the warm solve's own output
    (_WARM_HEALTH_* below) instead of an a-priori basin probe — the
    probe duplicated the warm solve's first Schulz inner product at
    HIGHEST precision plus a second fused KKT build (~2.7 ms/tick at
    batch 4096) on EVERY routed tick to guard a p50 1-3 scenarios/tick
    failure mode, and a residual check additionally catches
    finite-garbage solutions the signature test cannot see.

    Returns (warm_in, transition, window): the repaired WarmState (flip
    ticks restart the duals and zero newly-infeasible primal entries —
    the carried duals belong to the OLD equality pattern and poison even
    a full cold solve, measured 31 N off a fresh-start reference at trot
    flips), the () bool cold-route flag, and the () bool post-flip
    WINDOW flag (long-warm route; cold wins when both are set).
    """
    warm_in = admm.WarmState(x=state.qp_warm_x, y=state.qp_warm_y,
                             rho=jnp.clip(state.qp_warm_rho,
                                          WARM_RHO_MIN, WARM_RHO_MAX),
                             minv=state.qp_warm_minv)
    # Drift denominator floored at the QP's working force scale
    # (max diag(H) bounds max|H| for PSD H; 180 N is the fz bound,
    # ConvexMpc.cpp:223): at stand the raw gradient nearly cancels
    # (x0 ~ x_ref), so mm-level state jitter (bf16 plant/FK noise, real
    # sensor noise in deployment) reads as >20% relative drift and
    # routed ~54% of a standing batch cold every tick on TPU (measured
    # r4) — a pure small-denominator artifact. The floor translates the
    # threshold into "the implied force-scale gradient shift exceeds
    # WARM_DRIFT_TOL x ~9 N", which is what the warm budget actually
    # cares about.
    den = jnp.maximum(jnp.max(jnp.abs(lazy.gradient)),
                      0.05 * jnp.max(srb.lazy_hessian_diag(lazy)) * 180.0)
    grad_drift = (jnp.max(jnp.abs(lazy.gradient - state.qp_warm_grad))
                  / (den + 1e-9))
    contact_flip = jnp.any(state.contacts != state.qp_warm_contacts)
    transition = (contact_flip
                  | (state.mpc_init_counter < WARM_YOUNG_TICKS)
                  | (grad_drift > WARM_DRIFT_TOL)
                  | _post_flip(state, params, WARM_POSTFLIP_COLD_TICKS)
                  | _pre_flip(state, params))
    window = _post_flip(state, params)
    swing_u = jnp.repeat(~state.contacts, 3).astype(warm_in.x.dtype)
    x_flip = warm_in.x * (1.0 - jnp.tile(swing_u, P.PLAN_HORIZON))
    warm_in = warm_in._replace(
        x=jnp.where(contact_flip, x_flip, warm_in.x),
        y=jnp.where(contact_flip, jnp.zeros_like(warm_in.y),
                    warm_in.y))
    return warm_in, transition, window


# A-posteriori warm-solve health gate: a warm/window tick whose OWN
# residuals exceed these bounds gets re-solved cold (per scenario, via
# the compact overlay in the batched program; via a lax.cond in the
# unbatched one). Replaces the a-priori basin probe, which duplicated
# the warm solve's first Schulz inner product + KKT build (~2.7 ms/tick
# at batch 4096). The thresholds are RELATIVE: primal residual against
# the projected-constraint scale max|z| (force units), dual residual
# against the gradient scale max|q| (gradient-cancellation floored at
# max diag(H) x 1 N, the same hazard class as the drift-denominator
# floor above) — absolute thresholds were calibrated only for the
# default presets and silently mis-scale with robot mass / q,r weights
# (r4 advisor finding). Calibration: r4 absolutes (TPU, batch 512,
# closed-loop trot: healthy prim <= 0.0089 / dual <= 0.0013 raw at
# z_scale ~76 N, g_scale ~0.085; basin-rejected-fallback failure floor
# prim ~0.43 / dual ~0.088) normalize to healthy prim/z <= 1.2e-4,
# dual/g <= 1.5e-2 vs failure floors 5.7e-3 / ~1.0 — the thresholds
# below keep the r4 ~7x margins on both sides and reproduce the old
# absolute cutoffs on the default presets. A CPU f32 re-probe of the
# same protocol (r5) measures healthy maxima 5x / 40x below these.
# Nonfinite solves carry resid = 1e6 (ops/admm.py _warm_finish) and
# are always flagged.
_WARM_HEALTH_PRIM_REL = 8e-4
_WARM_HEALTH_DUAL_REL = 0.15


def _unhealthy(sol, lazy):
    """() bool — the warm/window solve's output is not trustworthy."""
    z_scale = jnp.maximum(jnp.max(jnp.abs(sol.z)), 1.0)
    g_scale = jnp.maximum(jnp.max(jnp.abs(lazy.gradient)),
                          jnp.max(srb.lazy_hessian_diag(lazy)))
    return ((sol.primal_res > _WARM_HEALTH_PRIM_REL * z_scale)
            | (sol.dual_res > _WARM_HEALTH_DUAL_REL * g_scale))


def _grf_branches(settings, warm_settings, window_settings=None):
    """(cold_branch, warm_branch, window_branch) triple:
    LazyCondensedQP x WarmState -> (x_sol, WarmState, bad). Transition
    solves adapt rho only inside the warm-viable band so the carried
    (rho, minv) pair stays self-consistent. The window branch is the
    warm program with the post-flip long segment (``window_settings``,
    default WINDOW_WARM_SETTINGS resolved at call time). ``bad`` is the
    a-posteriori health flag (_unhealthy) — always False from the cold
    branch."""
    if window_settings is None:
        window_settings = WINDOW_WARM_SETTINGS
    settings_t = settings._replace(
        rho_min=max(settings.rho_min, WARM_RHO_MIN),
        rho_max=min(settings.rho_max, WARM_RHO_MAX))

    def cold_branch(lz, warm):
        if not settings_t.polish and not settings_t.refine_f64:
            # segmented transition solve on the lazy factors — on the
            # pallas route each segment's KKT is built inside the
            # Schulz kernel (admm.solve_segmented_fused); polished
            # settings keep the dense path below (polish needs the
            # materialized Hessian)
            sol, w = admm.solve_segmented_fused(lz, settings_t,
                                                P.MPC_MU, warm)
            return sol.x, w, jnp.zeros((), bool)
        qp = srb.CondensedQP(hessian=srb.lazy_hessian(lz),
                             gradient=lz.gradient, lb=lz.lb, ub=lz.ub)
        sol, w = admm.mpc_solve(qp, settings_t, warm_x=warm.x,
                                warm_y=warm.y, warm_rho=warm.rho,
                                return_warm=True)
        return sol.x, w, jnp.zeros((), bool)

    def warm_branch(lz, warm):
        sol, w = admm.mpc_solve_warm_fused(lz, warm, warm_settings)
        return sol.x, w, _unhealthy(sol, lz)

    def window_branch(lz, warm):
        sol, w = admm.mpc_solve_warm_fused(lz, warm, window_settings)
        return sol.x, w, _unhealthy(sol, lz)

    return cold_branch, warm_branch, window_branch


def compute_grf_mpc_batched(states, model, params,
                            settings=admm.ADMMSettings(),
                            use_terrain_adapt=True,
                            warm_settings=WARM_SETTINGS,
                            robust=False, compact_k=128,
                            window_settings=None):
    """Batched MPC GRF solve with BATCH-LEVEL transition routing and
    per-scenario cold-solve COMPACTION.

    The per-scenario ``lax.cond`` in :func:`compute_grf_mpc` vectorizes
    into a select under vmap: every scenario pays the full cold solve
    (2 segments x 30 Schulz-laden iterations) every tick even when no
    scenario is at a gait transition — the 33% rollout tax VERDICT r2
    item 3 flags. This entry lifts the routing decision above the batch
    into a three-way ``lax.switch`` on the per-tick transition count:

    - **0 flags** (the steady cadence): the pure warm/window base
      program (the post-flip window promotion is batch-level, see the
      inline note), plus the a-posteriori residual health gate — a
      flag-free tick whose warm solve is healthy pays NOTHING beyond
      the base program.
    - **1..compact_k flags** (the desynchronized-trot regime, where
      SOME scenario flips nearly every tick): every scenario runs the
      base tick, and the flagged scenarios — a-priori transition flags
      plus a-posteriori health rejects — are GATHERED into a fixed-size
      (compact_k, ...) sub-batch, solved cold from their own
      primal/dual carries, and scattered back over the base results.
      Per scenario this computes exactly what the per-scenario routing
      in :func:`compute_grf_mpc` computes (flagged -> cold, unflagged
      -> warm/window), at base-batch cost plus a compact_k-sized cold
      solve — the batch has the reference's property that OSQP pays
      iterations only where the warm start is off
      (A1RobotControl.cpp:522-540), per scenario instead of per tick.
    - **> compact_k flags** (synchronized flip ticks, mode switches):
      the whole batch takes the cold solve, never less accurate than
      the per-scenario blend (the cold solve warm-starts from each
      scenario's carry and is a strict superset of the warm tick's
      work). When the a-priori count alone exceeds compact_k the base
      program is skipped entirely.

    Args:
      states: CtrlState with a leading batch axis on every leaf.
      model, params: unbatched RobotModel / CtrlParams.
      compact_k: static size of the gathered cold sub-batch (clamped to
        the batch size). The 128 default covers the measured desync-
        stray rate at batch-4096 trot (health rejects p50 1/tick) with
        wide headroom; overflow degrades gracefully to whole-batch
        cold. 0 disables compaction — mixed ticks then route the whole
        batch cold (the pre-r4 two-way routing; health rejects then
        also force whole-batch cold).

    Returns:
      updated batched CtrlState.
    """

    def prepare(state):
        state = terrain.terrain_adaptation(state, use_terrain_adapt)
        x0 = srb.mpc_state(state.root_euler, state.root_pos,
                           state.root_ang_vel, state.root_lin_vel)
        vel_d_world = state.root_rot_mat @ state.root_lin_vel_d
        x_ref = srb.reference_trajectory(
            state.root_pos, state.root_euler, state.root_pos_d,
            state.root_euler_d, state.root_ang_vel_d, vel_d_world,
            params.mpc_dt)
        a_c = srb.calculate_A_c(state.root_euler)
        foot_pos_mpc = jnp.where(state.contacts[:, None],
                                 state.foot_pos_abs,
                                 state.foot_pos_target_abs)
        b_c = srb.calculate_B_c(model.mass, model.trunk_inertia,
                                state.root_rot_mat, foot_pos_mpc)
        a_d, b_d = srb.discretize(a_c, b_c, params.mpc_dt)
        lazy = srb.condense_nilpotent_lazy(
            a_d, b_d, x0, x_ref, params.q_weights, params.r_weights,
            state.contacts)
        warm_in, transition, window = _transition_test(state, lazy,
                                                       params)
        return state, lazy, warm_in, transition, window

    states, lazy, warm_in, transition, window = jax.vmap(prepare)(states)
    if robust:
        # uniform robust warm program (see ROBUST_WARM_SETTINGS): the
        # scaled-schedule refinement handles basin-rejected carries per
        # scenario, so no batch-level cold branch exists at all. The
        # flip repair (dual restart) from _transition_test still applied
        # per scenario above.
        robust_settings = warm_settings._replace(
            schulz_l0_refine=(warm_settings.schulz_l0_refine
                              if warm_settings.schulz_l0_refine > 0
                              else 1e-4))
        _, warm_branch, _ = _grf_branches(settings, robust_settings,
                                          window_settings)
        x_sol, warm_out, _ = jax.vmap(warm_branch)(lazy, warm_in)
    else:
        cold_branch, warm_branch, window_branch = _grf_branches(
            settings, warm_settings, window_settings)
        batch = transition.shape[0]
        k = min(compact_k, batch)
        all_warm = jax.vmap(warm_branch)
        all_window = jax.vmap(window_branch)
        all_cold = jax.vmap(cold_branch)

        def all_base(lz, warm):
            # Post-flip window promotion is BATCH-LEVEL: the window flag
            # derives from the gait counters, which advance identically
            # across a batch sharing gait phase (early contacts desync
            # `contacts`, not the counter), so any() == every scenario's
            # own flag and per-scenario equality with compute_grf_mpc
            # holds (tests/test_batched_transition.py). A deliberately
            # phase-desynchronized batch pays the longer window segment
            # on all scenarios of a window tick — never less accurate.
            return jax.lax.cond(jnp.any(window), all_window, all_warm,
                                lz, warm)

        def cold2(lz, warm):
            x, w, _ = all_cold(lz, warm)
            return x, w

        def neutralize(warm, bad):
            # health-rejected carries (bad on a NON-transition scenario)
            # are garbage by construction: the cold re-solve starts
            # neutral, matching the per-scenario auto program — a fixed
            # ADMM budget warm-started from garbage duals measurably
            # fails to re-converge (r5 probe: total vertical support
            # ~20 N off at 75 iterations)
            z = (bad & ~transition)[:, None].astype(warm.x.dtype)
            return warm._replace(x=warm.x * (1.0 - z),
                                 y=warm.y * (1.0 - z))

        if k == 0:
            def base_or_cold(lz, warm):
                x, w, bad = all_base(lz, warm)
                # health rejects without a compact sub-batch: re-solve
                # the whole batch cold (rare; k = 0 is the legacy mode)
                return jax.lax.cond(jnp.any(bad),
                                    lambda: cold2(lz, neutralize(warm,
                                                                 bad)),
                                    lambda: (x, w))
            x_sol, warm_out = jax.lax.cond(
                jnp.any(transition), cold2, base_or_cold, lazy, warm_in)
        else:
            def fix(x_w, w_w, flags, bad, lz, warm):
                # gather the flagged scenarios into a static-k cold
                # sub-batch and scatter its results (solution AND carry)
                # over the base ones. top_k over the 0/1 flags lists
                # flagged indices first (ascending within ties);
                # `valid` masks the fill.
                warm = neutralize(warm, bad)
                _, idx = jax.lax.top_k(flags.astype(jnp.int32), k)
                sub_lz = jax.tree.map(lambda a: a[idx], lz)
                sub_w = jax.tree.map(lambda a: a[idx], warm)
                x_c, w_c, _ = all_cold(sub_lz, sub_w)
                valid = flags[idx]

                def merge(full, sub):
                    v = valid.reshape((k,) + (1,) * (sub.ndim - 1))
                    return full.at[idx].set(jnp.where(v, sub, full[idx]))

                return merge(x_w, x_c), jax.tree.map(merge, w_w, w_c)

            def routed(lz, warm):
                # base everyone (fixed shape); flagged = a-priori
                # transition flags + a-posteriori health rejects.
                # Flag-free healthy ticks return the base result with
                # no compact work; overflow falls back to whole-batch
                # cold.
                x_w, w_w, bad = all_base(lz, warm)
                flags = transition | bad
                n_flag = jnp.sum(flags)
                return jax.lax.cond(
                    n_flag > k,
                    lambda: cold2(lz, neutralize(warm, bad)),
                    lambda: jax.lax.cond(
                        n_flag > 0,
                        lambda: fix(x_w, w_w, flags, bad, lz, warm),
                        lambda: (x_w, w_w)))

            # a-priori overflow (synchronized flips / mode switches)
            # skips the base program entirely
            x_sol, warm_out = jax.lax.cond(
                jnp.sum(transition) > k, cold2, routed, lazy, warm_in)
    return jax.vmap(_finish_grf)(states, x_sol, warm_out, lazy.gradient)


def compute_grf_mpc_stagewise(state, model, params,
                              settings=admm.ADMMSettings(),
                              use_terrain_adapt=True,
                              warm_settings=WARM_SETTINGS, horizon=40,
                              warm_mode="auto"):
    """Long-horizon MPC GRF solve via the stagewise O(H) Riccati-ADMM
    solver (ops/stagewise.py) — the production path for horizons the
    condensed H=10 design cannot reach (SURVEY section 5's long-context
    axis; supersedes the O(H^2) ConvexMpc.cpp:158-245 condensation).

    Same warm/cold cadence as :func:`compute_grf_mpc`: steady ticks run
    one short warm segment from the carried primal/dual (the Riccati
    refactorization is exact per tick, so no KKT-inverse carry or basin
    safeguard exists), while contact flips and gradient jumps route to a
    full cold solve under ``lax.cond``. The CtrlState must be built with
    ``init_ctrl_state(horizon=H)`` (carry fields sized 12H/20H;
    qp_warm_minv is a placeholder on this path).

    Args:
      horizon: static H (> 0); independent of PLAN_HORIZON.
    """
    h = horizon
    state = terrain.terrain_adaptation(state, use_terrain_adapt)
    x0 = srb.mpc_state(state.root_euler, state.root_pos,
                       state.root_ang_vel, state.root_lin_vel)
    vel_d_world = state.root_rot_mat @ state.root_lin_vel_d
    x_ref = srb.reference_trajectory(
        state.root_pos, state.root_euler, state.root_pos_d,
        state.root_euler_d, state.root_ang_vel_d, vel_d_world,
        params.mpc_dt, horizon=h)
    a_c = srb.calculate_A_c(state.root_euler)
    foot_pos_mpc = jnp.where(state.contacts[:, None], state.foot_pos_abs,
                             state.foot_pos_target_abs)
    b_c = srb.calculate_B_c(model.mass, model.trunk_inertia,
                            state.root_rot_mat, foot_pos_mpc)
    a_d, b_d = srb.discretize(a_c, b_c, params.mpc_dt)

    q_lin = stagewise.linear_term(a_d, b_d, x0, x_ref, params.q_weights,
                                  params.r_weights)
    # same force-scale denominator floor as the condensed path (the
    # stagewise per-stage Hessian block is 2 (R + B' Q B))
    h_diag_sw = 2.0 * (params.r_weights
                       + jnp.sum(params.q_weights[:, None] * b_d ** 2,
                                 axis=0))
    den_sw = jnp.maximum(jnp.max(jnp.abs(q_lin)),
                         0.05 * jnp.max(h_diag_sw) * 180.0)
    grad_drift = (jnp.max(jnp.abs(q_lin.reshape(-1) - state.qp_warm_grad))
                  / (den_sw + 1e-9))
    contact_flip = jnp.any(state.contacts != state.qp_warm_contacts)
    # the full post-flip window routes cold here (no stagewise WINDOW
    # program: the Riccati refactorization is exact per tick, so the
    # cold solve IS the long-budget program), and the pre-flip guard
    # mirrors the condensed path — the landing swing foot moves the
    # gradient fast in the 1-2 ticks before a hand-off, under the drift
    # threshold but beyond the short warm budget (ctrl/controller.py
    # _pre_flip calibration note)
    transition = (contact_flip
                  | (state.mpc_init_counter < WARM_YOUNG_TICKS)
                  | _post_flip(state, params)
                  | _pre_flip(state, params)
                  | (grad_drift > WARM_DRIFT_TOL))
    if warm_mode == "cold":
        transition = jnp.ones((), bool)
    elif warm_mode == "warm":
        transition = jnp.zeros((), bool)

    # flip repair, mirroring the condensed path: restart duals, zero the
    # newly-infeasible swing primal entries
    u_carry = state.qp_warm_x.reshape(h, P.NUM_DOF)
    y_carry = state.qp_warm_y.reshape(h, P.MPC_CONSTRAINT_DIM)
    swing_u = jnp.repeat(~state.contacts, 3).astype(u_carry.dtype)
    u_carry = jnp.where(contact_flip, u_carry * (1.0 - swing_u)[None, :],
                        u_carry)
    y_carry = jnp.where(contact_flip, jnp.zeros_like(y_carry), y_carry)
    warm_in = stagewise.StagewiseWarmState(
        u=u_carry, y=y_carry,
        rho=jnp.clip(state.qp_warm_rho, WARM_RHO_MIN, WARM_RHO_MAX),
        q_lin=state.qp_warm_grad.reshape(h, P.NUM_DOF))
    settings_t = settings._replace(
        rho_min=max(settings.rho_min, WARM_RHO_MIN),
        rho_max=min(settings.rho_max, WARM_RHO_MAX))

    def cold_branch(warm):
        sol, w = stagewise.mpc_solve(
            a_d, b_d, x0, x_ref, params.q_weights, params.r_weights,
            state.contacts, settings=settings_t, return_warm=True)
        return sol, w

    def warm_branch(warm):
        return stagewise.mpc_solve_warm(
            a_d, b_d, x0, x_ref, params.q_weights, params.r_weights,
            state.contacts, warm, settings=warm_settings)

    sol, warm_out = jax.lax.cond(transition, cold_branch, warm_branch,
                                 warm_in)
    warm_flat = admm.WarmState(x=warm_out.u.reshape(-1),
                               y=warm_out.y.reshape(-1),
                               rho=warm_out.rho, minv=state.qp_warm_minv)
    return _finish_grf(state, sol.u.reshape(-1), warm_flat,
                       grad_carry=q_lin.reshape(-1))


def _finish_grf(state, grf_x, warm_out, grad_carry):
    """Shared GRF-solve tail: frame rotation, NaN guard, warm-carry commit."""
    grf_world = grf_x[:12].reshape(4, 3)
    grf_body = grf_world @ state.root_rot_mat    # R^T f per leg
    # NaN guard per leg (A1RobotControl.cpp:558-561)
    bad = jnp.isnan(jnp.linalg.norm(grf_body, axis=-1, keepdims=True))
    any_bad = jnp.any(bad)
    grf_body = jnp.where(bad, state.foot_forces_grf, grf_body)

    def keep_old(new, old):
        return jnp.where(any_bad, old, new)

    return state._replace(
        foot_forces_grf=grf_body,
        qp_warm_x=keep_old(warm_out.x, state.qp_warm_x),
        qp_warm_y=keep_old(warm_out.y, state.qp_warm_y),
        qp_warm_rho=keep_old(warm_out.rho, state.qp_warm_rho),
        qp_warm_minv=keep_old(warm_out.minv, state.qp_warm_minv),
        # on a bad solve the old carry (and its contact pattern) stays, so
        # the next tick re-evaluates the transition test against it
        qp_warm_contacts=jnp.where(any_bad, state.qp_warm_contacts,
                                   state.contacts),
        qp_warm_grad=jnp.where(any_bad, state.qp_warm_grad, grad_carry))


def compute_grf_qp(state, model, params, settings=admm.ADMMSettings()):
    """Single-step balance QP (A1RobotControl.cpp:377-444)."""
    acc = balance.desired_root_acc(state, params, model.mass)
    qp = balance.build_balance_qp(acc, state.root_rot_mat_z,
                                  state.foot_pos_abs, state.contacts)
    grf_world, _ = balance.solve_balance_qp(qp, settings)
    grf_body = grf_world @ state.root_rot_mat
    bad = jnp.isnan(jnp.linalg.norm(grf_body, axis=-1, keepdims=True))
    grf_body = jnp.where(bad, state.foot_forces_grf, grf_body)
    return state._replace(foot_forces_grf=grf_body)


def control_step(state, model, params, dt, solver_type=MPC,
                 settings=admm.ADMMSettings(), use_terrain_adapt=True,
                 warm_settings=WARM_SETTINGS, receding_horizon=False,
                 warm_mode="auto", horizon=None):
    """One full controller tick; returns updated CtrlState (incl. torques).

    Fuses the reference's two-thread pipeline into one jitted program:
    update_plan -> swing control -> GRF solve -> torque mapping
    (MainGazebo.cpp:47-121 collapsed; the estimator runs in
    :func:`sensor_update`). The MPC branch runs the warm-started
    production solver by default (see :func:`compute_grf_mpc`); a static
    ``horizon`` other than PLAN_HORIZON routes the GRF solve to the
    stagewise O(H) solver (:func:`compute_grf_mpc_stagewise`; the state
    must come from ``init_ctrl_state(horizon=...)``).
    """
    state = gait.update_plan(state, params, model)
    state = swing.generate_swing_legs_ctrl(state, params, dt)
    if solver_type == MPC:
        if horizon is not None and horizon != P.PLAN_HORIZON:
            state = compute_grf_mpc_stagewise(
                state, model, params, settings, use_terrain_adapt,
                warm_settings, horizon, warm_mode)
        else:
            state = compute_grf_mpc(state, model, params, settings,
                                    use_terrain_adapt, warm_settings,
                                    receding_horizon, warm_mode)
    else:
        state = compute_grf_qp(state, model, params, settings)
    state = torque.compute_joint_torques(state, params)
    return state


def control_step_batched(states, model, params, dt,
                         settings=admm.ADMMSettings(),
                         use_terrain_adapt=True,
                         warm_settings=WARM_SETTINGS, robust=False,
                         compact_k=128):
    """Batched :func:`control_step` (MPC branch) with batch-level
    transition routing + cold-solve compaction — see
    :func:`compute_grf_mpc_batched`. The plan/swing/torque stages vmap
    per scenario; only the GRF solve's cold-vs-warm decision is lifted
    above the batch (or removed entirely with ``robust=True``, the
    uniform program for walking sweeps whose per-scenario transitions
    desynchronize).

    Args:
      states: CtrlState with a leading batch axis; model/params unbatched.
    """
    states = jax.vmap(lambda s: gait.update_plan(s, params, model))(states)
    states = jax.vmap(
        lambda s: swing.generate_swing_legs_ctrl(s, params, dt))(states)
    states = compute_grf_mpc_batched(states, model, params, settings,
                                     use_terrain_adapt, warm_settings,
                                     robust=robust, compact_k=compact_k)
    return jax.vmap(
        lambda s: torque.compute_joint_torques(s, params))(states)
