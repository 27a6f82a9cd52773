"""Fused observe + EKF Pallas kernel, batch-in-lanes layout.

The controller tick's acknowledged wall (NOTES_ROUND4 ablation;
VERDICT r4 item 3) is the observe+estimate stage: quaternion math, leg
FK/Jacobians, and the 18/28 Kalman tick are all <= 28-dim tensor work
that XLA lays out with the tiny dims on the (8, 128) vector registers —
a few percent lane occupancy for every one of its dozens of ops
(~17.5 ms of the ~31 ms warmed tick at batch 4096). This kernel extends
the lane-batched pattern proven by pallas_admm.schulz_inverse_lanes to
the WHOLE stage: the batch rides the lane axis, every small matmul is a
k-deep FMA loop at full lane width, and the entire chain — quat ->
rot/euler, closed-form FK + analytic Jacobian (models/kinematics.py
formulas), foot velocities, KF predict, innovation build, lane-Schulz
innovation inverse, Joseph-form update, covariance surgery — runs in
one VMEM-resident program. Sensor tensors cross HBM once.

Reference semantics: A1BasicEKF.cpp:70-164 (estimator),
GazeboA1ROS.cpp:242-288 + HardwareA1ROS.cpp:253-386 (observe stage).
The per-scenario reference composition lives in ctrl/controller.py
``sensor_update``; tests/test_pallas_ekf.py pins interpreter-mode
equivalence against it.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from go1_qp_mpc_controller_tpu.ops import ekf as ekf_mod
from go1_qp_mpc_controller_tpu.ops.pallas_admm import (_lane_matmul,
                                                       schulz_lanes_body)

NS = ekf_mod.STATE_SIZE       # 18
NM = ekf_mod.MEAS_SIZE        # 28
LANE_TILE = 128


def _lm(a, b, k):
    """Lane matmul wrapper: (m, k, L) x (k, n, L) -> (m, n, L)."""
    return _lane_matmul(a, b, k)


def _rot_from_quat(quat):
    """quat (4, L) -> rot (3, 3, L).

    Formula parity with utils/rotations.py quat_to_rot_mat. The euler
    extraction (and rot_z) stays OUTSIDE the kernel: Mosaic has no
    atan2/asin lowering, and as batch-last 1-D XLA ops it costs a few
    full-lane-occupancy passes (see observe_ekf_lanes)."""
    nrm = jax.lax.rsqrt(jnp.sum(quat * quat, axis=0))
    w, x, y, z = (quat[0] * nrm, quat[1] * nrm, quat[2] * nrm,
                  quat[3] * nrm)
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)])])


def _mid(a, i):
    """Integer-index the MIDDLE axis of (m, k, L) via slice+reshape —
    direct integer indexing there lowers to an unsupported gather in
    Mosaic."""
    return a[:, i:i + 1, :].reshape(a.shape[0], a.shape[2])


def _fk_jac(qpos, rho_opt, rho_fix):
    """qpos (12, L) -> fpr (4, 3, L), per-q Jacobian columns
    (col1, col2, col3) each (4, 3, L).

    The models/kinematics.py fk/jac formulas in lane layout; rho_opt
    (4, 3, 1) / rho_fix (4, 5, 1) broadcast over lanes."""
    q = qpos.reshape(4, 3, -1)
    q1, q2, q3 = _mid(q, 0), _mid(q, 1), _mid(q, 2)     # (4, L)
    cx, cy, cz = _mid(rho_opt, 0), _mid(rho_opt, 1), _mid(rho_opt, 2)
    ox, oy, d, lt, lc = (_mid(rho_fix, 0), _mid(rho_fix, 1),
                         _mid(rho_fix, 2), _mid(rho_fix, 3),
                         _mid(rho_fix, 4))
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s2, c2 = jnp.sin(q2), jnp.cos(q2)
    s23, c23 = jnp.sin(q2 + q3), jnp.cos(q2 + q3)
    calf = lc - cz
    hip = cy + d
    x_plane = cx * c23 - calf * s23 - lt * s2
    a = lt * c2 + calf * c23 + cx * s23
    px = ox + x_plane
    py = oy + hip * c1 + a * s1
    pz = hip * s1 - a * c1
    fpr = jnp.stack([px, py, pz], axis=1)               # (4, 3, L)

    da_dq2 = -lt * s2 - calf * s23 + cx * c23
    da_dq3 = -calf * s23 + cx * c23
    b_ = calf * c23 + cx * s23
    zero = jnp.zeros_like(a)
    col1 = jnp.stack([zero, -hip * s1 + a * c1, hip * c1 + a * s1],
                     axis=1)
    col2 = jnp.stack([-a, s1 * da_dq2, -c1 * da_dq2], axis=1)
    col3 = jnp.stack([-b_, s1 * da_dq3, -c1 * da_dq3], axis=1)
    return fpr, (col1, col2, col3)


def _apply_ct_cols(m18):
    """M (r, 18, L) -> M C' (r, 28, L) for the fixed EKF measurement
    matrix C (A1BasicEKF.cpp:11-17): columns 3i:3i+3 = M[:, 6+3i:9+3i] -
    M[:, 0:3]; 12+3i:15+3i = M[:, 3:6]; 24+i = M[:, 8+3i]."""
    fk_cols = [m18[:, 6 + 3 * i:9 + 3 * i] - m18[:, 0:3]
               for i in range(4)]
    v_cols = [m18[:, 3:6] for _ in range(4)]
    z_cols = [m18[:, 8 + 3 * i:9 + 3 * i] for i in range(4)]
    return jnp.concatenate(fk_cols + v_cols + z_cols, axis=1)


def _apply_c_rows(m18):
    """M (18, c, L) -> C M (28, c, L) (row-side application of C)."""
    fk_rows = [m18[6 + 3 * i:9 + 3 * i] - m18[0:3] for i in range(4)]
    v_rows = [m18[3:6] for _ in range(4)]
    z_rows = [m18[8 + 3 * i:9 + 3 * i] for i in range(4)]
    return jnp.concatenate(fk_rows + v_rows + z_rows, axis=0)


def _kc_from_k(k_gain):
    """K (18, 28, L) -> K C (18, 18, L) using C's structure."""
    kc_03 = -(k_gain[:, 0:3] + k_gain[:, 3:6] + k_gain[:, 6:9]
              + k_gain[:, 9:12])
    kc_36 = (k_gain[:, 12:15] + k_gain[:, 15:18] + k_gain[:, 18:21]
             + k_gain[:, 21:24])
    foot_blocks = []
    for i in range(4):
        blk = k_gain[:, 3 * i:3 * i + 3]
        blk = jnp.concatenate(
            [blk[:, 0:2], blk[:, 2:3] + k_gain[:, 24 + i:25 + i]], axis=1)
        foot_blocks.append(blk)
    return jnp.concatenate([kc_03, kc_36] + foot_blocks, axis=1)


def _kernel(x_ref, p_ref, quat_ref, acc_ref, gyro_ref, qpos_ref,
            qvel_ref, ffoot_ref, mode_ref, dt_ref, rho_opt_ref,
            rho_fix_ref,
            rot_out, fpr_out, fpa_out, fvr_out,
            jf_out, wav_out, x_out, p_out, estc_out,
            *, coeffs, contact_force_norm, assume_flat_ground):
    dt = dt_ref[0, 0]
    dtype = x_ref.dtype

    # ---- observe stage ------------------------------------------------
    rot = _rot_from_quat(quat_ref[...])
    fpr, (jc1, jc2, jc3) = _fk_jac(qpos_ref[...],
                                   rho_opt_ref[...][:, :, None],
                                   rho_fix_ref[...][:, :, None])
    jf = jnp.stack([jc1, jc2, jc3], axis=2)                 # (4, 3, 3, L)
    qv = qvel_ref[...].reshape(4, 3, -1)
    # foot_vel_rel[l, i] = sum_j J[l, i, j] dq[l, j]
    fvr = (jc1 * _mid(qv, 0)[:, None, :]
           + jc2 * _mid(qv, 1)[:, None, :]
           + jc3 * _mid(qv, 2)[:, None, :])                 # (4, 3, L)
    # rot columns as (1, 3, L) / rows as (3, L) via slice+swap (no
    # middle-axis integer indexing)
    rcol = [jnp.swapaxes(rot[:, k:k + 1, :], 0, 1) for k in range(3)]
    # foot_pos_abs[l] = rot @ fpr[l] ; world ang vel = rot @ gyro
    fpa = (rcol[0] * fpr[:, 0:1, :] + rcol[1] * fpr[:, 1:2, :]
           + rcol[2] * fpr[:, 2:3, :])                      # (4, 3, L)
    gyro = gyro_ref[...]
    wav = (_mid(rot, 0) * gyro[0:1] + _mid(rot, 1) * gyro[1:2]
           + _mid(rot, 2) * gyro[2:3])                      # (3, L)

    # ---- EKF (A1BasicEKF.cpp:70-164 semantics, ops/ekf.py parity) -----
    x = x_ref[...]
    p = p_ref[...]
    ffoot = ffoot_ref[...]
    mode = mode_ref[...]                                    # (1, L)
    cw = jnp.clip(ffoot / contact_force_norm, 0.0, 1.0)
    est_c = jnp.where(mode == 0.0, jnp.ones_like(cw), cw)
    infl = 1.0 + (1.0 - est_c) * 1e3                        # (4, L)

    acc = acc_ref[...]
    u = (_mid(rot, 0) * acc[0:1] + _mid(rot, 1) * acc[1:2]
         + _mid(rot, 2) * acc[2:3])
    u = jnp.concatenate([u[0:2], u[2:3] - 9.81], axis=0)

    # predict: A = I + dt E(0:3 <- 3:6); exact A x / A P A' via shifts
    xbar = jnp.concatenate(
        [x[0:3] + dt * x[3:6], x[3:6] + dt * u, x[6:]], axis=0)
    ap = jnp.concatenate([p[0:3] + dt * p[3:6], p[3:6], p[6:]], axis=0)
    pbar = jnp.concatenate(
        [ap[:, 0:3] + dt * ap[:, 3:6], ap[:, 3:6], ap[:, 6:]], axis=1)
    def rep3(a):
        # rows repeated 3x consecutively; jnp.repeat lowers to an
        # unsupported >2D gather in Mosaic
        return jnp.stack([a, a, a], axis=1).reshape(3 * a.shape[0], -1)

    q_rows = jnp.concatenate([
        jnp.full((3, 1), ekf_mod.PROCESS_NOISE_PIMU / 20.0, dtype)
        * jnp.ones_like(infl[:1]),
        jnp.full((3, 1), ekf_mod.PROCESS_NOISE_VIMU * 9.8 / 20.0, dtype)
        * jnp.ones_like(infl[:1]),
        rep3(infl * ekf_mod.PROCESS_NOISE_PFOOT)],
        axis=0) * dt                                        # (18, L)
    ii = jax.lax.broadcasted_iota(jnp.int32, (NS, NS, 1), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (NS, NS, 1), 1)
    eye18 = (ii == jj).astype(dtype)
    pbar = pbar + eye18 * q_rows[:, None, :]

    # measurements
    fk_world = fpa                                          # (4, 3, L)
    # leg_v = -fvr - omega x fpr (per leg)
    wx, wy, wz = gyro[0:1], gyro[1:2], gyro[2:3]
    fx, fy, fz = _mid(fpr, 0), _mid(fpr, 1), _mid(fpr, 2)
    cross = jnp.stack([wy * fz - wz * fy,
                       wz * fx - wx * fz,
                       wx * fy - wy * fx], axis=1)
    leg_v = -fvr - cross                                    # (4, 3, L)
    leg_v_w = (rcol[0] * leg_v[:, 0:1, :] + rcol[1] * leg_v[:, 1:2, :]
               + rcol[2] * leg_v[:, 2:3, :])                # (4, 3, L)
    vel_meas = ((1.0 - est_c)[:, None, :] * x[3:6][None]
                + est_c[:, None, :] * leg_v_w)
    height_meas = (1.0 - est_c) * (x[2:3] + fz)             # (4, L)
    y = jnp.concatenate([fk_world.reshape(12, -1),
                         vel_meas.reshape(12, -1), height_meas], axis=0)
    yhat = _apply_c_rows(xbar)                              # (28, L)
    err = y - yhat

    # innovation S = C pbar C' + R (28, 28, L)
    r_fk = rep3(infl * ekf_mod.SENSOR_NOISE_PIMU_REL_FOOT)
    r_vel = rep3(infl * ekf_mod.SENSOR_NOISE_VIMU_REL_FOOT)
    if assume_flat_ground:
        r_z = infl * ekf_mod.SENSOR_NOISE_ZFOOT
    else:
        r_z = jnp.full_like(infl, 1e5)
    r_vec = jnp.concatenate([r_fk, r_vel, r_z], axis=0)     # (28, L)
    cp = _apply_c_rows(pbar)                                # (28, 18, L)
    s_mat = _apply_ct_cols(cp)                              # (28, 28, L)
    im = jax.lax.broadcasted_iota(jnp.int32, (NM, NM, 1), 0)
    jm = jax.lax.broadcasted_iota(jnp.int32, (NM, NM, 1), 1)
    eye28 = (im == jm).astype(dtype)
    s_mat = s_mat + eye28 * r_vec[:, None, :]
    s_mat = 0.5 * (s_mat + jnp.swapaxes(s_mat, 0, 1))

    sinv = schulz_lanes_body(s_mat, coeffs)                 # (28, 28, L)
    pct = _apply_ct_cols(pbar)                              # (18, 28, L)
    k_gain = _lm(pct, sinv, NM)                             # (18, 28, L)
    x_new = xbar + _lm(k_gain, err[:, None, :], NM)[:, 0, :]

    ikc = eye18 - _kc_from_k(k_gain)                        # (18, 18, L)
    ikp = _lm(ikc, pbar, NS)
    p_new = _lm(ikp, jnp.swapaxes(ikc, 0, 1), NS)
    kr = k_gain * r_vec[None, :, :]
    p_new = p_new + _lm(kr, jnp.swapaxes(k_gain, 0, 1), NM)
    p_new = 0.5 * (p_new + jnp.swapaxes(p_new, 0, 1))

    # xy-position covariance surgery (A1BasicEKF.cpp:143-147); masks
    # from iota (Pallas kernels cannot capture array constants)
    p00 = _mid(p_new[0:1], 0)[0]
    p01 = _mid(p_new[0:1], 1)[0]
    p10 = _mid(p_new[1:2], 0)[0]
    p11 = _mid(p_new[1:2], 1)[0]
    det2 = p00 * p11 - p01 * p10
    xy_i = ii < 2
    xy_j = jj < 2
    mask_off = (xy_i == xy_j).astype(dtype)          # zero xy-cross rows
    scale = jnp.where(xy_i & xy_j, jnp.asarray(0.1, dtype),
                      jnp.asarray(1.0, dtype))
    p_surgery = p_new * mask_off * scale
    p_new = jnp.where((det2 > 1e-6)[None, None, :], p_surgery, p_new)

    rot_out[...] = rot
    fpr_out[...] = fpr
    fpa_out[...] = fpa
    fvr_out[...] = fvr
    jf_out[...] = jf
    wav_out[...] = wav
    x_out[...] = x_new
    p_out[...] = p_new
    estc_out[...] = est_c


def observe_ekf_lanes(x, P, quat, acc, gyro, qpos, qvel, ffoot, mode,
                      dt, rho_opt, rho_fix, contact_force_norm=100.0,
                      assume_flat_ground=True, interpret=None,
                      lane_tile=LANE_TILE):
    """Fused observe+EKF for a batch, batch-in-lanes.

    Args:
      x: (B, 18) prior states; P: (B, 18, 18) covariances.
      quat, acc, gyro, qpos, qvel, ffoot: (B, 4/3/3/12/12/4) sensors.
      mode: (B,) int movement mode.
      dt: () step.
      rho_opt, rho_fix: (4, 3) / (4, 5) leg geometry (shared).

    Returns:
      dict of batch-major outputs: rot (B,3,3), euler (B,3),
      rot_z (B,3,3), foot_pos_rel (B,4,3), foot_pos_abs (B,4,3),
      foot_vel_rel (B,4,3), j_foot (B,4,3,3), root_ang_vel (B,3),
      x (B,18), P (B,18,18), est_contacts (B,4).
    """
    b = x.shape[0]
    dtype = x.dtype
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    coeffs = _ekf_coeffs()

    def to_lanes(a):
        # (B, ...) -> (..., B)
        perm = tuple(range(1, a.ndim)) + (0,)
        return jnp.transpose(a, perm)

    # mode as (1, B): a pure-1D lane input trips an XLA-vs-Mosaic
    # tiling mismatch (f32[B] lays out T(256) while the block wants
    # T(128))
    args = [to_lanes(a) for a in
            (x, P, quat, acc, gyro, qpos, qvel, ffoot,
             mode.astype(dtype)[:, None])]
    pad = (-b) % lane_tile
    if pad:
        args = [jnp.concatenate(
            [a, jnp.repeat(a[..., -1:], pad, axis=-1)], axis=-1)
            for a in args]
    bt = b + pad
    dt_arr = jnp.full((1, 1), dt, dtype)

    kernel = functools.partial(
        _kernel, coeffs=coeffs,
        contact_force_norm=float(contact_force_norm),
        assume_flat_ground=bool(assume_flat_ground))

    def lane_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape + (lane_tile,),
                            lambda i, _nd=nd: (0,) * _nd + (i,),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    in_specs = [lane_spec(s) for s in
                ((NS,), (NS, NS), (4,), (3,), (3,), (12,), (12,), (4,),
                 (1,))]
    in_specs += [const_spec((1, 1)), const_spec((4, 3)),
                 const_spec((4, 5))]
    out_shapes = [(3, 3), (4, 3), (4, 3), (4, 3),
                  (4, 3, 3), (3,), (NS,), (NS, NS), (4,)]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct(s + (bt,), dtype)
                        for s in out_shapes),
        grid=(bt // lane_tile,),
        in_specs=in_specs,
        out_specs=tuple(lane_spec(s) for s in out_shapes),
        interpret=interpret,
    )(*args, dt_arr, rho_opt.astype(dtype), rho_fix.astype(dtype))

    def from_lanes(a):
        a = a[..., :b]
        perm = (a.ndim - 1,) + tuple(range(a.ndim - 1))
        return jnp.transpose(a, perm)

    keys = ("rot", "foot_pos_rel", "foot_pos_abs",
            "foot_vel_rel", "j_foot", "root_ang_vel", "x", "P",
            "est_contacts")
    out = {k: from_lanes(v) for k, v in zip(keys, outs)}
    # euler + rot_z in batch-last XLA (Mosaic has no atan2/asin):
    # 1-D ops over (B,) vectors pack the batch on the lanes, so these
    # few passes are full-occupancy and cost ~nothing
    qw, qx, qy, qz = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    y_sqr = qy * qy
    roll = jnp.arctan2(2.0 * (qw * qx + qy * qz),
                       1.0 - 2.0 * (qx * qx + y_sqr))
    pitch = jnp.arcsin(jnp.clip(2.0 * (qw * qy - qz * qx), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (qw * qz + qx * qy),
                      1.0 - 2.0 * (y_sqr + qz * qz))
    out["euler"] = jnp.stack([roll, pitch, yaw], axis=-1)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    zero = jnp.zeros_like(cy)
    one = jnp.ones_like(cy)
    out["rot_z"] = jnp.stack(
        [jnp.stack([cy, -sy, zero], axis=-1),
         jnp.stack([sy, cy, zero], axis=-1),
         jnp.stack([zero, zero, one], axis=-1)], axis=-2)
    return out


@functools.lru_cache(maxsize=None)
def _ekf_coeffs():
    from go1_qp_mpc_controller_tpu.ops import admm
    # the EKF innovation schedule edge (see ekf._schulz_sinv_fn)
    return admm._scaled_schulz_coeffs(1e-5)
