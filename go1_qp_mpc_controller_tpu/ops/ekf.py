"""18-state / 28-measurement Kalman-filter state estimator.

TPU-native equivalent of A1BasicEKF (src/a1_cpp/src/A1BasicEKF.cpp:7-164).
State x = (root pos 3, root vel 3, foot positions 4x3); measurements are the
4 body->foot FK vectors, 4 leg-odometry velocities, and 4 foot heights, with
contact-weighted noise inflation (x1001 for swing legs). The reference's
fullPivHouseholderQr innovation solve becomes a batched Cholesky solve (the
innovation covariance is symmetric positive definite by construction).

Pure step functions over (x, P); batch with vmap.
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from go1_qp_mpc_controller_tpu.utils import rotations
from go1_qp_mpc_controller_tpu.utils.precision import f32_matmuls

STATE_SIZE = 18
MEAS_SIZE = 28
# noise constants — A1BasicEKF.h:16-21
PROCESS_NOISE_PIMU = 0.01
PROCESS_NOISE_VIMU = 0.01
PROCESS_NOISE_PFOOT = 0.01
SENSOR_NOISE_PIMU_REL_FOOT = 0.001
SENSOR_NOISE_VIMU_REL_FOOT = 0.1
SENSOR_NOISE_ZFOOT = 0.001


class EKFResult(NamedTuple):
    x: jnp.ndarray                 # (18,) posterior state
    P: jnp.ndarray                 # (18, 18) posterior covariance
    estimated_contacts: jnp.ndarray  # (4,) float in [0, 1]


def _measurement_matrix(dtype):
    """Fixed C (A1BasicEKF.cpp:11-17)."""
    c = np.zeros((MEAS_SIZE, STATE_SIZE))
    for i in range(4):
        c[3 * i:3 * i + 3, 0:3] = -np.eye(3)
        c[3 * i:3 * i + 3, 6 + 3 * i:9 + 3 * i] = np.eye(3)
        c[12 + 3 * i:15 + 3 * i, 3:6] = np.eye(3)
        c[24 + i, 6 + 3 * i + 2] = 1.0
    return jnp.asarray(c, dtype)


def init_state(root_rot_mat, foot_pos_rel, dtype=None):
    """Initial (x, P) — A1BasicEKF::init_state (A1BasicEKF.cpp:55-68).

    Args:
      root_rot_mat: (3, 3).
      foot_pos_rel: (4, 3) body-frame FK foot positions.

    Returns:
      (x (18,), P (18, 18)).
    """
    dtype = dtype or foot_pos_rel.dtype
    root = jnp.asarray([0.0, 0.0, 0.09], dtype)
    feet_world = foot_pos_rel @ root_rot_mat.T + root
    x = jnp.concatenate([root, jnp.zeros((3,), dtype),
                         feet_world.reshape(-1)])
    return x, 3.0 * jnp.eye(STATE_SIZE, dtype=dtype)


@functools.lru_cache(maxsize=None)
def _schulz_sinv_fn():
    """Per-scenario Schulz innovation inverse with a batched TPU route.

    Under a caller's vmap on TPU the whole batch lands in ONE
    lane-batched VPU Pallas kernel (pallas_admm.schulz_inverse_lanes):
    for n = 28 << 128 the MXU path wastes a full padded systolic pass
    per batch element — the 12-step schedule measured ~6 ms of the
    9.4 ms EKF stage at batch 4096, vs 2.76 ms lane-batched. Off-TPU
    (CPU tests) the vmap rule falls back to the plain XLA loop; a
    dedicated interpreter-mode test pins the kernel's equivalence.

    NOTE: a 4-way block-diagonal packing of scenarios into 112x112
    matrices (Newton-Schulz is closed under block-diagonal structure)
    was measured SLOWER on TPU at batch 4096 (EKF stage marginal
    10.2 -> 12.1 ms): the assembly/unpack slices and custom_vmap
    boundary outweigh the 28 -> 128 tile-padding win on the MXU. The
    lane-batched layout sidesteps the tile padding entirely instead.

    Schedule lower edge 1e-5: the Jacobi-balanced innovation matrix
    measures cond ~1.3e3 on the controller presets (the swing-leg
    x1001 noise inflation lands in R's DIAGONAL, which the balance
    absorbs), so 1e-5 carries two decades of margin; an under-converged
    inverse degrades gracefully anyway (suboptimal Kalman gain, PSD
    preserved by the Joseph update) rather than destabilizing.
    """
    from go1_qp_mpc_controller_tpu.ops import admm as admm_mod
    coeffs = admm_mod._scaled_schulz_coeffs(1e-5)

    @jax.custom_batching.custom_vmap
    def sinv(s_mat):
        return admm_mod._schulz_inverse(s_mat, 0, coeffs=coeffs)

    @sinv.def_vmap
    def _rule(axis_size, in_batched, s_mat):
        if not in_batched[0]:
            s_mat = jnp.broadcast_to(s_mat, (axis_size,) + s_mat.shape)
        # Mosaic supports only 32-bit types: the f64 oracle-parity
        # configuration (x64 vmapped EKF) must take the XLA loop even
        # when the default backend is TPU (verified crash otherwise:
        # "NotImplementedError: 64-bit types are not supported")
        if (jax.default_backend() == "tpu"
                and s_mat.dtype == jnp.float32):
            from go1_qp_mpc_controller_tpu.ops import pallas_admm
            return pallas_admm.schulz_inverse_lanes(s_mat, coeffs), True
        return jax.vmap(
            lambda s: admm_mod._schulz_inverse(s, 0, coeffs=coeffs)
        )(s_mat), True

    return sinv


def _schulz_sinv(s_mat):
    """Schulz inverse of the (28, 28) innovation matrix (see
    :func:`_schulz_sinv_fn`)."""
    return _schulz_sinv_fn()(s_mat)


@f32_matmuls
def update_estimation(x, P, dt, root_rot_mat, imu_acc, imu_ang_vel,
                      foot_pos_rel, foot_vel_rel, foot_force, movement_mode,
                      assume_flat_ground=True, innovation_solver="schulz",
                      contact_force_norm=100.0):
    """One KF predict+update tick (A1BasicEKF.cpp:70-164).

    Args:
      x: (18,) prior state.
      P: (18, 18) prior covariance.
      dt: () step length.
      root_rot_mat: (3, 3) IMU orientation.
      imu_acc: (3,) body-frame accelerometer.
      imu_ang_vel: (3,) body-frame gyro.
      foot_pos_rel: (4, 3) FK foot positions (body frame).
      foot_vel_rel: (4, 3) FK foot velocities (body frame).
      foot_force: (4,) contact sensor forces.
      movement_mode: () int; 0 = stand (all feet assumed in contact).
      assume_flat_ground: static bool — trusts z=0 foot-height measurements.
      contact_force_norm: full-contact force scale for the contact
        probability estimate. The A1 stack normalizes by 100
        (A1BasicEKF.cpp:83); the Go1 RL/hardware stack's copy normalizes
        by 1000 for Go1 hardware force units (Go1BasicEKF.cpp:83) — with
        the A1 constant, Go1-scale readings (~500 N resting) would
        saturate every leg to "contact" and the swing-leg noise
        inflation would never engage.

    Returns:
      EKFResult.
    """
    dtype = x.dtype
    eye3 = jnp.eye(3, dtype=dtype)
    c_mat = _measurement_matrix(dtype)

    # contact estimate (A1BasicEKF.cpp:79-86; Go1BasicEKF.cpp:83)
    contacts_walk = jnp.clip(foot_force / contact_force_norm, 0.0, 1.0)
    est_c = jnp.where(movement_mode == 0, jnp.ones((4,), dtype),
                      contacts_walk.astype(dtype))
    infl = 1.0 + (1.0 - est_c) * 1e3    # (4,) swing-leg noise inflation

    # process matrices (A1BasicEKF.cpp:72-76)
    a_mat = jnp.eye(STATE_SIZE, dtype=dtype).at[0:3, 3:6].set(dt * eye3)
    u = root_rot_mat @ imu_acc + jnp.asarray([0.0, 0.0, -9.81], dtype)

    # process noise (A1BasicEKF.cpp:88-95)
    q_diag = jnp.concatenate([
        jnp.full((3,), PROCESS_NOISE_PIMU * dt / 20.0, dtype),
        jnp.full((3,), PROCESS_NOISE_VIMU * dt * 9.8 / 20.0, dtype),
        jnp.repeat(infl * dt * PROCESS_NOISE_PFOOT, 3),
    ])
    q_mat = jnp.diag(q_diag)

    # measurement noise (A1BasicEKF.cpp:27-31, 49-53, 98-106)
    r_fk = jnp.repeat(infl * SENSOR_NOISE_PIMU_REL_FOOT, 3)
    r_vel = jnp.repeat(infl * SENSOR_NOISE_VIMU_REL_FOOT, 3)
    if assume_flat_ground:
        r_z = infl * SENSOR_NOISE_ZFOOT
    else:
        r_z = jnp.full((4,), 1e5, dtype)
    r_mat = jnp.diag(jnp.concatenate([r_fk, r_vel, r_z]))

    # predict (A1BasicEKF.cpp:110-112); B u only feeds velocity rows.
    xbar = a_mat @ x
    xbar = xbar.at[3:6].add(dt * u)
    pbar = a_mat @ P @ a_mat.T + q_mat

    # measurements (A1BasicEKF.cpp:115-128)
    fk_world = foot_pos_rel @ root_rot_mat.T                    # (4, 3)
    omega_skew = rotations.skew(imu_ang_vel)
    leg_v = -foot_vel_rel - foot_pos_rel @ omega_skew.T         # (4, 3)
    vel_meas = ((1.0 - est_c)[:, None] * x[3:6]
                + est_c[:, None] * (leg_v @ root_rot_mat.T))
    height_meas = (1.0 - est_c) * (x[2] + foot_pos_rel[:, 2])
    y = jnp.concatenate([fk_world.reshape(-1), vel_meas.reshape(-1),
                         height_meas])
    yhat = c_mat @ xbar

    # innovation solve (replaces fullPivHouseholderQr,
    # A1BasicEKF.cpp:130-140). solver="schulz" (default) inverts the
    # balanced SPD innovation matrix with a scaled Newton-Schulz
    # schedule — pure matmuls, the TPU-native path (a batched 28x28
    # Cholesky + triangular solves serializes: measured ~15 ms of the
    # 93 ms controller tick at batch 4096 came from this one solve);
    # "chol" keeps the exact factorization for reference checks.
    s_mat = c_mat @ pbar @ c_mat.T + r_mat
    s_mat = 0.5 * (s_mat + s_mat.T)
    err = y - yhat

    if innovation_solver == "schulz":
        sinv = _schulz_sinv(s_mat)
        k_gain = pbar @ c_mat.T @ sinv                    # (18, 28)
        x_new = xbar + k_gain @ err
        # Joseph-form covariance: PSD for ANY gain, which makes the
        # update robust to the ~1e-5 Schulz inverse residual — the
        # reference's simple form P - P C' S^-1 C P (A1BasicEKF.cpp:140)
        # amplifies that residual into an INDEFINITE P (measured min eig
        # -9e-4 after one update; the next innovation then NaNs)
        ikc = jnp.eye(STATE_SIZE, dtype=dtype) - k_gain @ c_mat
        p_new = ikc @ pbar @ ikc.T + k_gain @ r_mat @ k_gain.T
    else:
        chol = jnp.linalg.cholesky(s_mat)

        def s_solve(rhs):
            import jax.scipy.linalg as jsl
            w = jsl.solve_triangular(chol, rhs, lower=True)
            return jsl.solve_triangular(chol.T, w, lower=False)

        serr = s_solve(err)
        x_new = xbar + pbar @ (c_mat.T @ serr)
        sc = s_solve(c_mat)
        p_new = pbar - pbar @ c_mat.T @ sc @ pbar
    p_new = 0.5 * (p_new + p_new.T)

    # xy-position covariance surgery (A1BasicEKF.cpp:143-147), branchless
    det2 = (p_new[0, 0] * p_new[1, 1] - p_new[0, 1] * p_new[1, 0])
    shrink = det2 > 1e-6
    mask_off = jnp.ones((STATE_SIZE, STATE_SIZE), dtype)
    mask_off = mask_off.at[0:2, 2:].set(0.0).at[2:, 0:2].set(0.0)
    scale = jnp.ones((STATE_SIZE, STATE_SIZE), dtype)
    scale = scale.at[0:2, 0:2].set(0.1)
    p_surgery = p_new * mask_off * scale
    p_new = jnp.where(shrink, p_surgery, p_new)

    return EKFResult(x=x_new, P=p_new, estimated_contacts=est_c)
