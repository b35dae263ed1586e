"""SE(3) / Sim(3) Lie-group operations, batched and jit-safe.

The tangent-vector convention follows the reference optimizer
(/root/reference/reconstruct/loss_utils.py:129-233): a pose increment is
ordered ``[translation(3), rotation(3)]`` for se(3) and
``[translation(3), rotation(3), log-scale(1)]`` for sim(3), applied as a
*left* perturbation ``T <- exp(dx) @ T``.

All functions are pure, shape-polymorphic over leading batch dimensions
where documented, and safe under jit/grad: the small-angle branches are
expressed with Taylor expansions selected by `jnp.where` on *sanitized*
inputs so no NaN can leak through either branch of the select (the usual
`where(cond, f(x), g(x))` gradient trap).

Reference parity targets:
  * exp_se3 / exp_sim3 — loss_utils.py:129-163, 188-233
  * point-to-pose Jacobians (left perturbation) — loss_utils.py:107-126, 166-185
  * Sim(3) <-> s,R,t factoring (scale = det(R)^(1/3)) — MapObject.cc:27-53
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of (..., 3) vectors -> (..., 3, 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `hat`: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_coeffs(theta_sq: jnp.ndarray):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3) robustly.

    Taylor series are used below theta < 0.1 — NOT merely near zero: the
    exact forms cancel catastrophically in f32 well before underflow
    ((t - sin t) at t = 1e-3 is 1.7e-10 against 6e-11 rounding in sin t,
    a 36% error), which put ~100% noise on the small-rotation
    rotation/translation coupling Jacobians and capped pose-graph
    convergence. At the 0.1 switch point the exact forms are accurate to
    ~1e-5 and the 3-term series to ~2e-10; both branches are always
    finite so gradients stay clean.
    """
    small = theta_sq < 0.01
    # sanitize to avoid sqrt(0) grad NaN in the unused branch
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    a_big = jnp.sin(theta) / theta
    b_big = (1.0 - jnp.cos(theta)) / safe_sq
    c_big = (theta - jnp.sin(theta)) / (safe_sq * theta)
    t2 = theta_sq
    t4 = theta_sq * theta_sq
    a_small = 1.0 - t2 / 6.0 + t4 / 120.0
    b_small = 0.5 - t2 / 24.0 + t4 / 720.0
    c_small = 1.0 / 6.0 - t2 / 120.0 + t4 / 5040.0
    return (
        jnp.where(small, a_small, a_big),
        jnp.where(small, b_small, b_big),
        jnp.where(small, c_small, c_big),
    )


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula: (..., 3) rotation vector -> (..., 3, 3)."""
    theta_sq = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A[..., None, None] * W + B[..., None, None] * W2


def so3_left_jacobian(w: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO(3): exp_se3 translation is J @ v."""
    theta_sq = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_coeffs(theta_sq)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B[..., None, None] * W + C[..., None, None] * W2


def exp_se3(x: jnp.ndarray) -> jnp.ndarray:
    """se(3) -> SE(3). x is (..., 6) ordered [v, w]; returns (..., 4, 4)."""
    v, w = x[..., :3], x[..., 3:6]
    R = exp_so3(w)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(w), v)
    return rt_to_mat44(R, t)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) -> so(3) rotation vector, (..., 3, 3) -> (..., 3).

    Uses the trace formula with a Taylor-guarded theta/sin(theta) factor.
    Accurate away from theta == pi (SLAM increments stay well inside).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    sin_theta = jnp.sin(theta)
    small = jnp.abs(sin_theta) < 1e-6
    factor = jnp.where(
        small,
        0.5 + theta * theta / 12.0,
        theta / jnp.where(small, jnp.ones_like(sin_theta), 2.0 * sin_theta),
    )
    return factor[..., None] * vee(R - jnp.swapaxes(R, -1, -2))


def _so3_left_jacobian_inv(w: jnp.ndarray) -> jnp.ndarray:
    theta_sq = jnp.sum(w * w, axis=-1)
    # series below theta = 0.5: (1 - x cot x) cancels in f32 for small x
    # (same failure mode as _sinc_coeffs; see its docstring)
    small = theta_sq < 0.25
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    half = 0.5 * theta
    cot_term_big = (1.0 - half * jnp.cos(half) / jnp.sin(half)) / safe_sq
    cot_series = (
        1.0 / 12.0 + theta_sq / 720.0 + theta_sq * theta_sq / 30240.0
    )
    cot_term = jnp.where(small, cot_series, cot_term_big)
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot_term[..., None, None] * W2


def log_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) -> (..., 6) tangent [v, w] with exp_se3(log_se3(T)) == T."""
    w = log_so3(T[..., :3, :3])
    v = jnp.einsum("...ij,...j->...i", _so3_left_jacobian_inv(w), T[..., :3, 3])
    return jnp.concatenate([v, w], axis=-1)


def sim3_w_matrix(w: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """The Sim(3) 'W' matrix coupling translation with rotation and scale.

    exp_sim3 translation = W @ v, mirroring the closed form of the
    reference (loss_utils.py:219-227) with series-guarded coefficients.
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    small_t = theta_sq < 1e-8
    safe_sq = jnp.where(small_t, jnp.ones_like(theta_sq), theta_sq)
    theta = jnp.sqrt(safe_sq)
    es = jnp.exp(s)
    small_s = jnp.abs(s) < 1e-6
    safe_s = jnp.where(small_s, jnp.ones_like(s), s)
    # C = (e^s - 1)/s, Taylor: 1 + s/2 + s^2/6
    C = jnp.where(small_s, 1.0 + s / 2.0 + s * s / 6.0, (es - 1.0) / safe_s)

    a = es * jnp.sin(theta)
    b = es * jnp.cos(theta)
    denom = s * s + safe_sq
    # coefficients multiplying W/theta and W^2/theta^2
    k1_big = (a * s + (1.0 - b) * theta) / (denom * theta)
    k2_big = (C - ((b - 1.0) * s + a * theta) / denom) / safe_sq
    # theta -> 0 limits (keep s dependence):
    #   k1 -> (s e^s - e^s + 1)/s^2        (s-Taylor: 1/2 + s/3)
    #   k2 -> (e^s - 1 - s e^s + s^2 e^s/2)/s^3   (s-Taylor: 1/6 + s/8)
    k1_small = jnp.where(small_s, 0.5 + s / 3.0, (s * es - es + 1.0) / (safe_s * safe_s))
    k2_small = jnp.where(
        small_s,
        1.0 / 6.0 + s / 8.0,
        (es - 1.0 - safe_s * es + safe_s * safe_s * es * 0.5) / (safe_s**3),
    )
    k1 = jnp.where(small_t, k1_small, k1_big)
    k2 = jnp.where(small_t, k2_small, k2_big)

    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    W_exact = (
        C[..., None, None] * eye + k1[..., None, None] * W
        + k2[..., None, None] * W2
    )

    # Small-generator region: the closed form cancels catastrophically in
    # f32 (see _sinc_coeffs), so evaluate the defining matrix series
    # W = sum_n M^n/(n+1)!, M = s I + hat(w), directly — 5 terms give
    # ~2e-10 truncation at the 0.1 switch point, and matrix products of
    # O(0.1) entries carry no cancellation.
    M = s[..., None, None] * eye + W
    M2 = M @ M
    M3 = M2 @ M
    M4 = M2 @ M2
    M5 = M4 @ M
    W_series = (
        eye + M / 2.0 + M2 / 6.0 + M3 / 24.0 + M4 / 120.0 + M5 / 720.0
    )
    use_series = (theta_sq + s * s) < 0.01
    return jnp.where(use_series[..., None, None], W_series, W_exact)


def exp_sim3(x: jnp.ndarray) -> jnp.ndarray:
    """sim(3) -> Sim(3) as a 4x4 with sR in the upper-left block.

    x is (..., 7) ordered [v(3), w(3), s(1)]. Matches the reference's
    closed form (loss_utils.py:188-233).
    """
    v, w, s = x[..., :3], x[..., 3:6], x[..., 6]
    R = exp_so3(w)
    sR = jnp.exp(s)[..., None, None] * R
    t = jnp.einsum("...ij,...j->...i", sim3_w_matrix(w, s), v)
    return rt_to_mat44(sR, t)


def log_sim3(T: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) 4x4 (sR upper-left) -> (..., 7) tangent [v, w, s]."""
    s, R, t = split_sim3(T)
    log_s = jnp.log(s)
    w = log_so3(R)
    Winv = jnp.linalg.inv(sim3_w_matrix(w, log_s))
    v = jnp.einsum("...ij,...j->...i", Winv, t)
    return jnp.concatenate([v, w, log_s[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# 4x4 helpers


def rt_to_mat44(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4) homogeneous."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    return T.at[..., 3, 3].set(1.0)


def inverse_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of an SE(3) 4x4 (R orthonormal)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat44(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def inverse_sim3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a Sim(3) 4x4 with sR upper-left block."""
    sR = T[..., :3, :3]
    t = T[..., :3, 3]
    s = jnp.linalg.det(sR) ** (1.0 / 3.0)
    R = sR / s[..., None, None]
    inv_sR = jnp.swapaxes(R, -1, -2) / s[..., None, None]
    return rt_to_mat44(inv_sR, -jnp.einsum("...ij,...j->...i", inv_sR, t))


def split_sim3(T: jnp.ndarray):
    """Factor a Sim(3) 4x4 into (scale, R, t); scale = det(sR)^(1/3).

    Mirrors MapObject's dual Sim3/SE3 representation (MapObject.cc:27-53).
    """
    sR = T[..., :3, :3]
    s = jnp.linalg.det(sR) ** (1.0 / 3.0)
    return s, sR / s[..., None, None], T[..., :3, 3]


def transform_points(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to (..., N, 3) -> (..., N, 3)."""
    return jnp.einsum("...ij,...nj->...ni", T[..., :3, :3], pts) + T[..., None, :3, 3]


# ---------------------------------------------------------------------------
# Point-to-pose Jacobians (left perturbation), reference loss_utils.py:107-185


def points_to_pose_jacobian_se3(points: jnp.ndarray) -> jnp.ndarray:
    """d(exp(dx) y)/d dx at dx=0 for already-transformed points y.

    points: (..., N, 3) -> (..., N, 3, 6) with columns [I | -hat(y)].
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), points.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -hat(points)], axis=-1)


def points_to_pose_jacobian_sim3(points: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) variant: (..., N, 3) -> (..., N, 3, 7), [I | -hat(y) | y]."""
    eye = jnp.broadcast_to(jnp.eye(3, dtype=points.dtype), points.shape[:-1] + (3, 3))
    return jnp.concatenate([eye, -hat(points), points[..., None]], axis=-1)


def adjoint_se3(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint in [v, w] ordering: (..., 4, 4) -> (..., 6, 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    top = jnp.concatenate([R, hat(t) @ R], axis=-1)
    bottom = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
