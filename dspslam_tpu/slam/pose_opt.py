"""Motion-only pose optimization (frame-to-map reprojection GN).

Replaces Optimizer::PoseOptimization (/root/reference/src/Optimizer.cc:
239-451, g2o Levenberg-Marquardt over one SE(3) vertex): given a frame's
matched 3D map points and keypoint observations, refine T_cw. The
reference runs 4 rounds of 10 iterations, re-classifying outliers
between rounds at chi2 thresholds (5.991 mono / 7.815 stereo) with Huber
kernels of the same deltas; inlier/outlier state is carried as a mask
here instead of toggling graph edges.

Everything is fixed-shape: N observation slots with validity masks;
mono and stereo observations share the 3-residual layout (the third
component masked off for mono).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie

def _es(*args, **kw):
    # full-f32 einsum: GN normal equations are precision-critical on TPU
    return jnp.einsum(*args, precision=jax.lax.Precision.HIGHEST, **kw)


CHI2_MONO = 5.991
CHI2_STEREO = 7.815


def project_stereo(
    T_cw: jnp.ndarray, pts_w: jnp.ndarray, fx, fy, cx, cy, bf
) -> jnp.ndarray:
    """World points -> (u, v, u_right) pixel triplets. (N, 3)."""
    pc = lie.transform_points(T_cw, pts_w)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.maximum(z, 1e-6)
    u = fx * x / zs + cx
    v = fy * y / zs + cy
    ur = u - bf / zs
    return jnp.stack([u, v, ur], axis=-1)


def _residuals_and_jac(T_cw, pts_w, obs, stereo_mask, fx, fy, cx, cy, bf):
    """Per-observation residual (N, 3) and Jacobian wrt se(3) (N, 3, 6).

    obs: (N, 3) [u, v, u_right]; stereo_mask selects the third row.
    Left-perturbation convention: T <- exp(dx) T, dx = [v, w].
    """
    pc = lie.transform_points(T_cw, pts_w)                  # (N, 3)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.maximum(z, 1e-6)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z

    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    ur = u - bf * inv_z
    pred = jnp.stack([u, v, ur], axis=-1)
    res = pred - obs                                        # (N, 3)
    res = res.at[:, 2].multiply(stereo_mask)

    # d(u,v,ur)/d(pc)
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zero, zero, bf * inv_z2], axis=-1)
    dpix_dpc = jnp.stack([du, dv, dur], axis=-2)            # (N, 3, 3)
    dpc_dxi = lie.points_to_pose_jacobian_se3(pc)           # (N, 3, 6)
    J = dpix_dpc @ dpc_dxi                                  # (N, 3, 6)
    J = J.at[:, 2, :].multiply(stereo_mask[:, None])
    return res, J


@partial(jax.jit, static_argnums=(8, 9))
def optimize_pose(
    T_cw_init: jnp.ndarray,   # (4, 4)
    pts_w: jnp.ndarray,       # (N, 3) matched map points
    obs: jnp.ndarray,         # (N, 3) [u, v, u_right] (u_right ignored if mono)
    inv_sigma2: jnp.ndarray,  # (N,) per-observation information scale
    valid: jnp.ndarray,       # (N,) 1.0 live observation
    stereo_mask: jnp.ndarray, # (N,) 1.0 where u_right is observed
    intrinsics: jnp.ndarray,  # (5,) [fx, fy, cx, cy, bf]
    damping: float = 1e-3,
    rounds_iters: tuple = (4, 10),
    chi2_anneal: tuple = (1.0, 1.0, 1.0, 1.0),
):
    """Returns (T_cw, inlier_mask (N,), n_inliers). 4x10 GN with per-round
    chi2 outlier reclassification, mirroring the reference schedule.
    chi2_anneal optionally scales the chi2 threshold per round
    (first->last); the default is the reference's constant threshold."""
    fx, fy, cx, cy, bf = [intrinsics[i] for i in range(5)]
    rounds, iters = rounds_iters

    chi2_base = jnp.where(stereo_mask > 0, CHI2_STEREO, CHI2_MONO)  # (N,)
    anneal = jnp.asarray(
        tuple(chi2_anneal) + (1.0,) * max(0, rounds - len(chi2_anneal)),
        jnp.float32,
    )

    def gn_iters(T, inlier, chi2_th):
        def body(_, T):
            res, J = _residuals_and_jac(
                T, pts_w, obs, stereo_mask, fx, fy, cx, cy, bf
            )
            w = inlier * valid * inv_sigma2                      # (N,)
            # Huber on the weighted chi2
            chi2 = jnp.sum(res * res, axis=-1) * inv_sigma2
            delta2 = chi2_th
            hub = jnp.where(
                chi2 <= delta2, 1.0, jnp.sqrt(delta2 / jnp.maximum(chi2, 1e-12))
            )
            w = w * hub
            Jw = J * w[:, None, None]
            H = _es("nij,nik->jk", Jw, J) + damping * jnp.eye(6)
            b = -_es("nij,ni->j", Jw, res)
            dx = jnp.linalg.solve(H, b)
            return lie.exp_se3(dx) @ T

        return jax.lax.fori_loop(0, iters, body, T)

    def round_body(r, state):
        T, inlier = state
        chi2_th = chi2_base * anneal[r]
        T = gn_iters(T, inlier, chi2_th)
        res, _ = _residuals_and_jac(T, pts_w, obs, stereo_mask, fx, fy, cx, cy, bf)
        chi2 = jnp.sum(res * res, axis=-1) * inv_sigma2
        inlier = (chi2 <= chi2_th).astype(jnp.float32) * valid
        return T, inlier

    T, inlier = jax.lax.fori_loop(
        0, rounds, round_body, (T_cw_init, valid)
    )
    return T, inlier, jnp.sum(inlier)
