"""Stereo keypoint matching along epipolar rows.

Replaces Frame::ComputeStereoMatches (/root/reference/src/Frame.cc:
467-643): rectified stereo means a left keypoint's match lies on (nearly)
the same image row in the right image. Candidates are gated by row band
and disparity range, scored by descriptor Hamming distance, then refined
to sub-pixel with an 11x11 SAD parabola fit — all as one masked dense
program instead of per-row candidate lists.

Depth = bf / disparity; RGBD input instead synthesizes the virtual right
coordinate uR = u - bf/depth (Frame.cc:644-668).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .matcher import BIG, hamming_matrix, TH_HIGH

_SAD_HALF = 5          # 11x11 window
_SHIFTS = 5            # +/- shift range for subpixel refinement


def _gather_patch_row(img, x, y, half_w):
    """(2*half_w+1, 2*half_w+1) patch centered at integer (x, y), clamped."""
    H, W = img.shape
    size = 2 * half_w + 1
    y0 = jnp.clip(y - half_w, 0, H - size)
    x0 = jnp.clip(x - half_w, 0, W - size)
    return jax.lax.dynamic_slice(img, (y0, x0), (size, size))


@partial(jax.jit, static_argnums=())
def stereo_match(
    feats_l: dict,
    feats_r: dict,
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    bf: jnp.ndarray,
    max_disparity: jnp.ndarray,
    row_slack: float = 2.0,
):
    """Per-left-keypoint disparity/depth.

    Returns dict(u_right (N,), depth (N,), valid (N,)) with -1 sentinels.
    Row band scales with the right keypoint's pyramid level, mirroring the
    reference's vector-of-rows candidate build (Frame.cc:481-500).
    """
    xl, yl = feats_l["xy"][:, 0], feats_l["xy"][:, 1]
    xr, yr = feats_r["xy"][:, 0], feats_r["xy"][:, 1]

    dist = hamming_matrix(feats_l["desc"], feats_r["desc"])   # (N, M)
    sigma_r = jnp.sqrt(feats_r["sigma2"])
    band = row_slack * sigma_r[None, :]
    disp = xl[:, None] - xr[None, :]
    cand = (
        (jnp.abs(yl[:, None] - yr[None, :]) <= band)
        & (disp >= -1.0)
        & (disp <= max_disparity)
        & (feats_l["valid"][:, None] > 0)
        & (feats_r["valid"][None, :] > 0)
        & (jnp.abs(feats_l["level"][:, None] - feats_r["level"][None, :]) <= 1)
    )
    d = jnp.where(cand, dist, BIG)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    ok = best <= TH_HIGH
    # uniqueness: reject ambiguous rows where the runner-up is nearly as
    # good (spurious matches otherwise mint wildly wrong depths)
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second = jnp.min(d2, axis=1)
    ok = ok & (best.astype(jnp.float32) < 0.8 * second.astype(jnp.float32))

    # subpixel SAD refinement around the matched column (Frame.cc:540-610),
    # as ONE batched gather per image + an unrolled sliding-window SAD —
    # per-keypoint dynamic slices vmapped poorly on TPU (gather storms)
    H, W = img_l.shape
    size = 2 * _SAD_HALF + 1                                  # 11
    wide = size + 2 * _SHIFTS                                 # 21
    yl_i = jnp.clip(yl.astype(jnp.int32), _SAD_HALF, H - _SAD_HALF - 1)
    xl_i = jnp.clip(xl.astype(jnp.int32), _SAD_HALF, W - _SAD_HALF - 1)
    xr_i = jnp.clip(
        xr[best_idx].astype(jnp.int32), _SAD_HALF + _SHIFTS,
        W - _SAD_HALF - _SHIFTS - 1,
    )
    dy = jnp.arange(-_SAD_HALF, _SAD_HALF + 1)
    dxl = jnp.arange(-_SAD_HALF, _SAD_HALF + 1)
    dxw = jnp.arange(-_SAD_HALF - _SHIFTS, _SAD_HALF + _SHIFTS + 1)
    rows = yl_i[:, None, None] + dy[None, :, None]            # (N, 11, 1)
    patch_l = img_l[rows, xl_i[:, None, None] + dxl[None, None, :]]   # (N, 11, 11)
    patch_r = img_r[rows, xr_i[:, None, None] + dxw[None, None, :]]   # (N, 11, 21)
    sads = jnp.stack(
        [
            jnp.sum(jnp.abs(patch_l - patch_r[:, :, s : s + size]), axis=(1, 2))
            for s in range(2 * _SHIFTS + 1)
        ],
        axis=-1,
    )                                                          # (N, 11)
    k = jnp.argmin(sads, axis=-1)
    k_in = jnp.clip(k, 1, 2 * _SHIFTS - 1)
    take = lambda off: jnp.take_along_axis(
        sads, (k_in + off)[:, None], axis=1
    )[:, 0]
    sm1, s0, sp1 = take(-1), take(0), take(1)
    denom = sm1 + sp1 - 2.0 * s0
    delta = jnp.where(jnp.abs(denom) > 1e-6, (sm1 - sp1) / (2.0 * denom), 0.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    u_right = (
        xr[best_idx] + (k_in - _SHIFTS).astype(jnp.float32) + delta
    )
    disparity = xl - u_right
    ok = ok & (disparity > 0.01) & (disparity <= max_disparity)
    depth = jnp.where(ok, bf / jnp.maximum(disparity, 0.01), -1.0)
    u_right = jnp.where(ok, u_right, -1.0)
    return {"u_right": u_right, "depth": depth, "valid": ok.astype(jnp.float32)}


def depth_to_virtual_right(u: jnp.ndarray, depth: jnp.ndarray, bf: float):
    """RGBD: virtual right coordinate from measured depth (Frame.cc:644-668)."""
    valid = depth > 0
    u_right = jnp.where(valid, u - bf / jnp.maximum(depth, 1e-6), -1.0)
    return u_right, valid.astype(jnp.float32)
