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
import numpy as np

from .matcher import BIG, hamming_matrix, TH_HIGH, TH_LOW

_SAD_HALF = 5          # 11x11 window
_SHIFTS = 5            # +/- shift range for subpixel refinement
# row-slant hypotheses (px/row) for the SAD: slanted surfaces (ground,
# walls at an angle) have a disparity GRADIENT across the window —
# ~bf/(fx*h_cam) ~ 0.33 px/row for an automotive ground plane — which
# decorrelates a rigid window; evaluating the SAD under a few slants and
# keeping the best recovers those matches (the reference's rigid window
# silently loses most ground stereo matches the same way)
_SLANTS = (-0.4, 0.0, 0.4)
_SLANT_PAD = 2         # max |round(slant * dy)| over the window


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
    img_l = img_l.astype(jnp.float32)   # uint8 frames accepted (see orb.extract)
    img_r = img_r.astype(jnp.float32)
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
    # absolute descriptor gate (the reference's thOrbDist =
    # (TH_HIGH+TH_LOW)/2, Frame.cc:520); no ratio test — on self-similar
    # texture (ground, road) a ratio gate starves exactly the near
    # structure that anchors camera y/z, and the SAD median culling
    # below is the outlier filter the reference relies on instead
    ok = best <= (TH_HIGH + TH_LOW) // 2

    # subpixel SAD refinement around the matched column (Frame.cc:540-610),
    # as ONE batched gather per image + an unrolled sliding-window SAD —
    # per-keypoint dynamic slices vmapped poorly on TPU (gather storms)
    H, W = img_l.shape
    size = 2 * _SAD_HALF + 1                                  # 11
    pad = _SHIFTS + _SLANT_PAD
    # octave-correct windows (Frame.cc:540-610 samples the keypoint's
    # PYRAMID LEVEL image): the TPU fixed-shape equivalent dilates the
    # tap spacing by the keypoint's octave scale on the level-0 image —
    # the window covers the same physical footprint the reference's
    # octave window does, and the disparity search/subpixel step run in
    # octave pixels (converted back below). Level-0 keypoints reduce to
    # the exact dense window.
    s_oct = jnp.sqrt(feats_l["sigma2"]).astype(jnp.float32)   # (N,)
    reach = jnp.ceil((_SAD_HALF + pad) * s_oct).astype(jnp.int32)
    yl_i = jnp.clip(yl.astype(jnp.int32), reach, H - reach - 1)
    xl_i = jnp.clip(xl.astype(jnp.int32), reach, W - reach - 1)
    xr_i = jnp.clip(xr[best_idx].astype(jnp.int32), reach, W - reach - 1)
    dy = jnp.arange(-_SAD_HALF, _SAD_HALF + 1)
    dxl = jnp.arange(-_SAD_HALF, _SAD_HALF + 1)
    dxw = jnp.arange(-_SAD_HALF - pad, _SAD_HALF + pad + 1)
    dy_d = jnp.round(dy[None, :] * s_oct[:, None]).astype(jnp.int32)   # (N, 11)
    dxl_d = jnp.round(dxl[None, :] * s_oct[:, None]).astype(jnp.int32)
    dxw_d = jnp.round(dxw[None, :] * s_oct[:, None]).astype(jnp.int32)
    rows = yl_i[:, None, None] + dy_d[:, :, None]             # (N, 11, 1)
    patch_l = img_l[rows, xl_i[:, None, None] + dxl_d[:, None, :]]    # (N, 11, 11)
    patch_r = img_r[rows, xr_i[:, None, None] + dxw_d[:, None, :]]    # (N, 11, 11+2*pad)
    # per-row sliding SADs once, then compose shift x slant from them
    n_j = 2 * pad + 1
    rowsad = jnp.stack(
        [
            jnp.sum(jnp.abs(patch_l - patch_r[:, :, j : j + size]), axis=2)
            for j in range(n_j)
        ],
        axis=-1,
    )                                                          # (N, 11, n_j)
    dy_np = np.arange(-_SAD_HALF, _SAD_HALF + 1)
    per_slant = []
    for slope in _SLANTS:
        offs = np.clip(
            np.round(slope * dy_np).astype(np.int64), -_SLANT_PAD, _SLANT_PAD
        )
        s = jnp.stack(
            [
                sum(
                    rowsad[:, r, k + _SLANT_PAD + int(offs[r])]
                    for r in range(size)
                )
                for k in range(2 * _SHIFTS + 1)
            ],
            axis=-1,
        )
        per_slant.append(s)
    sads = jnp.minimum(
        jnp.minimum(per_slant[0], per_slant[1]), per_slant[2]
    )                                                          # (N, 11)
    k = jnp.argmin(sads, axis=-1)
    # a minimum AT the search boundary means the true optimum is outside
    # the window — the parabola extrapolates garbage disparity; reject,
    # as the reference does (Frame.cc:592-594 "bestincR==-L || ==L")
    ok = ok & (k > 0) & (k < 2 * _SHIFTS)
    k_in = jnp.clip(k, 1, 2 * _SHIFTS - 1)
    take = lambda off: jnp.take_along_axis(
        sads, (k_in + off)[:, None], axis=1
    )[:, 0]
    sm1, s0, sp1 = take(-1), take(0), take(1)
    denom = sm1 + sp1 - 2.0 * s0
    delta = jnp.where(jnp.abs(denom) > 1e-6, (sm1 - sp1) / (2.0 * denom), 0.0)
    # |delta| > 1 means the parabola disagrees with the discrete argmin —
    # an unreliable fit (reference rejects: Frame.cc:602-604)
    ok = ok & (jnp.abs(delta) <= 1.0)
    delta = jnp.clip(delta, -1.0, 1.0)
    # median-SAD outlier culling (Frame.cc:614-640): wrong matches have
    # anomalously poor photometric agreement even when descriptors agree
    sad_best = s0
    valid_sad = jnp.where(ok, sad_best, jnp.nan)
    med = jnp.nanmedian(valid_sad)
    ok = ok & (sad_best <= 1.5 * 1.4 * jnp.where(jnp.isnan(med), jnp.inf, med))
    # shift and subpixel delta are in OCTAVE pixels; convert to level-0
    # (the reference's deltaR * scale factor, Frame.cc:606-610)
    u_right = (
        xr[best_idx]
        + ((k_in - _SHIFTS).astype(jnp.float32) + delta) * s_oct
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
