"""Batched ORB descriptor matching.

Replaces the reference's six-mode ORBmatcher (/root/reference/src/
ORBmatcher.cc) with masked dense tensor ops: one (N, M) Hamming-distance
matrix (XOR + population count — the SSE popcount loop of
ORBmatcher.cc:1647-1664 becomes `lax.population_count`), over which the
different search modes are just different candidate masks:

* brute-force / BoW-bucketed matching -> full or bucket-masked matrix;
* window / projection search -> spatial-radius candidate mask;
* initialization matching -> window mask + mutual-best + ratio test;
* rotation-consistency -> 30-bin orientation histogram, keep top-3 bins
  (ORBmatcher.cc:1601-1645).

Thresholds TH_HIGH=100 / TH_LOW=50 and the 0.9 best/second ratio follow
the reference (ORBmatcher.cc:35-40).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

TH_HIGH = 100
TH_LOW = 50
HISTO_BINS = 30
BIG = jnp.int32(1 << 20)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) x (M, 8) packed uint32 descriptors -> (N, M) int32 distances."""
    x = jnp.bitwise_xor(desc_a[:, None, :], desc_b[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def masked_match(
    dist: jnp.ndarray,
    cand_mask: jnp.ndarray,
    max_dist: int = TH_LOW,
    ratio: float | None = 0.9,
    mutual: bool = True,
):
    """Best-candidate matching over a masked distance matrix.

    dist: (N, M); cand_mask: (N, M) bool of allowed pairs.
    Returns (match_idx (N,) int32 into M with -1 for unmatched,
             match_dist (N,) int32).
    """
    d = jnp.where(cand_mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    ok = best <= max_dist
    if ratio is not None:
        d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
        second = jnp.min(d2, axis=1)
        ok = ok & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if mutual:
        rev_best = jnp.argmin(d, axis=0)                     # (M,)
        ok = ok & (rev_best[best_idx] == jnp.arange(d.shape[0]))
    return jnp.where(ok, best_idx, -1).astype(jnp.int32), best


def window_mask(
    xy_a: jnp.ndarray, xy_b: jnp.ndarray, radius: float,
    valid_a: jnp.ndarray, valid_b: jnp.ndarray,
    level_a: jnp.ndarray | None = None, level_b: jnp.ndarray | None = None,
    level_slack: int = 1,
) -> jnp.ndarray:
    """(N, M) candidate mask: b within `radius` px of a (projection/window
    search, ORBmatcher.cc:45-157 / 1328-1470), optional pyramid-level gate."""
    d2 = jnp.sum((xy_a[:, None, :] - xy_b[None, :, :]) ** 2, axis=-1)
    mask = d2 <= radius * radius
    mask = mask & (valid_a[:, None] > 0) & (valid_b[None, :] > 0)
    if level_a is not None and level_b is not None:
        dl = jnp.abs(level_a[:, None] - level_b[None, :])
        mask = mask & (dl <= level_slack)
    return mask


def rotation_consistency(
    angles_a: jnp.ndarray, angles_b: jnp.ndarray, match_idx: jnp.ndarray
) -> jnp.ndarray:
    """Keep matches whose orientation delta falls in the 3 dominant
    30-bin histogram bins (ORBmatcher.cc:1601-1645). Returns filtered idx."""
    matched = match_idx >= 0
    safe_idx = jnp.maximum(match_idx, 0)
    delta = angles_a - angles_b[safe_idx]
    delta = jnp.mod(delta, 2 * jnp.pi)
    bins = jnp.clip(
        (delta / (2 * jnp.pi) * HISTO_BINS).astype(jnp.int32), 0, HISTO_BINS - 1
    )
    hist = jnp.zeros((HISTO_BINS,), jnp.int32).at[bins].add(
        matched.astype(jnp.int32)
    )
    top3 = jax.lax.top_k(hist, 3)[0]
    keep_bin = hist >= jnp.maximum(top3[2], 1)
    keep = matched & keep_bin[bins]
    return jnp.where(keep, match_idx, -1)


@jax.jit
def match_features(
    feats_a: dict, feats_b: dict, max_dist: int = TH_LOW, ratio: float = 0.9
):
    """Full-frame brute-force matching with mutual-best + rotation check.

    feats_*: dicts from frontend.orb.extract. Returns (idx (N,), dist (N,)).
    """
    dist = hamming_matrix(feats_a["desc"], feats_b["desc"])
    cand = (feats_a["valid"][:, None] > 0) & (feats_b["valid"][None, :] > 0)
    idx, d = masked_match(dist, cand, max_dist, ratio, mutual=True)
    idx = rotation_consistency(feats_a["angle"], feats_b["angle"], idx)
    return idx, d


@partial(jax.jit, static_argnums=())
def match_in_windows(
    feats_a: dict, feats_b: dict, radius: float, max_dist: int = TH_LOW,
    ratio: float = 0.9,
):
    """Window-constrained matching (monocular initialization,
    ORBmatcher.cc:405-520): candidates within `radius` px."""
    dist = hamming_matrix(feats_a["desc"], feats_b["desc"])
    cand = window_mask(
        feats_a["xy"], feats_b["xy"], radius,
        feats_a["valid"], feats_b["valid"],
        feats_a["level"], feats_b["level"],
    )
    idx, d = masked_match(dist, cand, max_dist, ratio, mutual=True)
    idx = rotation_consistency(feats_a["angle"], feats_b["angle"], idx)
    return idx, d


@partial(jax.jit, static_argnames=("radius", "max_dist", "ratio", "level_slack"))
def match_by_projection(
    proj_xy: jnp.ndarray,      # (N, 2) projected map-point pixels
    proj_valid: jnp.ndarray,   # (N,)
    proj_desc: jnp.ndarray,    # (N, 8) map-point descriptors
    proj_level: jnp.ndarray,   # (N,) predicted octave
    feats: dict,               # frame features
    radius: float,
    max_dist: int = TH_HIGH,
    ratio: float | None = 0.9,
    level_slack: int | None = None,
):
    """Map-point -> frame projection search (ORBmatcher.cc:45-157):
    each projected point matches the closest descriptor among frame
    keypoints inside its radius; optionally gated to keypoints within
    `level_slack` octaves of the predicted level. The gate is OFF by
    default: per-corner detection octaves jitter frame-to-frame and the
    descriptor + mutual + chi2 filters already reject cross-scale
    mismatches (gating measurably starved tracking on synthetic scenes).
    """
    dist = hamming_matrix(proj_desc, feats["desc"])
    cand = window_mask(
        proj_xy, feats["xy"], radius, proj_valid, feats["valid"],
        proj_level if level_slack is not None else None,
        feats["level"] if level_slack is not None else None,
        level_slack=level_slack or 1,
    )
    return masked_match(dist, cand, max_dist, ratio, mutual=False)
