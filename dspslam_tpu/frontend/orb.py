"""ORB feature extraction as dense XLA kernels.

TPU-first redesign of the reference's ORBextractor (/root/reference/src/
ORBextractor.cc:78-1147: pyramid -> per-cell FAST -> quadtree NMS ->
intensity-centroid orientation -> Gaussian blur -> rBRIEF). The
data-dependent machinery (STL keypoint lists, quadtree recursion) becomes
fixed-shape tensor programs:

* FAST-9/16 runs as 16 rolled comparisons + unrolled contiguous-arc
  reduction over the whole image at once, producing a dense score map
  (the classic arc-min "V" corner score);
* non-max suppression = 3x3 local-maximum test, then spatial binning:
  top-k scores per fixed grid cell replace the quadtree — same goal
  (spatially spread responses), but a static-shape reduction;
* per-level feature budgets follow the reference's geometric allocation
  (ORBextractor.cc:436-447);
* orientation and descriptors gather 31x31 patches for the selected
  (static-K) keypoints only;
* the 256 rBRIEF test pairs default to a seeded Gaussian (sigma =
  patch/5, the classic BRIEF recipe); vocabulary/matching layers in
  this framework are trained for that pattern. ORBParams(
  pattern="reference") instead loads OpenCV's learned table
  (orb_pattern.py) for bit compatibility with OpenCV descriptors and
  the pretrained DBoW2 ORBvoc vocabulary (place/orbvoc.py).

All outputs are padded to static caps with validity masks.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15
PATCH = 31
EDGE_MARGIN = 19  # no keypoints closer than this to a level border

# Bresenham circle of radius 3 (FAST-16 offsets, clockwise from top)
_CIRCLE = np.array(
    [
        (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
        (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
    ],
    dtype=np.int32,
)  # (dx, dy)


@dataclasses.dataclass(frozen=True)
class ORBParams:
    n_features: int = 2000
    scale_factor: float = 1.2
    n_levels: int = 8
    fast_threshold: float = 20.0
    min_threshold: float = 7.0
    cell_size: int = 16          # top-k bin size in pixels
    per_cell: int = 4            # candidates kept per cell
    seed: int = 1234             # BRIEF pattern seed (pattern="seeded")
    # BRIEF test-pair table: "seeded" draws the classic Gaussian pattern
    # (self-consistent within this framework); "reference" uses OpenCV's
    # learned 512-point table (orb_pattern.py) for bit compatibility
    # with OpenCV-extracted descriptors and the pretrained DBoW2 ORBvoc
    # vocabulary (ORBextractor.cc:151-410 pattern, System.cc:76-87 load)
    pattern: str = "seeded"
    # FAST detector backend: "auto" picks the Pallas kernel on TPU for
    # level shapes in its measured win regime (tools/bench_pallas.py on
    # v5e-lite: 1.93x at 480x640, ~tie at 376x1241, loses at 540x960 —
    # crossover ~0.5 Mpix), "xla"/"pallas" force one path. On CPU,
    # "pallas" runs in interpret mode (tests).
    fast_backend: str = "auto"
    # per-feature sampling strategies (identical outputs for valid
    # keypoints; measured on-chip via tools/{profile_extract,bench_brief}):
    # orientation "patch" gathers 31x31 patches ("conv" moment maps lose
    # badly on TPU: XLA lowers the 1-channel 31x31 conv at ~600 ms).
    # BRIEF: "auto" picks the one-hot-matmul sampler on TPU (~2x vs the
    # gather, exact bits) and the global gather on CPU; "global"/
    # "patch"/"onehot" force one path.
    orient_mode: str = "patch"
    brief_mode: str = "auto"

    def features_per_level(self) -> list[int]:
        """Geometric budget per level (ORBextractor.cc:436-447)."""
        f = 1.0 / self.scale_factor
        n0 = self.n_features * (1 - f) / (1 - f**self.n_levels)
        out, total = [], 0
        for _ in range(self.n_levels - 1):
            out.append(int(round(n0)))
            total += out[-1]
            n0 *= f
        out.append(max(self.n_features - total, 0))
        return out

    def level_scales(self) -> list[float]:
        return [self.scale_factor**i for i in range(self.n_levels)]


def brief_pattern(seed: int = 1234, n_pairs: int = 256) -> np.ndarray:
    """(n_pairs, 2, 2) int32 test-pair offsets in patch coordinates.

    Classic BRIEF G-II sampling: both endpoints ~ N(0, (patch/5)^2),
    clipped to the patch; deterministic by seed.
    """
    rng = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pts = rng.normal(0.0, sigma, size=(n_pairs, 2, 2))
    pts = np.clip(np.round(pts), -(HALF_PATCH - 2), HALF_PATCH - 2)
    return pts.astype(np.int32)


def pattern_for(params: "ORBParams") -> np.ndarray:
    """Resolve the test-pair table for an ORBParams (see .pattern)."""
    if params.pattern == "reference":
        from .orb_pattern import reference_pattern

        return reference_pattern()
    return brief_pattern(params.seed)


# ---------------------------------------------------------------------------
# Dense FAST score map


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """FAST-9/16 corner response for every pixel of a (H, W) float image.

    Score is the classic "V" measure: over all contiguous 9-arcs that are
    uniformly brighter (or darker) than center +/- threshold, the maximum
    of the arc's minimum absolute difference. Non-corners score 0.
    """
    diffs = []
    for dx, dy in _CIRCLE:
        shifted = jnp.roll(img, shift=(-int(dy), -int(dx)), axis=(0, 1))
        diffs.append(shifted - img)
    d = jnp.stack(diffs, axis=0)                    # (16, H, W)

    bright = d > threshold
    dark = d < -threshold

    score = jnp.zeros_like(img)
    for k in range(16):
        idx = [(k + j) % 16 for j in range(9)]
        arc_b = bright[idx[0]]
        arc_d = dark[idx[0]]
        vmin_b = d[idx[0]]
        vmin_d = -d[idx[0]]
        for j in idx[1:]:
            arc_b = arc_b & bright[j]
            arc_d = arc_d & dark[j]
            vmin_b = jnp.minimum(vmin_b, d[j])
            vmin_d = jnp.minimum(vmin_d, -d[j])
        score = jnp.maximum(score, jnp.where(arc_b, vmin_b, 0.0))
        score = jnp.maximum(score, jnp.where(arc_d, vmin_d, 0.0))
    return score


def _local_maxima(score: jnp.ndarray) -> jnp.ndarray:
    """Keep scores that are >= all 8 neighbours (3x3 NMS)."""
    neigh = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.maximum(neigh, jnp.roll(score, (dy, dx), (0, 1)))
    return jnp.where(score >= neigh, score, 0.0)


def select_keypoints(
    score: jnp.ndarray, k: int, cell: int = 16, per_cell: int = 4
):
    """Spatially-spread top-k selection from a dense score map.

    Grid-binned candidates (top `per_cell` per cell) feed a global top-k —
    the static-shape counterpart of the reference's quadtree distribution
    (ORBextractor.cc:540-763). Returns (xy (k, 2) float32 [x, y],
    response (k,), valid (k,)).
    """
    H, W = score.shape
    score = _local_maxima(score)
    # zero the border
    border = jnp.zeros_like(score)
    border = border.at[EDGE_MARGIN:H - EDGE_MARGIN, EDGE_MARGIN:W - EDGE_MARGIN].set(
        1.0
    )
    score = score * border

    Hc, Wc = H // cell, W // cell
    cells = score[: Hc * cell, : Wc * cell].reshape(Hc, cell, Wc, cell)
    cells = cells.transpose(0, 2, 1, 3).reshape(Hc * Wc, cell * cell)
    top_val, top_idx = jax.lax.top_k(cells, per_cell)        # (Hc*Wc, per_cell)

    cell_ids = jnp.arange(Hc * Wc)
    cy = (cell_ids // Wc) * cell
    cx = (cell_ids % Wc) * cell
    ys = cy[:, None] + top_idx // cell
    xs = cx[:, None] + top_idx % cell

    flat_val = top_val.reshape(-1)
    flat_ys = ys.reshape(-1)
    flat_xs = xs.reshape(-1)
    if flat_val.shape[0] < k:
        # tiny pyramid levels (low-res / deep-level images) can hold
        # fewer candidates than the geometric budget; zero-pad so the
        # fixed-shape contract holds — pad slots score 0 -> valid 0
        pad = k - flat_val.shape[0]
        flat_val = jnp.pad(flat_val, (0, pad))
        flat_ys = jnp.pad(flat_ys, (0, pad))
        flat_xs = jnp.pad(flat_xs, (0, pad))
    val, idx = jax.lax.top_k(flat_val, k)
    xy = jnp.stack([flat_xs[idx], flat_ys[idx]], axis=-1).astype(jnp.float32)
    valid = (val > 0).astype(jnp.float32)
    return xy * valid[:, None], val * valid, valid


# ---------------------------------------------------------------------------
# Orientation + descriptors


def _circular_mask():
    yy, xx = np.mgrid[-HALF_PATCH:HALF_PATCH + 1, -HALF_PATCH:HALF_PATCH + 1]
    inside = (xx**2 + yy**2) <= HALF_PATCH**2
    return xx * inside, yy * inside


_U_WEIGHTS, _V_WEIGHTS = _circular_mask()


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """(K, 31, 31) image patches centered on integer keypoints (clamped)."""
    H, W = img.shape

    def one(c):
        y0 = jnp.clip(c[1].astype(jnp.int32) - HALF_PATCH, 0, H - PATCH)
        x0 = jnp.clip(c[0].astype(jnp.int32) - HALF_PATCH, 0, W - PATCH)
        return jax.lax.dynamic_slice(img, (y0, x0), (PATCH, PATCH))

    return jax.vmap(one)(xy)


def orientations(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angle per keypoint (IC_Angle, ORBextractor.cc:78-106)."""
    patches = gather_patches(img, xy)                        # (K, 31, 31)
    m10 = jnp.sum(patches * jnp.asarray(_U_WEIGHTS, img.dtype), axis=(1, 2))
    m01 = jnp.sum(patches * jnp.asarray(_V_WEIGHTS, img.dtype), axis=(1, 2))
    return jnp.arctan2(m01, m10)                             # (K,) radians


def orientations_conv(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angles via dense moment maps.

    One 2-channel 31x31 cross-correlation computes m10/m01 for EVERY
    pixel, then each keypoint reads back two scalars — replacing the
    K x 961 patch gathers of `orientations`. Identical angles for
    keypoints >= HALF_PATCH from the border (all valid ones,
    EDGE_MARGIN=19): interior patches neither clamp nor see the conv's
    zero padding.

    MEASURED LOSER on v5e (do not enable on TPU): XLA lowers the
    single-channel 31x31 conv at ~600 ms/frame vs ~2 ms for the patch
    gathers (tools/profile_extract.py --orient conv). Kept as the
    CPU-friendly formulation and as documentation of the measurement.
    """
    k = jnp.stack(
        [jnp.asarray(_U_WEIGHTS, img.dtype), jnp.asarray(_V_WEIGHTS, img.dtype)]
    )                                                        # (2, 31, 31)
    maps = jax.lax.conv_general_dilated(
        img[None, None], k[:, None], (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]                                                     # (2, H, W)
    xi = xy[:, 0].astype(jnp.int32)
    yi = xy[:, 1].astype(jnp.int32)
    return jnp.arctan2(maps[1, yi, xi], maps[0, yi, xi])


def gaussian_blur7(img: jnp.ndarray, sigma: float = 2.0) -> jnp.ndarray:
    """Separable 7x7 Gaussian (the reference blurs before BRIEF sampling).

    Implemented as shifted adds (roll + weight): measured fastest on v5e —
    single-channel conv_general_dilated pads channels onto the MXU
    wastefully (3x slower end-to-end), and vmapped jnp.convolve lowers to
    many small kernels.
    """
    x = np.arange(-3, 4)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g = (g / g.sum()).astype(np.float32)
    out_r = jnp.zeros_like(img)
    for k, w in enumerate(g):
        out_r = out_r + float(w) * jnp.roll(img, 3 - k, axis=1)
    out = jnp.zeros_like(img)
    for k, w in enumerate(g):
        out = out + float(w) * jnp.roll(out_r, 3 - k, axis=0)
    return out


def _pack_brief_bits(vals: jnp.ndarray) -> jnp.ndarray:
    """(K, 256, 2) sampled pair values -> (K, 8) packed uint32."""
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (K, 256)
    weights = jnp.asarray(
        (2 ** np.arange(32, dtype=np.int64)).astype(np.uint32)
    )
    packed = jnp.sum(bits.reshape(-1, 8, 32) * weights[None, None, :], axis=-1)
    return packed.astype(jnp.uint32)                         # (K, 8)


def _rotated_offsets(xy, angles, pattern):
    """Per-keypoint rotated pattern positions (image coords, float)."""
    cos, sin = jnp.cos(angles), jnp.sin(angles)              # (K,)
    pat = pattern.astype(jnp.float32)                        # (256, 2, 2) [x, y]
    px, py = pat[..., 0], pat[..., 1]                        # (256, 2)
    rx = cos[:, None, None] * px - sin[:, None, None] * py   # (K, 256, 2)
    ry = sin[:, None, None] * px + cos[:, None, None] * py
    return xy[:, None, None, 0] + rx, xy[:, None, None, 1] + ry


def brief_descriptors(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray, pattern: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF-256 -> (K, 8) uint32 packed descriptors.

    Pattern offsets are rotated by each keypoint's angle and sampled with
    nearest rounding (computeOrbDescriptor, ORBextractor.cc:109-143).
    Sampling is one global (K, 256, 2) image gather.
    """
    H, W = img_blur.shape
    fx, fy = _rotated_offsets(xy, angles, pattern)
    gx = jnp.clip(jnp.round(fx), 0, W - 1).astype(jnp.int32)
    gy = jnp.clip(jnp.round(fy), 0, H - 1).astype(jnp.int32)
    vals = img_blur[gy, gx]                                  # (K, 256, 2)
    return _pack_brief_bits(vals)


R_BRIEF = 19  # patch radius covering any rotated offset (13*sqrt(2) < 19)


def _brief_patches_local(img_blur, xy, angles, pattern):
    """Per-keypoint 39x39 blurred patches + patch-local sample indices.

    Identical sample positions to `brief_descriptors` for keypoints
    >= EDGE_MARGIN from the border (all valid ones): rotated offsets
    never leave the patch (|13*sqrt(2)| < R_BRIEF), so the contiguous
    dynamic_slice covers every sample."""
    H, W = img_blur.shape
    S = 2 * R_BRIEF + 1

    def one(c):
        y0 = jnp.clip(c[1].astype(jnp.int32) - R_BRIEF, 0, H - S)
        x0 = jnp.clip(c[0].astype(jnp.int32) - R_BRIEF, 0, W - S)
        return jax.lax.dynamic_slice(img_blur, (y0, x0), (S, S)), x0, y0

    patches, x0, y0 = jax.vmap(one)(xy)                      # (K, S, S)
    fx, fy = _rotated_offsets(xy, angles, pattern)
    gx = jnp.clip(jnp.round(fx), 0, W - 1).astype(jnp.int32)
    gy = jnp.clip(jnp.round(fy), 0, H - 1).astype(jnp.int32)
    lx = jnp.clip(gx - x0[:, None, None], 0, S - 1)
    ly = jnp.clip(gy - y0[:, None, None], 0, S - 1)
    return patches, lx.reshape(xy.shape[0], -1), ly.reshape(xy.shape[0], -1)


def brief_descriptors_patch(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray, pattern: jnp.ndarray
) -> jnp.ndarray:
    """BRIEF via patch slices + row-local take_along_axis. Bit-identical
    to `brief_descriptors` for valid keypoints; measured ~even with the
    global gather on v5e (tools/bench_brief.py) — kept as the simplest
    patch-domain formulation."""
    S = 2 * R_BRIEF + 1
    patches, lx, ly = _brief_patches_local(img_blur, xy, angles, pattern)
    li = ly * S + lx                                         # (K, 512)
    flat = patches.reshape(xy.shape[0], S * S)
    vals = jnp.take_along_axis(flat, li, axis=1).reshape(xy.shape[0], -1, 2)
    return _pack_brief_bits(vals)


def brief_descriptors_onehot(
    img_blur: jnp.ndarray, xy: jnp.ndarray, angles: jnp.ndarray, pattern: jnp.ndarray
) -> jnp.ndarray:
    """BRIEF via separable one-hot MATMUL sampling — no data-dependent
    gather at all: row selection is a (512, 39) one-hot batched matmul
    against each keypoint's patch on the MXU, column selection a masked
    sum. Bit-identical to `brief_descriptors` for valid keypoints and
    measured ~2x faster at Freiburg mono shapes on v5e (19 vs 39 ms for
    4000 keypoints, tools/bench_brief.py) where XLA's TPU gather runs
    far below HBM speed of light."""
    S = 2 * R_BRIEF + 1
    patches, lx, ly = _brief_patches_local(img_blur, xy, angles, pattern)
    a = jax.nn.one_hot(ly, S, dtype=jnp.float32)             # (K, 512, S)
    b = jax.nn.one_hot(lx, S, dtype=jnp.float32)             # (K, 512, S)
    m = jnp.einsum("ksi,kij->ksj", a, patches)               # (K, 512, S)
    vals = jnp.sum(m * b, axis=-1).reshape(xy.shape[0], -1, 2)
    return _pack_brief_bits(vals)


# ---------------------------------------------------------------------------
# Full extraction


# Pallas FAST win regime: measured faster below ~0.5 Mpix on-chip
# (tools/bench_pallas.py; the XLA rolled-copies path amortizes better at
# the largest level-0 frames). Decided at trace time per pyramid level.
_PALLAS_FAST_MAX_PIX = 480_000


def _pallas_fast(backend: str, pixels: int) -> bool:
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    return (
        jax.default_backend() not in ("cpu", "gpu")
        and pixels <= _PALLAS_FAST_MAX_PIX
    )


@partial(jax.jit, static_argnums=(1,))
def extract_batch(imgs: jnp.ndarray, params: ORBParams = ORBParams()):
    """Batched extraction over (B, H, W) images — e.g. a stereo pair runs
    as ONE device program (double-batched kernels amortize the many small
    per-level ops that make single-image extraction latency-bound)."""
    return jax.vmap(lambda im: extract(im, params))(imgs)


@partial(jax.jit, static_argnums=(1,))
def extract(img: jnp.ndarray, params: ORBParams = ORBParams()):
    """Multi-scale ORB extraction on a (H, W) float32 image in [0, 255].

    Returns a dict of padded arrays over N = sum of per-level budgets:
      xy (N, 2) level-0 pixel coords, response (N,), angle (N,),
      level (N,) int32, octave scale sigma2 (N,), desc (N, 8) uint32,
      valid (N,).
    """
    # accept uint8 camera frames: host->device image transfer is the
    # per-frame bandwidth bottleneck on relay-attached TPUs (4x smaller
    # than float32); the cast fuses into the first convolution
    img = img.astype(jnp.float32)
    budgets = params.features_per_level()
    scales = params.level_scales()
    pattern = jnp.asarray(pattern_for(params))

    outs = {k: [] for k in ("xy", "response", "angle", "level", "sigma2", "desc", "valid")}
    level_img = img
    H0, W0 = img.shape
    for level in range(params.n_levels):
        if level > 0:
            h = int(round(H0 / scales[level]))
            w = int(round(W0 / scales[level]))
            level_img = jax.image.resize(img, (h, w), method="bilinear")
        # One FAST pass at the MIN threshold gives both detector tiers: the
        # arc-min score V satisfies "corner at threshold t iff V > t", so
        # high-threshold corners are exactly {V > iniThFAST}. Boosting them
        # by a constant reproduces the reference's preference for strong
        # corners with low-threshold fallback in sparse cells
        # (ORBextractor.cc:766-835) at half the detection cost.
        h, w = level_img.shape
        if _pallas_fast(params.fast_backend, h * w):
            from ..ops.pallas import fast_kernel

            score = fast_kernel.two_tier_score_fn(
                params.min_threshold, params.fast_threshold, 1e4,
                interpret=jax.default_backend() == "cpu",
            )(level_img)
        else:
            score = fast_score_map(level_img, params.min_threshold)
            score = jnp.where(
                score > params.fast_threshold, score + 1e4, score
            )
        xy, resp, valid = select_keypoints(
            score, budgets[level], params.cell_size, params.per_cell
        )
        orient = (
            orientations_conv if params.orient_mode == "conv" else orientations
        )
        ang = orient(level_img, xy)
        blurred = gaussian_blur7(level_img)
        mode = params.brief_mode
        if mode == "auto":
            mode = (
                "onehot"
                if jax.default_backend() not in ("cpu", "gpu")
                else "global"
            )
        brief = {
            "global": brief_descriptors,
            "patch": brief_descriptors_patch,
            "onehot": brief_descriptors_onehot,
        }[mode]
        desc = brief(blurred, xy, ang, pattern)
        outs["xy"].append(xy * scales[level])
        outs["response"].append(resp)
        outs["angle"].append(ang)
        outs["level"].append(jnp.full((budgets[level],), level, jnp.int32))
        outs["sigma2"].append(jnp.full((budgets[level],), scales[level] ** 2))
        outs["desc"].append(desc)
        outs["valid"].append(valid)
    return {k: jnp.concatenate(v, axis=0) for k, v in outs.items()}
