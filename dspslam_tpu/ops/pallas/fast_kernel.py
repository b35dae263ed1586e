"""Pallas TPU kernel: FAST-9/16 corner detection.

The XLA fast_score_map builds 16 rolled copies of the image, each
round-tripping HBM. This kernel streams 48-row output blocks through
VMEM (fetched with an 8-row halo by manual DMA -- BlockSpec cannot
express overlapping windows, and TPU DMA slices must be 8-aligned in
the sublane dimension) and computes the full two-tier response in-core:

* the 16 Bresenham-circle neighbours are static slices of the haloed
  block;
* bright/dark comparisons pack into one int32 word per pixel per
  polarity (lo tier bits 0..15, hi tier bits 16..31); a circular
  contiguous arc of >= 9 set bits is detected by ANDing shifts of the
  doubled 16-bit word;
* the response is the sum of absolute circle differences of corner
  pixels (a standard FAST response variant -- ordering-compatible for
  NMS/top-k), with high-threshold corners boosted so the two-tier
  selection of frontend.orb.select_keypoints works unchanged.

Detection parity with the XLA path is exact away from the 3-pixel
border (zero padding vs the XLA path's wraparound); response values
intentionally differ (sum-|d| vs arc-min V).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...frontend.orb import _CIRCLE

ROWS = 48            # output rows per grid step (8-aligned)
HALO = 8             # fetched halo rows each side (8-aligned DMA slices)


def _kernel(img_hbm, out_ref, scratch, sem, *, w: int, t_lo: float,
            t_hi: float, boost: float):
    i = pl.program_id(0)
    copy = pltpu.make_async_copy(
        img_hbm.at[pl.ds(i * ROWS, ROWS + 2 * HALO), :], scratch, sem
    )
    copy.start()
    copy.wait()
    blk = scratch[:]
    center = blk[HALO : HALO + ROWS, 128 : 128 + w]

    bright = jnp.zeros(center.shape, jnp.int32)
    dark = jnp.zeros(center.shape, jnp.int32)
    abs_sum = jnp.zeros(center.shape, jnp.float32)

    for k, (dx, dy) in enumerate(_CIRCLE):
        neigh = blk[
            HALO + int(dy) : HALO + int(dy) + ROWS,
            128 + int(dx) : 128 + int(dx) + w,
        ]
        d = neigh - center
        abs_sum = abs_sum + jnp.abs(d)
        bit_lo = jnp.int32(1 << k)
        bit_hi = jnp.int32(
            np.array(1 << (16 + k), np.uint32).view(np.int32).item()
        )
        zero = jnp.int32(0)
        bright = bright | jnp.where(d > t_lo, bit_lo, zero)
        bright = bright | jnp.where(d > t_hi, bit_hi, zero)
        dark = dark | jnp.where(d < -t_lo, bit_lo, zero)
        dark = dark | jnp.where(d < -t_hi, bit_hi, zero)

    def has_run9(word16):
        # circular contiguous run of >= 9 bits within 16: double the word;
        # bit p of AND_{s=0..8}(x >> s) is set iff bits p..p+8 all set.
        # (Arithmetic >> only pollutes bits >= 24, which are never read.)
        x = word16 | (word16 << 16)
        y = x
        for s in range(1, 9):
            y = y & (x >> s)
        return (y & jnp.int32(0xFFFF)) != 0

    mask16 = jnp.int32(0xFFFF)
    corner_lo = has_run9(bright & mask16) | has_run9(dark & mask16)
    corner_hi = has_run9((bright >> 16) & mask16) | has_run9(
        (dark >> 16) & mask16
    )
    score = jnp.where(corner_lo, abs_sum, 0.0)
    score = jnp.where(corner_hi, score + boost, score)
    out_ref[:] = score


def fast_score_map_batched(
    imgs: jnp.ndarray, t_lo: float = 7.0, t_hi: float = 20.0,
    boost: float = 1e4, interpret: bool = False,
):
    """(B, H, W) images -> (B, H, W) two-tier scores in ONE kernel launch.

    Batching flattens images along rows: each image is padded to a
    multiple of ROWS first, so no 48-row output block straddles two
    images. The DMA halo of a boundary block can still read <= HALO rows
    of the neighbouring image, which only affects scores within 3 px of
    an image's top/bottom edge — a band the extractor's EDGE_MARGIN
    border mask discards anyway (frontend.orb.select_keypoints).
    """
    B, H, W = imgs.shape
    hp = H + (-H) % ROWS
    x = jnp.pad(imgs, ((0, 0), (0, hp - H), (0, 0)))
    flat = x.reshape(B * hp, W)
    out = fast_score_map_pallas(flat, t_lo, t_hi, boost, interpret)
    return out.reshape(B, hp, W)[:, :H, :]


def two_tier_score_fn(
    t_lo: float, t_hi: float, boost: float = 1e4, interpret: bool = False
):
    """img -> two-tier score, safe to use under jax.vmap.

    vmapping a pallas_call directly miscompiles on TPU; the custom_vmap
    rule reroutes batched calls through fast_score_map_batched's
    row-flattened single launch instead.
    """

    @jax.custom_batching.custom_vmap
    def score(img):
        return fast_score_map_pallas(img, t_lo, t_hi, boost, interpret)

    @score.def_vmap
    def _rule(axis_size, in_batched, imgs):
        del axis_size, in_batched
        return fast_score_map_batched(imgs, t_lo, t_hi, boost, interpret), True

    return score


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def fast_score_map_pallas(
    img: jnp.ndarray, t_lo: float = 7.0, t_hi: float = 20.0,
    boost: float = 1e4, interpret: bool = False,
):
    """(H, W) image -> two-tier FAST score map (row-block Pallas kernel).

    Rows pad to a multiple of ROWS (+ halo); columns pad by a 128-lane
    halo each side. Output matches the input shape.
    """
    H, W = img.shape
    pad_h = (-H) % ROWS
    wp = W + ((-W) % 128)
    x = jnp.pad(
        img, ((HALO, HALO + pad_h), (128, 128 + (wp - W))),
        constant_values=0.0,
    )
    n_blocks = (H + pad_h) // ROWS

    out = pl.pallas_call(
        partial(_kernel, w=wp, t_lo=t_lo, t_hi=t_hi, boost=boost),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (ROWS, wp), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((H + pad_h, wp), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ROWS + 2 * HALO, wp + 256), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    return out[:H, :W]
