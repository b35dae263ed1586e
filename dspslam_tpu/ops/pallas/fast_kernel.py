"""Pallas TPU kernel: FAST-9/16 corner detection.

The XLA fast_score_map builds 16 rolled copies of the image and an
unrolled arc reduction — correct, but each roll round-trips HBM. This
kernel streams overlapping row blocks (3-row halo, fetched by manual
DMA — BlockSpec cannot express overlapping windows) through VMEM and
computes everything in-core:

* the 16 Bresenham-circle differences are formed from static slices of
  the haloed block (no rolls);
* bright/dark comparisons pack into 16-bit words per pixel; a contiguous
  arc of >= 9 set bits is detected with shift-AND bit tricks on the
  doubled word (circular runs);
* the response is the sum of absolute circle differences of corner
  pixels (a standard FAST response variant — ordering-compatible for
  NMS/top-k, cheaper than the exact arc-min "V"), with corners at the
  high threshold additionally boosted so the two-tier selection of
  frontend.orb.select_keypoints works unchanged.

Detection parity with the XLA path is exact (same corner set at a given
threshold); response values intentionally differ.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...frontend.orb import _CIRCLE

ROWS = 47            # output rows per grid step
HALO = 3


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

    bright_lo = jnp.zeros(center.shape, jnp.int32)
    dark_lo = jnp.zeros(center.shape, jnp.int32)
    bright_hi = jnp.zeros(center.shape, jnp.int32)
    dark_hi = jnp.zeros(center.shape, jnp.int32)
    abs_sum = jnp.zeros(center.shape, jnp.float32)

    for k, (dx, dy) in enumerate(_CIRCLE):
        neigh = blk[
            HALO + int(dy) : HALO + int(dy) + ROWS,
            128 + int(dx) : 128 + int(dx) + w,
        ]
        d = neigh - center
        abs_sum = abs_sum + jnp.abs(d)
        bit = jnp.int32(1 << k)
        zero = jnp.int32(0)
        bright_lo = bright_lo | jnp.where(d > t_lo, bit, zero)
        dark_lo = dark_lo | jnp.where(d < -t_lo, bit, zero)
        bright_hi = bright_hi | jnp.where(d > t_hi, bit, zero)
        dark_hi = dark_hi | jnp.where(d < -t_hi, bit, zero)

    def has_run9(word):
        # circular contiguous run of >= 9 bits within 16: double the word;
        # bit p of AND_{s=0..8}(x >> s) is set iff bits p..p+8 all set
        x = word | (word << 16)
        y = x
        for s in range(1, 9):
            y = y & (x >> s)
        return (y & jnp.int32(0xFFFF)) != 0

    corner_lo = has_run9(bright_lo) | has_run9(dark_lo)
    corner_hi = has_run9(bright_hi) | has_run9(dark_hi)
    score = jnp.where(corner_lo, abs_sum, 0.0)
    score = jnp.where(corner_hi, score + boost, score)
    out_ref[:] = score


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def fast_score_map_pallas(
    img: jnp.ndarray, t_lo: float = 7.0, t_hi: float = 20.0,
    boost: float = 1e4, interpret: bool = False,
):
    """(H, W) image -> two-tier FAST score map (Pallas row-block kernel).

    Rows pad to a multiple of ROWS; columns pad by a 128-lane halo on
    each side (keeps every shifted slice lane-aligned). Output matches
    the input shape.
    """
    H, W = img.shape
    pad_h = (-H) % ROWS
    wp = W + ((-W) % 128)
    x = jnp.pad(
        img,
        ((HALO, HALO + pad_h), (128, 128 + (wp - W))),
        constant_values=0.0,
    )
    n_blocks = (H + pad_h) // ROWS

    out = pl.pallas_call(
        partial(_kernel, w=wp, t_lo=t_lo, t_hi=t_hi, boost=boost),
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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
