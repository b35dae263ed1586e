"""Per-stage ORB extraction profile on the real chip.

Splits the mono extraction cost (the Freiburg pacing bottleneck: 33 ms
of the 51.6 ms frame at 960x540x4000) into its stages, per pyramid
level aggregate:

  pyramid   — resize chain only
  fast      — + FAST score maps (backend per ORBParams.fast_backend)
  select    — + per-cell/global top-k selection
  orient    — + intensity-centroid angles (31x31 patch gathers)
  blur      — + 7x7 Gaussian
  brief     — + steered BRIEF-256 (K x 512 random image gathers)

Each row reports the *incremental* cost of that stage, so the gather-
bound suspects (orient, brief) are directly comparable.

NOTE (axon): timing syncs via device->host fetch; run on a healthy
tunnel only.

Usage: python -m tools.profile_extract [--profile freiburg|redwood|kitti]
                                       [--nf 4000] [--backend auto]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dspslam_tpu.frontend import orb

SHAPES = {"kitti": (376, 1241), "redwood": (480, 640), "freiburg": (540, 960)}


def _stage_fn(params: orb.ORBParams, upto: str):
    """Extraction truncated after `upto`, returning something fetchable."""

    @partial(jax.jit, static_argnums=())
    def run(img):
        img = img.astype(jnp.float32)
        budgets = params.features_per_level()
        scales = params.level_scales()
        pattern = jnp.asarray(orb.brief_pattern(params.seed))
        acc = jnp.float32(0.0)
        H0, W0 = img.shape
        level_img = img
        for level in range(params.n_levels):
            if level > 0:
                h = int(round(H0 / scales[level]))
                w = int(round(W0 / scales[level]))
                level_img = jax.image.resize(img, (h, w), method="bilinear")
            if upto == "pyramid":
                acc = acc + jnp.sum(level_img[::16, ::16])
                continue
            h, w = level_img.shape
            if orb._pallas_fast(params.fast_backend, h * w):
                from dspslam_tpu.ops.pallas import fast_kernel

                score = fast_kernel.two_tier_score_fn(
                    params.min_threshold, params.fast_threshold, 1e4,
                    interpret=jax.default_backend() == "cpu",
                )(level_img)
            else:
                score = orb.fast_score_map(level_img, params.min_threshold)
                score = jnp.where(
                    score > params.fast_threshold, score + 1e4, score
                )
            if upto == "fast":
                acc = acc + jnp.sum(score[::16, ::16])
                continue
            xy, resp, valid = orb.select_keypoints(
                score, budgets[level], params.cell_size, params.per_cell
            )
            if upto == "select":
                acc = acc + jnp.sum(xy) + jnp.sum(resp)
                continue
            orient = (
                orb.orientations_conv
                if params.orient_mode == "conv"
                else orb.orientations
            )
            ang = orient(level_img, xy)
            if upto == "orient":
                acc = acc + jnp.sum(ang)
                continue
            blurred = orb.gaussian_blur7(level_img)
            if upto == "blur":
                acc = acc + jnp.sum(ang) + jnp.sum(blurred[::16, ::16])
                continue
            brief = {
                "global": orb.brief_descriptors,
                "patch": orb.brief_descriptors_patch,
                "onehot": orb.brief_descriptors_onehot,
            }[params.brief_mode]
            desc = brief(blurred, xy, ang, pattern)
            acc = acc + jnp.sum(desc.astype(jnp.float32)) + jnp.sum(ang)
        return acc

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", default="freiburg", choices=sorted(SHAPES))
    ap.add_argument("--nf", type=int, default=4000)
    ap.add_argument("--backend", default="auto",
                    choices=("auto", "xla", "pallas"))
    ap.add_argument("--orient", default="patch", choices=("patch", "conv"))
    ap.add_argument("--brief", default="global",
                    choices=("global", "patch", "onehot"))
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    h, w = SHAPES[args.profile]
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    params = orb.ORBParams(
        n_features=args.nf, n_levels=8, fast_backend=args.backend,
        orient_mode=args.orient, brief_mode=args.brief,
    )

    stages = ("pyramid", "fast", "select", "orient", "blur", "brief")
    prev = 0.0
    print(f"{args.profile} {h}x{w} nf={args.nf} backend={args.backend} "
          f"orient={args.orient} brief={args.brief} "
          f"({jax.default_backend()})")
    for st in stages:
        fn = _stage_fn(params, st)
        np.asarray(fn(img))  # compile + sync
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(img)
        np.asarray(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {st:8s} cumulative {ms:7.2f} ms  (+{ms - prev:6.2f})")
        prev = ms


if __name__ == "__main__":
    main()
