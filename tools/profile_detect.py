"""Stage profile of the Mask R-CNN detect() program on the live device.

Times three nested jitted programs at the given image shape, each
synchronized by a tiny device->host fetch (axon: block_until_ready is a
no-op), and reports increments:

  backbone   — resnet_fpn only (conv stack; bf16 by default)
  proposals  — + RPN heads, delta decode, top-k, greedy NMS
  detect     — the full program (+ RoIAlign x2, box/cls heads, NMS,
               mask head)

The increments separate MXU-bound conv cost from the gather/serial-NMS
tail, which is what decides whether a one-hot RoIAlign (cf. the BRIEF
sampler win, frontend/orb.py:brief_descriptors_onehot) is worth it.

Usage: python -m tools.profile_detect [--hw 376 1241] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dspslam_jax_cache")

from dspslam_tpu.detect import maskrcnn as mr  # noqa: E402


@partial(jax.jit, static_argnums=(2, 3))
def backbone(params, img, hw, cfg):
    feats = mr.resnet_fpn(params, mr.normalize_image(img), cfg)
    return [f.sum() for f in feats]


@partial(jax.jit, static_argnums=(2, 3))
def proposals(params, img, hw, cfg):
    feats = mr.resnet_fpn(params, mr.normalize_image(img), cfg)
    props, valid = mr.rpn_propose(params, feats, hw, cfg)
    return props.sum() + valid.sum()


def _time(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(376, 1241))
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    hw = tuple(args.hw)
    cfg = mr.MaskRCNNConfig(backbone_dtype=args.dtype)
    params = mr.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = jax.device_put(
        jnp.asarray(rng.uniform(0, 255, (*hw, 3)).astype(np.float32))
    )
    np.asarray(img[0, 0, 0])  # settle the upload

    print(f"{hw[0]}x{hw[1]} dtype={args.dtype} ({jax.default_backend()})")
    prev = 0.0
    for name, fn in (
        ("backbone", backbone),
        ("proposals", proposals),
        ("detect", mr.Detector2D(params=params, cfg=cfg)._detect),
    ):
        ms = _time(fn, params, img, hw, cfg, iters=args.iters)
        print(f"  {name:10s} {ms:7.2f} ms  (+{ms - prev:7.2f})")
        prev = ms


if __name__ == "__main__":
    main()
