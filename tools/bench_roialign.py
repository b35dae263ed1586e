"""On-chip shoot-out: gather vs separable-matmul RoIAlign.

The detect() stage profile (tools/profile_detect.py) shows a ~9 ms
RoI-heads tail after the bf16 backbone; RoIAlign's per-box bilinear
gathers are the data-dependent part. This times both formulations at
the production shape (128 RPN proposals x 4 FPN levels at KITTI
resolution, plus the 16-box mask pass) and asserts parity first.

Usage: python -m tools.bench_roialign [--hw 376 1241] [--n 128]
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


def _time(fn, *args, iters=20):
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
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--c", type=int, default=256)
    ap.add_argument("--out", type=int, default=7)
    args = ap.parse_args()
    h, w = args.hw[0] // 4, args.hw[1] // 4  # P2 feature grid
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.normal(size=(args.c, h, w)).astype(np.float32))
    x0 = rng.uniform(0, w - 30, args.n)
    y0 = rng.uniform(0, h - 20, args.n)
    boxes = jnp.asarray(
        np.stack(
            [x0, y0, x0 + rng.uniform(4, 30, args.n),
             y0 + rng.uniform(4, 20, args.n)], -1
        ).astype(np.float32)
    )

    gather = jax.jit(partial(mr.roi_align, out_size=args.out))
    matmul = jax.jit(partial(mr.roi_align_matmul, out_size=args.out))
    a = np.asarray(gather(feat, boxes))
    b = np.asarray(matmul(feat, boxes))
    err = np.abs(a - b).max()
    print(f"P2 {h}x{w} c={args.c} n={args.n} out={args.out} "
          f"({jax.default_backend()}); max |gather-matmul| = {err:.2e}")
    assert err < 1e-3, "parity failure"
    print(f"  gather {_time(gather, feat, boxes):7.2f} ms")
    print(f"  matmul {_time(matmul, feat, boxes):7.2f} ms")


if __name__ == "__main__":
    main()
