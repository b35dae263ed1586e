"""On-chip shoot-out of steered-BRIEF sampling formulations.

The Freiburg extraction profile (tools/profile_extract.py) shows the
K x 512 descriptor sampling gather is ~24 ms of the 30 ms extract —
XLA's TPU gather runs ~100x below HBM speed-of-light here. Candidates:

  global  — advanced indexing img[gy, gx] (production path)
  flat    — jnp.take on flattened linear indices
  patch   — 39x39 dynamic_slice per keypoint + take_along_axis
  onehot  — patch + separable one-hot MATMUL sampling: row-select via
            (512, 39) one-hot against the patch on the MXU, then
            col-select as a masked sum; no gather at all
  onehot_bf16 — same with bf16 one-hots/patches (bit flips possible
            when a pair's blurred values differ by < bf16 ulp)

All nearest-rounding; parity asserted against `global` before timing.

Usage: python -m tools.bench_brief [--nf 4000] [--hw 540 960]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dspslam_tpu.frontend import orb


def _time(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / iters * 1e3


S = 2 * orb.R_BRIEF + 1


def _patches_and_local(img, xy, fx, fy):
    H, W = img.shape

    def one(c):
        y0 = jnp.clip(c[1].astype(jnp.int32) - orb.R_BRIEF, 0, H - S)
        x0 = jnp.clip(c[0].astype(jnp.int32) - orb.R_BRIEF, 0, W - S)
        return jax.lax.dynamic_slice(img, (y0, x0), (S, S)), x0, y0

    patches, x0, y0 = jax.vmap(one)(xy)
    gx = jnp.clip(jnp.round(fx), 0, W - 1).astype(jnp.int32)
    gy = jnp.clip(jnp.round(fy), 0, H - 1).astype(jnp.int32)
    k = xy.shape[0]
    lx = jnp.clip(gx - x0[:, None, None], 0, S - 1).reshape(k, -1)
    ly = jnp.clip(gy - y0[:, None, None], 0, S - 1).reshape(k, -1)
    return patches, lx, ly


@partial(jax.jit, static_argnums=(4,))
def sample(img, xy, ang, pattern, mode):
    H, W = img.shape
    fx, fy = orb._rotated_offsets(xy, ang, pattern)
    k = xy.shape[0]
    if mode == "global":
        gx = jnp.clip(jnp.round(fx), 0, W - 1).astype(jnp.int32)
        gy = jnp.clip(jnp.round(fy), 0, H - 1).astype(jnp.int32)
        return img[gy, gx].reshape(k, -1)
    if mode == "flat":
        gx = jnp.clip(jnp.round(fx), 0, W - 1).astype(jnp.int32)
        gy = jnp.clip(jnp.round(fy), 0, H - 1).astype(jnp.int32)
        return jnp.take(img.reshape(-1), (gy * W + gx).reshape(k, -1), axis=0)
    if mode in ("binned", "binned_onehot"):
        # original-ORB angle discretization (2 pi / 30, Rublee 2011
        # sec 4.1): per-bin rotated patterns are STATIC indices into the
        # patch, so sampling is 30 constant-index column permutations +
        # a per-keypoint bin select — no data-dependent gather.
        n_bins = 30
        pat = orb.brief_pattern().astype(np.float32)
        px, py = pat[..., 0], pat[..., 1]                  # (256, 2)
        li_bins = []
        for b_ in range(n_bins):
            th = (b_ + 0.5) * 2 * np.pi / n_bins - np.pi
            rx = np.round(np.cos(th) * px - np.sin(th) * py).astype(int)
            ry = np.round(np.sin(th) * px + np.cos(th) * py).astype(int)
            li_bins.append(
                ((ry + orb.R_BRIEF) * S + rx + orb.R_BRIEF).reshape(-1)
            )
        li_bins = jnp.asarray(np.stack(li_bins))           # (30, 512)
        kbin = jnp.floor(
            (ang + jnp.pi) / (2 * jnp.pi) * n_bins
        ).astype(jnp.int32) % n_bins                       # (K,)

        def one(c):
            y0 = c[1].astype(jnp.int32) - orb.R_BRIEF
            x0 = c[0].astype(jnp.int32) - orb.R_BRIEF
            return jax.lax.dynamic_slice(img, (y0, x0), (S, S))

        pf = jax.vmap(one)(xy).reshape(k, S * S)
        if mode == "binned":
            all_v = jnp.stack(
                [jnp.take(pf, li_bins[b_], axis=1) for b_ in range(30)]
            )                                              # (30, K, 512)
            sel = jax.nn.one_hot(kbin, n_bins, axis=0)     # (30, K)
            return jnp.einsum("bk,bks->ks", sel, all_v)
        li = li_bins[kbin]                                 # (K, 512) gather rows
        return jnp.take_along_axis(pf, li, axis=1)
    patches, lx, ly = _patches_and_local(img, xy, fx, fy)
    if mode == "patch":
        li = ly * S + lx
        return jnp.take_along_axis(patches.reshape(k, S * S), li, axis=1)
    dt = jnp.bfloat16 if mode == "onehot_bf16" else jnp.float32
    a = jax.nn.one_hot(ly, S, dtype=dt)                    # (K, 512, S)
    b = jax.nn.one_hot(lx, S, dtype=dt)                    # (K, 512, S)
    m = jnp.einsum("ksi,kij->ksj", a, patches.astype(dt))  # (K, 512, S)
    return jnp.sum(m * b, axis=-1).astype(jnp.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nf", type=int, default=4000)
    ap.add_argument("--hw", type=int, nargs=2, default=(540, 960))
    args = ap.parse_args()
    h, w = args.hw
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
    xy = jnp.asarray(
        np.stack(
            [
                rng.integers(orb.EDGE_MARGIN, w - orb.EDGE_MARGIN, args.nf),
                rng.integers(orb.EDGE_MARGIN, h - orb.EDGE_MARGIN, args.nf),
            ],
            -1,
        ).astype(np.float32)
    )
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, args.nf).astype(np.float32))
    pattern = jnp.asarray(orb.brief_pattern())

    def bits(v):
        return v.reshape(v.shape[0], -1, 2)[..., 0] < v.reshape(
            v.shape[0], -1, 2
        )[..., 1]

    ref = bits(np.asarray(sample(img, xy, ang, pattern, "global")))
    print(f"{h}x{w} nf={args.nf} ({jax.default_backend()})")
    # exact modes must be bit-identical to the production global gather;
    # bf16/binned variants change bits by design and only report rates
    exact = {"global", "flat", "patch", "onehot"}
    for mode in (
        "global", "flat", "patch", "onehot", "onehot_bf16",
        "binned", "binned_onehot",
    ):
        out = bits(np.asarray(sample(img, xy, ang, pattern, mode)))
        mism = (out != ref).mean()
        assert mode not in exact or mism == 0.0, (
            f"{mode}: parity failure vs global ({mism:.2e})"
        )
        ms = _time(lambda: sample(img, xy, ang, pattern, mode))
        print(f"  {mode:12s} {ms:7.2f} ms   bit mismatch {mism:.2e}")


if __name__ == "__main__":
    main()
