"""Stage profile of the PointPillars path on the live device.

Separates the measured ~119 ms/scan (docs/STATUS.md) into:

  pillarize   — host numpy sparse pillarization (no device)
  upload      — compact sparse tensors host->device (settled fetch)
  build       — build_pillars_device (scatter/decode to dense pillars)
  network     — + PFN, BEV backbone (bf16), heads
  select      — + decode, top-k, exact BEV rotated-IoU NMS (full program)

Each jitted stage is timed with a device->host sync fetch (axon:
block_until_ready is a no-op).

Usage: python -m tools.profile_pp [--pts 120000] [--iters 10]
"""

from __future__ import annotations

import argparse
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dspslam_jax_cache")

from dspslam_tpu.detect import pointpillars as pp  # noqa: E402


def _sync(x):
    """Await EVERY buffer in the tree with one tiny fetch: a device-side
    reduce over all leaves depends on all of them (independent
    device_puts in the upload stage do not complete together), and the
    single-element fetch avoids paying a download per leaf."""
    leaves = jax.tree.leaves(x)
    np.asarray(sum(jnp.ravel(a)[:1].astype(jnp.float32)[0] for a in leaves))


def _time(fn, iters=10):
    fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters * 1e3


@partial(jax.jit, static_argnums=(1,))
def _build_only(sparse, cfg):
    pillars = pp.build_pillars_device(sparse, cfg)
    return {k: v.sum() for k, v in pillars.items() if hasattr(v, "sum")}


@partial(jax.jit, static_argnums=(2,))
def _network_only(params, sparse, cfg):
    pillars = pp.build_pillars_device(sparse, cfg)
    cls, boxes, dirs = pp.forward(params, pillars, cfg)
    return cls.sum() + boxes.sum() + dirs.sum()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pts", type=int, default=120000)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    cfg = pp.PointPillarsConfig()
    det = pp.Detector3D(cfg=cfg)
    rng = np.random.default_rng(0)
    pts = np.stack(
        [
            rng.uniform(0, 48, args.pts), rng.uniform(-35, 35, args.pts),
            rng.uniform(-2.5, 0.5, args.pts), rng.uniform(0, 1, args.pts),
        ], -1,
    ).astype(np.float32)

    sparse_host = pp.pillarize_sparse(pts, cfg)
    print(f"{args.pts} pts ({jax.default_backend()})")
    ms = _time(lambda: pp.pillarize_sparse(pts, cfg), args.iters)
    print(f"  pillarize(host) {ms:7.2f} ms")

    def upload():
        d = {k: jax.device_put(v) for k, v in sparse_host.items()}
        _sync(d)
        return d

    sparse_dev = upload()
    ms = _time(upload, args.iters)
    print(f"  upload          {ms:7.2f} ms")

    prev = 0.0
    for name, fn in (
        ("build", lambda: _sync(_build_only(sparse_dev, cfg))),
        ("network", lambda: _sync(_network_only(det.params, sparse_dev, cfg))),
        ("full+select", lambda: _sync(
            det._run(det.params, sparse_dev, det.anchors)
        )),
    ):
        ms = _time(fn, args.iters)
        print(f"  {name:15s} {ms:7.2f} ms  (+{ms - prev:7.2f})")
        prev = ms

    # the production path: device pillar assignment (points-only upload)
    pts_host = pp.crop_quantize_points(pts, cfg)
    ms = _time(lambda: pp.crop_quantize_points(pts, cfg), args.iters)
    print(f"  crop+quant(host){ms:7.2f} ms  "
          f"({sum(v.nbytes for v in pts_host.values() if hasattr(v, 'nbytes'))/1e3:.0f} KB "
          f"vs {sum(v.nbytes for v in sparse_host.values() if hasattr(v, 'nbytes'))/1e3:.0f} KB sparse)")

    def upload_pts():
        d = {k: jax.device_put(v) for k, v in pts_host.items()}
        _sync(d)
        return d

    pts_dev = upload_pts()
    ms = _time(upload_pts, args.iters)
    print(f"  upload(points)  {ms:7.2f} ms")
    ms = _time(lambda: _sync(
        det._run_points(det.params, pts_dev, det.anchors)
    ), args.iters)
    print(f"  full(dev-assign){ms:7.2f} ms")


if __name__ == "__main__":
    main()
