"""Detector inference latency on live hardware.

The reference prints per-frame detector timings inline
(kitti_sequence.py:101-109 for Mask R-CNN, :162-167 for the 3D
detector); this measures the same thing for the from-scratch JAX
detectors — PointPillars on a synthetic 120k-point LiDAR scan (host
crop+quantize + on-device pillar assignment + network) and Mask R-CNN ResNet50-FPN at KITTI
resolution. Random weights: latency is architecture-, not
weight-dependent.

Usage:  python -m dspslam_tpu.apps.benchmark_detectors [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np


def synthetic_scan(n: int = 120_000, seed: int = 0) -> np.ndarray:
    """KITTI-like Velodyne scan: ground disk + scattered structures."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(2.5, 69.0, n)
    th = rng.uniform(-np.pi, np.pi, n)
    x = r * np.cos(th)
    y = r * np.sin(th)
    z = np.where(
        rng.uniform(size=n) < 0.7,
        rng.normal(-1.7, 0.05, n),                   # ground
        rng.uniform(-1.5, 1.5, n),                   # structure
    )
    i = rng.uniform(0, 1, n)
    return np.stack([x, y, z, i], -1).astype(np.float32)


def bench_pointpillars(iters: int):
    """The production path: host crop+quantize, points-only upload,
    whole-network jit with ON-DEVICE pillar assignment (Detector3D
    defaults), synced by the boxes fetch."""
    from ..detect import pointpillars as pp

    det = pp.Detector3D()
    scan = synthetic_scan()
    det.make_prediction(scan)                         # compile
    t_total, t_host = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        det.collect(det.dispatch(scan))               # crop+upload+net+fetch
        t_total.append(time.perf_counter() - t0)
        t1 = time.perf_counter()
        pp.crop_quantize_points(scan, det.cfg)        # host share, measured alone
        t_host.append(time.perf_counter() - t1)
    return float(np.median(t_total)) * 1e3, float(np.median(t_host)) * 1e3


def bench_maskrcnn(iters: int):
    import jax.numpy as jnp

    from ..detect import maskrcnn as mr

    cfg = mr.MaskRCNNConfig()
    params = mr.init_params(cfg, jax.random.PRNGKey(0))
    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 255, (376, 1248, 3)), jnp.float32
    )
    out = mr.detect(params, img, (376, 1248), cfg)
    np.asarray(out["scores"])                         # compile + sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = mr.detect(params, img, (376, 1248), cfg)
        np.asarray(out["scores"])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    pp_ms, pp_host_ms = bench_pointpillars(args.iters)
    mr_ms = bench_maskrcnn(args.iters)
    print(json.dumps({
        "pointpillars_ms_per_scan": round(pp_ms, 2),
        "pointpillars_host_crop_ms": round(pp_host_ms, 2),
        "maskrcnn_ms_per_frame": round(mr_ms, 2),
    }))
    return pp_ms, mr_ms


if __name__ == "__main__":
    main()
