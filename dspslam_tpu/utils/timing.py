"""Stage timing with explicit device synchronization.

Replaces the reference's `torch.cuda.synchronize(); time.time()` pattern
(loss_utils.py:268-273) and the per-stage chrono prints (dsp_slam.cc:
76-115) with a reusable accumulator that reports median/mean per stage.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import numpy as np


class StageTimer:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str, sync: object = None):
        """Time a block; pass a jax array as `sync` to block on it at exit."""
        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            target = out.get("sync", sync)
            if target is not None:
                # device_get, not block_until_ready: on some remote TPU
                # backends (axon relay) only a host fetch truly awaits
                # execution.
                jax.device_get(target)
            self.samples[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float):
        """Record an externally-timed sample."""
        self.samples[name].append(seconds)

    def report(self) -> dict:
        return {
            name: {
                "median_ms": float(np.median(v) * 1e3),
                "mean_ms": float(np.mean(v) * 1e3),
                "p95_ms": float(np.percentile(v, 95) * 1e3),
                "max_ms": float(np.max(v) * 1e3),
                "total_ms": float(np.sum(v) * 1e3),
                "count": len(v),
            }
            for name, v in self.samples.items()
        }

    def summary_ms(self) -> dict:
        """Flat {stage: rounded p50/p95/total} dict sized for a bench
        JSON line — the self-attribution record the driver artifact
        carries (median/p95 locate the cost; total attributes the run's
        wall clock to stages)."""
        out = {}
        for name, s in sorted(self.report().items()):
            out[name] = {
                "p50": round(s["median_ms"], 1),
                "p95": round(s["p95_ms"], 1),
                "total": round(s["total_ms"], 1),
                "n": s["count"],
            }
        return out

    def __str__(self):
        rows = [
            f"{name:30s} median {s['median_ms']:8.2f} ms  mean {s['mean_ms']:8.2f} ms  n={s['count']}"
            for name, s in sorted(self.report().items())
        ]
        return "\n".join(rows)
