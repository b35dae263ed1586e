"""Per-stage wall-clock profile of the keyframe path (run on real TPU).

Wraps LocalMapper/ObjectPipeline stage methods with perf counters and
runs the benchmark_slam world, printing mean ms per stage per keyframe.
"""

import time
from collections import defaultdict

import numpy as np

times = defaultdict(list)


def wrap(obj, name, label=None):
    fn = getattr(obj, name)
    lab = label or name

    def wrapped(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        times[lab].append(time.perf_counter() - t0)
        return out

    setattr(obj, name, wrapped)


def main():
    from dspslam_tpu.apps import benchmark_slam as B
    from dspslam_tpu.slam.local_mapping import LocalMapper
    from dspslam_tpu.objects.pipeline import ObjectPipeline

    for name in ("_cull_points", "_create_new_points", "_fuse_duplicates",
                 "local_bundle_adjust", "_cull_keyframes", "process"):
        wrap(LocalMapper, name)
    for name in ("_measure_associated", "_reconstruct_new", "_cull_objects",
                 "process_keyframe"):
        wrap(ObjectPipeline, name, f"obj.{name}")

    import sys
    B.main(["--frames", "20"])
    print("\n=== keyframe stage profile (ms) ===")
    for k in sorted(times, key=lambda k: -float(np.sum(times[k]))):
        v = np.asarray(times[k]) * 1e3
        print(f"{k:28s} n={len(v):3d} mean={v.mean():8.1f} max={v.max():8.1f} "
              f"total={v.sum():8.0f}")


if __name__ == "__main__":
    main()
