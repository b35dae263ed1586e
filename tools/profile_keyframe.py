"""Per-stage wall-clock profile of the keyframe path (run on real TPU).

Wraps LocalMapper/ObjectPipeline stage methods with perf counters and
runs the benchmark_slam world, printing mean ms per stage per keyframe.
"""

import inspect
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

    # getattr_static walks the MRO, so inherited staticmethods are seen
    # too (obj.__dict__ alone would miss them and pass self at call time)
    if isinstance(inspect.getattr_static(obj, name), staticmethod):
        wrapped = staticmethod(wrapped)
    setattr(obj, name, wrapped)


def main():
    from dspslam_tpu.apps import benchmark_slam as B
    from dspslam_tpu.slam.local_mapping import LocalMapper
    from dspslam_tpu.objects.pipeline import ObjectPipeline

    for name in ("_cull_points", "_dispatch_triangulate",
                 "_apply_triangulate", "dispatch_bundle_adjust",
                 "_apply_bundle_adjust", "_cull_keyframes", "process",
                 "poll"):
        wrap(LocalMapper, name)
    for name in ("_dispatch_measure", "_apply_measure", "_dispatch_recon",
                 "_apply_recon", "_cull_objects", "process_keyframe",
                 "dispatch_keyframe", "apply_keyframe", "collect_meshes"):
        wrap(ObjectPipeline, name, f"obj.{name}")

    from dspslam_tpu.detect.maskrcnn import Detector2D
    from dspslam_tpu.detect.pointpillars import Detector3D
    wrap(Detector3D, "dispatch", "det3d.dispatch")
    wrap(Detector3D, "collect", "det3d.collect")
    wrap(Detector2D, "dispatch", "det2d.dispatch")
    wrap(Detector2D, "collect", "det2d.collect")
    wrap(B.DetectorChannel, "__call__", "detector_channel")

    B.main(["--frames", "24"])
    print("\n=== keyframe stage profile (ms) ===")
    for k in sorted(times, key=lambda k: -float(np.sum(times[k]))):
        v = np.asarray(times[k]) * 1e3
        print(f"{k:28s} n={len(v):3d} med={np.median(v):8.1f} "
              f"mean={v.mean():8.1f} max={v.max():8.1f} "
              f"total={v.sum():8.0f}")


if __name__ == "__main__":
    main()
