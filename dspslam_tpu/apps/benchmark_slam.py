"""End-to-end SLAM throughput benchmark on live hardware.

Runs the FULL object-aware stereo pipeline (ORB x2, stereo depth,
projection matching, motion-only GN, keyframing, local mapping with
joint BA, per-keyframe object GN + meshes) over an in-memory synthetic
KITTI-like sequence and reports steady-state frames/second — the
reference's headline "operates at 10 fps" claim (README.md:3), measured
the same way (wall clock around the per-frame track call,
dsp_slam.cc:76-115).

The world is a datasets.synthetic.LayeredWorld: ground plane + three
depth layers with subpixel-exact stereo, the same information structure
as a real street scene (near ground anchors camera y/z; see the module
docstring for the failure modes of simpler fixtures).

Usage:  python -m dspslam_tpu.apps.benchmark_slam [--frames 40]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

from ..datasets.synthetic import LayeredWorld
from ..frontend import orb
from ..models import deepsdf
from ..objects.detections import Detection
from ..objects.pipeline import ObjectPipeline
from ..shape import gn
from ..slam.system import SLAMSystem
from ..slam.tracking import TrackerConfig

FX = FY = 707.0912
CX, CY = 601.8873, 183.1104
BF = 379.8145
H, W = 376, 1241
BASELINE_M = BF / FX
CODE_LEN = 64
SPHERES_W = np.array([[2.0, 1.0, 9.0], [-4.0, 0.5, 14.0]], np.float32)
RADIUS = 1.0


def build_world(seed=0, x_max=40.0):
    return LayeredWorld(
        W, H, FX, cx=CX, cy=CY, depths=(25.0, 12.0, 7.0),
        ground_height=1.65, x_range=(-1.0, x_max), seed=seed,
    )


def render(world, cam_x, baseline_m=0.0):
    return world.render(cam_x, baseline_m)


def make_detections(cam_x, rng):
    dets = []
    for c_w in SPHERES_W:
        c = c_w - np.array([cam_x, 0, 0], np.float32)
        if c[2] < 3.0:
            continue
        d = rng.normal(size=(400, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        toc = -c / np.linalg.norm(c)
        d = d[(d @ toc) > 0.1][:250]
        pts = (c + RADIUS * d).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] *= 2.0
        T[:3, 3] = c + rng.normal(0, 0.05, 3)
        uv = pts[:, :2] / pts[:, 2:3]
        rays = np.concatenate([uv, np.ones((len(uv), 1))], -1).astype(np.float32)
        bg_dir = (c / np.linalg.norm(c))[None, :] + rng.normal(0, 0.3, (80, 3))
        bg_dir[:, 2] = np.abs(bg_dir[:, 2]) + 0.5
        bg = (bg_dir / bg_dir[:, 2:3]).astype(np.float32)[:60]
        dets.append(Detection(
            T_cam_obj=T, scale=2.0, box_size=np.full(3, 2.0, np.float32),
            surface_points=pts,
            rays=np.concatenate([rays, bg]), depth=pts[:, 2].copy(),
            num_foreground=len(rays),
        ))
    return dets


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--warmup", type=int, default=6)
    p.add_argument("--no_objects", action="store_true")
    p.add_argument("--no_pipeline", action="store_true",
                   help="disable one-frame-lag pipelined tracking")
    p.add_argument("--sync_ba", action="store_true",
                   help="apply local BA synchronously at each keyframe")
    p.add_argument("--async_kf", action="store_true",
                   help="spread keyframe work over subsequent frames "
                   "(bounds worst-case latency; raises the median)")
    p.add_argument("--mono", action="store_true",
                   help="monocular mode at reference mono settings "
                   "(4000 features; Redwood/Freiburg pacing is 15/25 fps)")
    args = p.parse_args(argv)
    if args.mono:
        return main_mono(args)

    world = build_world()
    rng = np.random.default_rng(1)
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=400, max_frames_between_kf=5,
        search_radius_motion=25.0,
        pipelined=not args.no_pipeline,
    )
    cam_xs = {}

    def detection_source(frame_idx):
        return make_detections(cam_xs[frame_idx], rng)

    def pipeline_factory(slam_map):
        return ObjectPipeline(
            slam_map, deepsdf.sphere_decoder_fn,
            deepsdf.make_sphere_params(code_len=CODE_LEN),
            gn.GNConfig(code_len=CODE_LEN, k4=0.0, num_iterations=10),
            max_detections=8, max_surface_points=256, max_rays=512,
            extract_meshes=True, voxels_dim=33,
        )

    from ..slam.local_mapping import LocalMapperConfig

    system = SLAMSystem(
        tracker_cfg=cfg,
        orb_params=orb.ORBParams(n_features=2000, n_levels=8),
        object_pipeline_factory=None if args.no_objects else pipeline_factory,
        detection_source=None if args.no_objects else detection_source,
        local_mapper_cfg=LocalMapperConfig(
            fx=FX, fy=FY, cx=CX, cy=CY, bf=BF,
            async_ba=not args.sync_ba,
            async_keyframe=args.async_kf,
        ),
    )

    import jax

    step = 0.3
    times = []
    # double-buffered loader: upload pair k+1 asynchronously while frame k
    # computes (the standard producer/consumer structure of the reference's
    # main loop; host->device transfer otherwise serializes on relay TPUs)
    def upload(k):
        cam_xs[k] = k * step
        # uint8 frames, as a real camera delivers them: 4x less relay
        # bandwidth than float32; device programs cast on entry
        l = jax.device_put(
            np.clip(render(world, cam_xs[k]), 0, 255).astype(np.uint8)
        )
        r = jax.device_put(
            np.clip(render(world, cam_xs[k], BASELINE_M), 0, 255).astype(np.uint8)
        )
        return l, r

    pair = upload(0)
    for k in range(args.frames):
        next_pair = upload(k + 1) if k + 1 < args.frames else None
        t0 = time.perf_counter()
        system.track_stereo(pair[0], pair[1], k * 0.1)
        times.append(time.perf_counter() - t0)
        pair = next_pair
    system.flush()

    steady = np.asarray(times[args.warmup :])
    fps = 1.0 / np.median(steady)

    # trajectory accuracy against the synthetic ground truth (pure +x
    # dolly at `step` m/frame), no alignment gauge games: SE(3) Umeyama
    from ..utils.evaluation import ate_rmse

    est, gt = [], []
    for ts, T_cw, lost in system.tracker.trajectory:
        if lost:
            continue
        T_wc = np.eye(4)
        T_wc[:3, :3] = T_cw[:3, :3].T
        T_wc[:3, 3] = -T_cw[:3, :3].T @ T_cw[:3, 3]
        est.append(T_wc)
        g = np.eye(4)
        g[0, 3] = cam_xs[int(round(ts / 0.1))]
        gt.append(g)
    ate = ate_rmse(np.stack(est), np.stack(gt))

    print(
        f"state={system.state.name} kfs={len(system.map.keyframes)} "
        f"pts={len(system.map.points)} objs={len(system.map.objects)}"
    )
    print(
        f"median frame {np.median(steady) * 1e3:.1f} ms, mean "
        f"{steady.mean() * 1e3:.1f} ms -> {fps:.1f} fps (target >= 10); "
        f"ATE RMSE {ate['rmse'] * 100:.1f} cm over "
        f"{(args.frames - 1) * step:.1f} m"
    )
    print(json.dumps({
        "metric": "slam_fps_end_to_end", "value": round(float(fps), 2),
        "unit": "fps", "vs_baseline": round(float(fps) / 10.0, 3),
        "ate_rmse_cm": round(ate["rmse"] * 100, 2),
    }))
    return fps


def main_mono(args):
    """Monocular throughput at the reference's mono settings (4000
    features, 8 levels — redwood/freiburg YAMLs; pacing targets 15 and
    25 fps). Objects off: mono objects reconstruct every ~5th keyframe
    from accumulated map points, negligible per-frame cost."""
    import jax

    world = build_world()
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=400, max_frames_between_kf=5,
        search_radius_motion=25.0,
        pipelined=not args.no_pipeline,
    )
    system = SLAMSystem(
        tracker_cfg=cfg,
        orb_params=orb.ORBParams(n_features=4000, n_levels=8),
    )
    step = 0.3
    times = []

    def upload(k):
        return jax.device_put(
            np.clip(render(world, k * step), 0, 255).astype(np.uint8)
        )

    img = upload(0)
    for k in range(args.frames):
        nxt = upload(k + 1) if k + 1 < args.frames else None
        t0 = time.perf_counter()
        system.track_mono(img, k * 0.1)
        times.append(time.perf_counter() - t0)
        img = nxt
    system.flush()

    steady = np.asarray(times[args.warmup :])
    fps = 1.0 / np.median(steady)
    print(
        f"state={system.state.name} kfs={len(system.map.keyframes)} "
        f"pts={len(system.map.points)}"
    )
    print(
        f"median frame {np.median(steady) * 1e3:.1f} ms, mean "
        f"{steady.mean() * 1e3:.1f} ms -> {fps:.1f} fps "
        f"(mono pacing targets 15 / 25)"
    )
    print(json.dumps({
        "metric": "mono_slam_fps", "value": round(float(fps), 2),
        "unit": "fps", "vs_baseline": round(float(fps) / 25.0, 3),
    }))
    return fps


if __name__ == "__main__":
    main()
