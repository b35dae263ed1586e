"""Stereo+LiDAR object SLAM CLI — the dsp_slam.cc equivalent.

Usage:
    python -m dspslam_tpu.apps.dsp_slam \
        --sequence_dir <kitti_seq> --settings configs/KITTI04-12.yaml \
        --config configs/config_kitti.json --map_dir out/map \
        [--frames N] [--no_objects] [--no_loop]

Per-frame loop mirrors dsp_slam.cc:62-105: track stereo, feed per-KF
object detections (offline labels), save the map + trajectory at the
end, print median/mean tracking times.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .. import config as cfg_mod
from ..datasets.kitti import KITTISequence
from ..frontend import orb
from ..objects.pipeline import ObjectPipeline
from ..slam.system import SLAMSystem
from ..slam.tracking import TrackerConfig
from ..utils.timing import StageTimer
from .reconstruct_frame import get_decoder


def build_system(system_cfg: cfg_mod.SystemConfig, sequence, enable_objects=True,
                 enable_loop=True, vocabulary=None, pipelined=False):
    cam = system_cfg.camera
    tracker_cfg = TrackerConfig(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.baseline_fx,
        width=cam.width, height=cam.height, th_depth=cam.depth_threshold,
        max_frames_between_kf=int(cam.fps),
        dist_coeffs=(cam.k1, cam.k2, cam.p1, cam.p2, cam.k3),
        pipelined=pipelined,
    )
    orb_params = orb.ORBParams(
        n_features=system_cfg.orb.n_features,
        scale_factor=system_cfg.orb.scale_factor,
        n_levels=system_cfg.orb.n_levels,
        fast_threshold=system_cfg.orb.ini_th_fast,
        min_threshold=system_cfg.orb.min_th_fast,
    )

    pipeline_factory = None
    if enable_objects:
        decoder_fn, decoder_params = get_decoder(system_cfg)
        d = system_cfg.detection

        def pipeline_factory(slam_map):
            return ObjectPipeline(
                slam_map, decoder_fn, decoder_params, system_cfg.optimizer,
                max_detections=d.max_detections,
                max_surface_points=d.max_surface_points,
                max_rays=d.max_rays,
                voxels_dim=system_cfg.voxels_dim,
            )

    detection_source = None
    if enable_objects and sequence is not None and sequence.det_cfg is not None:
        image_hw = (cam.height, cam.width)

        def detection_source(frame_idx):
            try:
                return sequence.get_frame_detections(frame_idx, image_hw)
            except FileNotFoundError:
                return []

    system = SLAMSystem(
        tracker_cfg=tracker_cfg,
        orb_params=orb_params,
        object_pipeline_factory=pipeline_factory,
        detection_source=detection_source,
    )
    if enable_loop and vocabulary is not None:
        system.enable_loop_closing(vocabulary, fix_scale=True)
    return system


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sequence_dir", required=True)
    p.add_argument("--settings", help="per-sequence YAML (reference format)")
    p.add_argument("--config", help="dataset JSON (reference format)")
    p.add_argument("--map_dir", default="map")
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--no_objects", action="store_true")
    p.add_argument("--no_loop", action="store_true")
    p.add_argument("--vocabulary", help="trained vocabulary .npz")
    p.add_argument("--profile_dir", help="write a jax.profiler trace here")
    p.add_argument(
        "--save_state", help="write a resumable map checkpoint (npz) here"
    )
    p.add_argument("--overlay_dir", help="write per-frame tracking overlays")
    p.add_argument(
        "--save_frames_dir",
        help="per-frame map dumps (System::SaveMapCurrentFrame format; "
        "feed to `visualize_map --follow` for a live view)",
    )
    p.add_argument("--save_frames_every", type=int, default=1)
    p.add_argument(
        "--pipeline", action="store_true",
        help="one-frame-lag pipelined tracking (higher throughput; "
        "overlays are emitted when each frame finalizes, one frame late)",
    )
    p.add_argument(
        "--live_view_dir",
        help="live in-run viewer: refreshes map.png/frame.png/index.html "
        "here during tracking (the headless Viewer-thread equivalent)",
    )
    p.add_argument(
        "--live_view_port", type=int, default=None,
        help="also serve --live_view_dir over HTTP (auto-refreshing page)",
    )
    p.add_argument("--live_view_every", type=int, default=5)
    args = p.parse_args(argv)

    system_cfg = (
        cfg_mod.SystemConfig.load(args.config)
        if args.config else cfg_mod.SystemConfig()
    )
    if args.settings:
        system_cfg = cfg_mod.SystemConfig.from_reference_yaml(
            args.settings, base=system_cfg
        )

    seq = KITTISequence(args.sequence_dir, system_cfg.detection)
    voc = None
    if args.vocabulary and os.path.exists(args.vocabulary):
        from ..place.vocabulary import Vocabulary

        # .npz (self-trained) or the reference's pretrained DBoW2
        # ORBvoc.bin/.txt (System.cc:76-87; use the matching
        # ORB.pattern=reference setting for bit compatibility)
        voc = Vocabulary.load_any(args.vocabulary)

    system = build_system(
        system_cfg, seq,
        enable_objects=not args.no_objects,
        enable_loop=not args.no_loop and voc is not None,
        vocabulary=voc,
        pipelined=args.pipeline,
    )

    n = args.frames or seq.num_frames
    timer = StageTimer()
    if args.profile_dir:
        import jax

        jax.profiler.start_trace(args.profile_dir)
    # under --pipeline results surface one frame late: overlays are keyed
    # by the finalized frame's timestamp, matching FrameDrawer semantics
    # (the reference's drawer also renders the last FINISHED frame,
    # FrameDrawer.cc:30-80)
    overlay_pending: dict = {}

    live = None
    if args.live_view_dir:
        from ..viz.live_viewer import LiveViewer

        live = LiveViewer(
            system, args.live_view_dir, every=args.live_view_every,
            serve_port=args.live_view_port,
        )

    def write_overlay(frame):
        if frame is None:
            return
        from PIL import Image

        from ..viz import frame_drawer

        fid, img = overlay_pending.pop(
            round(float(frame.timestamp), 6), (None, None)
        )
        if fid is None:
            return
        os.makedirs(args.overlay_dir, exist_ok=True)
        overlay = frame_drawer.draw_frame(
            img, frame.feats, frame.map_point_ids,
            state=system.state.name,
        )
        Image.fromarray(overlay).save(
            os.path.join(args.overlay_dir, f"{fid:06d}.png")
        )

    recent_imgs: dict = {}
    for frame_id in range(n):
        img_l, img_r = seq.load_stereo_gray(frame_id)
        if args.overlay_dir:
            overlay_pending[round(float(seq.timestamp(frame_id)), 6)] = (
                frame_id, img_l,
            )
        if live is not None:
            recent_imgs[round(float(seq.timestamp(frame_id)), 6)] = img_l
            while len(recent_imgs) > 3:
                recent_imgs.pop(next(iter(recent_imgs)))
        with timer.stage("track"):
            frame = system.track_stereo(img_l, img_r, seq.timestamp(frame_id))
        if args.overlay_dir:
            write_overlay(frame)
            while len(overlay_pending) > 8:     # dropped/lost frames
                overlay_pending.pop(next(iter(overlay_pending)))
        if live is not None:
            img_of_frame = None if frame is None else recent_imgs.get(
                round(float(frame.timestamp), 6)
            )
            live.tick(frame_id, frame=frame, img=img_of_frame)
        if args.save_frames_dir and frame_id % args.save_frames_every == 0:
            system.save_map_current_frame(args.save_frames_dir, frame_id)
        if frame_id % 20 == 0:
            print(
                f"frame {frame_id}/{n} state={system.state.name} "
                f"kfs={len(system.map.keyframes)} pts={len(system.map.points)} "
                f"objs={len(system.map.objects)}"
            )

    last = system.flush()
    if args.overlay_dir:
        write_overlay(last)
    if live is not None:
        live._last_render = 0.0          # force a final refresh
        live.tick(0, frame=None, img=None)
        live.close()
    if args.profile_dir:
        import jax

        jax.profiler.stop_trace()
    os.makedirs(args.map_dir, exist_ok=True)
    system.save_map(args.map_dir)
    if args.save_state:
        from ..slam import state_io

        state_io.save_state(system.map, args.save_state)
    from ..viz import renderer as viz_renderer

    viz_renderer.save_map_snapshot(
        system.map, os.path.join(args.map_dir, "map_snapshot.png")
    )
    print(timer)
    stats = timer.report().get("track", {})
    print(
        f"median tracking time: {stats.get('median_ms', 0):.1f} ms, "
        f"mean: {stats.get('mean_ms', 0):.1f} ms"
    )
    return system


if __name__ == "__main__":
    main()
