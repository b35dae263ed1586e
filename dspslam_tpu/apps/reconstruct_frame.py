"""Single-frame object reconstruction — the minimum end-to-end slice.

Equivalent of the reference's reconstruct_frame.py (offline detections ->
LiDAR crop/association -> Gauss-Newton pose+shape -> mesh), with every
per-object optimization batched into one jitted device program.

Usage:
    python -m dspslam_tpu.apps.reconstruct_frame \
        --sequence_dir <kitti_seq_dir> --frame_id 200 \
        --config configs/config_kitti.json --output_dir out/

Works against reference-format sequences (image_2/, velodyne/, calib.txt
+ .lbl or .npz label dirs). With --synthetic it runs on the built-in
analytic scene and sphere decoder (no weights needed).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax.numpy as jnp
import numpy as np

from .. import config as cfg_mod
from ..detect import offline, synthetic
from ..models import deepsdf
from ..objects import detections as det_mod
from ..shape import gn, mesh
from ..utils import io as io_mod
from ..utils.timing import StageTimer


def get_decoder(system_cfg):
    """Decoder (fn, params) from a DeepSDF experiment dir, or the analytic
    sphere fallback when no weights are configured."""
    if system_cfg.deepsdf_dir and os.path.isdir(system_cfg.deepsdf_dir):
        dec_cfg, params = deepsdf.load_torch_checkpoint(system_cfg.deepsdf_dir)
        return deepsdf.make_decoder_fn(dec_cfg), params
    params = deepsdf.make_sphere_params(code_len=system_cfg.optimizer.code_len)
    return deepsdf.sphere_decoder_fn, params


def reconstruct_frame_batch(decoder_fn, decoder_params, system_cfg, dets):
    """List of Detections -> batched GN results + per-object meshes."""
    d = system_cfg.detection
    batch = det_mod.pad_detections(
        dets, d.max_detections, d.max_surface_points, d.max_rays
    )
    run = gn.batched_reconstruct(decoder_fn, system_cfg.optimizer)
    out = run(
        decoder_params,
        jnp.asarray(batch["t_cam_obj"]),
        jnp.asarray(batch["pts"]),
        jnp.asarray(batch["pts_mask"]),
        jnp.asarray(batch["rays"]),
        jnp.asarray(batch["ray_mask"]),
        jnp.asarray(batch["depth"]),
        jnp.asarray(batch["fg_mask"]),
        jnp.zeros((d.max_detections, system_cfg.optimizer.code_len)),
    )
    return batch, {k: np.asarray(v) for k, v in out.items()}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sequence_dir")
    p.add_argument("--frame_id", type=int, default=0)
    p.add_argument("--config")
    p.add_argument("--output_dir", default="out")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--voxels_dim", type=int, default=None)
    args = p.parse_args(argv)

    system_cfg = (
        cfg_mod.SystemConfig.load(args.config)
        if args.config
        else cfg_mod.SystemConfig()
    )
    if args.voxels_dim:
        import dataclasses

        system_cfg = dataclasses.replace(system_cfg, voxels_dim=args.voxels_dim)

    timer = StageTimer()
    decoder_fn, decoder_params = get_decoder(system_cfg)

    with timer.stage("load_frame"):
        if args.synthetic:
            scene = synthetic.make_sphere_scene()
            velo, K, invK = scene.velo_pts, scene.K, scene.invK
            T_cam_velo, image_hw = scene.T_cam_velo, scene.image_hw
            boxes_3d, boxes_2d, masks_2d = (
                scene.boxes_3d, scene.boxes_2d, scene.masks_2d,
            )
        else:
            calib = io_mod.read_kitti_calib(
                os.path.join(args.sequence_dir, "calib.txt")
            )
            K, T_cam_velo = io_mod.kitti_cam2_calibration(calib)
            invK = np.linalg.inv(K).astype(np.float32)
            velo = io_mod.load_velodyne(
                os.path.join(
                    args.sequence_dir, "velodyne", f"{args.frame_id:06d}.bin"
                )
            )
            img = io_mod.load_image_rgb(
                os.path.join(
                    args.sequence_dir, "image_2", f"{args.frame_id:06d}.png"
                )
            )
            image_hw = img.shape[:2]
            boxes_3d = offline.load_labels_3d(
                system_cfg.detection.path_label_3d, args.frame_id
            )
            boxes_2d, masks_2d = offline.load_labels_2d(
                system_cfg.detection.path_label_2d, args.frame_id
            )

    with timer.stage("build_detections"):
        dets = det_mod.build_frame_detections(
            boxes_3d, masks_2d, boxes_2d, velo, K, invK, T_cam_velo, image_hw,
            max_lidar_points=system_cfg.detection.num_lidar_max,
            min_mask_area=system_cfg.detection.min_mask_area,
            bg_stride=system_cfg.detection.downsample_ratio,
            max_bg_rays=system_cfg.detection.max_bg_rays,
        )
        dets = [
            d for d in dets
            if d.num_surface_points >= system_cfg.detection.num_lidar_min
        ]

    with timer.stage("gauss_newton") as s:
        batch, results = reconstruct_frame_batch(
            decoder_fn, decoder_params, system_cfg, dets
        )

    os.makedirs(args.output_dir, exist_ok=True)
    extractor = mesh.MeshExtractor(
        decoder_fn, decoder_params, system_cfg.optimizer.code_len,
        system_cfg.voxels_dim,
    )
    summary = []
    for i in range(len(dets)):
        good = bool(results["is_good"][i]) and bool(batch["valid"][i] > 0)
        rec = {
            "index": i,
            "is_good": good,
            "loss": float(results["loss"][i]),
            "t_cam_obj": results["t_cam_obj"][i].tolist(),
            "code": results["code"][i].tolist(),
        }
        if good:
            with timer.stage("mesh"):
                m = extractor.extract_mesh_from_code(results["code"][i])
            ply = os.path.join(args.output_dir, f"object_{i}.ply")
            io_mod.write_mesh_ply(m["vertices"], m["faces"], ply)
            rec["mesh"] = ply
        summary.append(rec)

    with open(os.path.join(args.output_dir, "frame_recon.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(timer)
    print(
        f"reconstructed {sum(r['is_good'] for r in summary)}/{len(summary)} objects "
        f"-> {args.output_dir}"
    )
    return summary


if __name__ == "__main__":
    main()
