"""Generate the checked-in mini-KITTI fixture (tests/fixtures/mini_kitti).

A 3-frame KITTI-layout sequence that drives apps/dsp_slam.py end to end
through the REAL on-disk code paths the synthetic in-memory tests skip:
calib.txt parsing, times.txt, image_2/image_3 PNG decode, velodyne .bin,
and reference-format `.lbl` (torch pickle) detection labels
(/root/reference/reconstruct/kitti_sequence.py:104-107, 240-273).

Deterministic: re-running reproduces the same bytes (fixed seeds).
Scene recipe follows the repo's synthetic-world rules (CLAUDE.md):
multi-depth textured layers for trackability, and a LiDAR sphere object
(matching the analytic sphere decoder the CLI falls back to) kept clear
of the ground so the 3D-box crop stays clean.

Usage: python tools/make_mini_kitti.py [out_dir]
"""

import json
import os
import sys

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from dspslam_tpu.datasets.synthetic import LayeredWorld  # noqa: E402

W, H = 512, 160
FX = 400.0
CX, CY = 256.0, 80.0
BASELINE = 0.4                  # m -> Camera.bf = 160
N_FRAMES = 3
STEP = 0.35                     # camera dolly per frame (m)
R_SPH = 1.0                     # object radius (m)
SPHERE_W = np.array([2.5, 0.45, 10.0], np.float32)   # world == cam0@t0
# box length chosen so the pipeline's metric prior scale = 1.1*l/2 == R
BOX_L = 2.0 * R_SPH / 1.1
BOX_W = BOX_H = 2.0 * R_SPH


def cam_to_velo(pc):
    """Camera frame (x right, y down, z fwd) -> velodyne (x fwd, y left,
    z up); the inverse of the Tr rotation written to calib.txt."""
    pc = np.asarray(pc, np.float32).reshape(-1, 3)
    return np.stack([pc[:, 2], -pc[:, 0], -pc[:, 1]], -1)


def make_scan(cam_x, world, rng):
    """Sphere surface + ground rings + the world's wall layers (~6k pts,
    velodyne frame, benchmark_slam.make_velodyne_scan recipe at 1/10
    density — offline labels mean no PointPillars here)."""
    parts = []
    elevs = np.radians(np.linspace(-24.0, -3.0, 12))
    azims = np.radians(np.linspace(-60.0, 60.0, 180))
    ee, aa = np.meshgrid(elevs, azims, indexing="ij")
    r = np.minimum(1.65 / np.sin(-ee), 30.0)
    g = np.stack(
        [r * np.cos(ee) * np.cos(aa), r * np.cos(ee) * np.sin(aa),
         r * np.sin(ee)], -1
    ).reshape(-1, 3)
    parts.append(g[r.reshape(-1) < 29.9])
    for z_l in world.depths:
        xs = np.arange(-8.0, 8.0, 0.5)
        ys = np.arange(-2.0, 1.5, 0.5)
        xx, yy = np.meshgrid(xs, ys)
        pc = np.stack([xx, yy, np.full_like(xx, z_l - 0.0)], -1).reshape(-1, 3)
        pc[:, 0] -= 0.0
        parts.append(cam_to_velo(pc))
    d = rng.normal(size=(700, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    c_cam = SPHERE_W - np.array([cam_x, 0.0, 0.0], np.float32)
    parts.append(cam_to_velo(c_cam + R_SPH * d))
    pts = np.concatenate(parts).astype(np.float32)
    pts += rng.normal(0.0, 0.008, pts.shape).astype(np.float32)
    refl = rng.uniform(0.0, 1.0, (len(pts), 1)).astype(np.float32)
    return np.concatenate([pts, refl], -1)


def make_labels(cam_x, rng):
    """(boxes_3d (1, 7) velodyne frame, boxes_2d (1, 5), mask (1, H, W))."""
    c_cam = SPHERE_W - np.array([cam_x, 0.0, 0.0], np.float32)
    c_velo = cam_to_velo(c_cam)[0]
    # KITTI box z is the BOTTOM face (kitti_box_to_pose_velo lifts h/2)
    box = np.array(
        [c_velo[0], c_velo[1], c_velo[2] - BOX_H / 2.0,
         BOX_W, BOX_L, BOX_H, 0.0], np.float32,
    )
    box[:3] += rng.normal(0.0, 0.02, 3).astype(np.float32)
    # projected disk mask
    u_c = FX * c_cam[0] / c_cam[2] + CX
    v_c = FX * c_cam[1] / c_cam[2] + CY
    r_px = FX * R_SPH / c_cam[2]
    uu, vv = np.meshgrid(np.arange(W), np.arange(H))
    mask = ((uu - u_c) ** 2 + (vv - v_c) ** 2) <= r_px**2
    ys, xs = np.nonzero(mask)
    box2d = np.array(
        [xs.min(), ys.min(), xs.max(), ys.max(), 0.99], np.float32
    )
    return box.reshape(1, 7), box2d.reshape(1, 5), mask[None]


def main(out_dir):
    import torch

    rng = np.random.default_rng(9)
    for sub in ("image_2", "image_3", "velodyne", "labels_2d", "labels_3d"):
        os.makedirs(os.path.join(out_dir, sub), exist_ok=True)

    world = LayeredWorld(
        W, H, FX, cx=CX, cy=CY, depths=(25.0, 12.0, 7.0),
        coverage=(1.0, 0.35, 0.25), ground_height=1.65,
        x_range=(-0.5, N_FRAMES * STEP + BASELINE + 0.5), seed=5,
    )

    for k in range(N_FRAMES):
        cam_x = k * STEP
        left = np.clip(world.render(cam_x), 0, 255).astype(np.uint8)
        right = np.clip(
            world.render(cam_x, baseline=BASELINE), 0, 255
        ).astype(np.uint8)
        Image.fromarray(left).save(
            os.path.join(out_dir, "image_2", f"{k:06d}.png")
        )
        Image.fromarray(right).save(
            os.path.join(out_dir, "image_3", f"{k:06d}.png")
        )
        make_scan(cam_x, world, rng).tofile(
            os.path.join(out_dir, "velodyne", f"{k:06d}.bin")
        )
        box3d, box2d, mask = make_labels(cam_x, rng)
        # reference .lbl format: torch pickles (kitti_sequence.py:271-272)
        torch.save(box3d, os.path.join(out_dir, "labels_3d", f"{k:06d}.lbl"))
        torch.save(
            {"pred_boxes": box2d, "pred_masks": mask},
            os.path.join(out_dir, "labels_2d", f"{k:06d}.lbl"),
        )

    # calib.txt: cam2 == cam0 (zero offset), P3 at -fx*baseline, velodyne
    # co-located with standard KITTI axis rotation
    def prow(name, P):
        return name + ": " + " ".join(f"{v:.6e}" for v in P.reshape(-1))

    P = np.array([[FX, 0, CX, 0], [0, FX, CY, 0], [0, 0, 1, 0]])
    P3 = P.copy()
    P3[0, 3] = -FX * BASELINE
    Tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], float)
    with open(os.path.join(out_dir, "calib.txt"), "w") as f:
        for name, M in (("P0", P), ("P1", P3), ("P2", P), ("P3", P3),
                        ("Tr", Tr)):
            f.write(prow(name, M) + "\n")
    np.savetxt(
        os.path.join(out_dir, "times.txt"),
        np.arange(N_FRAMES) * 0.1, fmt="%.6e",
    )

    # SystemConfig template; {SEQ} is substituted by the consumer
    cfg = {
        "sensor": "stereo_lidar",
        "camera": {
            "fx": FX, "fy": FX, "cx": CX, "cy": CY,
            "width": W, "height": H, "fps": 10.0,
            "baseline_fx": FX * BASELINE, "depth_threshold": 35.0,
        },
        "orb": {"n_features": 1000, "n_levels": 4},
        "detection": {
            "detect_online": False,
            "path_label_2d": "{SEQ}/labels_2d",
            "path_label_3d": "{SEQ}/labels_3d",
            "min_mask_area": 500.0,
            "max_detections": 4,
            "max_surface_points": 256,
            "max_rays": 256,
        },
        "voxels_dim": 16,
    }
    with open(os.path.join(out_dir, "config.template.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main(
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(
            os.path.dirname(__file__), "..", "tests", "fixtures", "mini_kitti"
        )
    )
