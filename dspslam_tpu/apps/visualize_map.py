"""Joint map visualization — visualize_map.py equivalent, headless.

Loads a saved map directory (MapPoints.txt + Cameras.txt + extracted
meshes), filters points by percentile (visualize_map.py:46-97's outlier
trim), and writes (a) a combined world-frame PLY with all object meshes
placed by their Sim(3) poses and (b) a top-down PNG snapshot.

Usage:
    python -m dspslam_tpu.apps.visualize_map --map_dir out/map
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..utils import io as io_mod
from .extract_map_objects import load_map_objects


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--map_dir", required=True)
    p.add_argument("--percentile", type=float, default=98.0)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    pts_path = os.path.join(args.map_dir, "MapPoints.txt")
    pts = np.loadtxt(pts_path) if os.path.exists(pts_path) else np.zeros((0, 3))
    if len(pts):
        # trim outliers by distance percentile
        center = np.median(pts, axis=0)
        d = np.linalg.norm(pts - center, axis=-1)
        pts = pts[d <= np.percentile(d, args.percentile)]

    # gather object meshes (if extracted) into world frame
    mesh_dir = os.path.join(args.map_dir, "meshes")
    all_v, all_f = [], []
    offset = 0
    obj_path = os.path.join(args.map_dir, "MapObjects.txt")
    if os.path.isdir(mesh_dir) and os.path.exists(obj_path):
        for obj_id, Two, _code in load_map_objects(obj_path):
            ply = os.path.join(mesh_dir, f"{obj_id}.ply")
            if not os.path.exists(ply):
                continue
            v, f = io_mod.read_mesh_ply(ply)
            v_world = v @ Two[:3, :3].T + Two[:3, 3]
            all_v.append(v_world)
            all_f.append(f + offset)
            offset += len(v)

    out = args.output or os.path.join(args.map_dir, "joint_map.ply")
    verts = np.concatenate([pts.astype(np.float32)] + all_v) if (len(pts) or all_v) \
        else np.zeros((0, 3), np.float32)
    faces = np.concatenate(all_f) + (len(pts) if all_f else 0) if all_f \
        else np.zeros((0, 3), np.int32)
    if all_f:
        faces = np.concatenate(all_f) + len(pts)
    io_mod.write_mesh_ply(verts, faces, out)
    print(f"wrote {out}: {len(verts)} vertices, {len(faces)} faces")

    # top-down snapshot
    png = os.path.splitext(out)[0] + ".png"
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 8))
        if len(pts):
            ax.scatter(pts[:, 0], pts[:, 2], s=1, c="gray", alpha=0.4)
        for v in all_v:
            ax.scatter(v[::7, 0], v[::7, 2], s=2, c="red", alpha=0.6)
        cams_path = os.path.join(args.map_dir, "Cameras.txt")
        if os.path.exists(cams_path):
            cams = np.loadtxt(cams_path).reshape(-1, 3, 4)
            ax.plot(cams[:, 0, 3], cams[:, 2, 3], "b-", linewidth=1)
        ax.set_aspect("equal")
        fig.savefig(png, dpi=120, bbox_inches="tight")
        plt.close(fig)
        print(f"wrote {png}")
    except Exception as e:  # matplotlib optional
        print(f"snapshot skipped: {e}")


if __name__ == "__main__":
    main()
