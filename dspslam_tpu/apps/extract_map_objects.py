"""Decode saved shape codes to meshes — extract_map_objects.py equivalent.

Reads a MapObjects.txt (id / 3x4 Sim(3) Two row / code row triplets,
System_util.cc:122-146 format), re-decodes each code on a voxel grid and
writes per-object `<id>.ply` meshes plus `<id>_pose.npy` Sim(3) poses —
matching the reference tool's outputs (extract_map_objects.py:33-63).

Usage:
    python -m dspslam_tpu.apps.extract_map_objects \
        --map_dir out/map --config configs/config_kitti.json \
        [--voxels_dim 128]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .. import config as cfg_mod
from ..shape import mesh as mesh_mod
from ..utils import io as io_mod
from .reconstruct_frame import get_decoder


def load_map_objects(path: str):
    """Parse MapObjects.txt -> list of (id, Two (4, 4), code (L,))."""
    out = []
    with open(path) as f:
        lines = [l.strip() for l in f if l.strip()]
    i = 0
    while i + 2 < len(lines) + 1 and i + 2 <= len(lines):
        obj_id = int(lines[i])
        vals = np.fromstring(lines[i + 1], sep=" ")
        Two = np.eye(4, dtype=np.float32)
        Two[:3, :] = vals.reshape(3, 4)
        code = np.fromstring(lines[i + 2], sep=" ").astype(np.float32)
        out.append((obj_id, Two, code))
        i += 3
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--map_dir", required=True)
    p.add_argument("--config")
    p.add_argument("--voxels_dim", type=int, default=64)
    p.add_argument("--output_dir", default=None)
    p.add_argument(
        "--shard", action="store_true",
        help="shard the voxel-grid decode across all devices "
        "(parallel.mesh_utils dp mesh)",
    )
    args = p.parse_args(argv)

    system_cfg = (
        cfg_mod.SystemConfig.load(args.config)
        if args.config else cfg_mod.SystemConfig()
    )
    decoder_fn, decoder_params = get_decoder(system_cfg)
    out_dir = args.output_dir or os.path.join(args.map_dir, "meshes")
    os.makedirs(out_dir, exist_ok=True)

    objs = load_map_objects(os.path.join(args.map_dir, "MapObjects.txt"))
    device_mesh = None
    if args.shard:
        from ..parallel.mesh_utils import make_mesh

        device_mesh = make_mesh(tp=1)
    extractor = mesh_mod.MeshExtractor(
        decoder_fn, decoder_params,
        code_len=system_cfg.optimizer.code_len, voxels_dim=args.voxels_dim,
        mesh=device_mesh,
    )
    for obj_id, Two, code in objs:
        m = extractor.extract_mesh_from_code(code)
        io_mod.write_mesh_ply(
            m["vertices"], m["faces"], os.path.join(out_dir, f"{obj_id}.ply")
        )
        np.save(os.path.join(out_dir, f"{obj_id}_pose.npy"), Two)
        print(f"object {obj_id}: {len(m['vertices'])} verts -> {out_dir}")
    return objs


if __name__ == "__main__":
    main()
