"""End-to-end CLI smoke over the checked-in mini-KITTI fixture.

Drives apps/dsp_slam.py through the REAL on-disk paths the synthetic
in-memory tests bypass — calib.txt parsing, times.txt, PNG stereo pairs,
velodyne .bin, reference-format .lbl labels — and asserts the three map
files (System_util.cc:109-149 formats) parse back.
Fixture generator: tools/make_mini_kitti.py.
"""

import json
import os

import numpy as np
import pytest

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "mini_kitti")


@pytest.fixture(scope="module")
def run_cli(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mini_kitti_run")
    with open(os.path.join(FIXTURE, "config.template.json")) as f:
        cfg = f.read().replace("{SEQ}", FIXTURE)
    cfg_path = tmp / "config.json"
    cfg_path.write_text(cfg)
    map_dir = tmp / "map"

    from dspslam_tpu.apps import dsp_slam

    system = dsp_slam.main([
        "--sequence_dir", FIXTURE,
        "--config", str(cfg_path),
        "--map_dir", str(map_dir),
        "--no_loop",
    ])
    return system, str(map_dir)


def test_sequence_layout_loads():
    from dspslam_tpu.config import DetectionConfig
    from dspslam_tpu.datasets.kitti import KITTISequence

    with open(os.path.join(FIXTURE, "config.template.json")) as f:
        det = json.load(f)["detection"]
    det = {k: (v.replace("{SEQ}", FIXTURE) if isinstance(v, str) else v)
           for k, v in det.items()}
    seq = KITTISequence(FIXTURE, DetectionConfig(**det))
    assert seq.num_frames == 3
    assert seq.timestamp(1) == pytest.approx(0.1)
    l, r = seq.load_stereo_gray(0)
    assert l.shape == (160, 512) and r.shape == (160, 512)
    velo = seq.load_velodyne(0)
    assert velo.shape[1] == 4 and len(velo) > 3000
    # calib chain: fx from P2, velodyne extrinsic from Tr
    assert seq.K[0, 0] == pytest.approx(400.0)
    fwd_velo = seq.T_cam_velo[:3, :3] @ np.array([1.0, 0, 0])
    np.testing.assert_allclose(fwd_velo, [0, 0, 1], atol=1e-6)
    # .lbl (torch pickle) labels feed real detections
    dets = seq.get_frame_detections(0, (160, 512))
    assert len(dets) == 1
    d = dets[0]
    assert d.mask is not None and len(d.surface_points) >= 50
    # the crop stayed on the sphere: all surface points within its AABB
    c = np.array([2.5, 0.45, 10.0])
    assert np.all(np.abs(d.surface_points - c) < 1.3)


def test_cli_tracks_and_saves(run_cli):
    system, map_dir = run_cli
    assert system.state.name == "OK"
    assert len(system.map.keyframes) >= 1
    assert len(system.map.points) > 100

    # Cameras.txt: one KITTI 3x4 pose row per frame
    cams = np.loadtxt(os.path.join(map_dir, "Cameras.txt")).reshape(-1, 3, 4)
    assert cams.shape[0] == 3
    # dolly along +x at 0.35 m/frame
    dx = cams[-1, 0, 3] - cams[0, 0, 3]
    assert dx == pytest.approx(0.70, abs=0.08)
    np.testing.assert_allclose(cams[0, :3, :3], np.eye(3), atol=1e-5)

    # MapPoints.txt: xyz rows at plausible world depths
    pts = np.loadtxt(os.path.join(map_dir, "MapPoints.txt")).reshape(-1, 3)
    assert len(pts) > 100
    assert 4.0 < np.median(pts[:, 2]) < 30.0


def test_cli_reconstructs_object(run_cli):
    system, map_dir = run_cli
    from dspslam_tpu.apps.extract_map_objects import load_map_objects

    objs = list(load_map_objects(os.path.join(map_dir, "MapObjects.txt")))
    assert len(objs) >= 1
    obj_id, Two, code = objs[0]
    assert Two.shape == (4, 4) and code.shape == (64,)
    # the sphere sits ~10 m ahead, ~2.5 m right of the first camera
    center = Two[:3, 3]
    assert np.linalg.norm(center - np.array([2.5, 0.45, 10.0])) < 1.0
    # mesh export alongside (save_map writes meshes/<id>.ply)
    ply = os.path.join(map_dir, "meshes", f"{obj_id}.ply")
    if os.path.exists(ply):
        from dspslam_tpu.utils.io import read_mesh_ply

        v, f = read_mesh_ply(ply)
        assert len(v) > 0 and len(f) > 0
