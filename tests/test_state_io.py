"""Checkpoint/resume round-trip: save a built map, load it, compare."""

import numpy as np
import pytest

from dspslam_tpu.objects import cuboid
from dspslam_tpu.slam import state_io


def test_roundtrip_from_slam_run(tmp_path):
    # reuse the stereo SLAM fixture machinery
    import sys

    sys.path.insert(0, "tests")
    from test_slam import FX, render, textured_world, TrackerConfig, BF, CX, CY, H, W
    from dspslam_tpu.frontend import orb
    from dspslam_tpu.slam.system import SLAMSystem

    world = textured_world()
    cfg = TrackerConfig(
        fx=FX, fy=FX, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=4,
    )
    system = SLAMSystem(
        tracker_cfg=cfg, orb_params=orb.ORBParams(n_features=400, n_levels=3)
    )
    for k in range(5):
        cam_x = k * 0.15
        system.track_stereo(
            render(world, cam_x),
            render(world, cam_x, baseline_px=FX * 0.4 / 10.0),
            0.1 * k,
        )
    path = str(tmp_path / "map_state.npz")
    state_io.save_state(system.map, path)
    loaded = state_io.load_state(path)

    assert set(loaded.keyframes) == set(
        k for k, kf in system.map.keyframes.items() if not kf.bad
    )
    assert len(loaded.points) == sum(
        1 for p in system.map.points.values() if not p.bad
    )
    for kf_id, kf in loaded.keyframes.items():
        np.testing.assert_allclose(kf.T_cw, system.map.keyframes[kf_id].T_cw)
        np.testing.assert_array_equal(
            kf.map_point_ids, system.map.keyframes[kf_id].map_point_ids
        )
        assert kf.covis == system.map.keyframes[kf_id].covis
    # observation graph intact
    some_p = next(iter(loaded.points.values()))
    assert some_p.observations == system.map.points[some_p.id].observations


def test_remove_outliers_model():
    rng = np.random.default_rng(3)
    verts = rng.uniform(-0.5, 0.5, (50, 3)).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] *= 2.0                     # scale 2
    T[:3, 3] = [1.0, 0.0, 5.0]
    inside_obj = rng.uniform(-0.4, 0.4, (30, 3))
    outside_obj = rng.uniform(2.0, 3.0, (10, 3))
    pts_w = np.concatenate(
        [inside_obj * 2.0 + T[:3, 3], outside_obj * 2.0 + T[:3, 3]]
    )
    mask = cuboid.remove_outliers_model(pts_w, T, verts, margin=0.3)
    assert mask[:30].all()
    assert not mask[30:].any()


def test_resume_and_continue_mints_fresh_ids(tmp_path):
    """Continuing a loaded session must not reuse loaded entity ids
    (the class-level id counters are fast-forwarded on load)."""
    from dspslam_tpu.slam.map import Frame, KeyFrame, Map, MapObject, MapPoint
    from dspslam_tpu.slam.state_io import load_state, save_state

    m = Map()
    feats = {
        "xy": np.zeros((4, 2), np.float32),
        "desc": np.zeros((4, 8), np.uint32),
        "angle": np.zeros(4, np.float32),
        "level": np.zeros(4, np.int32),
        "sigma2": np.ones(4, np.float32),
        "response": np.zeros(4, np.float32),
        "valid": np.ones(4, np.float32),
    }
    kf = KeyFrame(Frame(0.0, feats))
    m.add_keyframe(kf)
    p = MapPoint(np.zeros(3, np.float32), np.zeros(8, np.uint32), kf.id)
    m.add_point(p)
    m.add_observation(p, kf, 0)
    obj = MapObject(np.eye(4, dtype=np.float32), np.zeros(8, np.float32), kf.id)
    m.add_object(obj)
    path = str(tmp_path / "state.npz")
    save_state(m, path)

    loaded = load_state(path)
    kf2 = KeyFrame(Frame(1.0, feats))
    p2 = MapPoint(np.ones(3, np.float32), np.zeros(8, np.uint32), kf2.id)
    obj2 = MapObject(np.eye(4, dtype=np.float32), np.zeros(8, np.float32), kf2.id)
    assert kf2.id not in loaded.keyframes
    assert p2.id not in loaded.points
    assert obj2.id not in loaded.objects
    loaded.add_keyframe(kf2)
    loaded.add_point(p2)
    loaded.add_object(obj2)
    assert len(loaded.keyframes) == len(m.keyframes) + 1
    assert len(loaded.points) == len(m.points) + 1
    assert len(loaded.objects) == len(m.objects) + 1
