"""SLAM end-to-end smoke tests on a synthetic fronto-parallel-plane
stereo sequence: tracking accuracy, keyframing, map growth, savers."""

import os

import numpy as np
import pytest

from dspslam_tpu.frontend import orb
from dspslam_tpu.slam import tracking
from dspslam_tpu.slam.system import SLAMSystem
from dspslam_tpu.slam.tracking import State, TrackerConfig

FX = FY = 500.0
CX, CY = 320.0, 120.0
BASELINE = 0.4
BF = FX * BASELINE
PLANE_Z = 10.0
H, W = 240, 640


def textured_world(seed=0):
    """A wide textured strip; crops of it simulate a plane at Z=PLANE_Z."""
    rng = np.random.default_rng(seed)
    world = rng.normal(80, 10, (H, W * 3)).astype(np.float32)
    for _ in range(350):
        y, x = rng.integers(10, H - 20), rng.integers(10, W * 3 - 20)
        s = rng.integers(4, 12)
        world[y : y + s, x : x + s] = rng.uniform(150, 230)
    return world


def render(world, cam_x, baseline_px=0.0):
    """Camera at world x-offset cam_x (meters): image shifts by fx*x/Z px."""
    shift = int(round(FX * cam_x / PLANE_Z + baseline_px))
    x0 = W + shift
    return world[:, x0 : x0 + W]


@pytest.fixture(scope="module")
def slam_result():
    world = textured_world()
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=4,
    )
    system = SLAMSystem(
        tracker_cfg=cfg, orb_params=orb.ORBParams(n_features=600, n_levels=4)
    )
    true_x = []
    step = 0.15
    for k in range(8):
        cam_x = k * step
        img_l = render(world, cam_x)
        # right-camera content appears at u_l - disparity, so the crop
        # window moves right by fx*b/Z
        img_r = render(world, cam_x, baseline_px=FX * BASELINE / PLANE_Z)
        system.track_stereo(img_l, img_r, timestamp=k * 0.1)
        true_x.append(cam_x)
    return system, np.asarray(true_x)


class TestTracking:
    def test_initializes_and_stays_ok(self, slam_result):
        system, _ = slam_result
        assert system.state == State.OK

    def test_trajectory_accuracy(self, slam_result):
        system, true_x = slam_result
        est = []
        for ts, T_cw, lost in system.tracker.trajectory:
            assert not lost
            Rwc = T_cw[:3, :3].T
            twc = -Rwc @ T_cw[:3, 3]
            est.append(twc)
        est = np.asarray(est)
        # camera moves along +x; ATE RMSE within 5 cm over 1.05 m travelled
        err = est[:, 0] - true_x
        rmse = float(np.sqrt(np.mean(err**2)))
        assert rmse < 0.05, f"ATE RMSE {rmse}"
        # lateral drift bounded
        assert np.abs(est[:, 1:]).max() < 0.05

    def test_map_grows_with_keyframes(self, slam_result):
        system, _ = slam_result
        assert len(system.map.keyframes) >= 2
        assert len(system.map.points) > 100
        # covisibility connects consecutive keyframes
        kfs = sorted(system.map.keyframes)
        assert len(system.map.keyframes[kfs[1]].covis) > 0

    def test_stereo_depths_correct(self, slam_result):
        system, _ = slam_result
        kf0 = system.map.keyframes[min(system.map.keyframes)]
        d = kf0.depth[(kf0.depth > 0)]
        np.testing.assert_allclose(np.median(d), PLANE_Z, rtol=0.05)

    def test_map_points_on_plane(self, slam_result):
        system, _ = slam_result
        pos = np.stack([p.position for p in system.map.points.values()])
        # world frame == first camera frame; plane at z = PLANE_Z
        np.testing.assert_allclose(np.median(pos[:, 2]), PLANE_Z, rtol=0.05)


class TestSavers:
    def test_save_map_formats(self, slam_result, tmp_path):
        system, _ = slam_result
        system.save_map(str(tmp_path))
        pts = np.loadtxt(tmp_path / "MapPoints.txt")
        assert pts.shape[1] == 3 and len(pts) > 100
        cams = np.loadtxt(tmp_path / "Cameras.txt")
        assert cams.shape == (8, 12)
        # first camera at origin-ish
        np.testing.assert_allclose(cams[0].reshape(3, 4)[:, 3], 0, atol=1e-5)
        system.save_trajectory_tum(str(tmp_path / "tum.txt"))
        tum = np.loadtxt(tmp_path / "tum.txt")
        assert tum.shape == (8, 8)


class TestSystemFacade:
    """System-facade parity methods (System.h:91-140)."""

    def test_keyframe_trajectory_reset_mapchanged(self, slam_result, tmp_path):
        system, _ = slam_result
        path = tmp_path / "kf_tum.txt"
        system.save_keyframe_trajectory_tum(str(path))
        lines = path.read_text().strip().splitlines()
        n_good = sum(1 for kf in system.map.keyframes.values() if not kf.bad)
        assert len(lines) == n_good
        assert all(len(l.split()) == 8 for l in lines)

        assert system.map_changed() is True      # first call seeds
        assert system.map_changed() is False     # steady map

        system.shutdown()                        # no-op drain, keeps map
        assert len(system.map.keyframes) == n_good
