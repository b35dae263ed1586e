"""Monocular SLAM end-to-end: two-view initialization on a synthetic
layered scene, tracking with triangulated map growth, scale-free
trajectory consistency."""

import numpy as np
import pytest

from dspslam_tpu.frontend import orb
from dspslam_tpu.slam.system import SLAMSystem
from dspslam_tpu.slam.tracking import State, TrackerConfig

FX = FY = 500.0
CX, CY = 320.0, 120.0
FAR_Z, NEAR_Z = 5.0, 2.5
H, W = 240, 640


def textured_world(seed=4):
    rng = np.random.default_rng(seed)
    far = rng.normal(80, 10, (H, 4 * W)).astype(np.float32)
    for _ in range(700):
        y, x = rng.integers(10, H - 20), rng.integers(10, 4 * W - 20)
        s = rng.integers(4, 12)
        far[y : y + s, x : x + s] = rng.uniform(150, 230)
    # near layer: LARGE, internally-textured patches. Small uniform squares
    # yield only boundary features whose descriptors sample the (parallax-
    # shifting) background and never match across frames.
    near = np.full((H, 8 * W), np.nan, np.float32)
    for _ in range(160):
        y, x = rng.integers(10, H - 48), rng.integers(10, 8 * W - 48)
        s = int(rng.integers(24, 44))
        patch = rng.normal(120, 25, (s, s)).astype(np.float32)
        for _ in range(6):
            py, px = rng.integers(2, s - 10, 2)
            q = rng.integers(4, 8)
            patch[py : py + q, px : px + q] = rng.uniform(30, 240)
        near[y : y + s, x : x + s] = patch
    return far, near


def render(world, cam_x):
    far, near = world
    sf = int(round(FX * cam_x / FAR_Z))
    sn = int(round(FX * cam_x / NEAR_Z))
    img = far[:, W + sf : 2 * W + sf].copy()
    crop = near[:, W + sn : W + sn + W]
    m = ~np.isnan(crop)
    img[m] = crop[m]
    return img


@pytest.fixture(scope="module")
def mono_run():
    world = textured_world()
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H,
        max_frames_between_kf=3, search_radius_motion=40.0,
    )
    system = SLAMSystem(
        tracker_cfg=cfg, orb_params=orb.ORBParams(n_features=600, n_levels=4)
    )
    step = 0.12
    xs = [k * step for k in range(10)]
    for k, x in enumerate(xs):
        system.track_mono(render(world, x), timestamp=0.1 * k)
    return system, np.asarray(xs)


class TestMonoSLAM:
    def test_initializes(self, mono_run):
        system, _ = mono_run
        assert system.state == State.OK
        assert len(system.map.keyframes) >= 2
        assert len(system.map.points) > 80

    def test_trajectory_straight_and_consistent(self, mono_run):
        system, xs = mono_run
        est = []
        for ts, T_cw, lost in system.tracker.trajectory:
            if lost:
                continue
            est.append(-T_cw[:3, :3].T @ T_cw[:3, 3])
        est = np.asarray(est)
        assert len(est) >= 8
        # motion is along +x (monocular scale is free): dominant axis
        total = est[-1] - est[0]
        assert abs(total[0]) > 5 * abs(total[1])
        assert abs(total[0]) > 5 * abs(total[2])
        # uniform steps: the per-frame x increments should be near-constant
        dx = np.diff(est[:, 0])
        dx = dx[np.abs(dx) > 1e-6]
        assert len(dx) >= 5
        assert np.std(dx) / abs(np.mean(dx)) < 0.2

    def test_map_structure_two_depth_layers(self, mono_run):
        system, _ = mono_run
        pos = np.stack([p.position for p in system.map.points.values()])
        z = pos[:, 2]
        z = z[(z > 0) & np.isfinite(z)]
        far_med = np.median(z)
        # scale-free: the near layer sits at half the far depth. The far
        # plane dominates the feature budget, so just require that SOME
        # triangulated points landed on the near layer at the right ratio.
        near_pts = ((z > 0.35 * far_med) & (z < 0.7 * far_med)).sum()
        assert near_pts >= 3, f"near-layer points: {near_pts}"

    def test_triangulation_grew_map(self, mono_run):
        system, _ = mono_run
        # initial two-view map is ~100-300 points; triangulation should add
        kf_ids = sorted(system.map.keyframes)
        later_pts = sum(
            1 for p in system.map.points.values()
            if p.ref_kf_id not in kf_ids[:2]
        )
        assert later_pts > 30
