"""RGBD tracking mode: depth-image input synthesizes virtual stereo."""

import numpy as np
import pytest

from dspslam_tpu.frontend import orb
from dspslam_tpu.slam.system import SLAMSystem
from dspslam_tpu.slam.tracking import State, TrackerConfig

FX = FY = 500.0
CX, CY = 320.0, 120.0
BF = 200.0
FAR_Z, NEAR_Z = 10.0, 5.0
H, W = 240, 640


def world_and_depth(seed=8):
    rng = np.random.default_rng(seed)
    far = rng.normal(80, 10, (H, 3 * W)).astype(np.float32)
    for _ in range(350):
        y, x = rng.integers(10, H - 20), rng.integers(10, 3 * W - 20)
        s = rng.integers(4, 12)
        far[y : y + s, x : x + s] = rng.uniform(150, 230)
    near = np.full((H, 6 * W), np.nan, np.float32)
    for _ in range(200):
        y, x = rng.integers(10, H - 44), rng.integers(10, 6 * W - 44)
        s = int(rng.integers(24, 40))
        patch = rng.normal(120, 25, (s, s)).astype(np.float32)
        for _ in range(5):
            py, px = rng.integers(2, s - 9, 2)
            q = rng.integers(4, 8)
            patch[py : py + q, px : px + q] = rng.uniform(30, 240)
        near[y : y + s, x : x + s] = patch
    return far, near


def render_rgbd(world, cam_x):
    far, near = world
    sf = int(round(FX * cam_x / FAR_Z))
    sn = int(round(FX * cam_x / NEAR_Z))
    img = far[:, W + sf : 2 * W + sf].copy()
    depth = np.full((H, W), FAR_Z, np.float32)
    crop = near[:, W + sn : W + sn + W]
    m = ~np.isnan(crop)
    img[m] = crop[m]
    depth[m] = NEAR_Z
    return img, depth


def test_rgbd_tracking():
    world = world_and_depth()
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=3,
    )
    system = SLAMSystem(
        tracker_cfg=cfg, orb_params=orb.ORBParams(n_features=500, n_levels=3)
    )
    xs = [k * 0.12 for k in range(6)]
    for k, x in enumerate(xs):
        img, depth = render_rgbd(world, x)
        system.track_rgbd(img, depth, 0.1 * k)
    assert system.state == State.OK
    est = []
    for ts, T_cw, lost in system.tracker.trajectory:
        assert not lost
        est.append((-T_cw[:3, :3].T @ T_cw[:3, 3])[0])
    err = np.asarray(est) - np.asarray(xs)
    assert np.sqrt(np.mean(err**2)) < 0.05
    # depths came from the depth image (two layers present in the map)
    pos = np.stack([p.position for p in system.map.points.values()])
    z = pos[:, 2]
    assert (np.abs(z - FAR_Z) < 0.5).sum() > 50
    assert (np.abs(z - NEAR_Z) < 0.5).sum() > 5


@pytest.mark.parametrize("pipelined", [False, True])
def test_rgbd_fused_and_pipelined(pipelined):
    """Steady-state RGB-D runs the fused one-program path (on-device
    depth lookup); with pipelined=True it runs one frame behind. Both
    must track like the modular path."""
    world = world_and_depth(seed=9)
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=3,
        pipelined=pipelined,
    )
    system = SLAMSystem(
        tracker_cfg=cfg, orb_params=orb.ORBParams(n_features=500, n_levels=3)
    )
    xs = [k * 0.12 for k in range(8)]
    for k, x in enumerate(xs):
        img, depth = render_rgbd(world, x)
        system.track_rgbd(img, depth, 0.1 * k)
    system.flush()
    assert system.state == State.OK
    assert len(system.tracker.trajectory) == len(xs)
    est = np.asarray([
        (-T[:3, :3].T @ T[:3, 3])[0] for _, T, _ in system.tracker.trajectory
    ])
    err = est - np.asarray(xs)
    assert np.sqrt(np.mean(err**2)) < 0.05, err
