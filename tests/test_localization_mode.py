"""Localization-only mode: the map freezes but tracking continues."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")


def test_localization_mode_freezes_map():
    from test_slam import BF, CX, CY, FX, H, PLANE_Z, W, render, textured_world
    from dspslam_tpu.frontend import orb
    from dspslam_tpu.slam.system import SLAMSystem
    from dspslam_tpu.slam.tracking import State, TrackerConfig

    world = textured_world()
    cfg = TrackerConfig(
        fx=FX, fy=FX, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=2,
    )
    system = SLAMSystem(
        tracker_cfg=cfg, orb_params=orb.ORBParams(n_features=400, n_levels=3)
    )
    for k in range(4):
        x = k * 0.15
        system.track_stereo(
            render(world, x), render(world, x, baseline_px=FX * 0.4 / PLANE_Z),
            0.1 * k,
        )
    n_kf = len(system.map.keyframes)
    n_pts = len(system.map.points)
    system.activate_localization_mode()
    for k in range(4, 8):
        x = k * 0.15
        system.track_stereo(
            render(world, x), render(world, x, baseline_px=FX * 0.4 / PLANE_Z),
            0.1 * k,
        )
    assert system.state == State.OK
    assert len(system.map.keyframes) == n_kf
    assert len(system.map.points) == n_pts
    # pose still advances
    T_cw = system.tracker.trajectory[-1][1]
    twc = -T_cw[:3, :3].T @ T_cw[:3, 3]
    np.testing.assert_allclose(twc[0], 7 * 0.15, atol=0.08)
