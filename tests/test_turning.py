"""Rotational camera motion through the image-driven system.

The reference runs KITTI street turns as a matter of course
(dsp_slam.cc:62-99); until round 3 every image-driven test drove a pure
x-translation dolly, so a broken yaw path in the fused/chained tracker
(frame_step.py velocity composition) could pass the whole suite. These
tests render from full SE(3) poses (synthetic.LayeredWorld.render_pose)
and track through >= 30 degrees of cumulative yaw.
"""

import numpy as np
import pytest

from dspslam_tpu.datasets.synthetic import (
    LayeredWorld,
    forward_turn_trajectory,
    pose_yaw,
    strafe_yaw_trajectory,
)

FX = 500.0
CX, CY = 320.0, 120.0
H, W = 240, 640
BASELINE = 0.4


def _est_trajectory_wc(system):
    out = []
    for _, T_cw, lost in system.tracker.trajectory:
        if lost:
            continue
        T = np.eye(4)
        T[:3, :3] = T_cw[:3, :3].T
        T[:3, 3] = -T_cw[:3, :3].T @ T_cw[:3, 3]
        out.append(T)
    return np.stack(out)


def _yaw_of(T_wc):
    return np.degrees(np.arctan2(T_wc[0, 2], T_wc[2, 2]))


def test_pose_render_matches_dolly_path():
    """render_pose at a pure-x pose reproduces the dolly renderer: exact
    at fractional parallax shifts; at integer shifts the dolly path's
    crop-lerp over-poisons one-texel transparency edges (weight-0 NaN
    reads), so a <1% pixel fraction may differ there."""
    world = LayeredWorld(W, H, FX, cx=CX, cy=CY, x_range=(-1.0, 6.0),
                         seed=3, yaw_max=np.radians(35), z_range=(0.0, 8.0))
    a = world.render(2.3)
    b = world.render_pose(pose_yaw(2.3, 0.0, 0.0))
    assert np.nanmax(np.abs(a - b)) < 1e-3
    a = world.render(0.0)
    b = world.render_pose(pose_yaw(0.0, 0.0, 0.0))
    assert float((np.abs(a - b) > 1.0).mean()) < 0.01
    d = np.abs(world.depth_map(2.3) - world.depth_map_pose(
        pose_yaw(2.3, 0.0, 0.0)))
    assert float((d > 0.01).mean()) < 1e-6


def test_yawed_view_is_textured():
    """A 25-degree yawed camera inside the declared envelope still sees
    texture almost everywhere (canvases were widened for it)."""
    world = LayeredWorld(W, H, FX, cx=CX, cy=CY, x_range=(-1.0, 6.0),
                         seed=3, yaw_max=np.radians(35), z_range=(0.0, 8.0))
    img = world.render_pose(pose_yaw(1.0, 4.0, np.radians(25)))
    assert float((img == world.BACKGROUND).mean()) < 0.08
    assert img.std() > 10.0


@pytest.mark.slow
def test_stereo_track_through_turn():
    """Car-like drive: straight, then a 35-degree arc, then straight
    (10+ m travelled). The stereo tracker must keep tracking through the
    turn with bounded ATE and recover the cumulative yaw."""
    from dspslam_tpu.frontend import orb
    from dspslam_tpu.slam.system import SLAMSystem
    from dspslam_tpu.slam.tracking import State, TrackerConfig
    from dspslam_tpu.utils.evaluation import ate_rmse

    world = LayeredWorld(
        W, H, FX, cx=CX, cy=CY, depths=(40.0, 26.0, 16.0),
        coverage=(1.0, 0.32, 0.22), ground_height=1.5,
        max_ground_depth=40.0, x_range=(-2.0, 10.0), seed=12,
        yaw_max=np.radians(40.0), z_range=(0.0, 12.0),
    )
    traj = forward_turn_trajectory(
        30, step=0.35, turn_start=6, turn_frames=16,
        total_yaw=np.radians(35.0),
    )
    params = orb.ORBParams(n_features=600, n_levels=3)
    cfg = TrackerConfig(
        fx=FX, fy=FX, cx=CX, cy=CY, bf=FX * BASELINE, width=W, height=H,
        min_init_features=150, max_frames_between_kf=3,
        search_radius_motion=50.0,
    )
    system = SLAMSystem(tracker_cfg=cfg, orb_params=params)
    for k, T in enumerate(traj):
        system.track_stereo(
            world.render_pose(T), world.render_pose(T, BASELINE), 0.1 * k
        )
    system.flush()
    assert system.state == State.OK
    lost = sum(1 for _, _, l in system.tracker.trajectory if l)
    assert lost == 0
    est = _est_trajectory_wc(system)
    ate = ate_rmse(est, traj)
    travelled = 0.35 * (len(traj) - 1)
    assert ate["rmse"] < 0.03 * travelled, (
        f"ATE {ate['rmse']:.3f} m over {travelled:.1f} m"
    )
    # the estimated trajectory must actually contain the rotation
    assert _yaw_of(est[-1]) - _yaw_of(est[0]) > 28.0


@pytest.mark.slow
def test_stereo_track_through_turn_pipelined():
    """Same turn under one-frame-lag pipelined tracking: the chained
    on-device velocity composition (frame_step._chain_epilogue) must
    hold through rotation, not just translation."""
    from dspslam_tpu.frontend import orb
    from dspslam_tpu.slam.system import SLAMSystem
    from dspslam_tpu.slam.tracking import State, TrackerConfig
    from dspslam_tpu.utils.evaluation import ate_rmse

    world = LayeredWorld(
        W, H, FX, cx=CX, cy=CY, depths=(40.0, 26.0, 16.0),
        coverage=(1.0, 0.32, 0.22), ground_height=1.5,
        max_ground_depth=40.0, x_range=(-2.0, 10.0), seed=12,
        yaw_max=np.radians(40.0), z_range=(0.0, 12.0),
    )
    traj = forward_turn_trajectory(
        30, step=0.35, turn_start=6, turn_frames=16,
        total_yaw=np.radians(35.0),
    )
    params = orb.ORBParams(n_features=600, n_levels=3)
    cfg = TrackerConfig(
        fx=FX, fy=FX, cx=CX, cy=CY, bf=FX * BASELINE, width=W, height=H,
        min_init_features=150, max_frames_between_kf=3,
        search_radius_motion=50.0, pipelined=True,
    )
    system = SLAMSystem(tracker_cfg=cfg, orb_params=params)
    for k, T in enumerate(traj):
        system.track_stereo(
            world.render_pose(T), world.render_pose(T, BASELINE), 0.1 * k
        )
    system.flush()
    assert system.state == State.OK
    est = _est_trajectory_wc(system)
    ate = ate_rmse(est, traj)
    travelled = 0.35 * (len(traj) - 1)
    assert ate["rmse"] < 0.03 * travelled, (
        f"ATE {ate['rmse']:.3f} m over {travelled:.1f} m"
    )
    assert _yaw_of(est[-1]) - _yaw_of(est[0]) > 28.0


@pytest.mark.slow
def test_mono_track_through_yaw():
    """Monocular strafe whose view yaws 25 degrees mid-run: the mono
    fused path must track rotation; Sim(3)-aligned ATE bounded (mono
    scale is a gauge freedom)."""
    from dspslam_tpu.frontend import orb
    from dspslam_tpu.slam.system import SLAMSystem
    from dspslam_tpu.slam.tracking import State, TrackerConfig
    from dspslam_tpu.utils.evaluation import ate_rmse

    world = LayeredWorld(
        W, H, FX, cx=CX, cy=CY, x_range=(-1.0, 9.0), seed=12,
        yaw_max=np.radians(30.0),
    )
    traj = strafe_yaw_trajectory(
        26, step=0.3, yaw_start=8, yaw_frames=12,
        total_yaw=np.radians(25.0),
    )
    params = orb.ORBParams(n_features=600, n_levels=3)
    cfg = TrackerConfig(
        fx=FX, fy=FX, cx=CX, cy=CY, bf=FX * BASELINE, width=W, height=H,
        min_init_features=150, max_frames_between_kf=3,
        search_radius_motion=50.0,
    )
    system = SLAMSystem(tracker_cfg=cfg, orb_params=params)
    for k, T in enumerate(traj):
        system.track_mono(world.render_pose(T), timestamp=0.1 * k)
    system.flush()
    assert system.state == State.OK
    est = _est_trajectory_wc(system)
    # mono trajectory only starts once initialized; align tail-to-tail
    gt = traj[len(traj) - len(est):]
    ate = ate_rmse(est, gt, scale=True)
    travelled = 0.3 * (len(gt) - 1)
    assert ate["rmse"] < 0.05 * travelled, (
        f"ATE {ate['rmse']:.3f} m over {travelled:.1f} m"
    )
    assert _yaw_of(est[-1]) - _yaw_of(est[0]) > 20.0
