"""Pipelined (one-frame-lag) fused tracking: the dispatch-k+1-then-
fetch-k steady state must produce the same trajectory and map as the
synchronous fused path, with keyframes carrying the correct source
frame index for detection lookup."""

import numpy as np
import pytest

from dspslam_tpu.frontend import orb
from dspslam_tpu.slam.system import SLAMSystem
from dspslam_tpu.slam.tracking import State, TrackerConfig

FX = FY = 500.0
CX, CY = 320.0, 120.0
BASELINE = 0.4
BF = FX * BASELINE
FAR_Z, NEAR_Z = 10.0, 5.0
H, W = 240, 640
STEP = 0.15
N_FRAMES = 12


def textured_world(seed=0):
    rng = np.random.default_rng(seed)
    far = rng.normal(80, 10, (H, 3 * W)).astype(np.float32)
    for _ in range(350):
        y, x = rng.integers(10, H - 20), rng.integers(10, 3 * W - 20)
        s = rng.integers(4, 12)
        far[y : y + s, x : x + s] = rng.uniform(150, 230)
    near = np.full((H, 6 * W), np.nan, np.float32)
    for _ in range(220):
        y, x = rng.integers(10, H - 30), rng.integers(10, 6 * W - 30)
        s = rng.integers(6, 14)
        near[y : y + s, x : x + s] = rng.uniform(40, 250)
    return far, near


def render(world, cam_x, baseline_m=0.0):
    far, near = world
    sf = int(round(FX * (cam_x + baseline_m) / FAR_Z))
    sn = int(round(FX * (cam_x + baseline_m) / NEAR_Z))
    img = far[:, W + sf : 2 * W + sf].copy()
    crop = near[:, W + sn : W + sn + W]
    m = ~np.isnan(crop)
    img[m] = crop[m]
    return img


def run(pipelined: bool, detection_log=None, async_keyframe=False,
        pipeline_depth=1):
    from dspslam_tpu.slam.local_mapping import LocalMapperConfig

    world = textured_world()
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=4,
        pipelined=pipelined, pipeline_depth=pipeline_depth,
    )
    lm_cfg = LocalMapperConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, async_keyframe=async_keyframe,
    )
    detection_source = None
    if detection_log is not None:
        def detection_source(frame_idx):
            detection_log.append(frame_idx)
            return []
    system = SLAMSystem(
        tracker_cfg=cfg, orb_params=orb.ORBParams(n_features=600, n_levels=4),
        detection_source=detection_source,
        object_pipeline_factory=None,
        local_mapper_cfg=lm_cfg,
    )
    for k in range(N_FRAMES):
        system.track_stereo(
            render(world, k * STEP),
            render(world, k * STEP, baseline_m=BASELINE),
            timestamp=k * 0.1,
        )
    system.flush()
    return system


@pytest.fixture(scope="module")
def both_runs():
    return run(False), run(True)


class TestPipelinedParity:
    def test_pipelined_stays_ok_and_covers_all_frames(self, both_runs):
        sync, pipe = both_runs
        assert pipe.state == State.OK
        assert len(pipe.tracker.trajectory) == N_FRAMES
        assert len(sync.tracker.trajectory) == N_FRAMES

    def test_trajectory_matches_synchronous(self, both_runs):
        sync, pipe = both_runs
        ts = np.array([t for t, _, _ in sync.tracker.trajectory])
        tp = np.array([t for t, _, _ in pipe.tracker.trajectory])
        np.testing.assert_allclose(ts, tp)
        true_x = np.arange(N_FRAMES) * STEP
        for system in (sync, pipe):
            est = np.array([
                (-T[:3, :3].T @ T[:3, 3])[0]
                for _, T, _ in system.tracker.trajectory
            ])
            rmse = float(np.sqrt(np.mean((est - true_x) ** 2)))
            # the pipelined run tracks frames dispatched one call before
            # each keyframe against a one-update-stale local map (the
            # reference's tracking/mapping threads race identically);
            # transients recover within a frame, so ATE stays tight
            assert rmse < 0.05, rmse
        # frame-by-frame agreement outside the keyframe transients
        es = np.stack([T for _, T, _ in sync.tracker.trajectory])
        ep = np.stack([T for _, T, _ in pipe.tracker.trajectory])
        err = np.linalg.norm(es[:, :3, 3] - ep[:, :3, 3], axis=-1)
        assert np.median(err) < 0.005, err

    def test_map_grows_comparably(self, both_runs):
        sync, pipe = both_runs
        assert len(pipe.map.keyframes) >= 2
        n_s, n_p = len(sync.map.points), len(pipe.map.points)
        assert abs(n_s - n_p) / max(n_s, 1) < 0.3, (n_s, n_p)


class TestBackToBackKeyframes:
    """Keyframes on (nearly) consecutive frames must drain the deferred
    pipeline in order without losing stages (SURVEY hard-part #7:
    bounded keyframe queue / cooperative scheduling correctness)."""

    def test_consecutive_keyframes_drain_cleanly(self):
        from dspslam_tpu.slam.local_mapping import LocalMapperConfig

        world = textured_world(seed=2)
        cfg = TrackerConfig(
            fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
            min_init_features=150, max_frames_between_kf=1,  # KF every frame
            pipelined=True,
        )
        system = SLAMSystem(
            tracker_cfg=cfg,
            orb_params=orb.ORBParams(n_features=600, n_levels=4),
            local_mapper_cfg=LocalMapperConfig(
                fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, async_keyframe=True,
            ),
        )
        for k in range(10):
            system.track_stereo(
                render(world, k * STEP),
                render(world, k * STEP, baseline_m=BASELINE),
                timestamp=k * 0.1,
            )
        system.flush()
        assert system.state == State.OK
        lm = system.local_mapper
        assert lm._pending_tri is None and lm._pending_ba is None \
            and lm._ba_kf is None
        # the aggressive KF policy + culling leaves a coherent map
        assert len(system.map.keyframes) >= 3
        assert len(system.map.points) > 200


class TestAsyncKeyframePipeline:
    """async_keyframe=True: triangulation applies one frame after the
    keyframe, local BA one frame later still (poll()) — trajectory and
    map quality must match the synchronous keyframe path."""

    def test_matches_synchronous_quality(self):
        sync = run(True, async_keyframe=False)
        deferred = run(True, async_keyframe=True)
        assert deferred.state == State.OK
        true_x = np.arange(N_FRAMES) * STEP
        for system in (sync, deferred):
            est = np.array([
                (-T[:3, :3].T @ T[:3, 3])[0]
                for _, T, _ in system.tracker.trajectory
            ])
            rmse = float(np.sqrt(np.mean((est - true_x) ** 2)))
            assert rmse < 0.05, rmse
        n_s, n_d = len(sync.map.points), len(deferred.map.points)
        assert abs(n_s - n_d) / max(n_s, 1) < 0.3, (n_s, n_d)


def run_mono(pipelined: bool):
    world = textured_world(seed=4)
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H,
        max_frames_between_kf=3, search_radius_motion=40.0,
        pipelined=pipelined,
    )
    system = SLAMSystem(
        tracker_cfg=cfg, orb_params=orb.ORBParams(n_features=600, n_levels=4)
    )
    for k in range(N_FRAMES):
        system.track_mono(render(world, k * STEP), timestamp=k * 0.1)
    system.flush()
    return system


class TestMonoFused:
    """The mono fused/pipelined path (distortion-free cameras) must
    track like the modular path — weak spot #9 of the round-1 review:
    mono previously always ran stage-by-stage."""

    @pytest.fixture(scope="class")
    def mono_runs(self):
        return run_mono(False), run_mono(True)

    def test_both_modes_track_to_the_end(self, mono_runs):
        fused, pipe = mono_runs
        assert fused.state == State.OK
        assert pipe.state == State.OK
        assert len(pipe.tracker.trajectory) == N_FRAMES

    def test_fused_path_was_exercised(self, mono_runs):
        fused, _ = mono_runs
        # after init the steady state must not fall back to modular:
        # velocity/ref/last all exist and no distortion is configured
        assert fused.tracker.velocity is not None
        assert len(fused.map.keyframes) >= 2

    def test_straight_dolly_trajectories(self, mono_runs):
        for system in mono_runs:
            t = np.array([
                -T[:3, :3].T @ T[:3, 3]
                for _, T, _ in system.tracker.trajectory
            ])
            # mono gauge: shape only, not metric scale. The camera
            # dollies along +x: net forward motion, mostly-positive
            # steps (per-step magnitude wobbles with the mono scale
            # drift on both the fused AND modular paths), and lateral/
            # vertical drift well below the travelled distance
            steps = np.diff(t[2:, 0])
            assert t[-1, 0] > 5.0 * max(abs(t[-1, 1]), abs(t[-1, 2]), 1e-6)
            assert (steps > 0).mean() >= 0.8, steps
            assert t[-1, 0] > 0.6 * np.abs(steps).sum()


class TestKeyframeSeqIndex:
    def test_detection_indices_match_keyframe_source_frames(self):
        log = []
        system = run(True, detection_log=log)
        kfs = sorted(system.map.keyframes.values(), key=lambda kf: kf.id)
        # every drained keyframe requested detections for ITS OWN frame
        # index: seq_idx monotonically increasing, within range, and the
        # log matches the keyframes' stamped indices in order
        stamped = [kf.seq_idx for kf in kfs if kf.seq_idx >= 0]
        assert all(0 <= i < N_FRAMES for i in log)
        assert log == sorted(log)
        # all keyframes alive at the end appear in the requested log
        for idx in stamped:
            assert idx in log


class TestPipelineDepth2:
    """Two frames in flight (pipeline_depth=2, the relay-RTT-hiding
    mode): tracking must cover every frame and stay within the same
    accuracy envelope as the synchronous path."""

    def test_depth2_tracks_accurately(self):
        system = run(True, pipeline_depth=2)
        assert system.state == State.OK
        assert len(system.tracker.trajectory) == N_FRAMES
        true_x = np.arange(N_FRAMES) * STEP
        est = np.array([
            (-T[:3, :3].T @ T[:3, 3])[0]
            for _, T, _ in system.tracker.trajectory
        ])
        rmse = float(np.sqrt(np.mean((est - true_x) ** 2)))
        assert rmse < 0.05, rmse
        assert len(system.map.keyframes) >= 2
