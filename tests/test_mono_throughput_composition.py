"""Mono per-frame throughput COMPOSITION pin (VERDICT r4 #2).

On relay-attached TPU chips every blocking device->host fetch costs a
~30-50 ms round trip, so mono fps is set by the NUMBER of blocking
fetches per tracked frame, not by host compute. The round-4 Redwood
regression (15.77 -> 10.21 fps, redwood_01053.yaml:19 pacing) shipped
without any test failing because nothing pinned that composition. This
test runs the bench's mono configuration (pipelined tracker depth 2,
async keyframe + BA local mapper — benchmark_slam.main_mono) over the
synthetic layered scene and counts jax.device_get calls per frame:

- steady-state non-apply frames must do exactly ONE fetch (the fused
  tracker program's single round trip, slam/tracking.py
  _finalize_inflight);
- frames that additionally apply one deferred local-mapping result
  (triangulation / BA / object GN — local_mapping.poll applies at most
  one) may do TWO, never more;
- keyframe insertion must not cascade (the round-4 mechanism: the
  AcceptKeyFrames gate held insertion while deferred applies were
  pending, then the decay rule inserted extras — 9 vs 5 KFs over a
  30-frame run).

A change that adds a per-frame blocking sync or un-defers keyframe work
fails here on CPU instead of surfacing as a silent fps drop in
BENCH_r{N}.json.
"""

import jax
import numpy as np
import pytest

from dspslam_tpu.frontend import orb
from dspslam_tpu.slam.local_mapping import LocalMapperConfig
from dspslam_tpu.slam.system import SLAMSystem
from dspslam_tpu.slam.tracking import State, TrackerConfig

from test_mono_slam import CX, CY, FX, FY, H, W, render, textured_world

N_FRAMES = 24
WARMUP = 6          # init + first-keyframe burst settles by here


@pytest.fixture(scope="module")
def counted_run():
    world = textured_world()
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H,
        max_frames_between_kf=3, search_radius_motion=40.0,
        pipelined=True, pipeline_depth=2,
    )
    system = SLAMSystem(
        tracker_cfg=cfg,
        orb_params=orb.ORBParams(n_features=600, n_levels=4),
        local_mapper_cfg=LocalMapperConfig(
            fx=FX, fy=FY, cx=CX, cy=CY, async_ba=True, async_keyframe=True,
        ),
    )
    real = jax.device_get
    count = [0]

    def counting(tree):
        count[0] += 1
        return real(tree)

    jax.device_get = counting
    try:
        step = 0.12
        counts = []
        for k in range(N_FRAMES):
            count[0] = 0
            system.track_mono(render(world, k * step), timestamp=0.1 * k)
            counts.append(count[0])
    finally:
        jax.device_get = real
    return system, np.asarray(counts)


def test_tracks_to_the_end(counted_run):
    system, _ = counted_run
    assert system.state is State.OK


def test_steady_frame_does_at_most_two_fetches(counted_run):
    """1 = the fused tracker fetch; +1 for the single deferred apply a
    poll may land. A third blocking fetch on ANY steady frame is a new
    per-frame round trip — the exact shape of the Redwood regression."""
    _, counts = counted_run
    steady = counts[WARMUP:]
    assert steady.max() <= 2, steady.tolist()
    assert steady.min() >= 1, steady.tolist()


def test_apply_frames_are_the_minority(counted_run):
    """Deferred keyframe work must stay spread: with a keyframe roughly
    every 3 frames and at most one apply per poll, 2-fetch frames are
    bounded by the keyframe rate (~2 applies per KF interval). Mean
    fetch count creeping toward 2.0 means per-frame applies became the
    rule, not the keyframe exception."""
    _, counts = counted_run
    steady = counts[WARMUP:]
    assert steady.mean() <= 1.7, steady.tolist()


def test_keyframes_do_not_cascade(counted_run):
    """Round-4 mechanism: gated insertion + decay rule cascaded extra
    keyframes (9 vs 5 over 30 mono frames). With max_frames_between_kf=3
    this 24-frame run needs a handful of keyframes, not one per frame."""
    system, _ = counted_run
    n_kf = len(system.map.keyframes)
    assert 3 <= n_kf <= 10, n_kf
