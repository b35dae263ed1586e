"""Relocalization: tracking loss via blank frames, recovery at a
previously-visited viewpoint through BoW + PnP + robust GN."""

import numpy as np
import pytest

from dspslam_tpu.frontend import orb
from dspslam_tpu.place.vocabulary import Vocabulary
from dspslam_tpu.slam.system import SLAMSystem
from dspslam_tpu.slam.tracking import State, TrackerConfig

FX = FY = 500.0
CX, CY = 320.0, 120.0
BASELINE = 0.4
BF = FX * BASELINE
FAR_Z, NEAR_Z = 10.0, 5.0
H, W = 240, 640


def textured_world(seed=6):
    rng = np.random.default_rng(seed)
    far = rng.normal(80, 10, (H, 3 * W)).astype(np.float32)
    for _ in range(350):
        y, x = rng.integers(10, H - 20), rng.integers(10, 3 * W - 20)
        s = rng.integers(4, 12)
        far[y : y + s, x : x + s] = rng.uniform(150, 230)
    near = np.full((H, 6 * W), np.nan, np.float32)
    for _ in range(120):
        y, x = rng.integers(10, H - 48), rng.integers(10, 6 * W - 48)
        s = int(rng.integers(24, 40))
        patch = rng.normal(120, 25, (s, s)).astype(np.float32)
        for _ in range(5):
            py, px = rng.integers(2, s - 9, 2)
            q = rng.integers(4, 8)
            patch[py : py + q, px : px + q] = rng.uniform(30, 240)
        near[y : y + s, x : x + s] = patch
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


@pytest.mark.slow
def test_relocalize_after_blackout():
    world = textured_world()
    params = orb.ORBParams(n_features=500, n_levels=3)
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=2,
        search_radius_motion=40.0,
    )
    system = SLAMSystem(tracker_cfg=cfg, orb_params=params)
    # vocabulary from the world itself
    import jax.numpy as jnp

    descs = []
    for x in (0.0, 0.6, 1.2):
        f = orb.extract(jnp.asarray(render(world, x)), params)
        descs.append(np.asarray(f["desc"])[np.asarray(f["valid"]) > 0])
    voc = Vocabulary.train(np.concatenate(descs), branching=6, levels=2)
    system.enable_loop_closing(voc, fix_scale=True)

    blank = np.zeros((H, W), np.float32)
    k = 0

    def step(img_l, img_r):
        nonlocal k
        system.track_stereo(img_l, img_r, 0.1 * k)
        k += 1

    # build a map over x = 0 .. 1.2
    for x in np.arange(0, 1.21, 0.15):
        step(render(world, x), render(world, x, BASELINE))
    assert system.state == State.OK

    # blackout -> tracking lost
    for _ in range(3):
        step(blank, blank)
    assert system.state == State.LOST

    # reappear at a mapped location
    for _ in range(3):
        step(render(world, 0.45), render(world, 0.45, BASELINE))
    assert system.state == State.OK, "failed to relocalize"
    T_cw = system.tracker.trajectory[-1][1]
    twc = -T_cw[:3, :3].T @ T_cw[:3, 3]
    np.testing.assert_allclose(twc[0], 0.45, atol=0.08)
    np.testing.assert_allclose(twc[1:], 0.0, atol=0.08)


@pytest.mark.slow
def test_relocalize_after_blackout_pipelined():
    """Same blackout scenario under one-frame-lag pipelined tracking:
    the blackout lands while a frame is in flight, poisoning the device
    chain — the tracker must fall back, go LOST, relocalize, and resume
    the pipelined steady state (poisoned-redo + flush machinery)."""
    world = textured_world(seed=13)
    params = orb.ORBParams(n_features=500, n_levels=3)
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=2,
        search_radius_motion=40.0,
        pipelined=True,
    )
    system = SLAMSystem(tracker_cfg=cfg, orb_params=params)
    import jax.numpy as jnp

    descs = []
    for x in (0.0, 0.6, 1.2):
        f = orb.extract(jnp.asarray(render(world, x)), params)
        descs.append(np.asarray(f["desc"])[np.asarray(f["valid"]) > 0])
    voc = Vocabulary.train(np.concatenate(descs), branching=6, levels=2)
    system.enable_loop_closing(voc, fix_scale=True)

    blank = np.zeros((H, W), np.float32)
    k = 0

    def step(img_l, img_r):
        nonlocal k
        system.track_stereo(img_l, img_r, 0.1 * k)
        k += 1

    for x in np.arange(0, 1.21, 0.15):
        step(render(world, x), render(world, x, BASELINE))
    system.flush()
    assert system.state == State.OK

    for _ in range(4):
        step(blank, blank)
    system.flush()
    assert system.state == State.LOST

    for _ in range(4):
        step(render(world, 0.45), render(world, 0.45, BASELINE))
    system.flush()
    assert system.state == State.OK, "failed to relocalize (pipelined)"
    # resumed frames keep appearing in timestamp order with sane poses
    ts = [t for t, _, _ in system.tracker.trajectory]
    assert ts == sorted(ts)
    T_cw = system.tracker.trajectory[-1][1]
    twc = -T_cw[:3, :3].T @ T_cw[:3, 3]
    np.testing.assert_allclose(twc[0], 0.45, atol=0.08)
