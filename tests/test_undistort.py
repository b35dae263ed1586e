"""Lens undistortion: inverse accuracy, geometric consistency, and the
mono background-ray path (reference Frame.cc:405-465 and
mono_sequence.py:106-107 behaviors)."""

import numpy as np
import pytest

from dspslam_tpu.frontend import undistort as und

# Freiburg-like lens (configs/freiburg_001.yaml has visible radial terms)
DIST = (-0.23, 0.12, 6.0e-4, -4.0e-4, -0.04)
K = np.array([[520.9, 0, 325.1], [0, 521.0, 249.7], [0, 0, 1.0]])
W, H = 640, 480


def test_roundtrip_inverse():
    rng = np.random.default_rng(0)
    ideal = rng.uniform([20, 20], [W - 20, H - 20], (500, 2)).astype(np.float32)
    raw = und.distort_points(ideal, K, DIST)
    rec = und.undistort_points(raw, K, DIST)
    err = np.linalg.norm(rec - ideal, axis=-1)
    assert err.max() < 1e-3  # px


def test_zero_coeffs_identity():
    xy = np.array([[10.0, 20.0], [300.0, 200.0]], np.float32)
    out = und.undistort_points(xy, K, (0, 0, 0, 0, 0))
    np.testing.assert_allclose(out, xy)
    assert not und.has_distortion((0.0, 0.0, 0.0, 0.0, 0.0))
    assert und.has_distortion(DIST)


def test_bounds_expand_for_barrel():
    # barrel distortion pulls corners inward, so undistorted bounds expand
    xmin, xmax, ymin, ymax = und.undistorted_bounds(W, H, K, DIST)
    assert xmin < 0 and xmax > W and ymin < 0 and ymax > H


def test_pose_recovery_with_distorted_observations():
    """Project 3D points through the full lens model, undistort the raw
    pixels, run the motion-only pose GN: the recovered pose must match the
    distortion-free run (VERDICT #4 'Done' criterion)."""
    import jax.numpy as jnp

    from dspslam_tpu.slam import pose_opt

    rng = np.random.default_rng(1)
    n, cap = 200, 256
    pts_w = rng.uniform([-2, -1.5, 4], [2, 1.5, 12], (n, 3)).astype(np.float32)
    T_true = np.eye(4, dtype=np.float32)
    T_true[:3, 3] = [0.12, -0.05, 0.3]
    c = np.cos(0.04); s = np.sin(0.04)
    T_true[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)

    pc = pts_w @ T_true[:3, :3].T + T_true[:3, 3]
    ideal = np.stack(
        [K[0, 0] * pc[:, 0] / pc[:, 2] + K[0, 2],
         K[1, 1] * pc[:, 1] / pc[:, 2] + K[1, 2]], -1,
    ).astype(np.float32)
    raw = und.distort_points(ideal, K, DIST)  # what a real lens measures
    un = und.undistort_points(raw, K, DIST)

    intr = jnp.asarray([K[0, 0], K[1, 1], K[0, 2], K[1, 2], 100.0])

    def solve(obs_xy):
        obs = np.zeros((cap, 3), np.float32)
        obs[:n, :2] = obs_xy
        pw = np.zeros((cap, 3), np.float32)
        pw[:n] = pts_w
        vmask = np.zeros(cap, np.float32)
        vmask[:n] = 1.0
        T, _, n_in = pose_opt.optimize_pose(
            jnp.asarray(np.eye(4, dtype=np.float32)), jnp.asarray(pw),
            jnp.asarray(obs), jnp.ones(cap, jnp.float32),
            jnp.asarray(vmask), jnp.zeros(cap, jnp.float32), intr,
        )
        return np.asarray(T), int(n_in)

    T_un, n_un = solve(un)
    T_ideal, _ = solve(ideal)
    assert n_un > 0.9 * n
    # undistorted observations recover the ideal-lens pose
    np.testing.assert_allclose(T_un, T_ideal, atol=2e-3)
    np.testing.assert_allclose(T_un, T_true, atol=5e-3)
    # raw (distorted) observations do NOT: the test is sensitive
    T_raw, _ = solve(raw)
    assert np.linalg.norm(T_raw[:3, 3] - T_true[:3, 3]) > 0.02


def test_mono_background_rays_undistorted():
    """build_mono_detection must lift background pixels through the
    undistortion before invK (mono_sequence.py:106-107)."""
    from dspslam_tpu.datasets.mono import build_mono_detection

    mask = np.zeros((H, W), bool)
    mask[200:280, 280:380] = True
    boxes = np.array([[280, 200, 380, 280]], np.float32)
    invK = np.linalg.inv(K).astype(np.float32)

    det0 = build_mono_detection(
        mask[None], boxes, invK, min_mask_area=100.0, dist_coeffs=None
    )
    det1 = build_mono_detection(
        mask[None], boxes, invK, min_mask_area=100.0, dist_coeffs=DIST
    )
    assert det0 is not None and det1 is not None
    r0, r1 = det0.rays, det1.rays
    assert r0.shape == r1.shape
    # rays differ (the lens matters) ...
    assert np.abs(r0 - r1).max() > 1e-4
    # ... and the undistorted rays equal invK @ undistort(px) for the
    # same sampled pixels
    raw_px = (r0 @ K.T)[:, :2].astype(np.float32)
    expect = und.undistort_points(raw_px, K, DIST)
    got = (r1 @ K.T)[:, :2]
    np.testing.assert_allclose(got, expect, atol=1e-3)
