"""RANSAC PnP tests: exact recovery, noise, outliers, degeneracy."""

import numpy as np
import pytest

from dspslam_tpu.ops import lie
from dspslam_tpu.slam import pnp

import jax.numpy as jnp

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
RNG = np.random.default_rng(31)


def make_scene(n=60, T_cw=None):
    pts = np.stack(
        [RNG.uniform(-4, 4, n), RNG.uniform(-3, 3, n), RNG.uniform(5, 15, n)],
        axis=-1,
    )
    if T_cw is None:
        T_cw = np.asarray(
            lie.exp_se3(jnp.asarray([0.5, -0.2, 0.3, 0.1, -0.15, 0.05]))
        )
    pc = pts @ T_cw[:3, :3].T + T_cw[:3, 3]
    proj = pc @ K.T
    uv = proj[:, :2] / proj[:, 2:3]
    return pts, uv, T_cw


class TestDLT:
    def test_exact_recovery(self):
        pts, uv, T_true = make_scene()
        T = pnp.pnp_dlt(pts, uv, K)
        err = np.asarray(lie.log_se3(jnp.asarray(T @ np.linalg.inv(T_true))))
        assert np.linalg.norm(err) < 1e-4

    def test_too_few_points(self):
        pts, uv, _ = make_scene(5)
        assert pnp.pnp_dlt(pts, uv, K) is None


class TestRansac:
    def test_with_noise_and_outliers(self):
        pts, uv, T_true = make_scene(80)
        uv = uv + RNG.normal(0, 0.5, uv.shape)
        uv[:20] += RNG.uniform(40, 100, (20, 2))     # 25% outliers
        T, mask = pnp.ransac_pnp(pts, uv, K, seed=2)
        assert T is not None
        err = np.asarray(lie.log_se3(jnp.asarray(T @ np.linalg.inv(T_true))))
        assert np.linalg.norm(err[:3]) < 0.05
        assert mask[20:].mean() > 0.9
        assert mask[:20].mean() < 0.2

    def test_rejects_garbage(self):
        pts = RNG.normal(size=(40, 3)) + [0, 0, 10]
        uv = RNG.uniform(0, 640, (40, 2))
        T, mask = pnp.ransac_pnp(pts, uv, K, min_inliers=15)
        assert T is None
