"""Trajectory evaluation metrics tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from dspslam_tpu.ops import lie
from dspslam_tpu.utils import evaluation

RNG = np.random.default_rng(41)


def traj(n=30, step=0.5):
    out = []
    for i in range(n):
        T = np.eye(4)
        T[:3, 3] = [i * step, 0.1 * np.sin(i * 0.3), 0.0]
        out.append(T)
    return np.stack(out)


class TestATE:
    def test_zero_error_identical(self):
        t = traj()
        r = evaluation.ate_rmse(t, t)
        assert r["rmse"] == pytest.approx(0.0, abs=1e-9)

    def test_alignment_removes_rigid_offset(self):
        gt = traj()
        T_off = np.asarray(
            lie.exp_se3(jnp.asarray([1.0, -2.0, 0.5, 0.2, 0.1, -0.3]))
        )
        est = np.einsum("ij,njk->nik", T_off, gt)
        r_unaligned = evaluation.ate_rmse(est, gt, align=False)
        r_aligned = evaluation.ate_rmse(est, gt, align=True)
        assert r_unaligned["rmse"] > 1.0
        assert r_aligned["rmse"] < 1e-6

    def test_sim3_alignment_removes_scale(self):
        gt = traj()
        est = gt.copy()
        est[:, :3, 3] *= 2.5                   # monocular scale ambiguity
        r_se3 = evaluation.ate_rmse(est, gt, align=True, scale=False)
        r_sim3 = evaluation.ate_rmse(est, gt, align=True, scale=True)
        assert r_sim3["rmse"] < 1e-6 < r_se3["rmse"]

    def test_detects_real_drift(self):
        gt = traj()
        est = gt.copy()
        est[:, 0, 3] += np.linspace(0, 1.0, len(gt))  # growing drift
        r = evaluation.ate_rmse(est, gt, align=True)
        assert 0.05 < r["rmse"] < 1.0


class TestRPE:
    def test_zero_for_identical(self):
        t = traj()
        r = evaluation.rpe(t, t)
        assert r["trans_rmse"] == pytest.approx(0.0, abs=1e-9)
        assert r["rot_rmse_deg"] == pytest.approx(0.0, abs=1e-6)

    def test_catches_step_noise(self):
        gt = traj()
        est = gt.copy()
        est[:, :3, 3] += RNG.normal(0, 0.02, (len(gt), 3))
        r = evaluation.rpe(est, gt)
        assert 0.005 < r["trans_rmse"] < 0.2


class TestIO:
    def test_kitti_roundtrip(self, tmp_path):
        t = traj(5)
        path = tmp_path / "Cameras.txt"
        with open(path, "w") as f:
            for T in t:
                f.write(" ".join(f"{v:.9f}" for v in T[:3].reshape(-1)) + "\n")
        loaded = evaluation.load_kitti_trajectory(str(path))
        np.testing.assert_allclose(loaded, t, atol=1e-8)
