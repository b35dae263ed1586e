"""Monocular machinery tests: two-view initializer (F and H paths) and
PCA cuboid object initialization."""

import numpy as np
import pytest

from dspslam_tpu.objects import cuboid
from dspslam_tpu.slam import initializer

K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
RNG = np.random.default_rng(11)


def project(K, X):
    h = X @ K.T
    return h[:, :2] / h[:, 2:3]


def rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


class TestTwoViewInit:
    def test_general_scene_fundamental_path(self):
        # non-planar cloud
        X = np.stack(
            [RNG.uniform(-3, 3, 200), RNG.uniform(-2, 2, 200), RNG.uniform(4, 12, 200)],
            axis=-1,
        )
        R_true = rot_y(0.06)
        t_true = np.array([0.5, 0.05, 0.02])
        X2 = X @ R_true.T + t_true
        p1 = project(K, X) + RNG.normal(0, 0.3, (200, 2))
        p2 = project(K, X2) + RNG.normal(0, 0.3, (200, 2))
        out = initializer.initialize_two_view(p1, p2, K, seed=1)
        assert out is not None
        assert out["model"] == "F"
        # direction of translation recovered (scale-free)
        t_est = out["t"] / np.linalg.norm(out["t"])
        t_dir = t_true / np.linalg.norm(t_true)
        assert abs(np.dot(t_est, t_dir)) > 0.99
        # rotation error small
        # ~1 deg is the linear 8-point accuracy at this noise level; the
        # pose is refined by BA downstream
        dR = out["R"] @ R_true.T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.03
        # triangulated structure consistent: depth ratios preserved
        good = out["good_mask"]
        assert good.sum() > 100
        ratio = out["points3d"][good][:, 2] / X[good][:, 2]
        assert np.std(ratio) / np.mean(ratio) < 0.08

    def test_planar_scene_homography_path(self):
        # points on a plane z = 6 + 0.3x  (slightly tilted)
        x = RNG.uniform(-4, 4, 200)
        y = RNG.uniform(-3, 3, 200)
        X = np.stack([x, y, 6 + 0.3 * x], axis=-1)
        R_true = rot_y(0.04)
        t_true = np.array([0.8, 0.0, 0.1])
        X2 = X @ R_true.T + t_true
        p1 = project(K, X) + RNG.normal(0, 0.2, (200, 2))
        p2 = project(K, X2) + RNG.normal(0, 0.2, (200, 2))
        out = initializer.initialize_two_view(p1, p2, K, seed=2)
        assert out is not None
        assert out["model"] == "H"
        t_est = out["t"] / np.linalg.norm(out["t"])
        t_dir = t_true / np.linalg.norm(t_true)
        assert abs(np.dot(t_est, t_dir)) > 0.98
        dR = out["R"] @ R_true.T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.02

    def test_rejects_pure_noise(self):
        p1 = RNG.uniform(0, 640, (100, 2))
        p2 = RNG.uniform(0, 640, (100, 2))
        out = initializer.initialize_two_view(p1, p2, K, seed=3)
        assert out is None or out["n_good"] < 30


class TestCuboid:
    def make_box_points(self, yaw=0.5, center=(2.0, -0.5, 8.0), whl=(1.8, 1.5, 4.2), n=400):
        R = rot_y(yaw)
        # ShapeNet: x right (w), y up (h), z back (l)
        local = RNG.uniform(-0.5, 0.5, (n, 3)) * np.asarray(whl)
        return local @ R.T + np.asarray(center), R

    def test_pca_recovers_box(self):
        pts, R_true = self.make_box_points()
        out = cuboid.compute_cuboid_pca(pts)
        assert out is not None
        np.testing.assert_allclose(out["center"], [2.0, -0.5, 8.0], atol=0.15)
        # longest axis (l ~ 4.2) maps to z of the object frame
        w, h, l = out["whl"]
        assert l > w and l > h
        assert l == pytest.approx(4.2 * 0.9, rel=0.15)  # 5-95 percentile shrink
        # recovered z axis parallel to the true one (sign-free)
        assert abs(np.dot(out["R"][:, 2], R_true[:, 2])) > 0.98
        # pose scale = 0.40 * l
        s = np.linalg.det(out["T_wo_sim3"][:3, :3]) ** (1 / 3)
        assert s == pytest.approx(0.40 * l, rel=1e-4)

    def test_outlier_rejection(self):
        pts, _ = self.make_box_points(n=300)
        outliers = RNG.uniform(-20, 20, (30, 3)) + np.array([2.0, -0.5, 8.0])
        all_pts = np.concatenate([pts, outliers])
        out = cuboid.compute_cuboid_pca(all_pts)
        assert out is not None
        # most inliers kept, most far outliers dropped
        assert out["inlier_mask"][:300].mean() > 0.9
        assert out["inlier_mask"][300:].mean() < 0.2

    def test_flipped_pose(self):
        pts, _ = self.make_box_points()
        out = cuboid.compute_cuboid_pca(pts)
        T = out["T_wo_sim3"]
        Tf = cuboid.flipped_pose(T)
        # same scale and center, z axis reversed
        np.testing.assert_allclose(Tf[:3, 3], T[:3, 3])
        np.testing.assert_allclose(Tf[:3, 2], -T[:3, 2], atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.det(Tf[:3, :3]), np.linalg.det(T[:3, :3]), rtol=1e-5
        )
