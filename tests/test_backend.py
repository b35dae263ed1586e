"""Bundle adjustment + motion-only pose optimizer tests on synthetic
geometry with known ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.backend import ba
from dspslam_tpu.ops import lie
from dspslam_tpu.slam import pose_opt

FX, FY, CX, CY, BF = 500.0, 500.0, 320.0, 240.0, 200.0
INTR = jnp.asarray([FX, FY, CX, CY, BF])
RNG = np.random.default_rng(42)


def make_world(n_pts=120, n_kf=5):
    pts = np.stack(
        [
            RNG.uniform(-5, 5, n_pts),
            RNG.uniform(-3, 3, n_pts),
            RNG.uniform(8, 20, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)
    poses = []
    for i in range(n_kf):
        dx = np.zeros(6, np.float32)
        dx[0] = 0.4 * i          # translate along x
        dx[4] = 0.02 * i         # slight yaw
        poses.append(np.asarray(lie.exp_se3(jnp.asarray(dx))))
    return pts, np.stack(poses)


def project_all(poses, pts, noise=0.0):
    """obs arrays for every (kf, pt) pair that is in front of the camera."""
    obs_kf, obs_pt, obs_uvr = [], [], []
    for k, T in enumerate(poses):
        pc = pts @ T[:3, :3].T + T[:3, 3]
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        ur = u - BF / pc[:, 2]
        ok = (pc[:, 2] > 0.1) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
        for p in np.nonzero(ok)[0]:
            obs_kf.append(k)
            obs_pt.append(p)
            obs_uvr.append(
                [
                    u[p] + RNG.normal(0, noise),
                    v[p] + RNG.normal(0, noise),
                    ur[p] + RNG.normal(0, noise),
                ]
            )
    return (
        np.asarray(obs_kf, np.int32),
        np.asarray(obs_pt, np.int32),
        np.asarray(obs_uvr, np.float32),
    )


class TestPoseOptimization:
    def test_recovers_perturbed_pose(self):
        pts, poses = make_world(n_kf=1)
        k, p, uvr = project_all(poses, pts, noise=0.3)
        T_true = poses[0]
        T_init = np.asarray(
            lie.exp_se3(jnp.asarray([0.2, -0.1, 0.15, 0.03, -0.02, 0.04]))
        ) @ T_true
        n = len(p)
        T, inlier, n_in = pose_opt.optimize_pose(
            jnp.asarray(T_init),
            jnp.asarray(pts[p]),
            jnp.asarray(uvr),
            jnp.ones(n),
            jnp.ones(n),
            jnp.ones(n),
            INTR,
        )
        err = np.asarray(lie.log_se3(jnp.asarray(T) @ np.linalg.inv(T_true)))
        assert np.linalg.norm(err[:3]) < 0.02
        assert np.linalg.norm(err[3:]) < 0.005
        assert float(n_in) > 0.9 * n

    def test_outlier_rejection(self):
        pts, poses = make_world(n_kf=1)
        k, p, uvr = project_all(poses, pts, noise=0.2)
        n = len(p)
        # corrupt 20% of observations massively
        n_bad = n // 5
        uvr[:n_bad, :2] += RNG.uniform(50, 120, (n_bad, 2))
        T, inlier, n_in = pose_opt.optimize_pose(
            jnp.asarray(poses[0]),
            jnp.asarray(pts[p]),
            jnp.asarray(uvr),
            jnp.ones(n),
            jnp.ones(n),
            jnp.ones(n),
            INTR,
        )
        inlier = np.asarray(inlier)
        assert inlier[:n_bad].mean() < 0.1       # corrupted flagged out
        assert inlier[n_bad:].mean() > 0.9


def _pad_problem(poses_init, pts_init, k, p, uvr, K, P, O):
    """Pack into fixed-shape arrays."""
    n = len(k)
    obs_kf = np.zeros(O, np.int32)
    obs_pt = np.zeros(O, np.int32)
    obs_uvr = np.zeros((O, 3), np.float32)
    obs_valid = np.zeros(O, np.float32)
    obs_kf[:n], obs_pt[:n], obs_uvr[:n] = k, p, uvr
    obs_valid[:n] = 1
    kf_poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    kf_poses[: len(poses_init)] = poses_init
    pts = np.zeros((P, 3), np.float32)
    pts[: len(pts_init)] = pts_init
    pt_valid = np.zeros(P, np.float32)
    pt_valid[: len(pts_init)] = 1
    return kf_poses, pts, pt_valid, obs_kf, obs_pt, obs_uvr, obs_valid


class TestBundleAdjustment:
    def test_refines_noisy_geometry(self):
        pts_true, poses_true = make_world(n_pts=100, n_kf=5)
        k, p, uvr = project_all(poses_true, pts_true, noise=0.25)
        # perturb everything except KF0 (gauge anchor)
        poses_init = poses_true.copy()
        for i in range(1, 5):
            poses_init[i] = (
                np.asarray(
                    lie.exp_se3(jnp.asarray(RNG.normal(0, 0.02, 6).astype(np.float32)))
                )
                @ poses_init[i]
            )
        pts_init = pts_true + RNG.normal(0, 0.08, pts_true.shape).astype(np.float32)

        K, P, O = 5, 128, 1024
        kf_poses, pts, pt_valid, obs_kf, obs_pt, obs_uvr, obs_valid = _pad_problem(
            poses_init, pts_init, k, p, uvr, K, P, O
        )
        kf_fixed = np.zeros(K, np.float32)
        kf_fixed[0] = 1

        out = ba.bundle_adjust(
            jnp.asarray(kf_poses), jnp.asarray(kf_fixed), jnp.asarray(pts),
            jnp.asarray(pt_valid), jnp.asarray(obs_kf), jnp.asarray(obs_pt),
            jnp.asarray(obs_uvr), jnp.ones(O), jnp.ones(O),
            jnp.asarray(obs_valid), INTR,
        )
        new_poses = np.asarray(out["kf_poses"])
        # pose error vs truth shrinks well below the init perturbation
        for i in range(1, 5):
            err0 = np.linalg.norm(
                np.asarray(
                    lie.log_se3(jnp.asarray(poses_init[i] @ np.linalg.inv(poses_true[i])))
                )
            )
            err1 = np.linalg.norm(
                np.asarray(
                    lie.log_se3(jnp.asarray(new_poses[i] @ np.linalg.inv(poses_true[i])))
                )
            )
            assert err1 < 0.5 * err0
        # fixed anchor untouched
        np.testing.assert_allclose(new_poses[0], poses_init[0], atol=1e-6)
        # points improved
        new_pts = np.asarray(out["points"])[: len(pts_true)]
        assert np.median(np.linalg.norm(new_pts - pts_true, axis=-1)) < np.median(
            np.linalg.norm(pts_init - pts_true, axis=-1)
        )

    def test_joint_ba_recovers_object_pose(self):
        pts_true, poses_true = make_world(n_pts=80, n_kf=4)
        k, p, uvr = project_all(poses_true, pts_true, noise=0.2)
        K, P, O = 4, 128, 1024
        kf_poses, pts, pt_valid, obs_kf, obs_pt, obs_uvr, obs_valid = _pad_problem(
            poses_true, pts_true, k, p, uvr, K, P, O
        )
        kf_fixed = np.zeros(K, np.float32)
        kf_fixed[0] = 1

        # one object observed by all KFs; perturbed initial estimate
        T_wo_true = np.asarray(
            lie.exp_se3(jnp.asarray([1.0, 0.2, 12.0, 0.0, 0.4, 0.0]))
        )
        M, Q = 2, 8
        obj_poses = np.tile(np.eye(4, dtype=np.float32), (M, 1, 1))
        obj_poses[0] = (
            np.asarray(lie.exp_se3(jnp.asarray([0.1, -0.08, 0.12, 0.03, -0.04, 0.02])))
            @ T_wo_true
        )
        edge_kf = np.zeros(Q, np.int32)
        edge_obj = np.zeros(Q, np.int32)
        edge_Tco = np.tile(np.eye(4, dtype=np.float32), (Q, 1, 1))
        edge_valid = np.zeros(Q, np.float32)
        for i in range(4):
            edge_kf[i] = i
            edge_Tco[i] = poses_true[i] @ T_wo_true   # exact T_co measurements
            edge_valid[i] = 1

        out = ba.bundle_adjust(
            jnp.asarray(kf_poses), jnp.asarray(kf_fixed), jnp.asarray(pts),
            jnp.asarray(pt_valid), jnp.asarray(obs_kf), jnp.asarray(obs_pt),
            jnp.asarray(obs_uvr), jnp.ones(O), jnp.ones(O),
            jnp.asarray(obs_valid), INTR,
            1e-3,
            {
                "poses": jnp.asarray(obj_poses),
                "fixed": jnp.asarray(np.array([0.0, 1.0], np.float32)),
                "edge_kf": jnp.asarray(edge_kf),
                "edge_obj": jnp.asarray(edge_obj),
                "edge_Tco": jnp.asarray(edge_Tco),
                "edge_valid": jnp.asarray(edge_valid),
            },
        )
        T_wo_est = np.asarray(out["obj_poses"][0])
        err = np.asarray(lie.log_se3(jnp.asarray(T_wo_est @ np.linalg.inv(T_wo_true))))
        assert np.linalg.norm(err) < 0.01
        # untouched padded object stays identity
        np.testing.assert_allclose(out["obj_poses"][1], np.eye(4), atol=1e-5)

    def test_object_edge_residual_zero_at_truth(self):
        T_cw = np.asarray(lie.exp_se3(jnp.asarray([0.3, 0.1, -0.2, 0.05, 0.1, 0.0])))
        T_wo = np.asarray(lie.exp_se3(jnp.asarray([1.0, 0.0, 5.0, 0.0, 0.3, 0.0])))
        T_co = T_cw @ T_wo
        r = ba._object_residual_single(
            jnp.asarray(T_cw), jnp.asarray(T_wo), jnp.asarray(T_co)
        )
        np.testing.assert_allclose(np.asarray(r), 0.0, atol=1e-5)
