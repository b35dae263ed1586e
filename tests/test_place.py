"""Place recognition + loop closing tests: vocabulary, Sim3 RANSAC,
pose-graph drift correction."""

import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.backend import pose_graph
from dspslam_tpu.ops import lie
from dspslam_tpu.place import sim3 as sim3_mod
from dspslam_tpu.place.vocabulary import KeyFrameDatabase, Vocabulary

RNG = np.random.default_rng(7)


def random_descs(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


class TestVocabulary:
    def test_train_and_assign(self):
        descs = random_descs(2000)
        voc = Vocabulary.train(descs, branching=6, levels=2)
        words = voc.assign_words(descs[:100])
        assert words.shape == (100,)
        assert words.min() >= 0 and words.max() < voc.n_words
        # assignment is deterministic
        np.testing.assert_array_equal(words, voc.assign_words(descs[:100]))

    def test_similar_images_score_higher(self):
        descs = random_descs(3000, seed=1)
        voc = Vocabulary.train(descs, branching=6, levels=2, seed=1)
        img_a = descs[:400]
        # same image with small bit corruption
        img_a2 = img_a.copy()
        flip = np.zeros_like(img_a2)
        flip[:40] = 1 << 3
        img_a2 = img_a2 ^ flip
        img_b = descs[1500:1900]
        va, va2, vb = (voc.bow_vector(x) for x in (img_a, img_a2, img_b))
        assert Vocabulary.score(va, va2) > Vocabulary.score(va, vb)
        assert Vocabulary.score(va, va) == pytest.approx(1.0, abs=1e-5)

    def test_database_query(self):
        descs = random_descs(2000, seed=2)
        voc = Vocabulary.train(descs, branching=6, levels=2, seed=2)
        db = KeyFrameDatabase(voc)
        for i in range(5):
            db.add(i, voc.bow_vector(descs[i * 300 : i * 300 + 300]))
        q = voc.bow_vector(descs[600:900])   # same content as kf 2
        res = db.query(q, 0.1, exclude={3})
        assert res[0][0] == 2
        assert all(k != 3 for k, _ in res)


class TestSim3:
    def test_horn_exact_recovery(self):
        p2 = RNG.normal(size=(30, 3))
        s_true, w = 1.4, np.array([0.2, -0.3, 0.1])
        R_true = np.asarray(lie.exp_so3(jnp.asarray(w, jnp.float32)))
        t_true = np.array([2.0, -1.0, 0.5])
        p1 = s_true * (p2 @ R_true.T) + t_true
        s, R, t = sim3_mod.horn_sim3(p1, p2)
        assert s == pytest.approx(s_true, rel=1e-5)
        np.testing.assert_allclose(R, R_true, atol=1e-5)
        np.testing.assert_allclose(t, t_true, atol=1e-5)

    def test_fixed_scale_mode(self):
        p2 = RNG.normal(size=(30, 3))
        R_true = np.asarray(lie.exp_so3(jnp.asarray([0.1, 0.2, -0.1], jnp.float32)))
        p1 = p2 @ R_true.T + np.array([1.0, 0, 0])
        s, R, t = sim3_mod.horn_sim3(p1, p2, fix_scale=True)
        assert s == 1.0
        np.testing.assert_allclose(R, R_true, atol=1e-5)

    def test_ransac_with_outliers(self):
        p2 = RNG.normal(size=(60, 3)) * 3
        R_true = np.asarray(lie.exp_so3(jnp.asarray([0.0, 0.4, 0.1], jnp.float32)))
        p1 = 1.2 * (p2 @ R_true.T) + np.array([0.5, 1.0, -2.0])
        # corrupt 30%
        p1[:18] += RNG.normal(0, 5.0, (18, 3))
        T, inliers = sim3_mod.ransac_sim3(p1, p2, fix_scale=False, seed=3)
        assert T is not None
        assert inliers[18:].mean() > 0.95
        assert inliers[:18].mean() < 0.2
        s, R, t = (
            np.linalg.det(T[:3, :3]) ** (1 / 3),
            None, None,
        )
        assert s == pytest.approx(1.2, rel=0.02)

    def test_ransac_rejects_garbage(self):
        p1 = RNG.normal(size=(40, 3))
        p2 = RNG.normal(size=(40, 3))
        T, inliers = sim3_mod.ransac_sim3(p1, p2, min_inliers=20)
        assert T is None


class TestPoseGraph:
    def test_corrects_accumulated_drift(self):
        """Chain 0-1-...-9 with odometry edges + loop edge 9->0; initial
        poses drift; optimization should pull the chain back."""
        K = 10
        # ground truth: poses along a line, identity rotation
        true = [np.eye(4, dtype=np.float32) for _ in range(K)]
        for i in range(K):
            true[i][0, 3] = -float(i)          # T_cw: camera at x=+i
        # drifted initial: each step slightly too long
        drift = [np.eye(4, dtype=np.float32) for _ in range(K)]
        for i in range(K):
            drift[i][0, 3] = -float(i) * 1.1
        E = 16
        edge_i = np.zeros(E, np.int32)
        edge_j = np.zeros(E, np.int32)
        meas = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
        valid = np.zeros(E, np.float32)
        n = 0
        for i in range(1, K):  # odometry edges with TRUE relative motion
            edge_i[n], edge_j[n] = i, i - 1
            meas[n] = true[i] @ np.linalg.inv(true[i - 1])
            valid[n] = 1
            n += 1
        # loop edge between 9 and 0 with true relative pose
        edge_i[n], edge_j[n] = 9, 0
        meas[n] = true[9] @ np.linalg.inv(true[0])
        valid[n] = 1
        n += 1

        poses = np.tile(np.eye(4, dtype=np.float32), (128, 1, 1))
        poses[:K] = drift
        fixed = np.ones(128, np.float32)
        fixed[:K] = 0
        fixed[0] = 1
        ei = np.zeros(512, np.int32)
        ej = np.zeros(512, np.int32)
        em = np.tile(np.eye(4, dtype=np.float32), (512, 1, 1))
        ev = np.zeros(512, np.float32)
        ei[:E], ej[:E], em[:E], ev[:E] = edge_i, edge_j, meas, valid

        out = np.asarray(
            pose_graph.optimize_pose_graph(
                jnp.asarray(poses), jnp.asarray(fixed), jnp.asarray(ei),
                jnp.asarray(ej), jnp.asarray(em), jnp.asarray(ev),
            )
        )
        for i in range(K):
            err = np.abs(out[i][0, 3] - true[i][0, 3])
            assert err < 0.05, f"kf {i}: {out[i][0, 3]} vs {true[i][0, 3]}"
        # scale stays ~1
        s = np.linalg.det(out[5][:3, :3]) ** (1 / 3)
        assert s == pytest.approx(1.0, abs=0.02)
