"""ORB frontend tests: FAST parity vs OpenCV, keypoint selection,
orientation, descriptors, matching, stereo depth."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.frontend import matcher, orb, stereo


def checker_corners_image(h=240, w=320, seed=0):
    """Image with scattered bright squares -> strong corners."""
    rng = np.random.default_rng(seed)
    img = rng.normal(60, 3, (h, w)).astype(np.float32)
    corners = []
    for _ in range(40):
        y, x = rng.integers(30, h - 40), rng.integers(30, w - 40)
        s = rng.integers(8, 16)
        img[y : y + s, x : x + s] = 200.0
        corners += [(x, y), (x + s - 1, y), (x, y + s - 1), (x + s - 1, y + s - 1)]
    return img, np.asarray(corners, np.float32)


SMALL = orb.ORBParams(n_features=500, n_levels=4)


@pytest.fixture(scope="module")
def scene():
    img, corners = checker_corners_image()
    return img, corners


@pytest.fixture(scope="module")
def feats(scene):
    img, _ = scene
    return jax.tree.map(np.asarray, orb.extract(jnp.asarray(img), SMALL))


class TestFAST:
    def test_score_peaks_at_corners(self, scene):
        img, corners = scene
        score = np.asarray(orb.fast_score_map(jnp.asarray(img), 20.0))
        # a flat region scores zero
        assert score[5:20, 5:20].max() == 0.0
        # most square corners score positive within 2 px
        hit = 0
        for x, y in corners:
            if score[int(y) - 2 : int(y) + 3, int(x) - 2 : int(x) + 3].max() > 0:
                hit += 1
        assert hit / len(corners) > 0.8

    def test_against_opencv_fast(self, scene):
        """Every strong OpenCV FAST corner should score >0 in our map."""
        img, _ = scene
        det = cv2.FastFeatureDetector_create(
            threshold=20, nonmaxSuppression=True
        )
        kps = det.detect(img.astype(np.uint8))
        score = np.asarray(orb.fast_score_map(jnp.asarray(img), 20.0))
        hits = 0
        strong = list(kps)
        for k in strong:
            x, y = int(round(k.pt[0])), int(round(k.pt[1]))
            if 3 <= x < img.shape[1] - 3 and 3 <= y < img.shape[0] - 3:
                hits += score[y - 1 : y + 2, x - 1 : x + 2].max() > 0
        assert strong and hits / len(strong) > 0.9


class TestSelection:
    def test_top_k_spread_and_masked(self, scene):
        img, _ = scene
        score = orb.fast_score_map(jnp.asarray(img), 20.0)
        xy, resp, valid = orb.select_keypoints(score, 200)
        xy, resp, valid = map(np.asarray, (xy, resp, valid))
        n = int(valid.sum())
        assert 20 < n <= 200
        live = xy[valid > 0]
        # respect border margin
        assert live[:, 0].min() >= orb.EDGE_MARGIN
        assert live[:, 1].min() >= orb.EDGE_MARGIN
        # no duplicate positions
        assert len(np.unique(live, axis=0)) == len(live)
        # responses sorted descending in the live prefix region
        rs = resp[valid > 0]
        assert (np.diff(rs) <= 1e-5).all()


class TestOrientation:
    def test_gradient_patch_angle(self):
        # brightness increasing with +x -> centroid to the right -> angle 0
        img = np.tile(np.arange(64, dtype=np.float32), (64, 1))
        ang = float(orb.orientations(jnp.asarray(img), jnp.asarray([[32.0, 32.0]]))[0])
        assert abs(ang) < 0.1
        # increasing with +y -> angle pi/2
        ang2 = float(
            orb.orientations(jnp.asarray(img.T), jnp.asarray([[32.0, 32.0]]))[0]
        )
        assert abs(ang2 - np.pi / 2) < 0.1


class TestSamplingVariants:
    """The MXU/patch-local alternatives must match the gather baselines
    exactly for interior keypoints (all valid ones: EDGE_MARGIN=19)."""

    def _interior_kps(self, h, w, n=200, seed=3):
        rng = np.random.default_rng(seed)
        xs = rng.integers(orb.EDGE_MARGIN, w - orb.EDGE_MARGIN, n)
        ys = rng.integers(orb.EDGE_MARGIN, h - orb.EDGE_MARGIN, n)
        return jnp.asarray(np.stack([xs, ys], -1).astype(np.float32))

    def test_orientations_conv_parity(self, scene):
        img, _ = scene
        j = jnp.asarray(img)
        xy = self._interior_kps(*img.shape)
        a_ref = np.asarray(orb.orientations(j, xy))
        a_conv = np.asarray(orb.orientations_conv(j, xy))
        # same math, different accumulation order: moments agree to
        # ~1e-2 absolute, so the angle matches tightly wherever the
        # moment magnitude isn't degenerate (flat noise patches)
        d = np.abs(np.angle(np.exp(1j * (a_conv - a_ref))))
        assert np.quantile(d, 0.9) < 1e-3
        assert np.median(d) < 2e-4

    def test_brief_patch_and_onehot_parity(self, scene):
        img, _ = scene
        blurred = orb.gaussian_blur7(jnp.asarray(img))
        xy = self._interior_kps(*img.shape, seed=4)
        rng = np.random.default_rng(5)
        ang = jnp.asarray(rng.uniform(-np.pi, np.pi, xy.shape[0]).astype(np.float32))
        pattern = jnp.asarray(orb.brief_pattern())
        d_ref = np.asarray(orb.brief_descriptors(blurred, xy, ang, pattern))
        d_patch = np.asarray(
            orb.brief_descriptors_patch(blurred, xy, ang, pattern)
        )
        np.testing.assert_array_equal(d_patch, d_ref)
        d_onehot = np.asarray(
            orb.brief_descriptors_onehot(blurred, xy, ang, pattern)
        )
        np.testing.assert_array_equal(d_onehot, d_ref)

    def test_extract_patch_brief_end_to_end(self, scene, feats):
        img, _ = scene
        params = orb.ORBParams(n_features=500, n_levels=4, brief_mode="patch")
        out = jax.tree.map(np.asarray, orb.extract(jnp.asarray(img), params))
        # same selection and angles; bit-identical descriptors
        np.testing.assert_array_equal(out["xy"], feats["xy"])
        np.testing.assert_array_equal(out["angle"], feats["angle"])
        valid = feats["valid"] > 0
        np.testing.assert_array_equal(
            out["desc"][valid], feats["desc"][valid]
        )

    def test_extract_conv_orient_end_to_end(self, scene, feats):
        img, _ = scene
        params = orb.ORBParams(n_features=500, n_levels=4, orient_mode="conv")
        out = jax.tree.map(np.asarray, orb.extract(jnp.asarray(img), params))
        np.testing.assert_array_equal(out["xy"], feats["xy"])
        valid = feats["valid"] > 0
        d = np.abs(
            np.angle(np.exp(1j * (out["angle"] - feats["angle"])))[valid]
        )
        # selected keypoints are strong corners -> stable moments; the
        # accumulation-order noise stays tiny (descriptor bits may still
        # flip where a rotated offset sits exactly on a .5 boundary)
        assert np.quantile(d, 0.95) < 1e-3
        ham = np.unpackbits(
            (out["desc"][valid] ^ feats["desc"][valid]).view(np.uint8),
            axis=1,
        ).sum(axis=1)
        assert np.median(ham) == 0
        assert np.quantile(ham, 0.95) <= 4


class TestDescriptors:
    def test_deterministic_and_discriminative(self, scene, feats):
        img, _ = scene
        f2 = jax.tree.map(np.asarray, orb.extract(jnp.asarray(img), SMALL))
        np.testing.assert_array_equal(feats["desc"], f2["desc"])
        live = feats["valid"] > 0
        d = feats["desc"][live]
        # different keypoints should mostly have distinct descriptors
        dist = np.asarray(
            matcher.hamming_matrix(jnp.asarray(d), jnp.asarray(d))
        )
        off_diag = dist[~np.eye(len(d), dtype=bool)]
        assert np.median(off_diag) > 40

    def test_pattern_reproducible(self):
        p1 = orb.brief_pattern(1234)
        p2 = orb.brief_pattern(1234)
        np.testing.assert_array_equal(p1, p2)
        assert p1.shape == (256, 2, 2)
        assert np.abs(p1).max() <= orb.HALF_PATCH - 2


class TestExtract:
    def test_shapes_and_levels(self, feats):
        n_total = sum(SMALL.features_per_level())
        assert feats["xy"].shape == (n_total, 2)
        assert feats["desc"].shape == (n_total, 8)
        assert feats["valid"].sum() > 100
        assert set(np.unique(feats["level"])) <= set(range(SMALL.n_levels))

    def test_budget_allocation_matches_reference_rule(self):
        budgets = orb.ORBParams(n_features=2000, n_levels=8).features_per_level()
        assert sum(budgets) == 2000
        assert budgets[0] > budgets[1] > budgets[-1]


class TestMatching:
    def test_match_shifted_image(self, scene):
        img, _ = scene
        shift = 7
        img2 = np.roll(img, shift, axis=1)
        fa = orb.extract(jnp.asarray(img), SMALL)
        fb = orb.extract(jnp.asarray(img2), SMALL)
        idx, dist = matcher.match_features(fa, fb)
        idx = np.asarray(idx)
        matched = idx >= 0
        assert matched.sum() > 30
        dx = np.asarray(fb["xy"])[idx[matched], 0] - np.asarray(fa["xy"])[matched, 0]
        assert abs(np.median(dx) - shift) < 1.0

    def test_projection_search(self, scene):
        img, _ = scene
        f = orb.extract(jnp.asarray(img), SMALL)
        # project "map points" exactly at keypoint locations
        idx, dist = matcher.match_by_projection(
            f["xy"], f["valid"], f["desc"], f["level"], f, radius=3.0
        )
        idx = np.asarray(idx)
        live = np.asarray(f["valid"]) > 0
        # each point finds itself
        assert (idx[live] == np.arange(len(idx))[live]).mean() > 0.95


class TestStereo:
    def test_uniform_disparity_depth(self, scene):
        img, _ = scene
        disp = 12.0
        img_r = np.roll(img, -int(disp), axis=1)
        fl = orb.extract(jnp.asarray(img), SMALL)
        fr = orb.extract(jnp.asarray(img_r), SMALL)
        bf = 400.0
        out = stereo.stereo_match(
            fl, fr, jnp.asarray(img), jnp.asarray(img_r),
            jnp.float32(bf), jnp.float32(60.0),
        )
        valid = np.asarray(out["valid"]) > 0
        assert valid.sum() > 30
        depth = np.asarray(out["depth"])[valid]
        np.testing.assert_allclose(np.median(depth), bf / disp, rtol=0.05)

    def test_virtual_right_from_depth(self):
        u = jnp.asarray([100.0, 200.0])
        d = jnp.asarray([10.0, -1.0])
        ur, valid = stereo.depth_to_virtual_right(u, d, bf=400.0)
        assert float(ur[0]) == pytest.approx(100.0 - 40.0)
        assert float(valid[1]) == 0.0

    @pytest.mark.parametrize("level,tol", [(0, 0.3), (3, 0.9)])
    def test_subpixel_octave_windows(self, level, tol):
        """SAD windows dilate with the keypoint's octave (reference
        samples the pyramid-level image, Frame.cc:540-610): a
        high-octave keypoint on smooth large-scale texture still
        recovers a fractional disparity, with octave-scaled subpixel
        resolution."""
        H, W = 96, 256
        yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)

        def f(x, y):
            return (
                120
                + 40 * np.sin(2 * np.pi * x / 23.0) * np.cos(2 * np.pi * y / 31.0)
                + 30 * np.sin(2 * np.pi * (x + y) / 17.0)
            )

        true_disp = 3.3
        img_l = f(xx, yy).astype(np.float32)
        img_r = f(xx + true_disp, yy).astype(np.float32)

        sf = 1.2
        n = 6
        xs = np.linspace(60, 200, n).astype(np.float32)
        desc = np.zeros((n, 8), np.uint32)
        desc[:, 0] = 1 << np.arange(n)      # unique per keypoint
        feats = {
            "xy": np.stack([xs, np.full(n, 48.0, np.float32)], -1),
            "desc": desc,
            "level": np.full(n, level, np.int32),
            "sigma2": np.full(n, sf ** (2 * level), np.float32),
            "valid": np.ones(n, np.float32),
            "response": np.ones(n, np.float32),
            "angle": np.zeros(n, np.float32),
        }
        fr = dict(feats)
        fr["xy"] = feats["xy"] - np.array([[np.round(true_disp), 0.0]], np.float32)
        fl_j = {k: jnp.asarray(v) for k, v in feats.items()}
        fr_j = {k: jnp.asarray(v) for k, v in fr.items()}
        out = stereo.stereo_match(
            fl_j, fr_j, jnp.asarray(img_l), jnp.asarray(img_r),
            jnp.float32(400.0), jnp.float32(40.0),
        )
        valid = np.asarray(out["valid"]) > 0
        assert valid.sum() >= n - 2
        disp = (feats["xy"][:, 0] - np.asarray(out["u_right"]))[valid]
        assert np.abs(np.median(disp) - true_disp) < tol, disp
