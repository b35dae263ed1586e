"""Native library parity tests: C++ paths must match the numpy reference."""

import numpy as np
import pytest

from dspslam_tpu import native
from dspslam_tpu.objects import detections as det_mod

RNG = np.random.default_rng(13)


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.available(), "native library failed to build"


class TestNative:
    def test_transform_points(self):
        pts = RNG.normal(size=(100, 4)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.linalg.qr(RNG.normal(size=(3, 3)))[0].astype(np.float32)
        T[:3, 3] = [1, 2, 3]
        out = native.transform_points(T, pts)
        ref = pts[:, :3] @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_crop_lidar_box_matches_numpy(self):
        velo = np.concatenate(
            [
                RNG.uniform(-10, 10, (3000, 3)),
                np.ones((3000, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
        box = np.array([2.0, -1.0, 0.5, 1.8, 4.2, 1.5, 0.7], np.float32)
        ref = det_mod.crop_lidar_for_box(velo, box, 250)[:, :3]
        out = native.crop_lidar_box(velo, box, 250)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.sort(out, axis=0), np.sort(ref, axis=0),
                                   atol=1e-5)

    def test_crop_subsampling_cap(self):
        # dense cluster inside the box -> capped output
        velo = np.concatenate(
            [
                RNG.normal([2.0, -1.0, 1.0], 0.3, (5000, 3)),
                np.ones((5000, 1)),
            ],
            axis=-1,
        ).astype(np.float32)
        box = np.array([2.0, -1.0, 0.0, 3.0, 3.0, 3.0, 0.0], np.float32)
        out = native.crop_lidar_box(velo, box, 100)
        assert len(out) == 100

    def test_mask_hit_counts(self):
        masks = RNG.random((4, 50, 60)) > 0.6
        uv = np.stack(
            [RNG.uniform(-5, 65, 300), RNG.uniform(-5, 55, 300)], axis=-1
        ).astype(np.float32)
        valid = RNG.random(300) > 0.2
        out = native.mask_hit_counts(masks, uv, valid)
        pi = uv.astype(np.int64)
        ref = np.zeros(4, np.int64)
        for i in range(300):
            x, y = pi[i]
            if valid[i] and 0 <= x < 60 and 0 <= y < 50:
                ref += masks[:, y, x]
        np.testing.assert_array_equal(out, ref)

    def test_hamming_matrix(self):
        a = RNG.integers(0, 2**32, (40, 8), dtype=np.uint32)
        b = RNG.integers(0, 2**32, (30, 8), dtype=np.uint32)
        out = native.hamming_matrix(a, b)
        x = a[:, None, :] ^ b[None, :, :]
        ref = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
        np.testing.assert_array_equal(out, ref)
