"""Host numpy SE(3) exp/log vs the jax reference implementation."""

import numpy as np

from dspslam_tpu.ops import lie_np


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        x = rng.normal(0, 1.0, 6).astype(np.float32)
        T = lie_np.exp_se3(x)
        x2 = lie_np.log_se3(T)
        np.testing.assert_allclose(x2, x, atol=1e-4)


def test_matches_jax_lie():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dspslam_tpu.ops import lie

    rng = np.random.default_rng(1)
    for _ in range(10):
        x = rng.normal(0, 0.8, 6).astype(np.float32)
        np.testing.assert_allclose(
            lie_np.exp_se3(x), np.asarray(lie.exp_se3(x)), atol=1e-5
        )


def test_log_near_pi():
    w = np.array([0.0, np.pi - 1e-5, 0.0])
    T = lie_np.exp_se3(np.concatenate([[0.1, 0.2, 0.3], w]))
    x = lie_np.log_se3(T)
    np.testing.assert_allclose(np.linalg.norm(x[3:]), np.pi - 1e-5, atol=1e-3)


def test_interp_endpoints():
    rng = np.random.default_rng(2)
    A = lie_np.exp_se3(rng.normal(0, 0.5, 6))
    B = lie_np.exp_se3(rng.normal(0, 0.5, 6))
    np.testing.assert_allclose(lie_np.interp_se3(A, B, 0.0), A, atol=1e-5)
    np.testing.assert_allclose(lie_np.interp_se3(A, B, 1.0), B, atol=1e-5)
