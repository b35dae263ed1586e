"""Pallas fused decoder-gradient kernel: parity with the autodiff path
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.models import deepsdf
from dspslam_tpu.ops.pallas import decoder_kernel as dk


@pytest.fixture(scope="module")
def setup():
    cfg = deepsdf.DecoderConfig()
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestFusedKernel:
    def test_supports_canonical_arch_only(self):
        assert dk.supports(deepsdf.DecoderConfig())
        assert not dk.supports(deepsdf.DecoderConfig(code_len=8))
        assert not dk.supports(deepsdf.DecoderConfig(latent_in=()))

    def test_matches_autodiff(self, setup):
        cfg, params = setup
        x = jax.random.normal(jax.random.PRNGKey(1), (300, 67)) * 0.3
        fn = deepsdf.make_decoder_fn(cfg)
        sdf_ref, grad_ref = deepsdf.sdf_and_input_grad(fn, params, x)
        sdf, grad = dk.fused_sdf_and_input_grad(params, x, True)
        np.testing.assert_allclose(np.asarray(sdf), np.asarray(sdf_ref), atol=1e-5)
        err = np.abs(np.asarray(grad) - np.asarray(grad_ref)).max(axis=1)
        # points exactly on a ReLU boundary pick a different (equally
        # valid) subgradient; everything else must agree tightly
        assert np.quantile(err, 0.99) < 1e-4
        assert (err > 1e-4).sum() <= 3

    def test_padding_rows_sliced(self, setup):
        cfg, params = setup
        x = jax.random.normal(jax.random.PRNGKey(2), (7, 67)) * 0.3
        sdf, grad = dk.fused_sdf_and_input_grad(params, x, True)
        assert sdf.shape == (7,)
        assert grad.shape == (7, 67)
        # consistent with a different batch size containing the same rows
        sdf2, grad2 = dk.fused_sdf_and_input_grad(params, x[:3], True)
        np.testing.assert_allclose(np.asarray(sdf[:3]), np.asarray(sdf2), atol=1e-6)


class TestFastKernel:
    """FAST Pallas kernel (interpret mode): exact detection parity.

    Benchmarked on v5e the XLA rolled version is faster (4.6 vs 6.6 ms —
    the +/-3 column offsets force lane relayouts in Mosaic), so the
    kernel is an in-tree alternative, not the default path.
    """

    def test_detection_parity_and_two_tier(self):
        from dspslam_tpu.frontend import orb
        from dspslam_tpu.ops.pallas import fast_kernel as fk

        rng = np.random.default_rng(0)
        img = rng.normal(60, 3, (120, 200)).astype(np.float32)
        for _ in range(25):
            y, x = rng.integers(15, 100), rng.integers(15, 180)
            s = rng.integers(6, 12)
            img[y : y + s, x : x + s] = 200.0
        j = jnp.asarray(img)
        ref = np.asarray(orb.fast_score_map(j, 7.0))
        out = np.asarray(fk.fast_score_map_pallas(j, 7.0, 20.0, 1e4, True))
        inner = np.s_[5:-5, 5:-5]
        assert ((ref > 0)[inner] == (out > 0)[inner]).all()
        # the high tier must be populated and a strict subset of the low
        hi = out >= 1e4
        assert hi.sum() > 100
        assert (out[hi] > 0).all()
