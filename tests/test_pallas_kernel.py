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


class TestFusedDispatch:
    """vmap-safe dispatcher: the GN stack's entry to the fused kernel."""

    def test_decoder_fn_marks_eligibility(self):
        fn = deepsdf.make_decoder_fn(deepsdf.DecoderConfig())
        assert fn.fused_kernel_ok
        fn8 = deepsdf.make_decoder_fn(deepsdf.DecoderConfig(code_len=8))
        assert not fn8.fused_kernel_ok

    def test_vmap_flattens_to_one_launch(self, setup):
        cfg, params = setup
        fn = deepsdf.make_decoder_fn(cfg)
        x = jax.random.normal(jax.random.PRNGKey(3), (3, 100, 67)) * 0.3
        sdf, grad = jax.vmap(dk.dispatch_fused, in_axes=(None, 0))(params, x)
        sdf_ref, grad_ref = jax.vmap(
            lambda xx: deepsdf.sdf_and_input_grad(fn, params, xx)
        )(x)
        assert sdf.shape == (3, 100)
        np.testing.assert_allclose(
            np.asarray(sdf), np.asarray(sdf_ref), atol=1e-5
        )
        err = np.abs(np.asarray(grad) - np.asarray(grad_ref)).max(axis=-1)
        assert np.quantile(err, 0.99) < 1e-4

    def test_large_batch_falls_back_to_autodiff(self, setup):
        cfg, params = setup
        # 3 x 2000 = 6000 > FUSED_MAX_POINTS: must route through the
        # generic path (and therefore not require a TPU even off-CPU)
        x = jax.random.normal(jax.random.PRNGKey(4), (3, 2000, 67)) * 0.3
        sdf, grad = jax.vmap(dk.dispatch_fused, in_axes=(None, 0))(params, x)
        fn = deepsdf.make_decoder_fn(cfg)
        sdf_ref, _ = jax.vmap(
            lambda xx: deepsdf.sdf_and_input_grad(fn, params, xx)
        )(x)
        np.testing.assert_allclose(
            np.asarray(sdf), np.asarray(sdf_ref), atol=1e-5
        )


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

    def _textured_batch(self, b, h, w, seed=0):
        rng = np.random.default_rng(seed)
        imgs = rng.normal(60, 3, (b, h, w)).astype(np.float32)
        for i in range(b):
            for _ in range(20):
                y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
                s = rng.integers(6, 12)
                imgs[i, y : y + s, x : x + s] = 60.0 + 80.0 * (i + 1)
        return imgs

    def test_batched_matches_per_image(self):
        from dspslam_tpu.ops.pallas import fast_kernel as fk

        imgs = jnp.asarray(self._textured_batch(3, 100, 160))
        out_b = np.asarray(
            fk.fast_score_map_batched(imgs, 7.0, 20.0, 1e4, True)
        )
        for i in range(3):
            ref = np.asarray(
                fk.fast_score_map_pallas(imgs[i], 7.0, 20.0, 1e4, True)
            )
            # only the <=3-px top/bottom bands may see neighbour-image
            # halos (masked off downstream by EDGE_MARGIN)
            np.testing.assert_array_equal(out_b[i][3:-3], ref[3:-3])

    def test_custom_vmap_routes_batched(self):
        from dspslam_tpu.ops.pallas import fast_kernel as fk

        imgs = jnp.asarray(self._textured_batch(2, 96, 160, seed=1))
        score = fk.two_tier_score_fn(7.0, 20.0, 1e4, interpret=True)
        out_v = np.asarray(jax.vmap(score)(imgs))
        for i in range(2):
            ref = np.asarray(score(imgs[i]))
            np.testing.assert_array_equal(out_v[i][3:-3], ref[3:-3])

    def test_extract_with_pallas_backend(self):
        """End-to-end extraction on the Pallas detector (interpret):
        every selected keypoint must be a FAST corner of the XLA score
        map (detection-set parity at the selection level)."""
        from dspslam_tpu.frontend import orb

        img = jnp.asarray(self._textured_batch(1, 120, 200, seed=2)[0])
        params = orb.ORBParams(
            n_features=150, n_levels=1, fast_backend="pallas"
        )
        out = orb.extract(img, params)
        ref_score = np.asarray(orb.fast_score_map(img, 7.0))
        xy = np.asarray(out["xy"])
        valid = np.asarray(out["valid"]) > 0
        assert valid.sum() > 20
        for x, y in xy[valid].astype(int):
            assert ref_score[y, x] > 0
