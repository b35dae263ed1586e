"""DeepSDF trainer checkpoints: orbax round-trip + reference-format
export/ingest interoperability."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.models import deepsdf, deepsdf_train


def small_cfg():
    return deepsdf.DecoderConfig(code_len=8, hidden=(32, 32), latent_in=())


class TestCheckpoints:
    def test_orbax_roundtrip(self, tmp_path):
        cfg = small_cfg()
        opt = deepsdf_train.make_optimizer()
        state = deepsdf_train.init_state(cfg, 4, jax.random.PRNGKey(0), opt)
        batch = deepsdf_train.make_sphere_dataset(jax.random.PRNGKey(1), 4, 512)
        for _ in range(3):
            state, _ = deepsdf_train.train_step(state, batch, cfg, opt)
        path = str(tmp_path / "ckpt")
        deepsdf_train.save_checkpoint(state, path)
        restored = deepsdf_train.load_checkpoint(path, cfg, 4, opt)
        assert int(restored.step) == 3
        for a, b in zip(state.params["w"], restored.params["w"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        np.testing.assert_allclose(
            np.asarray(state.codes), np.asarray(restored.codes)
        )

    def test_reference_format_export_reimports(self, tmp_path):
        """Exported specs.json + latest.pth loads back through the
        reference-checkpoint ingestion path with identical outputs."""
        cfg = small_cfg()
        state = deepsdf_train.init_state(cfg, 2, jax.random.PRNGKey(3))
        out = str(tmp_path / "exp")
        deepsdf_train.export_reference_format(state, cfg, out)
        loaded_cfg, params = deepsdf.load_torch_checkpoint(out)
        assert loaded_cfg.code_len == cfg.code_len
        x = jax.random.normal(jax.random.PRNGKey(4), (9, cfg.in_dim)) * 0.4
        a = deepsdf.apply(state.params, x, cfg)
        b = deepsdf.apply(params, x, loaded_cfg)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
