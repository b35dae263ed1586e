"""DeepSDF decoder tests: architecture parity with the torch reference,
checkpoint ingestion with weight-norm folding, gradient path."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.models import deepsdf


def small_config():
    # miniature DeepSDF: 4 hidden layers of 32, latent re-injection at 2
    return deepsdf.DecoderConfig(code_len=8, hidden=(32, 32, 32, 32), latent_in=(2,))


class TestArchitecture:
    def test_layer_dims_narrow_before_latent_in(self):
        cfg = small_config()
        dims = cfg.layer_dims()
        # layer 1 output must be narrowed by in_dim (11) so that concat at
        # layer 2 restores the nominal width
        assert dims[1] == (32, 32 - 11)
        assert dims[2] == (32, 32)
        assert dims[-1] == (32, 1)

    def test_full_scale_dims_match_reference_arch(self):
        cfg = deepsdf.DecoderConfig()  # 64-code, 8x512, latent_in=(4,)
        dims = cfg.layer_dims()
        assert dims[3] == (512, 512 - 67)
        assert dims[4] == (512, 512)
        assert len(dims) == 9

    def test_apply_shapes_and_finite(self):
        cfg = small_config()
        params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 7, cfg.in_dim))
        out = deepsdf.apply(params, x, cfg)
        assert out.shape == (5, 7)
        assert np.all(np.isfinite(out))
        assert np.all(np.abs(out) <= 1.0)  # final tanh

    def test_matches_torch_reference_impl(self):
        """Build the same net in torch with identical weights; compare."""
        import torch
        import torch.nn as nn

        cfg = small_config()
        params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))

        class TorchDecoder(nn.Module):
            # re-expression of the DeepSDF forward rule with the
            # reference's counting: num_layers = len(dims) = n_linear + 1,
            # ReLU for layer < num_layers - 2 == all but the last linear
            def __init__(self):
                super().__init__()
                self.lins = nn.ModuleList(
                    [nn.Linear(i, o) for i, o in cfg.layer_dims()]
                )

            def forward(self, inp):
                x = inp
                num_layers = len(self.lins) + 1
                for layer, lin in enumerate(self.lins):
                    if layer in cfg.latent_in:
                        x = torch.cat([x, inp], dim=-1)
                    x = lin(x)
                    if layer < num_layers - 2:
                        x = torch.relu(x)
                return torch.tanh(x)

        tnet = TorchDecoder()
        with torch.no_grad():
            for lin, w, b in zip(tnet.lins, params["w"], params["b"]):
                lin.weight.copy_(torch.from_numpy(np.asarray(w).T))
                lin.bias.copy_(torch.from_numpy(np.asarray(b)))

        x = np.random.default_rng(2).normal(size=(17, cfg.in_dim)).astype(np.float32)
        ours = deepsdf.apply(params, jnp.asarray(x), cfg)
        theirs = tnet(torch.from_numpy(x)).detach().numpy()[..., 0]
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


class TestCheckpointLoading:
    def test_load_weight_norm_checkpoint(self, tmp_path):
        """Round-trip: save a torch weight-norm net, load, compare outputs."""
        import torch
        import torch.nn as nn

        cfg = small_config()
        lins = [
            torch.nn.utils.weight_norm(nn.Linear(i, o)) for i, o in cfg.layer_dims()
        ]

        def torch_forward(inp):
            x = inp
            for layer, lin in enumerate(lins):
                if layer in cfg.latent_in:
                    x = torch.cat([x, inp], dim=-1)
                x = lin(x)
                if layer < len(lins) - 1:   # ReLU all but the last linear
                    x = torch.relu(x)
            return torch.tanh(x)

        state = {}
        for i, lin in enumerate(lins):
            for k, v in lin.state_dict().items():
                state[f"module.lin{i}.{k}"] = v

        exp = tmp_path / "exp"
        (exp / "ModelParameters").mkdir(parents=True)
        specs = {
            "CodeLength": cfg.code_len,
            "NetworkArch": "deep_sdf_decoder",
            "NetworkSpecs": {
                "dims": list(cfg.hidden),
                "latent_in": list(cfg.latent_in),
                "weight_norm": True,
                "use_tanh": False,
            },
        }
        (exp / "specs.json").write_text(json.dumps(specs))
        torch.save({"model_state_dict": state}, exp / "ModelParameters" / "latest.pth")

        loaded_cfg, params = deepsdf.load_torch_checkpoint(str(exp))
        assert loaded_cfg.code_len == cfg.code_len

        x = np.random.default_rng(3).normal(size=(9, cfg.in_dim)).astype(np.float32)
        ours = deepsdf.apply(params, jnp.asarray(x), loaded_cfg)
        with torch.no_grad():
            theirs = torch_forward(torch.from_numpy(x)).numpy()[..., 0]
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


class TestGradients:
    def test_input_grad_matches_fd(self):
        cfg = small_config()
        params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
        fn = deepsdf.make_decoder_fn(cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (6, cfg.in_dim)) * 0.3
        sdf, grad = deepsdf.sdf_and_input_grad(fn, params, x)
        assert sdf.shape == (6,)
        assert grad.shape == (6, cfg.in_dim)
        eps = 1e-3
        d = np.zeros(cfg.in_dim, np.float32)
        d[-1] = eps
        sdf_p = fn(params, x + d)
        fd = (np.asarray(sdf_p) - np.asarray(sdf)) / eps
        np.testing.assert_allclose(np.asarray(grad)[:, -1], fd, atol=1e-2)

    def test_sphere_decoder_gradient(self):
        params = deepsdf.make_sphere_params(code_len=4, r0=0.5)
        x = jnp.concatenate(
            [jnp.zeros((3, 4)), jnp.array([[0.6, 0, 0], [0, 0.2, 0], [0, 0, 1.0]])],
            axis=-1,
        )
        sdf, grad = deepsdf.sdf_and_input_grad(deepsdf.sphere_decoder_fn, params, x)
        np.testing.assert_allclose(np.asarray(sdf), [0.1, -0.3, 0.5], atol=1e-5)
        # xyz gradient is the unit radial direction
        np.testing.assert_allclose(np.asarray(grad)[0, -3:], [1, 0, 0], atol=1e-4)
        # code gradient is -w
        np.testing.assert_allclose(np.asarray(grad)[0, 0], -0.3, atol=1e-5)
