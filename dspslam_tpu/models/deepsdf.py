"""DeepSDF shape-prior decoder, TPU-native.

Functional re-implementation of the auto-decoder MLP the reference embeds
via PyTorch (/root/reference/deep_sdf/deep_sdf_decoder.py:9-110) and loads
from DeepSDF experiment directories (/root/reference/deep_sdf/workspace.py:
202-223). Differences by design:

* pure function of a params pytree — no modules, no eval/train modes
  (inference never uses dropout; weight-norm is folded at load time);
* batched over points *and* objects: `apply` broadcasts over any leading
  dims, so multi-object reconstruction is one big MXU matmul;
* the input-gradient path (`sdf_and_input_grad`) is one fused
  value_and_grad, replacing the reference's repeated forward +
  `y.backward(eye)` trick (loss_utils.py:82-103);
* optional bfloat16 compute with float32 accumulation for MXU throughput.

Checkpoint ingestion: `load_torch_checkpoint` reads the reference's
`specs.json` + `ModelParameters/<ckpt>.pth` (weight-norm `weight_g` /
`weight_v` folded into plain weights) so published DeepSDF priors
(cars_64, chairs_64) drop in unchanged.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    code_len: int = 64
    hidden: tuple[int, ...] = (512,) * 8
    latent_in: tuple[int, ...] = (4,)
    use_tanh: bool = False          # tanh before the final layer's output stage
    final_tanh: bool = True         # the reference's always-present `th`
    compute_dtype: Any = jnp.float32
    # The decoder tolerates reduced matmul precision (verified: GN
    # converges identically) and runs ~4.6x faster on v5e than the
    # framework-wide 'highest' default set for geometry code.
    matmul_precision: str = "default"

    @property
    def in_dim(self) -> int:
        return self.code_len + 3

    def layer_dims(self) -> list[tuple[int, int]]:
        """(fan_in, fan_out) per linear layer, reproducing the reference's
        width bookkeeping: a layer feeding a latent re-injection point is
        narrowed by in_dim so the concatenated width matches."""
        dims = [self.in_dim] + list(self.hidden) + [1]
        out = []
        for layer in range(len(dims) - 1):
            fan_out = dims[layer + 1]
            if (layer + 1) in self.latent_in:
                fan_out -= dims[0]
            out.append((dims[layer], fan_out))
        return out


def init_params(config: DecoderConfig, key: jax.Array) -> dict:
    """He-style init; returns {'w': [W_l...], 'b': [b_l...]} pytree."""
    ws, bs = [], []
    for fan_in, fan_out in config.layer_dims():
        key, sub = jax.random.split(key)
        w = jax.random.normal(sub, (fan_in, fan_out), jnp.float32) * np.sqrt(
            2.0 / fan_in
        )
        ws.append(w)
        bs.append(jnp.zeros((fan_out,), jnp.float32))
    return {"w": ws, "b": bs}


def apply(params: dict, inputs: jnp.ndarray, config: DecoderConfig) -> jnp.ndarray:
    """SDF value for (..., code_len + 3) inputs -> (...,).

    inputs = concat([code, xyz], -1); matmuls run in config.compute_dtype
    with float32 accumulation (MXU-friendly), output is float32.
    """
    cdt = config.compute_dtype
    x = inputs.astype(cdt)
    orig = x
    n_layers = len(params["w"])
    # reference semantics (deep_sdf_decoder.py:85-105 with num_layers =
    # len(dims) = n_linear + 1): ReLU after every layer except the LAST
    # linear; use_tanh applies to the last linear's output.
    for layer, (w, b) in enumerate(zip(params["w"], params["b"])):
        if layer in config.latent_in:
            x = jnp.concatenate([x, orig], axis=-1)
        x = (
            jnp.dot(
                x, w.astype(cdt), preferred_element_type=jnp.float32,
                precision=config.matmul_precision,
            )
            + b.astype(jnp.float32)
        )
        if layer == n_layers - 1 and config.use_tanh:
            x = jnp.tanh(x)
        if layer < n_layers - 1:
            x = jax.nn.relu(x).astype(cdt)
    x = x[..., 0]
    if config.final_tanh:
        x = jnp.tanh(x)
    return x


def make_decoder_fn(config: DecoderConfig):
    """Close over config -> decoder_fn(params, inputs). The shape/GN stack
    is generic over this signature so tests can substitute analytic SDFs.

    For the canonical architecture on TPU, `sdf_and_input_grad` reroutes
    to the fused Pallas forward+input-grad kernel
    (ops.pallas.decoder_kernel) in its measured win regime (<= ~4k
    points, ~1.4x on v5e); the `fused_kernel_ok` attribute marks
    eligibility. Batched GN calls stay safe: a custom_vmap rule flattens
    the object batch into one kernel launch (vmapping a pallas_call
    directly miscompiles on TPU).
    """

    def decoder_fn(params, inputs):
        return apply(params, inputs, config)

    from ..ops.pallas import decoder_kernel

    decoder_fn.fused_kernel_ok = decoder_kernel.supports(config)
    return decoder_fn


def sdf_and_input_grad(decoder_fn, params, inputs: jnp.ndarray):
    """Per-point SDF and gradient wrt the full input vector.

    inputs: (N, D) -> (sdf (N,), grad (N, D)). One reverse-mode pass per
    point, batched by vmap (the whole batch shares a single compiled
    forward+backward — contrast loss_utils.py:82-103). Canonical
    decoders on TPU dispatch to the fused Pallas kernel (see
    make_decoder_fn).
    """
    if getattr(decoder_fn, "fused_kernel_ok", False) and jax.default_backend() not in (
        "cpu",
        "gpu",
    ):
        from ..ops.pallas import decoder_kernel

        return decoder_kernel.dispatch_fused(params, inputs)

    def single(inp):
        return decoder_fn(params, inp[None, :])[0]

    return jax.vmap(jax.value_and_grad(single))(inputs)


# ---------------------------------------------------------------------------
# Analytic decoders for tests and synthetic-data pipelines


def sphere_decoder_fn(params, inputs):
    """Analytic SDF of a sphere whose radius is modulated by the code.

    sdf = ||x|| - (r0 + w . code). `params` = {'r0': float, 'w': (L,)}.
    Exercises exactly the optimizer's contract (scalar SDF, grads wrt code
    and xyz) with a known global optimum.
    """
    code, xyz = inputs[..., :-3], inputs[..., -3:]
    r = params["r0"] + jnp.sum(code * params["w"], axis=-1)
    return jnp.linalg.norm(xyz + 1e-12, axis=-1) - r


def make_sphere_params(code_len: int = 64, r0: float = 0.5) -> dict:
    w = np.zeros((code_len,), np.float32)
    w[0] = 0.3
    return {"r0": jnp.float32(r0), "w": jnp.asarray(w)}


# ---------------------------------------------------------------------------
# PyTorch checkpoint ingestion (reference workspace.py:202-223)


def _fold_weight_norm(state: dict, prefix: str):
    """Return (W, b) with weight-norm folded: W = g * v / ||v||_row."""
    g = state[prefix + ".weight_g"].detach().cpu().numpy()
    v = state[prefix + ".weight_v"].detach().cpu().numpy()
    norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1).reshape(
        (-1,) + (1,) * (v.ndim - 1)
    )
    w = g * v / norm
    b = state[prefix + ".bias"].detach().cpu().numpy()
    return w, b


def load_torch_checkpoint(
    experiment_dir: str, checkpoint: str = "latest", compute_dtype=jnp.float32
):
    """Load a DeepSDF experiment dir (specs.json + ModelParameters/*.pth).

    Returns (config, params). Weight-norm parametrization is folded into
    plain weights; DataParallel 'module.' prefixes are stripped. Torch
    stores Linear weights as (out, in); we transpose to (in, out).
    """
    import torch

    with open(os.path.join(experiment_dir, "specs.json")) as f:
        specs = json.load(f)
    net = specs["NetworkSpecs"]
    config = DecoderConfig(
        code_len=int(specs["CodeLength"]),
        hidden=tuple(net["dims"]),
        latent_in=tuple(net.get("latent_in", ())),
        use_tanh=bool(net.get("use_tanh", False)),
        compute_dtype=compute_dtype,
    )
    path = os.path.join(experiment_dir, "ModelParameters", checkpoint + ".pth")
    saved = torch.load(path, map_location="cpu", weights_only=False)
    state = saved["model_state_dict"]
    state = {k.removeprefix("module."): v for k, v in state.items()}

    ws, bs = [], []
    for layer in range(len(config.layer_dims())):
        prefix = f"lin{layer}"
        if prefix + ".weight_g" in state:
            w, b = _fold_weight_norm(state, prefix)
        else:
            w = state[prefix + ".weight"].detach().cpu().numpy()
            b = state[prefix + ".bias"].detach().cpu().numpy()
        ws.append(jnp.asarray(w.T, jnp.float32))
        bs.append(jnp.asarray(b, jnp.float32))
    return config, {"w": ws, "b": bs}
