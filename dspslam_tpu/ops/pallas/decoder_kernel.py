"""Pallas TPU kernel: fused DeepSDF forward + input gradient.

The GN reconstructor's hottest op is the per-point SDF value *and* its
gradient wrt the 67-d input (code 64 + xyz). The stock path is
`vmap(value_and_grad)` — one forward chain plus one backward chain
through HBM. This kernel fuses both: for each tile of points the full
decoder (canonical DSP-SLAM architecture: 64-code, 8x512, latent
re-injection at layer 4, final tanh — deep_sdf_decoder.py:9-110 shape)
runs forward keeping activations in VMEM, then backpropagates to the
input in the same kernel — no activation traffic to HBM, weights loaded
once per tile.

Weights total ~7 MB (f32) and fit VMEM alongside a 256-row tile. The
latent re-injection is handled by splitting layer 4's weight into the
hidden part (445 rows) and the input part (67 rows), so every matmul has
static MXU-friendly shapes.

`fused_sdf_and_input_grad` is a drop-in for
models.deepsdf.sdf_and_input_grad for the canonical architecture;
`supports(config)` reports applicability.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import deepsdf

TILE = 256
IN_DIM = 67           # 64 code + 3 xyz
HID = 512
NARROW = HID - IN_DIM  # 445: layer-3 output width


def supports(config: deepsdf.DecoderConfig) -> bool:
    return (
        config.code_len == 64
        and tuple(config.hidden) == (512,) * 8
        and tuple(config.latent_in) == (4,)
        and not config.use_tanh
        and config.final_tanh
        and config.compute_dtype == jnp.float32
    )


# Measured crossover (tools/bench_pallas.py, v5e-lite): the fused kernel
# wins ~1.4x up to ~2k points (GN surface-term sizes: 8 objects x 256
# points flatten to 2048) and loses to XLA's pipelined matmuls at 8k+
# (render-term grad batches, mesh grids). Dispatch by total point count.
FUSED_MAX_POINTS = 4096


def _generic(params, inputs):
    """Reference autodiff path for the canonical architecture."""
    cfg = deepsdf.DecoderConfig()

    def single(inp):
        return deepsdf.apply(params, inp[None, :], cfg)[0]

    return jax.vmap(jax.value_and_grad(single))(inputs)


@jax.custom_batching.custom_vmap
def dispatch_fused(params, inputs):
    """sdf_and_input_grad for the canonical architecture, vmap-safe.

    Unbatched (N, 67) calls pick pallas-vs-XLA by N; under jax.vmap the
    custom rule flattens (B, N, 67) -> (B*N, 67) into ONE kernel launch
    (vmapping the pallas_call itself miscompiles on TPU) and falls back
    to the autodiff path above FUSED_MAX_POINTS or when the weights are
    themselves batched.
    """
    if inputs.shape[0] <= FUSED_MAX_POINTS:
        return fused_sdf_and_input_grad(
            params, inputs, jax.default_backend() == "cpu"
        )
    return _generic(params, inputs)


@dispatch_fused.def_vmap
def _dispatch_rule(axis_size, in_batched, params, inputs):
    del axis_size
    params_b, inputs_b = in_batched
    params_batched = any(jax.tree.leaves(params_b))
    if not inputs_b:
        # only the weights are batched: no flattening trick applies
        out = jax.vmap(_generic, in_axes=(0, None))(params, inputs)
        return out, (True, True)
    B, N, D = inputs.shape
    if not params_batched and B * N <= FUSED_MAX_POINTS:
        sdf, grad = fused_sdf_and_input_grad(
            params, inputs.reshape(B * N, D), jax.default_backend() == "cpu"
        )
        return (sdf.reshape(B, N), grad.reshape(B, N, D)), (True, True)
    p_axes = jax.tree.map(lambda b: 0 if b else None, params_b)
    out = jax.vmap(_generic, in_axes=(p_axes, 0))(params, inputs)
    return out, (True, True)


def _kernel(
    x_ref,                    # (TILE, IN_DIM) input tile
    w0, b0, w1, b1, w2, b2, w3, b3,
    w4h, w4x, b4,             # layer-4 split: hidden (NARROW, HID), input (IN_DIM, HID)
    w5, b5, w6, b6, w7, b7, w8, b8,
    sdf_ref,                  # (TILE, 1) out
    grad_ref,                 # (TILE, IN_DIM) out
):
    x = x_ref[:]

    def lin(h, w, b):
        return jnp.dot(h, w[:], preferred_element_type=jnp.float32) + b[:]

    z0 = lin(x, w0, b0); h0 = jnp.maximum(z0, 0.0)
    z1 = lin(h0, w1, b1); h1 = jnp.maximum(z1, 0.0)
    z2 = lin(h1, w2, b2); h2 = jnp.maximum(z2, 0.0)
    z3 = lin(h2, w3, b3); h3 = jnp.maximum(z3, 0.0)          # (TILE, NARROW)
    z4 = (
        jnp.dot(h3, w4h[:], preferred_element_type=jnp.float32)
        + jnp.dot(x, w4x[:], preferred_element_type=jnp.float32)
        + b4[:]
    )
    h4 = jnp.maximum(z4, 0.0)
    z5 = lin(h4, w5, b5); h5 = jnp.maximum(z5, 0.0)
    z6 = lin(h5, w6, b6); h6 = jnp.maximum(z6, 0.0)
    z7 = lin(h6, w7, b7); h7 = jnp.maximum(z7, 0.0)
    z8 = lin(h7, w8, b8)                                     # (TILE, 1)
    y = jnp.tanh(z8)
    sdf_ref[:] = y

    # backward to the input
    def back(g, w, z):
        gz = jnp.dot(g, w[:].T, preferred_element_type=jnp.float32)
        return gz * (z > 0.0)

    g8 = 1.0 - y * y                                         # (TILE, 1)
    g7 = back(g8, w8, z7)
    g6 = back(g7, w7, z6)
    g5 = back(g6, w6, z5)
    g4 = back(g5, w5, z4)
    gx_inject = jnp.dot(g4, w4x[:].T, preferred_element_type=jnp.float32)
    g3 = jnp.dot(g4, w4h[:].T, preferred_element_type=jnp.float32) * (z3 > 0.0)
    g2 = back(g3, w3, z2)
    g1 = back(g2, w2, z1)
    g0 = back(g1, w1, z0)
    gx = jnp.dot(g0, w0[:].T, preferred_element_type=jnp.float32)
    grad_ref[:] = gx + gx_inject


def _pack_weights(params: dict):
    """Split layer 4 and return the 19 weight/bias operands."""
    w = params["w"]
    b = params["b"]
    w4 = w[4]
    return (
        w[0], b[0], w[1], b[1], w[2], b[2], w[3], b[3],
        w4[:NARROW], w4[NARROW:], b[4],
        w[5], b[5], w[6], b[6], w[7], b[7], w[8], b[8],
    )


@partial(jax.jit, static_argnums=(2,))
def fused_sdf_and_input_grad(params: dict, inputs: jnp.ndarray,
                             interpret: bool = False):
    """(N, 67) inputs -> (sdf (N,), grad (N, 67)). N padded to TILE."""
    n = inputs.shape[0]
    pad = (-n) % TILE
    x = jnp.pad(inputs.astype(jnp.float32), ((0, pad), (0, 0)))
    n_tiles = x.shape[0] // TILE

    weights = _pack_weights(params)
    w_specs = [pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM)
               for _ in weights]

    sdf, grad = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE, IN_DIM), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[
                pl.BlockSpec(
                    w.shape,
                    lambda i, _nd=w.ndim: (0,) * _nd,   # bind ndim per weight
                    memory_space=pltpu.VMEM,
                )
                for w in weights
            ],
        ],
        out_specs=(
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, IN_DIM), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], IN_DIM), jnp.float32),
        ),
        interpret=interpret,
    )(x, *weights)
    return sdf[:n, 0], grad[:n]
