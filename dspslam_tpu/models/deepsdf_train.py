"""DeepSDF prior training — auto-decoder SDF regression, sharded.

The reference *consumes* pretrained DeepSDF priors (cars_64 / chairs_64,
workspace.py:202-223) but ships no trainer; a complete framework must be
able to produce them. This implements the standard auto-decoder
objective (clamped-L1 SDF regression + per-shape latent codes with an
L2 prior) as one jitted, mesh-sharded training step:

  * samples batch shards over the ``dp`` mesh axis;
  * decoder hidden weights shard over ``tp`` (tensor parallel);
  * gradients are averaged by XLA collectives implied by the shardings.

This is also the framework's multi-chip "training step" contract used by
__graft_entry__.dryrun_multichip.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import deepsdf


class TrainState(NamedTuple):
    params: dict          # decoder weights
    codes: jnp.ndarray    # (num_shapes, code_len) latent table
    opt_state: optax.OptState
    step: jnp.ndarray


def make_optimizer(lr: float = 5e-4):
    return optax.adam(lr)


def init_state(
    config: deepsdf.DecoderConfig,
    num_shapes: int,
    key: jax.Array,
    optimizer=None,
) -> TrainState:
    k1, k2 = jax.random.split(key)
    params = deepsdf.init_params(config, k1)
    codes = 0.01 * jax.random.normal(k2, (num_shapes, config.code_len))
    optimizer = optimizer or make_optimizer()
    return TrainState(
        params=params,
        codes=codes,
        opt_state=optimizer.init((params, codes)),
        step=jnp.zeros((), jnp.int32),
    )


def sdf_loss(
    params,
    codes,
    shape_idx: jnp.ndarray,   # (B,) int32
    xyz: jnp.ndarray,         # (B, 3)
    sdf_target: jnp.ndarray,  # (B,)
    config: deepsdf.DecoderConfig,
    clamp: float = 0.1,
    code_reg: float = 1e-4,
):
    code = codes[shape_idx]                                   # (B, L)
    inputs = jnp.concatenate([code, xyz], axis=-1)
    pred = deepsdf.apply(params, inputs, config)
    data = jnp.mean(
        jnp.abs(jnp.clip(pred, -clamp, clamp) - jnp.clip(sdf_target, -clamp, clamp))
    )
    reg = code_reg * jnp.mean(jnp.sum(code**2, axis=-1))
    return data + reg


@partial(jax.jit, static_argnums=(2, 3), donate_argnums=(0,))
def train_step(state: TrainState, batch: dict, config, optimizer) -> tuple:
    """One SGD step. batch = {shape_idx (B,), xyz (B,3), sdf (B,)}.

    Sharding is carried by the input arrays: put the batch on ``dp`` and
    the params on ``tp`` (parallel.mesh_utils) and XLA emits psums over
    the right axes automatically.
    """

    def loss_fn(params_and_codes):
        params, codes = params_and_codes
        return sdf_loss(
            params, codes, batch["shape_idx"], batch["xyz"], batch["sdf"], config
        )

    loss, grads = jax.value_and_grad(loss_fn)((state.params, state.codes))
    updates, opt_state = optimizer.update(grads, state.opt_state)
    params, codes = optax.apply_updates((state.params, state.codes), updates)
    return (
        TrainState(params, codes, opt_state, state.step + 1),
        loss,
    )


def make_sphere_dataset(key, num_shapes=4, n=4096):
    """Synthetic SDF samples of spheres with per-shape radii (tests)."""
    k1, k2 = jax.random.split(key)
    xyz = jax.random.uniform(k1, (n, 3), minval=-1.0, maxval=1.0)
    shape_idx = jax.random.randint(k2, (n,), 0, num_shapes)
    radii = 0.3 + 0.1 * jnp.arange(num_shapes)
    sdf = jnp.linalg.norm(xyz, axis=-1) - radii[shape_idx]
    return {"shape_idx": shape_idx, "xyz": xyz, "sdf": sdf}
