"""Device-mesh and sharding helpers.

The reference is a single-GPU, 4-thread process with no distributed
backend (SURVEY.md §2.4); here multi-chip scaling is native: work is laid
out over a `jax.sharding.Mesh` and XLA inserts the collectives (ICI).
Two axes cover the framework's needs:

* ``dp`` — data parallel: SDF sample batches (DeepSDF training), objects
  (multi-object GN), rays/voxel chunks (render/mesh eval);
* ``tp`` — tensor parallel: the decoder's hidden dimension.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, tp: int | None = None) -> Mesh:
    """A (dp, tp) mesh over the first n_devices. tp defaults to 2 when the
    device count is even (and > 1), else 1."""
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if tp is None:
        tp = 2 if n % 2 == 0 and n > 1 else 1
    dp = n // tp
    return Mesh(np.asarray(devices).reshape(dp, tp), ("dp", "tp"))


def decoder_param_sharding(mesh: Mesh, params: dict) -> dict:
    """Shard DeepSDF MLP weights tensor-parallel over the hidden dim.

    Hidden-layer weights (in, out) shard the output dim; the following
    layer's input dim is sharded to match, so activations stay sharded
    through the stack and XLA reduces over 'tp' only where widths break
    (latent re-injection, final scalar head).
    """
    tp = mesh.shape["tp"]

    def spec_for(w: jax.Array) -> P:
        if w.ndim == 2:
            in_ok = w.shape[0] % tp == 0 and w.shape[0] > 4
            out_ok = w.shape[1] % tp == 0 and w.shape[1] > 4
            if out_ok:
                return P(None, "tp")
            if in_ok:
                return P("tp", None)
        elif w.ndim == 1 and w.shape[0] % tp == 0 and w.shape[0] > 4:
            return P("tp")
        return P()

    return jax.tree.map(
        lambda w: jax.device_put(w, NamedSharding(mesh, spec_for(w))), params
    )


def batch_sharding(mesh: Mesh):
    """NamedSharding for batch-leading arrays: shard dim 0 over dp."""
    def put(tree):
        return jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
            ),
            tree,
        )

    return put


def sharded_object_gn(mesh: Mesh, batched_recon, params, *batch_args):
    """Sharded INFERENCE path for the per-keyframe multi-object GN: the
    object batch shards over `dp`, decoder params replicate, and XLA
    partitions the vmapped reconstruction with zero collectives in the
    hot loop (objects are independent). This is the multi-chip analogue
    of the reference's per-keyframe reconstruct_object loop
    (LocalMapping_util.cc:156-205 runs objects serially on one GPU).

    When is one chip simply enough? The per-keyframe batch is small
    (<= 8 objects at reference caps, ~7 ms/object on one v5e), so
    sharding pays only when amortizing many keyframes offline (map-wide
    re-reconstruction, extract_map_objects over hundreds of objects) —
    live SLAM keeps the whole batch on the tracking chip.
    """
    params = jax.tree.map(
        lambda w: jax.device_put(w, NamedSharding(mesh, P())), params
    )
    put = batch_sharding(mesh)
    args = tuple(put(a) for a in batch_args)
    with mesh:
        return batched_recon(params, *args)
