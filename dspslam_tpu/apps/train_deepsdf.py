"""Train a DeepSDF shape prior — the missing trainer the reference
assumes (it consumes pretrained cars_64 / chairs_64 dirs).

Input: a directory of per-shape SDF sample files (`<name>.npz` with
`xyz (N, 3)` and `sdf (N,)` — the standard DeepSDF preprocessed sample
format), or `--synthetic` spheres for smoke runs. Trains the
auto-decoder on a (dp, tp) device mesh and exports both an orbax
checkpoint and a reference-format experiment directory that
`models.deepsdf.load_torch_checkpoint` (and the reference itself) can
load.

Usage:
    python -m dspslam_tpu.apps.train_deepsdf --samples_dir sdf/ \
        --out experiments/cars_64 [--steps 20000] [--code_len 64]
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models import deepsdf, deepsdf_train
from ..parallel import mesh_utils


def load_samples(samples_dir: str):
    files = sorted(f for f in os.listdir(samples_dir) if f.endswith(".npz"))
    xyz, sdf, idx = [], [], []
    for i, f in enumerate(files):
        z = np.load(os.path.join(samples_dir, f))
        xyz.append(np.asarray(z["xyz"], np.float32))
        sdf.append(np.asarray(z["sdf"], np.float32))
        idx.append(np.full(len(xyz[-1]), i, np.int32))
    return (
        np.concatenate(xyz), np.concatenate(sdf), np.concatenate(idx),
        len(files),
    )


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--samples_dir")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", default="experiments/deepsdf")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=16384)
    p.add_argument("--code_len", type=int, default=64)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--layers", type=int, default=8)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = deepsdf.DecoderConfig(
        code_len=args.code_len,
        hidden=(args.hidden,) * args.layers,
        latent_in=(args.layers // 2,),
    )
    if args.synthetic:
        n_shapes = 8
        data = deepsdf_train.make_sphere_dataset(
            jax.random.PRNGKey(args.seed), n_shapes, 200000
        )
        xyz = np.asarray(data["xyz"])
        sdf = np.asarray(data["sdf"])
        idx = np.asarray(data["shape_idx"], np.int32)
    else:
        xyz, sdf, idx, n_shapes = load_samples(args.samples_dir)
    print(f"{len(xyz)} samples over {n_shapes} shapes")

    opt = deepsdf_train.make_optimizer(args.lr)
    state = deepsdf_train.init_state(
        cfg, n_shapes, jax.random.PRNGKey(args.seed), opt
    )
    mesh = mesh_utils.make_mesh()
    put_batch = mesh_utils.batch_sharding(mesh)
    rng = np.random.default_rng(args.seed)
    with mesh:
        for step in range(args.steps):
            sel = rng.integers(0, len(xyz), args.batch)
            batch = put_batch({
                "xyz": jnp.asarray(xyz[sel]),
                "sdf": jnp.asarray(sdf[sel]),
                "shape_idx": jnp.asarray(idx[sel]),
            })
            state, loss = deepsdf_train.train_step(state, batch, cfg, opt)
            if step % 200 == 0:
                print(f"step {step}: loss {float(loss):.5f}")
    os.makedirs(args.out, exist_ok=True)
    deepsdf_train.save_checkpoint(
        state, os.path.abspath(os.path.join(args.out, "orbax"))
    )
    deepsdf_train.export_reference_format(state, cfg, args.out)
    np.save(os.path.join(args.out, "latent_codes.npy"), np.asarray(state.codes))
    print(f"exported {args.out}")
    return state


if __name__ == "__main__":
    main()
