"""Headline benchmark: per-object 10-iteration Gauss-Newton reconstruction.

The reference's hottest call (reconstruct/optimizer.py:88-203, "HOTTEST
single call" SURVEY.md §3.3) with the full-scale DeepSDF decoder
(64-code, 8x512, latent-in) at reference caps: 256 surface points, 512
rays, 50 depth samples, 10 GN iterations. We batch a keyframe's worth of
objects (B=8) into one device program and report per-object latency.

Baseline: <=50 ms/object on one TPU v5e (BASELINE.md rebuild target).
Prints one JSON line; vs_baseline > 1 means faster than the target.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from dspslam_tpu.models import deepsdf
    from dspslam_tpu.shape import gn

    cfg = deepsdf.DecoderConfig(
        code_len=64, hidden=(512,) * 8, latent_in=(4,), compute_dtype=jnp.float32
    )
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    decoder_fn = deepsdf.make_decoder_fn(cfg)
    gn_cfg = gn.GNConfig(code_len=64, num_iterations=10, max_grad_points=1024)

    B, P, R = 8, 256, 512
    rng = np.random.default_rng(0)
    t = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    t[:, :3, :3] *= 2.0
    t[:, 2, 3] = 8.0
    dirs = rng.normal(size=(B, P, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    pts = (dirs * 1.0 + np.array([0, 0, 8.0])).astype(np.float32)
    rays = rng.normal(0, 0.05, (B, R, 3)).astype(np.float32) + np.array(
        [0, 0, 1.0], np.float32
    )
    args = (
        params,
        jnp.asarray(t),
        jnp.asarray(pts),
        jnp.ones((B, P), jnp.float32),
        jnp.asarray(rays),
        jnp.ones((B, R), jnp.float32),
        jnp.full((B, R), 8.0, jnp.float32),
        jnp.ones((B, R), jnp.float32),
        jnp.zeros((B, 64), jnp.float32),
    )

    run = gn.batched_reconstruct(decoder_fn, gn_cfg)
    # warmup / compile. NOTE: on the axon TPU backend block_until_ready
    # does not await remote execution; a device->host fetch does, so we
    # sync by materializing the loss.
    out = run(*args)
    np.asarray(out["loss"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    np.asarray(out["loss"])
    elapsed = time.perf_counter() - t0

    ms_per_object = elapsed / iters / B * 1e3
    baseline_ms = 50.0
    print(
        json.dumps(
            {
                "metric": "gn_recon_ms_per_object",
                "value": round(ms_per_object, 3),
                "unit": "ms",
                "vs_baseline": round(baseline_ms / ms_per_object, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
