"""On-chip Pallas-vs-XLA measurement for the two custom kernels.

Decides the "Pallas where measured to win" question with numbers
(SURVEY §7 stance): runs each kernel against its XLA counterpart at the
shapes the framework actually uses and prints a table.

* FAST score map (ops/pallas/fast_kernel.py) vs frontend.orb's XLA
  rolled-copies path, at KITTI stereo (1241x376) and the mono profiles
  (640x480 Redwood, 960x540 Freiburg) across pyramid levels.
* Fused DeepSDF value+input-grad (ops/pallas/decoder_kernel.py) vs
  models.deepsdf.sdf_and_input_grad, at GN surface-term sizes (256-2k
  points) and mesh-extraction sizes (33^3 ~ 36k points).

NOTE (axon): timing syncs via device->host fetches; run only on a
healthy tunnel (see CLAUDE.md bandwidth gotcha).

Usage:  python -m tools.bench_pallas
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    np.asarray(jax.tree.leaves(x)[0].ravel()[0])


def _time(fn, *args, iters=20):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_fast():
    from dspslam_tpu.frontend import orb
    from dspslam_tpu.ops.pallas import fast_kernel

    print("FAST score map (ms):")
    rng = np.random.default_rng(0)
    for name, (h, w) in (
        ("kitti", (376, 1241)), ("redwood", (480, 640)),
        ("freiburg", (540, 960)),
    ):
        img = jnp.asarray(rng.uniform(0, 255, (h, w)).astype(np.float32))
        xla = jax.jit(lambda im: orb.fast_score_map(im, 7.0))
        pal = jax.jit(
            lambda im: fast_kernel.fast_score_map_pallas(im, 7.0, 20.0)
        )
        try:
            t_x = _time(xla, img)
            t_p = _time(pal, img)
            print(f"  {name:9s} {h}x{w}: xla {t_x:7.2f}  pallas {t_p:7.2f}  "
                  f"({'PALLAS' if t_p < t_x else 'xla'} wins "
                  f"{max(t_x, t_p) / min(t_x, t_p):.2f}x)")
        except Exception as e:
            print(f"  {name}: pallas failed: {type(e).__name__}: {e}")


def bench_decoder():
    from dspslam_tpu.models import deepsdf
    from dspslam_tpu.ops.pallas import decoder_kernel

    cfg = deepsdf.DecoderConfig(code_len=64, hidden=(512,) * 8, latent_in=(4,))
    params = deepsdf.init_params(cfg, jax.random.PRNGKey(0))
    decoder_fn = deepsdf.make_decoder_fn(cfg)
    rng = np.random.default_rng(0)
    print("DeepSDF value+input-grad (ms):")
    for n in (256, 2048, 8192, 35937):
        x = jnp.asarray(rng.normal(0, 0.3, (n, 67)).astype(np.float32))
        ref = jax.jit(
            lambda p, xx: deepsdf.sdf_and_input_grad(decoder_fn, p, xx)
        )
        try:
            t_x = _time(ref, params, x, iters=10)
            t_p = _time(
                lambda p, xx: decoder_kernel.fused_sdf_and_input_grad(p, xx),
                params, x, iters=10,
            )
            print(f"  n={n:6d}: xla {t_x:7.2f}  pallas {t_p:7.2f}  "
                  f"({'PALLAS' if t_p < t_x else 'xla'} wins "
                  f"{max(t_x, t_p) / min(t_x, t_p):.2f}x)")
        except Exception as e:
            print(f"  n={n}: pallas failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}")
    bench_fast()
    bench_decoder()
