"""Isolate the static-object center bias: joint GN on a one-sided GT
sphere observation, (a) exact sphere SDF decoder, (b) the bench's
trained decoder if its cache exists. Measures center/scale error."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from dspslam_tpu.models import deepsdf
from dspslam_tpu.shape import gn

rng = np.random.default_rng(1)
RADIUS = 1.0
c = np.array([0.5, 0.0, 8.0], np.float32)       # camera-frame center

# bench-identical detection (benchmark_slam.make_detections)
d = rng.normal(size=(400, 3))
d /= np.linalg.norm(d, axis=-1, keepdims=True)
toc = -c / np.linalg.norm(c)
d = d[(d @ toc) > 0.1][:250]
pts = (c + RADIUS * d).astype(np.float32)
uv = pts[:, :2] / pts[:, 2:3]
rays = np.concatenate([uv, np.ones((len(uv), 1))], -1).astype(np.float32)
bg_dir = (c / np.linalg.norm(c))[None, :] + rng.normal(0, 0.3, (80, 3))
bg_dir[:, 2] = np.abs(bg_dir[:, 2]) + 0.5
bg = (bg_dir / bg_dir[:, 2:3]).astype(np.float32)[:60]
all_rays = np.concatenate([rays, bg])
depth = np.concatenate([pts[:, 2].copy(), np.zeros(len(bg), np.float32)])
fg = np.concatenate([np.ones(len(rays)), np.zeros(len(bg))]).astype(np.float32)

P, R = 256, 512
pts_p = np.zeros((P, 3), np.float32); pts_p[: len(pts)] = pts
pm = np.zeros(P, np.float32); pm[: len(pts)] = 1
rays_p = np.tile(np.array([0, 0, 1.0], np.float32), (R, 1))
rays_p[: len(all_rays)] = all_rays
rm = np.zeros(R, np.float32); rm[: len(all_rays)] = 1
dep_p = np.full(R, 8.0, np.float32); dep_p[: len(all_rays)] = depth
fg_p = np.zeros(R, np.float32); fg_p[: len(all_rays)] = fg

def run(decoder_fn, params, code_len, label, n_iter=10):
    cfg = gn.GNConfig(code_len=code_len, num_iterations=n_iter,
                      max_grad_points=1024)
    t0 = np.eye(4, dtype=np.float32)
    t0[:3, :3] *= 2.0                            # bench init: scale 2
    t0[:3, 3] = c + np.array([0.05, -0.03, 0.08], np.float32)
    out = gn.reconstruct_object(
        decoder_fn, cfg, params, jnp.asarray(t0), jnp.asarray(pts_p),
        jnp.asarray(pm), jnp.asarray(rays_p), jnp.asarray(rm),
        jnp.asarray(dep_p), jnp.asarray(fg_p),
        jnp.zeros(code_len, jnp.float32),
    )
    T = np.asarray(out["t_cam_obj"])
    s = float(np.linalg.det(T[:3, :3])) ** (1 / 3)
    err = np.linalg.norm(T[:3, 3] - c)
    print(f"{label} iters={n_iter}: center_err={err*100:.2f} cm  "
          f"scale={s:.4f} (want {RADIUS:.2f})  loss={float(out['loss']):.5f} "
          f"good={bool(out['is_good'])}")
    return err

run(deepsdf.sphere_decoder_fn, deepsdf.make_sphere_params(code_len=64), 64,
    "exact-sphere-decoder")
run(deepsdf.sphere_decoder_fn, deepsdf.make_sphere_params(code_len=64), 64,
    "exact-sphere-decoder", n_iter=40)

import glob, pickle, os
for f in sorted(glob.glob("/tmp/*decoder*") + glob.glob("/tmp/*bench_fit*")):
    print("cache file:", f)

# trained bench decoder (cache from the last bench run), with the
# pipeline's decoder-calibrated scale seeding (ObjectPipeline
# _measure_canonical_half_extent + _calibrated_t_init)
from dspslam_tpu.apps.benchmark_slam import train_bench_decoder, CODE_LEN
from dspslam_tpu.shape import mesh as mesh_mod
dec_fn, dec_params = train_bench_decoder(150, quiet=True)
dec_params = jax.tree.map(jnp.asarray, dec_params)

dim = 33
sdf = np.asarray(mesh_mod.decode_sdf_grid(
    dec_fn, dec_params, jnp.zeros(CODE_LEN), dim))
spacing = 2.0 / (dim - 1)
idx = np.argwhere(np.abs(sdf) < spacing)
r0 = float(np.median(np.linalg.norm(idx * spacing - 1.0, axis=-1)))
r_obs = float(np.median(np.linalg.norm(pts - c, axis=-1)))
s_star = r_obs / r0
print(f"canonical r0={r0:.3f} r_obs={r_obs:.3f} calibrated scale={s_star:.3f}")

def run_scaled(decoder_fn, params, code_len, label, s_init, n_iter=10):
    cfg = gn.GNConfig(code_len=code_len, num_iterations=n_iter,
                      k4=0.0, max_grad_points=1024)
    t0 = np.eye(4, dtype=np.float32)
    t0[:3, :3] *= s_init
    t0[:3, 3] = c + np.array([0.05, -0.03, 0.08], np.float32)
    out = gn.reconstruct_object(
        decoder_fn, cfg, params, jnp.asarray(t0), jnp.asarray(pts_p),
        jnp.asarray(pm), jnp.asarray(rays_p), jnp.asarray(rm),
        jnp.asarray(dep_p), jnp.asarray(fg_p),
        jnp.zeros(code_len, jnp.float32),
    )
    T = np.asarray(out["t_cam_obj"])
    s = float(np.linalg.det(T[:3, :3])) ** (1 / 3)
    err = np.linalg.norm(T[:3, 3] - c)
    print(f"{label} iters={n_iter}: center_err={err*100:.2f} cm  "
          f"scale={s:.4f}  loss={float(out['loss']):.5f} "
          f"good={bool(out['is_good'])}")
    return err

for it in (10, 20, 40):
    run_scaled(dec_fn, dec_params, CODE_LEN, "trained(150)+calib", s_star,
               n_iter=it)
