"""Shape-reconstruction residual blocks: SDF surface, depth-render, rotation prior.

TPU-first re-derivation of /root/reference/reconstruct/loss.py (22-178).
The reference builds data-dependent index lists on the GPU (torch.where
over valid samples, boolean-mask gathers of "points with gradient"); under
XLA everything here is fixed-shape:

* all inputs are padded to static caps with validity masks;
* the render loss evaluates the occupancy field on the full (R rays x S
  samples) grid — a single batched decoder matmul — and derives the
  per-sample depth-residual gradient de/do in closed form as a suffix
  sum of transmittances (instead of the reference's per-point row
  duplication + masked fill, loss.py:117-122);
* the expensive SDF input-Jacobians are computed only for a static-K
  subset of samples selected by `top_k` on the "has gradient" criterion
  (|sdf| < cutoff and de/do > 1e-2 — the same live set the reference
  gathers dynamically, loss.py:88-90, 124-126). The band is
  geometrically thin (|sdf| < cutoff spans ~1 depth sample per
  surface-crossing ray), so at reference caps (512 rays x 50 samples)
  it holds ~250 samples and the default K=1024 captures ALL of them —
  the selection is lossless and the GN optimum matches the full
  (K = R*S) Jacobian up to f32 summation order. K must exceed the
  in-band count: below it (K <~ 250 here) real gradient rows truncate
  and the trajectory departs (tests/test_render_jacobian_subset.py
  pins both sides).

Each block returns (J, res, mask) with J already in the [pose(7) | code]
column layout used by the Gauss-Newton assembly.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..models.deepsdf import sdf_and_input_grad
from ..ops import lie

Decoder = Callable[[dict, jnp.ndarray], jnp.ndarray]


def sdf_to_occupancy(sdf: jnp.ndarray, th: float = 0.01) -> jnp.ndarray:
    """Linear ramp occupancy: 1 below -th, 0 above +th (loss_utils.py:40-48)."""
    return 0.5 - jnp.clip(sdf, -th, th) / (2.0 * th)


def sdf_surface_loss(
    decoder_fn: Decoder,
    decoder_params,
    pts_cam: jnp.ndarray,      # (P, 3) surface points, camera frame (padded)
    pts_mask: jnp.ndarray,     # (P,) 1.0 live / 0.0 pad
    t_obj_cam: jnp.ndarray,    # (4, 4) Sim(3), camera -> object
    code: jnp.ndarray,         # (L,)
):
    """Surface term: the SDF at observed surface points should be zero.

    Returns (J (P, 7+L), res (P,), mask (P,)). J columns are
    [translation(3), rotation(3), scale(1), code(L)] — reference
    compute_sdf_loss (loss.py:22-43) with the pose/code concat done here.
    """
    pts_obj = lie.transform_points(t_obj_cam, pts_cam)
    L = code.shape[0]
    inputs = jnp.concatenate(
        [jnp.broadcast_to(code, (pts_obj.shape[0], L)), pts_obj], axis=-1
    )
    sdf, dsdf_din = sdf_and_input_grad(decoder_fn, decoder_params, inputs)
    de_dcode = dsdf_din[:, :L]                      # (P, L)
    de_dx = dsdf_din[:, L:]                         # (P, 3)
    dx_dpose = lie.points_to_pose_jacobian_sim3(pts_obj)  # (P, 3, 7)
    j_pose = jnp.einsum("pi,pij->pj", de_dx, dx_dpose)    # (P, 7)
    J = jnp.concatenate([j_pose, de_dcode], axis=-1)
    mask = pts_mask.astype(sdf.dtype)
    return J * mask[:, None], sdf * mask, mask


def render_loss(
    decoder_fn: Decoder,
    decoder_params,
    rays: jnp.ndarray,         # (R, 3) ray directions, camera frame (padded)
    ray_mask: jnp.ndarray,     # (R,) 1.0 live ray
    depth_obs: jnp.ndarray,    # (R,) observed depth for foreground rays
    fg_mask: jnp.ndarray,      # (R,) 1.0 foreground (has depth), 0.0 background
    t_obj_cam: jnp.ndarray,    # (4, 4) Sim(3)
    code: jnp.ndarray,         # (L,)
    num_samples: int = 50,
    cut_off: float = 0.01,
    max_grad_points: int = 1024,
    res_clamp: float = 0.30,
    min_grad_threshold: float = 1e-2,
    max_eval_points: int | None = None,
):
    """Differentiable depth-render term (reference loss.py:46-152).

    Rays are sampled at `num_samples` depths spanning [t_z - s, t_z + s]
    around the object center (s = object scale). The expected ray depth
    under the occupancy transmittance model is compared to the observed
    depth (foreground) or to 1.1*d_max (background).

    Returns (J (K, 7+L), res (K,), mask (K,), aux) where K =
    max_grad_points and aux carries (d_u, n_valid_query) diagnostics.
    """
    R = rays.shape[0]
    S = num_samples
    L = code.shape[0]

    t_cam_obj = lie.inverse_sim3(t_obj_cam)
    scale = jnp.linalg.det(t_cam_obj[:3, :3]) ** (1.0 / 3.0)
    d_min = t_cam_obj[2, 3] - scale
    d_max = t_cam_obj[2, 3] + scale
    depths = jnp.linspace(0.0, 1.0, S) * (d_max - d_min) + d_min   # (S,)
    delta_d = (d_max - d_min) / (S - 1)

    # background rays observe "empty" depth behind the object
    depth_target = jnp.where(fg_mask > 0, depth_obs, 1.1 * d_max)  # (R,)

    pts_cam = rays[:, None, :] * depths[None, :, None]             # (R, S, 3)
    pts_obj = lie.transform_points(t_obj_cam, pts_cam.reshape(-1, 3)).reshape(R, S, 3)

    in_ball = jnp.linalg.norm(pts_obj + 1e-12, axis=-1) < 1.0      # (R, S)
    valid = in_ball & (ray_mask[:, None] > 0)

    # occupancy over the ray x sample grid: one batched forward, no grad.
    # Points outside the unit ball contribute occupancy 0 without being
    # decoded, so when `max_eval_points` is set we decode only a top-k
    # subset selected by validity (identical numerics unless the cap
    # truncates genuinely-valid samples) — typically a 2-3x FLOP cut,
    # since most depth samples miss the canonical shape volume.
    if max_eval_points is not None and max_eval_points < R * S:
        flat_valid = valid.reshape(-1).astype(jnp.float32)
        _, eval_idx = jax.lax.top_k(flat_valid, max_eval_points)
        eval_live = flat_valid[eval_idx]
        pts_k_eval = pts_obj.reshape(-1, 3)[eval_idx]
        inp = jnp.concatenate(
            [jnp.broadcast_to(code, (max_eval_points, L)), pts_k_eval], axis=-1
        )
        sdf_k = jax.lax.stop_gradient(decoder_fn(decoder_params, inp))
        sdf = jnp.full((R * S,), 1e3).at[eval_idx].set(
            jnp.where(eval_live > 0, sdf_k, 1e3)
        ).reshape(R, S)
    else:
        inputs = jnp.concatenate(
            [jnp.broadcast_to(code, (R, S, L)), pts_obj], axis=-1
        ).reshape(R * S, L + 3)
        sdf = jax.lax.stop_gradient(decoder_fn(decoder_params, inputs)).reshape(R, S)
    occ = jnp.where(valid, sdf_to_occupancy(sdf, cut_off), 0.0)    # (R, S)

    # transmittance rendering (reference loss.py:98-115)
    acc_trans = jnp.cumprod(1.0 - occ, axis=-1)                    # (R, S)
    acc_aug = jnp.concatenate([jnp.ones((R, 1)), acc_trans], axis=-1)   # (R, S+1)
    o_aug = jnp.concatenate([occ, jnp.ones((R, 1))], axis=-1)           # (R, S+1)
    d_aug = jnp.concatenate([depths, jnp.array([1.1]) * d_max], axis=0)  # (S+1,)
    term_prob = o_aug * acc_aug
    d_u = jnp.sum(d_aug[None, :] * term_prob, axis=-1)             # (R,)

    # de/do in closed form: suffix sum of transmittance from each sample on
    suffix = jnp.cumsum(acc_trans[:, ::-1], axis=-1)[:, ::-1]      # (R, S)
    de_do = suffix / jnp.maximum(1.0 - occ, 1e-6)                  # (R, S)

    with_grad = valid & (jnp.abs(sdf) < cut_off) & (de_do > min_grad_threshold)

    # clamped depth residual per ray, broadcast per sample
    res_ray = jnp.clip(depth_target - d_u, -res_clamp, res_clamp)  # (R,)

    # select a static-K subset of live samples for the Jacobian pass
    score = with_grad.reshape(-1).astype(jnp.float32)
    _, idx = jax.lax.top_k(score, max_grad_points)                 # (K,)
    k_mask = score[idx]                                            # (K,)
    pts_k = pts_obj.reshape(-1, 3)[idx]                            # (K, 3)
    ray_of_k = idx // S
    de_do_k = de_do.reshape(-1)[idx]
    res_k = res_ray[ray_of_k] * k_mask

    do_ds = -1.0 / (2.0 * cut_off)
    de_ds_k = de_do_k * delta_d * do_ds                            # (K,)

    inp_k = jnp.concatenate(
        [jnp.broadcast_to(code, (max_grad_points, L)), pts_k], axis=-1
    )
    _, dsdf_din = sdf_and_input_grad(decoder_fn, decoder_params, inp_k)
    de_din = de_ds_k[:, None] * dsdf_din                           # (K, L+3)
    de_dx = de_din[:, L:]
    dx_dpose = lie.points_to_pose_jacobian_sim3(pts_k)             # (K, 3, 7)
    j_pose = jnp.einsum("ki,kij->kj", de_dx, dx_dpose)
    J = jnp.concatenate([j_pose, de_din[:, :L]], axis=-1) * k_mask[:, None]

    n_valid_query = jnp.sum(valid)
    aux = {"d_u": d_u, "n_valid_query": n_valid_query, "n_grad": jnp.sum(k_mask)}
    return J, res_k, k_mask, aux


def rotation_prior_loss(t_obj_cam: jnp.ndarray):
    """Keep the object's +y axis anti-aligned with camera-frame gravity.

    E = 1 - <R_co e_y, n_g> with n_g = -e_y; analytic Jacobian on the
    rotation block only (reference loss.py:155-178). Returns
    (J (7,), res scalar).

    Sign note: for a left perturbation exp(w^) on T_obj_cam one gets
    dE/dw = e_y x (R_oc n_g). The reference returns the negated vector
    and compensates with a second negation in its b-assembly
    (optimizer.py:177-179); we return the true gradient so the standard
    b = -J^T r applies uniformly.
    """
    t_cam_obj = lie.inverse_sim3(t_obj_cam)
    _, r_co, _ = lie.split_sim3(t_cam_obj)
    ey = jnp.array([0.0, 1.0, 0.0])
    ng = jnp.array([0.0, -1.0, 0.0])
    ry = r_co @ ey
    res = 1.0 - jnp.dot(ry, ng)
    j_rot = jnp.cross(ey, r_co.T @ ng)
    J = jnp.zeros((7,)).at[3:6].set(j_rot)
    # zero out at the optimum to match the reference's early-out
    live = (res >= 1e-7).astype(J.dtype)
    return J * live, res * live
