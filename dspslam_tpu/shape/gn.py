"""Joint pose + shape Gauss-Newton reconstruction, fully jitted.

The reference's core novelty (/root/reference/reconstruct/optimizer.py:
45-203) re-expressed as a pure JAX program: a `lax.fori_loop` over GN
iterations, each assembling a dense (7 + code_len) normal system from
three residual blocks (SDF surface, depth render, rotation prior) and
applying a Sim(3) left-multiplicative update. Everything is fixed-shape,
so one XLA compilation covers every object, and `jax.vmap` batches all
detections of a keyframe into a single device program (the reference
loops objects sequentially on CUDA).

Normal-equation conventions copied from the reference:
  H = k1 * Jr^T Jr / n_r  +  k2 * Js^T Js / n_s        (plain J, no IRLS in H)
  b = -k1 * Jr^T (w_r r_r) / n_r - k2 * Js^T (w_s r_s) / n_s   (Huber-weighted r)
  code prior: H_code += k3 I, b_code -= k3 * code
  rotation prior (k4) on the pose block, damping 1e0 on pose, s_damp on scale.
Failure semantics: the reference aborts on NaN or <10 valid render
samples (optimizer.py:130-150); here the per-iteration update is frozen
under the same conditions and `is_good` reports whether all executed
iterations were healthy.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.robust import robust_residuals
from . import losses


@dataclasses.dataclass(frozen=True)
class GNConfig:
    """Hyperparameters of the joint optimizer.

    Defaults follow configs/config_kitti.json:21-40 of the reference;
    mono datasets use (k1=10, k3=2.5, k4=0, b2=0.02, iters=5, s_damp=100).
    """

    code_len: int = 64
    num_depth_samples: int = 50
    cut_off: float = 0.01
    k1: float = 1.0        # render-term weight
    k2: float = 100.0      # sdf-term weight
    k3: float = 0.25       # code prior
    k4: float = 1e7        # rotation prior
    b1: float = 0.20       # Huber threshold, render residuals
    b2: float = 0.025      # Huber threshold, sdf residuals
    learning_rate: float = 1.0
    scale_damping: float = 1.0
    pose_damping: float = 1.0
    num_iterations: int = 10
    max_grad_points: int = 1024
    min_render_points: int = 10
    # fraction of the ray x sample grid decoded in the render loss (the
    # rest is outside the unit ball and contributes occupancy 0); None
    # disables the cap. Measured on v5e the top_k selection cost offsets
    # the matmul savings at reference sizes, so this stays off by default
    # and exists for much larger ray budgets.
    render_eval_fraction: float | None = None
    # trust region on the per-iteration log-scale step: the scale/code
    # product is weakly constrained (shrinking the object frame scales
    # all SDF residuals down), so unbounded GN steps can inflate the
    # scale far from the detector's metric prior before the code catches
    # up. The reference leans on scale_damping alone; a hard step bound
    # is more robust at the same converged solution.
    max_scale_step: float = 0.1
    # pose-only object ICP (config_kitti.json:36-38)
    pose_only_iterations: int = 5
    pose_only_inlier_thresh: float = 0.05
    pose_only_damping: float = 1e-2


POSE_DIM = 7


def _masked_normal_eqs(J, robust_res, mask):
    """(H, b, n_live) with the reference's 1/N row normalization."""
    n = jnp.maximum(jnp.sum(mask), 1.0)
    H = (J.T @ J) / n
    b = -(J.T @ robust_res) / n
    return H, b, n


@partial(jax.jit, static_argnums=(0, 1))
def reconstruct_object(
    decoder_fn: Callable,
    config: GNConfig,
    decoder_params: Any,
    t_cam_obj: jnp.ndarray,    # (4, 4) initial Sim(3) object -> camera
    pts_cam: jnp.ndarray,      # (P, 3) surface points (camera frame, padded)
    pts_mask: jnp.ndarray,     # (P,)
    rays: jnp.ndarray,         # (R, 3) ray directions (padded)
    ray_mask: jnp.ndarray,     # (R,)
    depth_obs: jnp.ndarray,    # (R,) foreground depths (0 where background)
    fg_mask: jnp.ndarray,      # (R,) 1.0 foreground
    code_init: jnp.ndarray | None = None,
):
    """Jointly optimize Sim(3) pose + shape code for one object.

    Returns dict(t_cam_obj, code, is_good, loss). vmap over a leading
    batch axis (on the array args) reconstructs a whole keyframe's
    detections in one device program.
    """
    L = config.code_len
    code0 = jnp.zeros((L,)) if code_init is None else code_init[:L]
    t_obj_cam0 = lie.inverse_sim3(t_cam_obj)

    def body(_, state):
        t_obj_cam, code, _, is_good = state

        J_s, r_s, m_s = losses.sdf_surface_loss(
            decoder_fn, decoder_params, pts_cam, pts_mask, t_obj_cam, code
        )
        rr_s, sdf_loss, _ = robust_residuals(r_s, config.b2, m_s)

        J_r, r_r, m_r, aux = losses.render_loss(
            decoder_fn,
            decoder_params,
            rays,
            ray_mask,
            depth_obs,
            fg_mask,
            t_obj_cam,
            code,
            num_samples=config.num_depth_samples,
            cut_off=config.cut_off,
            max_grad_points=config.max_grad_points,
            max_eval_points=(
                None
                if config.render_eval_fraction is None
                else int(
                    rays.shape[0] * config.num_depth_samples
                    * config.render_eval_fraction
                )
            ),
        )
        rr_r, render_loss_val, _ = robust_residuals(r_r, config.b1, m_r)

        J_rot, r_rot = losses.rotation_prior_loss(t_obj_cam)

        H_s, b_s, _ = _masked_normal_eqs(J_s, rr_s, m_s)
        H_r, b_r, _ = _masked_normal_eqs(J_r, rr_r, m_r)

        H = config.k1 * H_r + config.k2 * H_s
        b = config.k1 * b_r + config.k2 * b_s

        # code prior (towards the zero/mean shape)
        H = H.at[POSE_DIM:, POSE_DIM:].add(config.k3 * jnp.eye(L))
        b = b.at[POSE_DIM:].add(-config.k3 * code)

        # rotation prior on the pose block
        H = H.at[:POSE_DIM, :POSE_DIM].add(config.k4 * jnp.outer(J_rot, J_rot))
        b = b.at[:POSE_DIM].add(-config.k4 * J_rot * r_rot)

        # damping: unit on pose, large on scale (optimizer.py:183-184)
        H = H.at[:POSE_DIM, :POSE_DIM].add(config.pose_damping * jnp.eye(POSE_DIM))
        H = H.at[POSE_DIM - 1, POSE_DIM - 1].add(config.scale_damping)

        dx = jnp.linalg.solve(H, b)
        dx = dx.at[POSE_DIM - 1].set(
            jnp.clip(dx[POSE_DIM - 1], -config.max_scale_step,
                     config.max_scale_step)
        )
        delta_t = lie.exp_sim3(config.learning_rate * dx[:POSE_DIM])
        t_obj_cam_new = delta_t @ t_obj_cam
        code_new = code + config.learning_rate * dx[POSE_DIM:]

        loss = config.k1 * render_loss_val + config.k2 * sdf_loss
        # the render-validity gate only applies when the detection has
        # foreground (depth-observed) rays: mono detections carry
        # background rays alone, and early in a mono object's life the
        # PCA-seeded scale can be small enough that no ray sample enters
        # the canonical unit ball — the SDF surface term must then be
        # free to grow the scale (reference mono accepts GN results with
        # no such gate, LocalMapping_util.cc:396-438)
        render_required = jnp.sum(fg_mask) > 0
        healthy = (
            jnp.isfinite(loss)
            & jnp.all(jnp.isfinite(dx))
            & (
                (aux["n_valid_query"] >= config.min_render_points)
                | ~render_required
            )
        )
        t_obj_cam_out = jnp.where(healthy, t_obj_cam_new, t_obj_cam)
        code_out = jnp.where(healthy, code_new, code)
        return t_obj_cam_out, code_out, loss, is_good & healthy

    init = (t_obj_cam0, code0, jnp.float32(0.0), jnp.bool_(True))
    t_obj_cam, code, loss, is_good = jax.lax.fori_loop(
        0, config.num_iterations, body, init
    )
    return {
        "t_cam_obj": lie.inverse_sim3(t_obj_cam),
        "code": code,
        "is_good": is_good,
        "loss": loss,
    }


@partial(jax.jit, static_argnums=(0, 1))
def estimate_pose_cam_obj(
    decoder_fn: Callable,
    config: GNConfig,
    decoder_params: Any,
    t_cam_obj_se3: jnp.ndarray,  # (4, 4) SE(3) object -> camera
    scale: jnp.ndarray,          # () object scale
    pts_cam: jnp.ndarray,        # (P, 3)
    pts_mask: jnp.ndarray,       # (P,)
    code: jnp.ndarray,           # (L,)
):
    """Pose-only SE(3) GN ICP on SDF residuals (optimizer.py:45-86).

    The scale is baked into the rotation block for the duration of the
    solve and factored back out at the end. At iteration 4 the surface-
    point set is re-gated to inliers (|res| <= thresh), mirroring the
    reference's re-selection.

    Returns dict(t_cam_obj (SE(3)), loss).
    """
    t_cam_obj = t_cam_obj_se3.at[:3, :3].multiply(scale)
    t_obj_cam0 = jnp.linalg.inv(t_cam_obj)

    def body(e, state):
        t_obj_cam, mask, _ = state
        J, r, m = losses.sdf_surface_loss(
            decoder_fn, decoder_params, pts_cam, mask, t_obj_cam, code
        )
        _, sdf_loss, _ = robust_residuals(r, config.pose_only_inlier_thresh, m)
        J6 = J[:, :6]
        n = jnp.maximum(jnp.sum(m), 1.0)
        H = (J6.T @ J6) / n + config.pose_only_damping * jnp.eye(6)
        b = -(J6.T @ r) / n               # plain residual, as in the reference
        dx = jnp.linalg.solve(H, b)
        t_obj_cam = lie.exp_se3(dx) @ t_obj_cam
        mask = jnp.where(
            e == 4,
            mask * (jnp.abs(r) <= config.pose_only_inlier_thresh),
            mask,
        )
        return t_obj_cam, mask, sdf_loss

    t_obj_cam, _, loss = jax.lax.fori_loop(
        0, config.pose_only_iterations, body, (t_obj_cam0, pts_mask, jnp.float32(0.0))
    )
    t_cam_obj_out = jnp.linalg.inv(t_obj_cam)
    t_cam_obj_out = t_cam_obj_out.at[:3, :3].divide(scale)
    return {"t_cam_obj": t_cam_obj_out, "loss": loss}


def batched_estimate_pose(decoder_fn, config: GNConfig):
    """vmapped pose-only SE(3) ICP: all of a keyframe's associated
    detections refine in one device program (the reference loops objects
    sequentially through CUDA; on relay-attached TPUs each separate call
    also pays a host round trip).

    Returns fn(decoder_params, t_cam_obj (B,4,4), scale (B,), pts (B,P,3),
    pts_mask (B,P), code (B,L)) -> dict of batched results.
    """
    single = partial(estimate_pose_cam_obj, decoder_fn, config)
    return jax.jit(jax.vmap(single, in_axes=(None, 0, 0, 0, 0, 0)))


def batched_reconstruct(decoder_fn, config: GNConfig):
    """vmapped + jitted multi-object reconstruction: all detections of a
    keyframe run as one device program (decoder matmuls batch on the MXU).

    Returns fn(decoder_params, t_cam_obj (B,4,4), pts (B,P,3), pts_mask
    (B,P), rays (B,R,3), ray_mask (B,R), depth (B,R), fg_mask (B,R),
    code_init (B,L)) -> dict of batched results.
    """
    single = partial(reconstruct_object, decoder_fn, config)
    return jax.jit(jax.vmap(single, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0)))
