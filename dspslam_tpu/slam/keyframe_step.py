"""Fused per-keyframe device program: triangulation + duplicate fusion.

The keyframe path of the reference's LocalMapping thread
(/root/reference/src/LocalMapping.cc:55-140) runs as stage-wise calls in
round 1 — one device dispatch + fetch per matcher stage (2x triangulation
matching, 1x fusion matching) plus a host Python loop doing per-point
4x4 SVD triangulation. On relay-attached TPUs every round trip costs
~100 ms, so keyframes stalled ~0.6 s. This module fuses all matching AND
the batched DLT triangulation + cheirality/reprojection gating into ONE
jitted program with one result fetch; the host only mints MapPoint
objects from the pre-validated slots (the same treatment that
slam.frame_step gave per-frame tracking).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..frontend import matcher

FUSE_CAP = 2048
MAX_NEIGHBORS = 2


def _projection_matrix(intrinsics, T_cw):
    fx, fy, cx, cy = [intrinsics[i] for i in range(4)]
    K = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    K = K.at[0, 0].set(fx).at[1, 1].set(fy).at[0, 2].set(cx).at[1, 2].set(cy)
    return K @ T_cw[:3, :]


def _triangulate_batch(P1, P2, x1, x2):
    """Batched two-view DLT (Initializer.cc triangulation): rows
    u*P3-P1, v*P3-P2 per view; X = smallest right singular vector.
    P1/P2 are single (3, 4) projection matrices shared by all N pairs."""
    def rows(P, x):
        return jnp.stack(
            [x[:, 0:1] * P[2][None, :] - P[0][None, :],
             x[:, 1:2] * P[2][None, :] - P[1][None, :]], axis=1
        )                                                   # (N, 2, 4)

    A = jnp.concatenate([rows(P1, x1), rows(P2, x2)], axis=1)   # (N, 4, 4)
    # smallest right singular vector via eigendecomposition of A^T A —
    # symmetric eigh is well-supported and fast on TPU (vs batched SVD)
    AtA = jnp.einsum("nij,nik->njk", A, A)
    _, V = jnp.linalg.eigh(AtA)            # ascending eigenvalues
    X = V[:, :, 0]
    w = X[:, 3]
    ok_w = jnp.abs(w) > 1e-8
    X3 = X[:, :3] / jnp.where(ok_w, w, 1.0)[:, None]
    return X3, ok_w


@partial(jax.jit, static_argnums=())
def keyframe_matching(
    kf_feats: dict,            # new keyframe features (N slots)
    kf_T_cw: jnp.ndarray,      # (4, 4)
    kf_has_pt: jnp.ndarray,    # (N,) 1.0 where the keypoint already has a point
    kf_depth_pos: jnp.ndarray, # (N,) 1.0 where stereo depth already covers it
    nb_feats_list: tuple,      # M per-neighbor feature dicts (device-resident)
    nb_T_cw: jnp.ndarray,      # (2, 4, 4)
    nb_has_pt: jnp.ndarray,    # (2, N)
    nb_ok: jnp.ndarray,        # (2,) neighbor exists + enough baseline
    fuse_pos: jnp.ndarray,     # (C, 3) neighbor map points to fuse
    fuse_valid: jnp.ndarray,   # (C,)
    fuse_desc: jnp.ndarray,    # (C, 8)
    fuse_level: jnp.ndarray,   # (C,)
    intrinsics: jnp.ndarray,   # (5,)
    fuse_radius: float = 3.0,
):
    """Returns per-neighbor triangulation proposals + fusion matches.

    Everything data-dependent is resolved on device: matching, DLT
    triangulation, cheirality and reprojection gates. The host receives
    (idx, X, valid) per neighbor and mints map points for valid slots.

    nb_feats_list is stacked INSIDE the program: on relay-attached
    chips every eager op is its own dispatch, and the former host-side
    zeros_like + per-key jnp.stack cost 0.4-0.7 s of queue round trips
    per keyframe (measured via the stage telemetry). Empty slots carry
    the keyframe's own feats as filler — masked out by nb_ok=0.
    """
    nb_feats = {
        k: jnp.stack([d[k] for d in nb_feats_list])
        for k in nb_feats_list[0]
    }
    fx, fy, cx, cy = [intrinsics[i] for i in range(4)]
    width, height = 2.0 * cx, 2.0 * cy
    P_kf = _projection_matrix(intrinsics, kf_T_cw)

    def reproj_ok(T, X, xy):
        pc = X @ T[:3, :3].T + T[:3, 3]
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        err2 = (u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2
        return (pc[:, 2] > 0.05) & (err2 < 5.991 * 2.0)

    def one_neighbor(nb_f, nb_T, nb_hp, ok_flag):
        idx, _ = matcher.match_features(kf_feats, nb_f, max_dist=50)
        safe = jnp.maximum(idx, 0)
        cand = (
            (idx >= 0)
            & (kf_has_pt < 0.5)
            & (kf_depth_pos < 0.5)
            & (nb_hp[safe] < 0.5)
        )
        P_nb = _projection_matrix(intrinsics, nb_T)
        X, ok_w = _triangulate_batch(
            P_kf, P_nb, kf_feats["xy"], nb_f["xy"][safe]
        )
        good = (
            cand & ok_w
            & reproj_ok(kf_T_cw, X, kf_feats["xy"])
            & reproj_ok(nb_T, X, nb_f["xy"][safe])
            & (ok_flag > 0.5)
        )
        return idx, X, good

    tri_idx, tri_X, tri_ok = jax.vmap(one_neighbor)(
        nb_feats, nb_T_cw, nb_has_pt, nb_ok
    )

    # duplicate fusion: project neighbor points into the new keyframe
    pc = fuse_pos @ kf_T_cw[:3, :3].T + kf_T_cw[:3, 3]
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = fx * pc[:, 0] / z + cx
    v = fy * pc[:, 1] / z + cy
    in_img = (
        (pc[:, 2] > 0.1) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    )
    proj = jnp.stack([u, v], -1)
    fuse_idx, fuse_dist = matcher.match_by_projection(
        proj, fuse_valid * in_img, fuse_desc,
        jnp.zeros_like(fuse_level), kf_feats,
        radius=fuse_radius, max_dist=matcher.TH_LOW, ratio=None,
    )
    return {
        "tri_idx": tri_idx, "tri_X": tri_X, "tri_ok": tri_ok,
        "fuse_idx": fuse_idx, "fuse_dist": fuse_dist,
    }
