"""Fused per-frame tracking device program.

One jitted program runs the ENTIRE per-frame device pipeline — stereo
ORB extraction, row-matched depth, motion-stage projection matching +
pose GN against the last frame's points, then local-map matching + pose
GN — so tracking costs ONE dispatch + ONE result fetch per frame. The
modular path (frontend.* + pose_opt called stage-by-stage) computes the
same thing with ~12 host<->device round trips; on relay-attached TPUs
each round trip costs ~100+ ms, and even on directly-attached hosts the
fused program lets XLA overlap stages.

Matching conflict resolution (several map points matched to one
keypoint) is a scatter-min on descriptor distance, replacing the host
dict loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import matcher, orb, stereo
from . import pose_opt

BIG = jnp.int32(1 << 20)


def _resolve_and_pack(idx, dist, feats, u_right, cand_pos, cand_valid, cap):
    """Device-side conflict resolution + observation packing.

    idx: (N,) candidate->keypoint matches (-1 none). Returns arrays for
    optimize_pose plus the winning candidate mask (N,).
    """
    n_kp = feats["xy"].shape[0]
    matched = idx >= 0
    safe_kp = jnp.maximum(idx, 0)
    # best (min-distance) candidate per keypoint
    best = jnp.full((n_kp,), BIG).at[safe_kp].min(
        jnp.where(matched, dist, BIG)
    )
    win = matched & (dist <= best[safe_kp])
    # dedupe exact ties: keep lowest candidate index per keypoint
    first = jnp.full((n_kp,), BIG).at[safe_kp].min(
        jnp.where(win, jnp.arange(idx.shape[0], dtype=jnp.int32), BIG)
    )
    win = win & (jnp.arange(idx.shape[0], dtype=jnp.int32) == first[safe_kp])

    pts_w = cand_pos
    xy = feats["xy"][safe_kp]
    ur = u_right[safe_kp]
    obs = jnp.concatenate(
        [xy, jnp.where(ur > 0, ur, 0.0)[:, None]], axis=-1
    )
    smask = (ur > 0).astype(jnp.float32) * win
    inv_s2 = 1.0 / feats["sigma2"][safe_kp]
    vmask = win.astype(jnp.float32) * cand_valid
    return pts_w, obs, inv_s2, vmask, smask, win


def _two_stage_track(
    orb_params, radii, img_l, img_r, bf, max_disparity, intrinsics,
    T_pred, last_pos, last_desc, last_level, last_dist, last_valid,
    local_pos, local_desc, local_level, local_dist, local_valid,
):
    """Shared stereo body: extraction + stereo + motion/local stages."""
    feats_l = orb.extract(img_l, orb_params)
    feats_r = orb.extract(img_r, orb_params)
    st = stereo.stereo_match(feats_l, feats_r, img_l, img_r, bf, max_disparity)
    result = _match_stages(
        orb_params, radii, intrinsics, feats_l, st["u_right"], T_pred,
        last_pos, last_desc, last_level, last_dist, last_valid,
        local_pos, local_desc, local_level, local_dist, local_valid,
    )
    return feats_l, st, result


def _match_stages(
    orb_params, radii, intrinsics, feats_l, u_right,
    T_pred, last_pos, last_desc, last_level, last_dist, last_valid,
    local_pos, local_desc, local_level, local_dist, local_valid,
):
    """Motion stage + local stage over extracted features; u_right < 0
    everywhere gives the monocular form (no stereo reprojection term)."""
    fx, fy, cx, cy = [intrinsics[i] for i in range(4)]
    width = 2.0 * cx
    height = 2.0 * cy

    def project(T, pos, valid):
        pc = pos @ T[:3, :3].T + T[:3, 3]
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        ok = (
            (pc[:, 2] > 0.1) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        )
        return jnp.stack([u, v], -1), valid * ok

    log_sf = float(np.log(orb_params.scale_factor))
    n_levels = orb_params.n_levels

    def stage(T_init, pos, desc, level0, dist0, valid, radius):
        proj, v = project(T_init, pos, valid)
        # octave prediction from viewing distance (MapPoint::PredictScale)
        cam_center = -T_init[:3, :3].T @ T_init[:3, 3]
        d_now = jnp.linalg.norm(pos - cam_center, axis=-1)
        shift = jnp.log(
            jnp.maximum(dist0, 1e-3) / jnp.maximum(d_now, 1e-3)
        ) / log_sf
        level = jnp.clip(
            jnp.round(level0 + shift), 0, n_levels - 1
        ).astype(jnp.int32)
        idx, dist = matcher.match_by_projection(
            proj, v, desc, level, feats_l, radius=radius
        )
        pts_w, obs, inv_s2, vmask, smask, win = _resolve_and_pack(
            idx, dist, feats_l, u_right, pos, v, pos.shape[0]
        )
        T, inlier, n_in = pose_opt.optimize_pose(
            T_init, pts_w, obs, inv_s2, vmask, smask, intrinsics
        )
        return T, idx, inlier * vmask, n_in

    T1, idx1, inl1, n1 = stage(
        T_pred, last_pos, last_desc, last_level, last_dist, last_valid,
        radii[0],
    )
    T2, idx2, inl2, n2 = stage(
        T1, local_pos, local_desc, local_level, local_dist, local_valid,
        radii[1],
    )
    return {
        "T_motion": T1, "n_motion": n1,
        "T_cw": T2, "match_idx": idx2, "inlier": inl2, "n_inliers": n2,
    }


@partial(jax.jit, static_argnums=(0, 1))
def track_frame_stereo(
    orb_params: orb.ORBParams,
    radii: tuple,                 # (motion_radius, local_radius) static
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    bf: jnp.ndarray,
    max_disparity: jnp.ndarray,
    intrinsics: jnp.ndarray,      # (5,)
    T_pred: jnp.ndarray,          # (4, 4) motion-model prediction
    last_pos: jnp.ndarray,        # (C, 3) last-frame map points
    last_desc: jnp.ndarray,       # (C, 8)
    last_level: jnp.ndarray,      # (C,) creation octave
    last_dist: jnp.ndarray,       # (C,) creation viewing distance
    last_valid: jnp.ndarray,      # (C,)
    local_pos: jnp.ndarray,       # (C, 3) local-map points
    local_desc: jnp.ndarray,
    local_level: jnp.ndarray,
    local_dist: jnp.ndarray,
    local_valid: jnp.ndarray,
):
    """Returns (feats_l, stereo_out, result dict) — one device program."""
    return _two_stage_track(
        orb_params, radii, img_l, img_r, bf, max_disparity, intrinsics,
        T_pred, last_pos, last_desc, last_level, last_dist, last_valid,
        local_pos, local_desc, local_level, local_dist, local_valid,
    )


def _se3_inverse(T):
    R = T[:3, :3]
    t = T[:3, 3]
    out = jnp.eye(4, dtype=T.dtype)
    out = out.at[:3, :3].set(R.T)
    return out.at[:3, 3].set(-R.T @ t)


@partial(jax.jit, static_argnums=(0, 1, 2))
def track_frame_stereo_chained(
    orb_params: orb.ORBParams,
    radii: tuple,
    vel_alpha: float,             # SE(3) velocity smoothing gain (static)
    img_l: jnp.ndarray,
    img_r: jnp.ndarray,
    bf: jnp.ndarray,
    max_disparity: jnp.ndarray,
    intrinsics: jnp.ndarray,
    T_cw_prev: jnp.ndarray,       # (4, 4) previous frame pose  [device chain]
    vel_prev: jnp.ndarray,        # (4, 4) previous velocity    [device chain]
    last_pos: jnp.ndarray,        # motion-stage candidate set  [device chain]
    last_desc: jnp.ndarray,
    last_level: jnp.ndarray,
    last_dist: jnp.ndarray,
    last_valid: jnp.ndarray,
    local_pos: jnp.ndarray,       # local-map pack (host, updated at KFs)
    local_desc: jnp.ndarray,
    local_level: jnp.ndarray,
    local_dist: jnp.ndarray,
    local_valid: jnp.ndarray,
):
    """Pipelined variant: the motion prediction, velocity update and the
    next frame's motion-stage candidate set are computed ON DEVICE, so
    frame k+1 can be dispatched before frame k's results are fetched.
    The host then runs one frame behind the camera, and the per-frame
    result fetch (~relay RTT + payload) overlaps the next frame's device
    compute — the TPU-native equivalent of the reference's decoupled
    tracking thread (System.cc thread layout).

    Returns (feats_l, stereo_out, result, chain_state) where chain_state
    = (T_cw, velocity, pos, desc, level, dist, valid) feeds the next
    call's [device chain] arguments unchanged.
    """
    from ..ops import lie

    T_pred = vel_prev @ T_cw_prev
    feats_l, st, result = _two_stage_track(
        orb_params, radii, img_l, img_r, bf, max_disparity, intrinsics,
        T_pred, last_pos, last_desc, last_level, last_dist, last_valid,
        local_pos, local_desc, local_level, local_dist, local_valid,
    )
    result, chain = _chain_epilogue(
        vel_alpha, T_cw_prev, vel_prev, result,
        local_pos, local_desc, local_level, local_dist,
    )
    return feats_l, st, result, chain


def _chain_epilogue(vel_alpha, T_cw_prev, vel_prev, result,
                    local_pos, local_desc, local_level, local_dist):
    """Device-side velocity update + next-frame chain state."""
    from ..ops import lie

    T2 = result["T_cw"]
    # smoothed constant-velocity update (Tracker._update_velocity)
    v_obs = T2 @ _se3_inverse(T_cw_prev)
    dv = lie.log_se3(v_obs @ _se3_inverse(vel_prev))
    vel_new = lie.exp_se3(vel_alpha * dv) @ vel_prev
    result = dict(result, velocity=vel_new)
    chain = (
        T2, vel_new, local_pos, local_desc, local_level, local_dist,
        result["inlier"],
    )
    return result, chain


@partial(jax.jit, static_argnums=(0, 1))
def track_frame_mono(
    orb_params: orb.ORBParams,
    radii: tuple,
    img: jnp.ndarray,
    intrinsics: jnp.ndarray,
    T_pred: jnp.ndarray,
    last_pos: jnp.ndarray,
    last_desc: jnp.ndarray,
    last_level: jnp.ndarray,
    last_dist: jnp.ndarray,
    last_valid: jnp.ndarray,
    local_pos: jnp.ndarray,
    local_desc: jnp.ndarray,
    local_level: jnp.ndarray,
    local_dist: jnp.ndarray,
    local_valid: jnp.ndarray,
):
    """Monocular fused per-frame program: extraction + motion stage +
    local stage, one dispatch + one fetch (the mono analogue of
    track_frame_stereo; u_right < 0 drops the stereo residual term in
    pose_opt). Requires a distortion-free camera — with lens
    coefficients the tracker stays on the modular path, which
    undistorts on host (Frame::UndistortKeyPoints)."""
    feats = orb.extract(img, orb_params)
    u_right = -jnp.ones(feats["xy"].shape[0], jnp.float32)
    result = _match_stages(
        orb_params, radii, intrinsics, feats, u_right, T_pred,
        last_pos, last_desc, last_level, last_dist, last_valid,
        local_pos, local_desc, local_level, local_dist, local_valid,
    )
    return feats, result


def _rgbd_stereo_from_depth(feats, depth_img, bf):
    """Per-keypoint depth lookup (nearest pixel, the sensor image) and
    virtual right-view coordinate (Frame::ComputeStereoFromRGBD)."""
    H, W = depth_img.shape
    xy = feats["xy"]
    xs = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
    ys = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
    d = depth_img[ys, xs].astype(jnp.float32)
    live = (feats["valid"] > 0) & (d > 0)
    d = jnp.where(live, d, -1.0)
    u_right = jnp.where(
        live, xy[:, 0] - bf / jnp.maximum(d, 1e-6), -1.0
    )
    return {"depth": d, "u_right": u_right}


@partial(jax.jit, static_argnums=(0, 1))
def track_frame_rgbd(
    orb_params: orb.ORBParams,
    radii: tuple,
    img: jnp.ndarray,
    depth_img: jnp.ndarray,
    bf: jnp.ndarray,
    intrinsics: jnp.ndarray,
    T_pred: jnp.ndarray,
    last_pos: jnp.ndarray,
    last_desc: jnp.ndarray,
    last_level: jnp.ndarray,
    last_dist: jnp.ndarray,
    last_valid: jnp.ndarray,
    local_pos: jnp.ndarray,
    local_desc: jnp.ndarray,
    local_level: jnp.ndarray,
    local_dist: jnp.ndarray,
    local_valid: jnp.ndarray,
):
    """RGB-D fused per-frame program: extraction + depth lookup +
    motion/local stages in one dispatch (distortion-free cameras; the
    virtual u_right feeds the same stereo residual as true stereo)."""
    feats = orb.extract(img, orb_params)
    st = _rgbd_stereo_from_depth(feats, depth_img, bf)
    result = _match_stages(
        orb_params, radii, intrinsics, feats, st["u_right"], T_pred,
        last_pos, last_desc, last_level, last_dist, last_valid,
        local_pos, local_desc, local_level, local_dist, local_valid,
    )
    return feats, st, result


@partial(jax.jit, static_argnums=(0, 1, 2))
def track_frame_rgbd_chained(
    orb_params: orb.ORBParams,
    radii: tuple,
    vel_alpha: float,
    img: jnp.ndarray,
    depth_img: jnp.ndarray,
    bf: jnp.ndarray,
    intrinsics: jnp.ndarray,
    T_cw_prev: jnp.ndarray,
    vel_prev: jnp.ndarray,
    last_pos: jnp.ndarray,
    last_desc: jnp.ndarray,
    last_level: jnp.ndarray,
    last_dist: jnp.ndarray,
    last_valid: jnp.ndarray,
    local_pos: jnp.ndarray,
    local_desc: jnp.ndarray,
    local_level: jnp.ndarray,
    local_dist: jnp.ndarray,
    local_valid: jnp.ndarray,
):
    """Pipelined RGB-D variant (see track_frame_stereo_chained)."""
    T_pred = vel_prev @ T_cw_prev
    feats = orb.extract(img, orb_params)
    st = _rgbd_stereo_from_depth(feats, depth_img, bf)
    result = _match_stages(
        orb_params, radii, intrinsics, feats, st["u_right"], T_pred,
        last_pos, last_desc, last_level, last_dist, last_valid,
        local_pos, local_desc, local_level, local_dist, local_valid,
    )
    result, chain = _chain_epilogue(
        vel_alpha, T_cw_prev, vel_prev, result,
        local_pos, local_desc, local_level, local_dist,
    )
    return feats, st, result, chain


@partial(jax.jit, static_argnums=(0, 1, 2))
def track_frame_mono_chained(
    orb_params: orb.ORBParams,
    radii: tuple,
    vel_alpha: float,
    img: jnp.ndarray,
    intrinsics: jnp.ndarray,
    T_cw_prev: jnp.ndarray,
    vel_prev: jnp.ndarray,
    last_pos: jnp.ndarray,
    last_desc: jnp.ndarray,
    last_level: jnp.ndarray,
    last_dist: jnp.ndarray,
    last_valid: jnp.ndarray,
    local_pos: jnp.ndarray,
    local_desc: jnp.ndarray,
    local_level: jnp.ndarray,
    local_dist: jnp.ndarray,
    local_valid: jnp.ndarray,
):
    """Pipelined monocular variant (see track_frame_stereo_chained)."""
    T_pred = vel_prev @ T_cw_prev
    feats = orb.extract(img, orb_params)
    u_right = -jnp.ones(feats["xy"].shape[0], jnp.float32)
    result = _match_stages(
        orb_params, radii, intrinsics, feats, u_right, T_pred,
        last_pos, last_desc, last_level, last_dist, last_valid,
        local_pos, local_desc, local_level, local_dist, local_valid,
    )
    result, chain = _chain_epilogue(
        vel_alpha, T_cw_prev, vel_prev, result,
        local_pos, local_desc, local_level, local_dist,
    )
    return feats, result, chain
