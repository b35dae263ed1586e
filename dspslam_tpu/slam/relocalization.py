"""Relocalization after tracking loss.

The reference relocalizes via BoW candidates + EPnP RANSAC + pose
optimization (Tracking::Relocalization, Tracking.cc:1374-1504,
PnPsolver.cc). Here the camera-pose recovery reuses the robust GN pose
optimizer: BoW candidates come from the keyframe database, 2D-3D
correspondences from descriptor matching against each candidate's map
points, and the pose is solved by the 4x10 Huber GN initialized at the
candidate keyframe's pose (candidates are near-viewpoint by
construction, so the basin of attraction suffices; a minimal-solver
RANSAC can be layered later for wide-baseline cases).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..frontend import matcher
from . import pose_opt

MIN_INLIERS = 20
POINT_CAP = 2048


class Relocalizer:
    def __init__(self, slam_map, voc, db, intrinsics):
        self.map = slam_map
        self.voc = voc
        self.db = db
        self.intrinsics = jnp.asarray(intrinsics)

    def try_relocalize(self, frame) -> bool:
        """Attempt pose recovery; sets frame.T_cw and map_point_ids on
        success. Returns True if relocalized."""
        bow = self.voc.bow_vector(frame.feats["desc"], frame.feats["valid"])
        candidates = self.db.query(bow, 0.05, exclude=set())[:5]
        for cand_id, _score in candidates:
            kf = self.map.keyframes.get(cand_id)
            if kf is None or kf.bad:
                continue
            if self._solve_against(frame, kf):
                return True
        return False

    def _solve_against(self, frame, kf) -> bool:
        idx, dist = matcher.match_features(
            {k: jnp.asarray(v) for k, v in frame.feats.items()},
            {k: jnp.asarray(v) for k, v in kf.feats.items()},
            max_dist=matcher.TH_LOW,
        )
        idx = np.asarray(idx)
        pairs = []     # (frame_kp, map_point)
        for i in np.nonzero(idx >= 0)[0]:
            p_id = kf.map_point_ids[idx[i]]
            if p_id < 0:
                continue
            p = self.map.points.get(int(p_id))
            if p is not None and not p.bad:
                pairs.append((i, p))
        if len(pairs) < MIN_INLIERS:
            return False
        # wide-baseline initial pose from RANSAC PnP (PnPsolver parity);
        # falls back to the candidate keyframe's pose when degenerate
        from . import pnp

        K_mat = np.asarray(
            [
                [float(self.intrinsics[0]), 0, float(self.intrinsics[2])],
                [0, float(self.intrinsics[1]), float(self.intrinsics[3])],
                [0, 0, 1.0],
            ]
        )
        pts3 = np.stack([p.position for _, p in pairs])
        uv = np.stack([frame.feats["xy"][kp_i] for kp_i, _ in pairs])
        T_init, _ = pnp.ransac_pnp(pts3, uv, K_mat)
        T_start = T_init if T_init is not None else kf.T_cw
        n = min(len(pairs), POINT_CAP)
        pts_w = np.zeros((POINT_CAP, 3), np.float32)
        obs = np.zeros((POINT_CAP, 3), np.float32)
        inv_s2 = np.ones(POINT_CAP, np.float32)
        vmask = np.zeros(POINT_CAP, np.float32)
        smask = np.zeros(POINT_CAP, np.float32)
        for j, (kp_i, p) in enumerate(pairs[:n]):
            pts_w[j] = p.position
            obs[j, :2] = frame.feats["xy"][kp_i]
            ur = frame.u_right[kp_i] if frame.u_right is not None else -1.0
            if ur > 0:
                obs[j, 2] = ur
                smask[j] = 1.0
            inv_s2[j] = 1.0 / frame.feats["sigma2"][kp_i]
            vmask[j] = 1.0
        T, inlier, n_in = pose_opt.optimize_pose(
            jnp.asarray(np.asarray(T_start, np.float32)), jnp.asarray(pts_w),
            jnp.asarray(obs),
            jnp.asarray(inv_s2), jnp.asarray(vmask), jnp.asarray(smask),
            self.intrinsics,
        )
        if int(n_in) < MIN_INLIERS:
            return False
        T = np.asarray(T)
        if not np.isfinite(T).all():
            return False
        frame.T_cw = T
        inlier = np.asarray(inlier)
        frame.map_point_ids[:] = -1
        for j, (kp_i, p) in enumerate(pairs[:n]):
            if inlier[j] > 0:
                frame.map_point_ids[kp_i] = p.id
        return True
