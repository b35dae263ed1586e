"""Monocular object pipeline: map-point-supported shape reconstruction.

Re-expression of the reference's mono LocalMapping stages
(/root/reference/src/LocalMapping_util.cc:210-438):

* CreateNewObjectsFromDetections: keypoints inside a detection's mask
  vote with their map points; detections matching an existing object's
  points associate to it, otherwise a new (shape-less) MapObject is
  born owning those points;
* ProcessDetectedObjects: after a warmup (~15 keyframes of point
  accumulation) and every 5th keyframe, an object's pose is seeded from
  the PCA cuboid of its member points (objects.cuboid) and the joint
  Sim(3)+code GN runs with the member points as surface evidence and the
  detection's mask rays as render evidence; a 180-degree-flipped
  initialization resolves the front/back ambiguity by keeping the
  lower-loss result (LocalMapping_util.cc:396-407).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..shape import gn, mesh as mesh_mod
from ..slam.map import Map, MapObject
from . import cuboid
from .detections import Detection

MIN_POINTS_RECON = 50
MIN_RAYS_RECON = 20
WARMUP_KFS = 15
RECON_EVERY = 5
MIN_VOTES = 5


class MonoObjectPipeline:
    # association votes with map points inside the detection mask, so the
    # LocalMapper must apply this keyframe's triangulation synchronously
    # before apply_keyframe (disables the deferred keyframe pipeline)
    uses_map_points = True

    def __init__(
        self,
        slam_map: Map,
        decoder_fn,
        decoder_params,
        gn_config: gn.GNConfig,
        max_surface_points: int = 256,
        max_rays: int = 512,
        extract_meshes: bool = True,
        voxels_dim: int = 64,
        warmup_kfs: int = WARMUP_KFS,
        recon_every: int = RECON_EVERY,
    ):
        self.map = slam_map
        self.decoder_fn = decoder_fn
        self.decoder_params = decoder_params
        self.cfg = gn_config
        self.caps = (max_surface_points, max_rays)
        self.extract_meshes = extract_meshes
        self.mesher = mesh_mod.MeshExtractor(
            decoder_fn, decoder_params, gn_config.code_len, voxels_dim
        )
        self.warmup_kfs = warmup_kfs
        self.recon_every = recon_every
        self.kf_count = 0
        self.reconstructed: set[int] = set()

    # ------------------------------------------------------------------
    def process_keyframe(self, kf, local_kf_ids=None):
        self.kf_count += 1
        if not kf.detections:
            return
        self._associate_or_create(kf)
        if (
            self.kf_count >= self.warmup_kfs
            and (self.kf_count % self.recon_every) == 0
        ):
            self._reconstruct_ready(kf)

    # LocalMapper dispatch/apply split (slam/local_mapping.py:73-79).
    # Mono association votes with MAP POINTS inside the detection mask,
    # so the whole stage must run AFTER this keyframe's triangulation —
    # everything happens in apply_keyframe; there is nothing to overlap.
    def dispatch_keyframe(self, kf, local_kf_ids=None):
        return None

    def apply_keyframe(self, kf, pending):
        self.process_keyframe(kf)

    # ------------------------------------------------------------------
    def _points_in_mask(self, kf, det: Detection):
        """Map-point ids whose keypoints fall inside the detection mask."""
        if det.mask is None:
            return []
        h, w = det.mask.shape
        out = []
        for kp_i in np.nonzero(kf.map_point_ids >= 0)[0]:
            x, y = kf.feats["xy"][kp_i].astype(np.int64)
            if 0 <= x < w and 0 <= y < h and det.mask[y, x]:
                out.append(int(kf.map_point_ids[kp_i]))
        return out

    def _associate_or_create(self, kf):
        for det_idx, det in enumerate(kf.detections):
            pt_ids = self._points_in_mask(kf, det)
            if len(pt_ids) < MIN_VOTES:
                continue
            votes: dict[int, int] = {}
            free_pts = []
            for p_id in pt_ids:
                p = self.map.points.get(p_id)
                if p is None or p.bad:
                    continue
                if p.in_any_object:
                    votes[p.object_id] = votes.get(p.object_id, 0) + 1
                else:
                    free_pts.append(p)
            best = max(votes, key=votes.get) if votes else None
            if best is not None and votes[best] >= MIN_VOTES and best in self.map.objects:
                obj = self.map.objects[best]
            else:
                obj = MapObject(np.eye(4, dtype=np.float32),
                                np.zeros(self.cfg.code_len, np.float32), kf.id)
                obj.has_valid_pose = False
                self.map.add_object(obj)
            obj.observations[kf.id] = det_idx
            kf.object_associations[det_idx] = obj.id
            for p in free_pts:
                p.in_any_object = True
                p.object_id = obj.id
                p.keyframe_id_added_to_object = kf.id
                obj.point_ids.add(p.id)

    # ------------------------------------------------------------------
    def _member_points_world(self, obj):
        pts = [
            self.map.points[p].position
            for p in obj.point_ids
            if p in self.map.points and not self.map.points[p].bad
            and not self.map.points[p].outlier_in_object
        ]
        return np.stack(pts) if pts else np.zeros((0, 3), np.float32)

    def _reconstruct_ready(self, kf):
        for det_idx, obj_id in kf.object_associations.items():
            obj = self.map.objects.get(obj_id)
            det = kf.detections[det_idx]
            if obj is None or obj.bad:
                continue
            pts_w = self._member_points_world(obj)
            n_rays = 0 if det.rays is None else len(det.rays)
            if len(pts_w) < MIN_POINTS_RECON or n_rays <= MIN_RAYS_RECON:
                continue
            pca = cuboid.compute_cuboid_pca(pts_w)
            if pca is None:
                continue
            # flag PCA outliers on the member points
            for p_id, keep in zip(sorted(obj.point_ids), pca["inlier_mask"]):
                p = self.map.points.get(p_id)
                if p is not None and not keep:
                    p.outlier_in_object = True

            update_pose = obj_id not in self.reconstructed
            if update_pose:
                # keep member points inside the decoder's valid domain
                # (the 0.40*l car prior underestimates on sparse mono
                # clouds; see cuboid.floor_scale_to_domain)
                T_seed = cuboid.floor_scale_to_domain(
                    pca["T_wo_sim3"], pts_w
                )
                T_wo_candidates = [T_seed, cuboid.flipped_pose(T_seed)]
            else:
                T_wo_candidates = [obj.T_wo]

            best = None
            for T_wo in T_wo_candidates:
                out = self._run_gn(kf, det, pts_w, T_wo, obj.code)
                if out is None:
                    continue
                if best is None or out["loss"] < best["loss"]:
                    best = out
            if best is None or not best["is_good"]:
                continue
            T_wo_new = np.linalg.inv(kf.T_cw) @ best["t_cam_obj"]
            obj.set_pose_sim3(T_wo_new.astype(np.float32))
            obj.last_measured_kf_id = kf.id
            obj.code = best["code"]
            obj.has_valid_pose = True
            self.reconstructed.add(obj_id)
            if self.extract_meshes:
                m = self.mesher.extract_mesh_from_code(obj.code)
                obj.vertices, obj.faces = m["vertices"], m["faces"]

    def _run_gn(self, kf, det, pts_w, T_wo_sim3, code):
        P, R = self.caps
        # member points into the camera frame = surface evidence
        pts_c = pts_w @ kf.T_cw[:3, :3].T + kf.T_cw[:3, 3]
        pts = np.zeros((P, 3), np.float32)
        mask = np.zeros(P, np.float32)
        n = min(len(pts_c), P)
        pts[:n] = pts_c[:n]
        mask[:n] = 1.0
        rays = np.zeros((R, 3), np.float32)
        ray_mask = np.zeros(R, np.float32)
        fg = np.zeros(R, np.float32)
        depth = np.zeros(R, np.float32)
        m = min(len(det.rays), R)
        rays[:m] = det.rays[:m]
        ray_mask[:m] = 1.0
        nf = min(det.num_foreground, m)
        fg[:nf] = 1.0
        if det.depth is not None and len(det.depth):
            depth[:nf] = det.depth[:nf]
        T_co = (kf.T_cw @ T_wo_sim3).astype(np.float32)
        out = gn.reconstruct_object(
            self.decoder_fn, self.cfg, self.decoder_params,
            jnp.asarray(T_co), jnp.asarray(pts), jnp.asarray(mask),
            jnp.asarray(rays), jnp.asarray(ray_mask), jnp.asarray(depth),
            jnp.asarray(fg), jnp.asarray(code),
        )
        res = {k: np.asarray(v) for k, v in out.items()}
        res["is_good"] = bool(out["is_good"])
        res["loss"] = float(out["loss"])
        if not np.isfinite(res["t_cam_obj"]).all():
            return None
        return res
