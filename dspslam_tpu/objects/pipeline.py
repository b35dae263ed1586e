"""Per-keyframe object pipeline: associate -> pose-only GN -> full recon.

Host orchestration of the reference's LocalMapping object stages
(/root/reference/src/LocalMapping.cc:89-107 + LocalMapping_util.cc):

* GetNewObservations: for detections associated to existing objects, run
  the pose-only SE(3) GN ICP against the object's current shape code and
  classify static/dynamic from the measured motion
  (LocalMapping_util.cc:84-154);
* CreateNewMapObjects: for unassociated detections, run the full joint
  Sim(3)+code Gauss-Newton and register a new MapObject with an extracted
  mesh (LocalMapping_util.cc:156-205).

All new-object reconstructions of a keyframe run as ONE batched device
program (shape.gn.batched_reconstruct) — the reference loops objects
sequentially through CUDA.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..shape import gn, mesh as mesh_mod
from ..slam.map import Map, MapObject
from . import association
from .detections import Detection, pad_detections


def _bucket(n: int, cap: int) -> int:
    b = 1
    while b < min(n, cap):
        b *= 2
    return min(b, cap)

MIN_PTS_RECON = 50
# Recent-object culling (MapObjectCulling, LocalMapping_util.cc:29-62):
# a static object must accumulate MORE than CULL_MAX_OBS keyframe
# observations within CULL_WINDOW_KFS keyframes of creation or it is
# culled; past the window it graduates and is never re-checked. The
# aggressive 2-KF window is what removes the "ghost" a mover leaves
# behind when its track disassociates (the spawn-point object stops
# accumulating observations and dies two keyframes later).
CULL_MAX_OBS = 2
CULL_WINDOW_KFS = 2


class ObjectPipeline:
    def __init__(
        self,
        slam_map: Map,
        decoder_fn,
        decoder_params,
        gn_config: gn.GNConfig,
        max_detections: int = 8,
        max_surface_points: int = 256,
        max_rays: int = 512,
        extract_meshes: bool = True,
        voxels_dim: int = 32,
        calibrate_scale_init: bool = True,
        max_shape_refinements: int = 6,
    ):
        self.map = slam_map
        self.decoder_fn = decoder_fn
        self.decoder_params = decoder_params
        self.cfg = gn_config
        self.caps = (max_detections, max_surface_points, max_rays)
        self.batched_recon = gn.batched_reconstruct(decoder_fn, gn_config)
        self.batched_pose = gn.batched_estimate_pose(decoder_fn, gn_config)
        # Continuing shape refinement: the reference re-runs the FULL
        # joint reconstruct_object on every new observation of an
        # existing object, warm-started from the object's current code
        # (LocalMapping_util.cc:391 `pyOptimizer.attr("reconstruct_
        # object")(..., pMO->vShapeCode)`). One-shot 10-iteration fits
        # leave real convergence error on the table (measured: 16 cm
        # chamfer at 10 iters vs 4 cm at 40 from the same seed); each
        # warm-started re-observation adds iterations AND a new
        # viewpoint, which breaks the single-view depth/scale ambiguity.
        # Bounded per object: a converged code stops improving, so
        # refinement stops paying for itself after a handful of views.
        self.max_shape_refinements = max_shape_refinements
        # Decoder-calibrated initial scale for new-object GN: the zero
        # code decodes to the decoder's mean shape, whose canonical
        # half-extent e0 depends entirely on the training family. The
        # reference bakes this prior as fixed factors (pose seeding
        # T = 0.40*l*R, MapObject.cc:324-435; kitti_sequence.py:145-146
        # scale = l) valid only for its ShapeNet-car decoder; measuring
        # e0 once at startup makes the prior follow the decoder, and GN
        # then only refines scale instead of traveling ~30% of it
        # (measured: world radius 0.84 vs 1.0 after 10 iterations from
        # an uncalibrated init).
        self.canonical_half_extent = (
            self._measure_canonical_half_extent()
            if calibrate_scale_init else None
        )
        self.extract_meshes = extract_meshes
        self.mesher = mesh_mod.MeshExtractor(
            decoder_fn, decoder_params, gn_config.code_len, voxels_dim
        )
        # frame id of the previously processed keyframe: the dynamic
        # association predictor and velocity estimates work in
        # meters/FRAME over the actual keyframe gap (Tracking_util.cc:107,
        # LocalMapping_util.cc:119-121)
        self.last_kf_frame_id: int | None = None
        # deferred mesh extractions: (obj, device sdf-grid handle)
        self._pending_meshes: list = []
        # |predicted - measured| center per dynamic update (m): the
        # constant-velocity model's live prediction quality
        self.dyn_pred_errs: list[float] = []

    # ------------------------------------------------------------------
    def warmup_buckets(self, buckets=None):
        """Compile every pow-2 batch bucket of both GN programs up front.
        The batched measure/recon programs are cached per batch size
        (see _bucket); without this, the keyframe whose object count
        first crosses a bucket boundary pays a multi-second mid-run
        compile (measured 6.5 s inside kf_obj_dispatch on the axon
        chip). Mirrors LocalMapper.warmup_ba_buckets."""
        B_cap, P, R = self.caps
        if buckets is None:
            buckets = []
            b = 1
            while b <= B_cap:
                buckets.append(b)
                b *= 2
        L = self.cfg.code_len
        for B in buckets:
            eye = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
            eye[:, 2, 3] = 8.0
            pose_out = self.batched_pose(
                self.decoder_params, jnp.asarray(eye), jnp.ones(B),
                jnp.zeros((B, P, 3)), jnp.zeros((B, P)), jnp.zeros((B, L)),
            )
            recon_out = self.batched_recon(
                self.decoder_params, jnp.asarray(eye),
                jnp.zeros((B, P, 3)), jnp.zeros((B, P)),
                jnp.full((B, R, 3), np.array([0, 0, 1.0], np.float32)),
                jnp.zeros((B, R)), jnp.full((B, R), 8.0), jnp.zeros((B, R)),
                jnp.zeros((B, L)),
            )
            np.asarray(pose_out["t_cam_obj"])
            np.asarray(recon_out["loss"])
        if self.extract_meshes:
            # the mesher's grid decode is its own program (static
            # vol_dim): without this, the FIRST new object's mesh
            # dispatch pays its compile mid-run (cold compilation cache)
            np.asarray(self.mesher.dispatch(np.zeros(L, np.float32)))

    def process_keyframe(self, kf, local_kf_ids: list[int]):
        """Run association + measurement GN + new-object reconstruction."""
        pending = self.dispatch_keyframe(kf, local_kf_ids)
        self.apply_keyframe(kf, pending)

    def collect_meshes(self, limit: int | None = None):
        """Finalize deferred mesh extractions. The local mapper's idle
        polls call this with limit=1 so each marching-tetrahedra run
        (host) lands on an otherwise-clean frame, overlapping the next
        frame's already-dispatched device program; flush() drains the
        rest (see _apply_recon)."""
        n = len(self._pending_meshes) if limit is None \
            else min(limit, len(self._pending_meshes))
        pending, self._pending_meshes = (
            self._pending_meshes[:n], self._pending_meshes[n:]
        )
        for obj, handle in pending:
            if obj.bad:
                continue
            m = self.mesher.collect(handle)
            obj.vertices, obj.faces = m["vertices"], m["faces"]

    def dispatch_keyframe(self, kf, local_kf_ids: list[int]):
        """Associate detections (host) and DISPATCH both GN device
        programs (pose-only for associated, joint recon for new) without
        fetching — callers overlap other device work before
        apply_keyframe fetches the results."""
        frame_gap = (
            float(kf.frame_id - self.last_kf_frame_id)
            if self.last_kf_frame_id is not None else 1.0
        )
        self.last_kf_frame_id = kf.frame_id
        if not kf.detections:
            return None
        local_objects = self._local_objects(local_kf_ids)
        assoc, new_idx, bad_idx = association.associate_detections_centroid(
            kf, local_objects, kf.T_cw, frame_gap=max(frame_gap, 1.0)
        )
        measured = self._dispatch_measure(kf, assoc, frame_gap)
        recon = self._dispatch_recon(
            kf, [i for i in new_idx if i not in bad_idx]
        )
        return measured, recon, frame_gap

    def apply_keyframe(self, kf, pending):
        if pending is not None:
            measured, recon, frame_gap = pending
            self._apply_measure(kf, measured, frame_gap)
            self._apply_recon(kf, recon)
        self._cull_objects(kf)

    def _local_objects(self, kf_ids):
        objs, seen = [], set()
        for kf_id in kf_ids:
            kf = self.map.keyframes.get(kf_id)
            if kf is None:
                continue
            for obj_id in kf.object_associations.values():
                if obj_id in seen:
                    continue
                seen.add(obj_id)
                obj = self.map.objects.get(obj_id)
                if obj is not None and not obj.bad:
                    objs.append(obj)
        return objs

    # ------------------------------------------------------------------
    def _measure_canonical_half_extent(self):
        """Median surface radius of the zero-code (mean) shape on a
        coarse SDF grid — one startup decode, used to seed new-object
        scale. The matched statistic on the measurement side is the
        median distance of the detection's surface points from its
        center (below), so the ratio is a direct scale estimate."""
        dim = 33
        sdf = np.asarray(mesh_mod.decode_sdf_grid(
            self.decoder_fn, self.decoder_params,
            jnp.zeros(self.cfg.code_len), dim,
        ))
        spacing = 2.0 / (dim - 1)
        idx = np.argwhere(np.abs(sdf) < spacing)      # near-surface band
        if len(idx) == 0:
            return None                 # surface-free mean shape: skip
        pts = idx * spacing - 1.0
        return float(np.median(np.linalg.norm(pts, axis=-1)))

    def _calibrated_t_init(self, t_init, dets):
        """Rescale each detection's initial Sim(3) so the zero-code
        surface starts at the measured surface radius. Uses the
        detection's surface POINTS (the same data GN fits) rather than
        its 3-D box: box sizes carry dataset/convention inflation
        (kitti_sequence.py:145-146 bakes scale=l; cuboid PCA boxes of
        partial LiDAR caps over-reach), while the median point distance
        from the detection center estimates the object's surface radius
        directly."""
        r0 = self.canonical_half_extent
        if r0 is None or r0 < 1e-3:
            return t_init
        for slot, det in enumerate(dets):
            pts = getattr(det, "surface_points", None)
            n = getattr(det, "num_surface_points", 0)
            if pts is None or n < MIN_PTS_RECON:
                continue
            center = t_init[slot, :3, 3]
            r_obs = float(np.median(
                np.linalg.norm(np.asarray(pts[:n]) - center, axis=-1)
            ))
            s_det = float(np.linalg.det(t_init[slot, :3, :3])) ** (1 / 3)
            s_star = r_obs / r0
            if s_det > 1e-6 and s_star > 1e-6:
                t_init[slot, :3, :3] *= s_star / s_det
        return t_init

    def _dispatch_measure(self, kf, assoc, frame_gap: float = 1.0):
        """Pose-only GN for ALL associated detections in one batched
        device program -> SE3 T_co measurements (dispatch only).

        Dynamic objects warm-start from the constant-velocity PREDICTED
        pose, not the stale last-keyframe pose (the reference seeds its
        per-observation optimization from the predicted flow too,
        Tracking_util.cc:108-110): at bench speeds a 5-frame gap leaves
        the static init ~2.5 m behind the object and 10 GN iterations
        under-converge (measured dynamic_obj_err 119 cm from the stale
        init vs GN fit noise from the predicted one). The
        classification triage still compares against the UN-predicted
        pose (classify_measurement), so the static/dynamic verdict is
        unchanged."""
        entries = [
            (det_idx, obj)
            for det_idx, obj in assoc.items()
            if kf.detections[det_idx].num_surface_points
            >= association.MIN_PTS_ASSOCIATED
        ]
        if not entries:
            return None
        P = self.caps[1]
        entries = entries[: self.caps[0]]
        # pad to the smallest power-of-2 bucket, not the full cap: the
        # batched program's cost is linear in B and typical keyframes
        # carry 1-2 detections (the jit caches one program per bucket)
        B = _bucket(len(entries), self.caps[0])
        t_init = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
        scales = np.ones(B, np.float32)
        pts = np.zeros((B, P, 3), np.float32)
        mask = np.zeros((B, P), np.float32)
        codes = np.zeros((B, self.cfg.code_len), np.float32)
        for i, (det_idx, obj) in enumerate(entries):
            det: Detection = kf.detections[det_idx]
            n = min(det.num_surface_points, P)
            pts[i, :n] = det.surface_points[:n]
            mask[i, :n] = 1.0
            T_wo = obj.T_wo_se3
            if obj.dynamic:
                T_wo = T_wo.copy()
                T_wo[:3, 3] = T_wo[:3, 3] + obj.velocity * frame_gap
            t_init[i] = (kf.T_cw @ T_wo).astype(np.float32)
            scales[i] = obj.scale
            codes[i] = obj.code[: self.cfg.code_len]
        out = self.batched_pose(
            self.decoder_params, jnp.asarray(t_init), jnp.asarray(scales),
            jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(codes),
        )
        refine = self._dispatch_refine(kf, entries)
        return entries, out, refine

    def _dispatch_refine(self, kf, entries):
        """Warm-started joint recon for re-observed STATIC objects (the
        reference's per-observation re-reconstruction,
        LocalMapping_util.cc:391): code_init = the object's current
        code, pose init = its predicted Sim(3). Dispatch only — applied
        in _apply_measure for detections whose triage says STATIC (a
        dynamic verdict discards the refine slot: its pose moved, so
        the static-predicted init optimized the wrong problem)."""
        cand = [
            (det_idx, obj) for det_idx, obj in entries
            if not obj.dynamic
            and obj.n_shape_refinements < self.max_shape_refinements
            and kf.detections[det_idx].rays is not None
            and kf.detections[det_idx].num_surface_points >= MIN_PTS_RECON
        ]
        if not cand:
            return None
        B_cap, P, R = self.caps
        cand = cand[:B_cap]
        B = _bucket(len(cand), B_cap)
        dets = [kf.detections[i] for i, _ in cand]
        batch = pad_detections(dets, B, P, R)
        t_init = np.asarray(batch["t_cam_obj"])
        codes = np.zeros((B, self.cfg.code_len), np.float32)
        for slot, (_, obj) in enumerate(cand):
            t_init[slot] = (kf.T_cw @ obj.T_wo).astype(np.float32)
            codes[slot] = obj.code[: self.cfg.code_len]
        out = self.batched_recon(
            self.decoder_params,
            jnp.asarray(t_init),
            jnp.asarray(batch["pts"]),
            jnp.asarray(batch["pts_mask"]),
            jnp.asarray(batch["rays"]),
            jnp.asarray(batch["ray_mask"]),
            jnp.asarray(batch["depth"]),
            jnp.asarray(batch["fg_mask"]),
            jnp.asarray(codes),
        )
        return cand, out

    def _apply_measure(self, kf, pending, frame_gap: float = 1.0):
        """Apply the batched pose-only GN results with the reference's
        static/dynamic/false-association triage (GetNewObservations,
        LocalMapping_util.cc:100-151)."""
        if pending is None:
            return
        entries, out, refine = pending
        t_all = np.asarray(out["t_cam_obj"])
        T_wc = np.linalg.inv(kf.T_cw)
        static_dets: set[int] = set()
        for i, (det_idx, obj) in enumerate(entries):
            T_co = t_all[i]
            if not np.all(np.isfinite(T_co)):
                continue
            verdict = association.classify_measurement(obj, T_co, kf.T_cw)
            if verdict == association.STATIC_MEASUREMENT:
                static_dets.add(det_idx)
                kf.detections[det_idx].T_co_se3_measured = T_co
                # refine the map object's SE3 pose from this measurement
                obj.set_pose_se3((T_wc @ T_co).astype(np.float32))
                obj.last_measured_kf_id = kf.id
            elif verdict == association.DYNAMIC_UPDATE:
                if obj.dynamic:
                    # constant-velocity prediction quality: |predicted -
                    # measured| center at this keyframe (the warm-start
                    # the GN and the associator both consume) — only for
                    # already-dynamic objects (at the static->dynamic
                    # transition the velocity is not yet estimated)
                    pred = obj.T_wo_se3[:3, 3] + obj.velocity * frame_gap
                    meas = (T_wc @ T_co)[:3, 3]
                    self.dyn_pred_errs.append(
                        float(np.linalg.norm(pred - meas))
                    )
                else:
                    obj.dynamic = True
                    self.map.n_dynamic_objects += 1
                association.update_dynamic_object(
                    obj, T_co, kf.T_cw, frame_gap
                )
                obj.last_measured_kf_id = kf.id
            else:  # DISASSOCIATE: a mature static object jumped — the
                # centroid gate matched the wrong object
                # (LocalMapping_util.cc:144-149)
                kf.object_associations.pop(det_idx, None)
                obj.observations.pop(kf.id, None)
                continue
            obj.n_observed += 1
        self._apply_refine(kf, refine, static_dets)

    def _apply_refine(self, kf, refine, static_dets: set):
        """Write back warm-started re-reconstructions for detections the
        triage kept as STATIC (UpdateReconstruction,
        LocalMapping_util.cc:425-430): pose + code move to the joint
        optimum and the mesh re-extracts (deferred, like new objects)."""
        if refine is None:
            return
        cand, out = refine
        t_all = np.asarray(out["t_cam_obj"])
        codes = np.asarray(out["code"])
        good = np.asarray(out["is_good"])
        T_wc = np.linalg.inv(kf.T_cw)
        for slot, (det_idx, obj) in enumerate(cand):
            if (
                det_idx not in static_dets
                or obj.bad
                or obj.dynamic
                or not good[slot]
                or not np.all(np.isfinite(t_all[slot]))
            ):
                continue
            obj.set_pose_sim3((T_wc @ t_all[slot]).astype(np.float32))
            obj.code = codes[slot].astype(np.float32)
            obj.n_shape_refinements += 1
            kf.detections[det_idx].T_co_se3_measured = self._se3_of(
                t_all[slot]
            )
            if self.extract_meshes:
                self._pending_meshes.append(
                    (obj, self.mesher.dispatch(obj.code))
                )

    # ------------------------------------------------------------------
    def _dispatch_recon(self, kf, new_indices):
        """Batched joint GN on all new detections (dispatch only)."""
        dets = []
        det_map = []
        for i in new_indices:
            det: Detection = kf.detections[i]
            if (
                det.is_front
                and det.rays is not None
                and det.num_surface_points >= MIN_PTS_RECON
            ):
                dets.append(det)
                det_map.append(i)
        if not dets:
            return None
        B, P, R = self.caps
        B = _bucket(len(dets), B)          # see _dispatch_measure
        batch = pad_detections(dets, B, P, R)
        batch["t_cam_obj"] = self._calibrated_t_init(
            np.asarray(batch["t_cam_obj"]), dets
        )
        out = self.batched_recon(
            self.decoder_params,
            jnp.asarray(batch["t_cam_obj"]),
            jnp.asarray(batch["pts"]),
            jnp.asarray(batch["pts_mask"]),
            jnp.asarray(batch["rays"]),
            jnp.asarray(batch["ray_mask"]),
            jnp.asarray(batch["depth"]),
            jnp.asarray(batch["fg_mask"]),
            jnp.zeros((B, self.cfg.code_len)),
        )
        return det_map, out

    def _apply_recon(self, kf, pending):
        if pending is None:
            return
        det_map, out = pending
        B = int(np.asarray(out["t_cam_obj"]).shape[0])
        t_cam_obj = np.asarray(out["t_cam_obj"])
        codes = np.asarray(out["code"])
        good = np.asarray(out["is_good"])
        T_wc = np.linalg.inv(kf.T_cw)
        for slot, det_idx in enumerate(det_map[:B]):
            if not good[slot] or not np.all(np.isfinite(t_cam_obj[slot])):
                continue
            T_wo = (T_wc @ t_cam_obj[slot]).astype(np.float32)
            obj = MapObject(T_wo, codes[slot], kf.id)
            obj.observations[kf.id] = det_idx
            obj.last_measured_kf_id = kf.id
            kf.object_associations[det_idx] = obj.id
            kf.detections[det_idx].T_co_se3_measured = self._se3_of(
                t_cam_obj[slot]
            )
            self.map.add_object(obj)
            self._tag_member_points(kf, det_idx, obj)
            if self.extract_meshes:
                # dispatch the voxel decode now; marching tetrahedra +
                # the grid fetch happen at the NEXT keyframe (or flush)
                # — nothing in the SLAM loop consumes the vertices, so
                # the mesh cost moves off the keyframe's critical path
                self._pending_meshes.append(
                    (obj, self.mesher.dispatch(obj.code))
                )

    @staticmethod
    def _se3_of(T_sim3):
        s = np.linalg.det(T_sim3[:3, :3]) ** (1.0 / 3.0)
        T = T_sim3.copy()
        T[:3, :3] /= s
        return T.astype(np.float32)

    def _tag_member_points(self, kf, det_idx, obj):
        """Mark map points inside the detection mask as object members
        (mono association support, MapPoint.h:85-88)."""
        det = kf.detections[det_idx]
        if det.mask is None:
            return
        h, w = det.mask.shape
        for kp_i in np.nonzero(kf.map_point_ids >= 0)[0]:
            x, y = kf.feats["xy"][kp_i].astype(np.int64)
            if 0 <= x < w and 0 <= y < h and det.mask[y, x]:
                p = self.map.points.get(int(kf.map_point_ids[kp_i]))
                if p is not None and not p.in_any_object:
                    p.in_any_object = True
                    p.object_id = obj.id
                    p.keyframe_id_added_to_object = kf.id
                    obj.point_ids.add(p.id)

    # ------------------------------------------------------------------
    def _cull_objects(self, kf):
        """Drop stale low-evidence objects (MapObjectCulling rules,
        LocalMapping_util.cc:29-82). Dynamic objects must be re-observed
        continuously: unseen for >= 2 keyframes -> culled and the map's
        dynamic counter decremented (LocalMapping_util.cc:41-48, 66-80).
        Recent STATIC objects must earn > CULL_MAX_OBS observations
        within CULL_WINDOW_KFS keyframes of creation
        (LocalMapping_util.cc:54-60 cnThObs); older ones graduated."""
        for obj in list(self.map.objects.values()):
            if obj.bad:
                continue
            if obj.dynamic:
                newest = max(obj.observations) if obj.observations \
                    else obj.ref_kf_id
                if kf.id - newest >= 2:
                    self.map.erase_object(obj.id)
                    self.map.n_dynamic_objects -= 1
                continue
            age = kf.id - obj.ref_kf_id
            if age >= CULL_WINDOW_KFS and age < CULL_WINDOW_KFS + 2 \
                    and len(obj.observations) <= CULL_MAX_OBS:
                self.map.erase_object(obj.id)
