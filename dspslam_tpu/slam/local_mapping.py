"""Local mapping stage: point culling + windowed (joint) bundle adjustment.

Cooperative-stage re-design of the reference's LocalMapping thread
(/root/reference/src/LocalMapping.cc:55-140): each new keyframe is
processed synchronously by the host loop — covisibility bookkeeping,
map-point culling, the object pipeline (associate/measure/reconstruct),
then a local *joint* bundle adjustment over the covisibility window with
camera-object edges (Optimizer_util.cc:309-771) as one jitted device
program.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import time

import jax.numpy as jnp
import numpy as np

from ..backend import ba
from .map import KeyFrame, Map

BA_KF_CAP = 16          # free window keyframes + fixed observers
BA_WINDOW = 8           # optimized keyframes
# Point-count compile buckets: the solve shape grows with the window's
# density so dense maps optimize EVERY point (the reference's local BA is
# unbounded, Optimizer_util.cc:309-430) while sparse windows keep small,
# cheap programs. Each bucket is one XLA compile (pre-warmed by
# warmup_ba_buckets); observations scale 4x points (the empirical
# obs/point ratio of a BA_KF_CAP window).
BA_PT_BUCKETS = (1024, 2048, 4096, 8192)
BA_PT_CAP = BA_PT_BUCKETS[-1]     # hard cap: truncation warning beyond
BA_OBS_PER_PT = 4
BA_OBJ_CAP = 8
BA_EDGE_CAP = 32


def ba_point_bucket(n: int) -> int:
    """Smallest compile bucket holding n points (the pow2-bucket pattern
    of objects/pipeline.py); the last bucket is the truncation cap."""
    for b in BA_PT_BUCKETS:
        if n <= b:
            return b
    return BA_PT_BUCKETS[-1]


def _results_ready(tree) -> bool:
    """True when every device array in a pending-result pytree has
    finished computing (jax.Array.is_ready — 0.1 ms over the axon relay,
    measured). Poll-time applies use this to never block a frame on
    in-flight compute; non-array leaves (host numpy, metadata) pass."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_ready():
            return False
    return True


@dataclasses.dataclass
class LocalMapperConfig:
    fx: float = 707.0912
    fy: float = 707.0912
    cx: float = 601.8873
    cy: float = 183.1104
    bf: float = 379.8145
    cull_found_ratio: float = 0.25
    # reference MapPointCulling: a point must reach 3 keyframe
    # observations within 2 keyframes of birth or it is dropped
    # (LocalMapping.cc, mnMinObs = 3 for stereo) — the rolling-window
    # filter that keeps only multi-view-confirmed points
    cull_min_obs: int = 3
    window: int = BA_KF_CAP
    # Asynchronous local BA: the solve for keyframe k is DISPATCHED at k
    # and its results are fetched/applied when keyframe k+1 arrives, so
    # the (fetch + host writeback) cost overlaps ordinary tracking — the
    # TPU-native form of the reference's mapping thread finishing BA
    # while the tracking thread keeps running (LocalMapping.cc:55-140,
    # mbAbortBA semantics). Loop closures drop the pending solve, the
    # reference's abort. flush() applies it at sequence end.
    async_ba: bool = True
    # Spread the whole keyframe pipeline over subsequent frames: the
    # keyframe frame only DISPATCHES triangulation+fusion; poll() (one
    # call per tracked frame, System.track_*) applies it a frame later
    # (its compute has overlapped tracking by then) and dispatches BA,
    # which applies another frame later. Turns the ~0.4 s keyframe
    # latency spike into three ~0.15 s steps — the cooperative-
    # scheduling form of the reference's mapping thread draining its
    # queue across tracked frames. Trade-off measured on one v5e:
    # worst-case frame 400 -> ~150 ms and mean 141 -> 126 ms, but the
    # MEDIAN frame rises (poll work lands on otherwise-clean frames) —
    # enable for deadline-bound real-time pacing; leave off to maximize
    # typical-frame throughput. Auto-disabled when the object pipeline
    # votes with map points (mono: association needs fresh points).
    async_keyframe: bool = False
    # Defer the object-stage APPLY (the fetch of the measure/recon GN
    # programs, ~60+ ms of device compute for an 8-object batch) to the
    # next frame's poll(). The T_co measurements are camera-frame and
    # keyframes are >= several frames apart, so a one-frame-late apply
    # is semantically the reference's mapping-thread lag. Only takes
    # effect with async_keyframe (the spread-the-keyframe mode).
    async_objects: bool = False
    # Camera-object SE3 edges in local BA (the paper's joint
    # factor-graph claim; reference Optimizer_util.cc:309-430 builds
    # EdgeSE3LieAlgebra camera<->object edges into the same solve as
    # point edges). Off = points-only BA with object poses frozen at
    # their per-keyframe GN measurements — the A/B arm the benchmark
    # uses to RECORD the joint-BA payoff instead of asserting it.
    ba_objects: bool = True


class LocalMapper:
    def __init__(self, slam_map: Map, cfg: LocalMapperConfig,
                 object_pipeline=None):
        self.map = slam_map
        self.cfg = cfg
        self.object_pipeline = object_pipeline
        self.recent_points: list[tuple[int, int]] = []  # (point_id, birth_kf)
        self._pending_ba = None
        self._pending_tri = None
        self._pending_obj = None      # (kf, obj_pending) awaiting apply
        self._ba_kf = None            # KF whose BA dispatch awaits tri apply
        self._skip_polls = 0          # freshness: let dispatched work overlap
        self._intrinsics_dev = None   # device-resident [fx fy cx cy bf]
        self.telemetry = None         # optional utils.timing.StageTimer

    @contextlib.contextmanager
    def _span(self, name: str):
        """Attribute a mapping sub-stage's host wall time (no device
        sync — dispatches record their enqueue cost, applies record the
        fetch+writeback they actually pay)."""
        if self.telemetry is None:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.telemetry.add(name, time.perf_counter() - t0)

    @property
    def intrinsics(self):
        if self._intrinsics_dev is None:
            c = self.cfg
            self._intrinsics_dev = jnp.asarray([c.fx, c.fy, c.cx, c.cy, c.bf])
        return self._intrinsics_dev

    def accepting_keyframes(self) -> bool:
        """The reference's Tracking::NeedNewKeyFrame gates weak-tracking
        keyframe insertion on LocalMapping being idle
        (AcceptKeyFrames()): while the previous keyframe's triangulated
        points haven't been applied yet (async_keyframe spreading), the
        tracker's match count is temporarily depressed and the decay
        rule would cascade extra keyframes (measured: 9 vs 5 KFs over a
        30-frame mono run). Max-gap insertion is NOT gated, matching
        the reference's forced c1a path. Only pending TRIANGULATION
        gates: object-GN applies don't feed tracked counts, and holding
        keyframes for them just delayed insertion once polls became
        readiness-aware (objects wait several frames for GN compute)."""
        return self._pending_tri is None

    # ------------------------------------------------------------------
    def process(self, kf: KeyFrame, triangulate: bool = True):
        """One keyframe through the mapping stages.

        Device-dispatch discipline (the keyframe analogue of
        slam.frame_step): the object pipeline's GN programs and the fused
        triangulation+fusion matcher are all dispatched BEFORE any result
        is fetched, so their round trips overlap — JAX dispatch is async
        and the device queue serializes the compute anyway. Round 1 ran
        these as ~8 dispatch->fetch->host->dispatch cycles (~0.6 s
        keyframe stalls on relay-attached chips).
        """
        with self._span("kf_flush_prev"):
            self.flush()             # drain anything from the previous KF
        self.map.update_covisibility(kf)
        self._cull_points(kf)
        needs_fresh_points = getattr(
            self.object_pipeline, "uses_map_points", False
        )
        defer = self.cfg.async_keyframe and not needs_fresh_points
        tri_sync = None
        # tri dispatch FIRST: its single program is cheap to enqueue and
        # small to run; dispatching it behind the object GN programs made
        # the enqueue pay the relay's flow-control backpressure from that
        # heavy queue (stage telemetry: tri_call 0.45-0.86 s when queued
        # after objects vs ~10 ms when the queue is shallow)
        with self._span("kf_tri_dispatch"):
            if defer:
                self._pending_tri = self._dispatch_triangulate(kf, triangulate)
                if self._pending_tri is not None:
                    from .tracking import _prefetch_to_host

                    _prefetch_to_host(self._pending_tri["out"])
            elif needs_fresh_points:
                # mono association votes with map points: triangulation
                # must land before the object stage
                self._triangulate_and_fuse(kf, triangulate)
            else:
                # sync path, interleaved: fetch triangulation AFTER the
                # object-stage apply so its compute + host transfer
                # overlap that host work
                tri_sync = self._dispatch_triangulate(kf, triangulate)
                if tri_sync is not None:
                    from .tracking import _prefetch_to_host

                    _prefetch_to_host(tri_sync["out"])
        obj_pending = None
        if self.object_pipeline is not None:
            local_ids = self.map.local_keyframes(kf, self.cfg.window)
            with self._span("kf_obj_dispatch"):
                obj_pending = self.object_pipeline.dispatch_keyframe(
                    kf, local_ids
                )
        if self.object_pipeline is not None:
            if defer and self.cfg.async_objects:
                # fetch the measure/recon GN results at the next poll —
                # their compute overlaps the frames in between
                self._pending_obj = (kf, obj_pending)
            else:
                with self._span("obj_apply"):
                    self.object_pipeline.apply_keyframe(kf, obj_pending)
        if tri_sync is not None:
            with self._span("tri_apply"):
                self._apply_triangulate(tri_sync)
        if defer:
            # BA must see the triangulated points: dispatched by poll()
            # right after the triangulation applies
            self._ba_kf = kf
            self._skip_polls = 1
        elif self.cfg.async_ba:
            with self._span("ba_dispatch"):
                self._pending_ba = self.dispatch_bundle_adjust(kf)
                if self._pending_ba is not None:
                    from .tracking import _prefetch_to_host

                    _prefetch_to_host(self._pending_ba["out"])
            self._skip_polls = 1
        else:
            with self._span("ba_sync"):
                self.local_bundle_adjust(kf)
        self._cull_keyframes(kf)

    def poll(self):
        """One deferred-stage step; called once per tracked frame
        (System.track_*). Applies at most one pending result per frame
        so each frame absorbs a bounded slice of keyframe work — and
        ONLY results whose device programs have finished (is_ready(),
        0.1 ms over the relay): an apply never blocks a frame waiting
        on compute. flush() at the next keyframe force-drains whatever
        never signalled ready, bounding staleness at the KF interval."""
        if self._skip_polls > 0:
            self._skip_polls -= 1
            return
        # triangulation first: cheap to apply, unblocks BA dispatch and
        # the AcceptKeyFrames gate
        if self._pending_tri is not None:
            if not _results_ready(self._pending_tri["out"]):
                return
            pending, self._pending_tri = self._pending_tri, None
            with self._span("tri_apply"):
                self._apply_triangulate(pending)
            if self._ba_kf is not None:
                kf, self._ba_kf = self._ba_kf, None
                if not kf.bad:
                    if self.cfg.async_ba:
                        with self._span("ba_dispatch"):
                            self._pending_ba = self.dispatch_bundle_adjust(kf)
                        self._skip_polls = 1
                    else:
                        with self._span("ba_sync"):
                            self.local_bundle_adjust(kf)
            return
        if self._pending_obj is not None:
            if not _results_ready(self._pending_obj[1]):
                return
            (kf, obj_pending), self._pending_obj = self._pending_obj, None
            with self._span("obj_apply"):
                self.object_pipeline.apply_keyframe(kf, obj_pending)
            return
        if self._pending_ba is not None:
            if not _results_ready(self._pending_ba["out"]):
                return
            with self._span("ba_apply"):
                self.apply_pending_ba()
            return
        # idle poll: finalize ONE deferred mesh — its voxel decode +
        # host transfer overlapped the frames since its keyframe, and
        # collecting here keeps marching tetrahedra (host) off the
        # keyframe critical path entirely (the next frame's device
        # program is already dispatched when poll runs)
        pipeline = self.object_pipeline
        if pipeline is not None and getattr(pipeline, "_pending_meshes", None):
            if not _results_ready(pipeline._pending_meshes[0][1]):
                return
            with self._span("mesh_collect"):
                pipeline.collect_meshes(limit=1)

    def apply_pending_ba(self):
        """Fetch + write back the previous keyframe's BA solve, if any."""
        pending, self._pending_ba = self._pending_ba, None
        if pending is not None:
            self._apply_bundle_adjust(pending)

    def drop_pending_ba(self):
        """Discard in-flight solves — called when a loop closure
        rewrites the poses they were computed from (the reference's
        mbAbortBA path, LoopClosing.cc:CorrectLoop)."""
        self._pending_ba = None
        self._pending_tri = None
        self._ba_kf = None
        if self._pending_obj is not None:
            # object measurements are CAMERA-frame (pose-independent):
            # still valid after the correction — apply, don't drop
            (kf, obj_pending), self._pending_obj = self._pending_obj, None
            self.object_pipeline.apply_keyframe(kf, obj_pending)

    def flush(self):
        """Drain all deferred keyframe stages in order."""
        self._skip_polls = 0
        if self._pending_obj is not None:
            (kf, obj_pending), self._pending_obj = self._pending_obj, None
            self.object_pipeline.apply_keyframe(kf, obj_pending)
        if self._pending_tri is not None:
            pending, self._pending_tri = self._pending_tri, None
            self._apply_triangulate(pending)
        if self._ba_kf is not None:
            kf, self._ba_kf = self._ba_kf, None
            if not kf.bad:
                self._pending_ba = self.dispatch_bundle_adjust(kf)
        self.apply_pending_ba()
        if self.object_pipeline is not None:
            collect = getattr(self.object_pipeline, "collect_meshes", None)
            if collect is not None:
                collect()

    # ------------------------------------------------------------------
    def warmup_ba_buckets(self, buckets=None, with_objects: bool = True):
        """Pre-compile the bundle-adjust program for each point bucket so
        density growth mid-run never pays a compile inside the measured
        loop (the keyframe analogue of the detector jit warmup)."""
        K = BA_KF_CAP
        intr = self.intrinsics
        for P in (buckets or BA_PT_BUCKETS):
            O = BA_OBS_PER_PT * P
            kf_poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
            kf_poses[1, 0, 3] = 0.5          # baseline so H is non-singular
            kf_fixed = np.ones(K, np.float32)
            kf_fixed[1] = 0.0
            points = np.zeros((P, 3), np.float32)
            points[:, 2] = 5.0
            pt_valid = np.ones(P, np.float32)
            obs_kf = np.zeros(O, np.int32)
            obs_kf[1::2] = 1
            obs_pt = np.minimum(np.arange(O, dtype=np.int32) // 2, P - 1)
            obs_uvr = np.zeros((O, 3), np.float32)
            obs_uvr[:, 0] = float(intr[2])
            obs_uvr[:, 1] = float(intr[3])
            obj_variants = [None]
            if with_objects:
                M, Q = BA_OBJ_CAP, BA_EDGE_CAP
                obj_variants.append({
                    "poses": jnp.tile(jnp.eye(4), (M, 1, 1)),
                    "fixed": jnp.zeros(M),
                    "edge_kf": jnp.zeros(Q, jnp.int32),
                    "edge_obj": jnp.zeros(Q, jnp.int32),
                    "edge_Tco": jnp.tile(jnp.eye(4), (Q, 1, 1)),
                    "edge_valid": jnp.zeros(Q),
                })
            for obj_state in obj_variants:
                out = ba.bundle_adjust(
                    jnp.asarray(kf_poses), jnp.asarray(kf_fixed),
                    jnp.asarray(points), jnp.asarray(pt_valid),
                    jnp.asarray(obs_kf), jnp.asarray(obs_pt),
                    jnp.asarray(obs_uvr), jnp.zeros(O),
                    jnp.ones(O), jnp.ones(O), intr, 1e-3, obj_state,
                )
                np.asarray(out["kf_poses"])   # sync (axon needs a fetch)

    # ------------------------------------------------------------------
    def _cull_points(self, kf: KeyFrame):
        """Recent-point culling (LocalMapping::MapPointCulling)."""
        survivors = []
        for p_id, birth in self.recent_points:
            p = self.map.points.get(p_id)
            if p is None or p.bad:
                continue
            age = kf.id - birth
            if p.found_ratio() < self.cfg.cull_found_ratio:
                self.map.erase_point(p_id)
            elif age >= 2 and p.n_obs < self.cfg.cull_min_obs:
                self.map.erase_point(p_id)
            elif age < 3:
                survivors.append((p_id, birth))
        self.recent_points = survivors

    def register_new_points(self, point_ids, birth_kf_id):
        self.recent_points.extend((p, birth_kf_id) for p in point_ids)

    # ------------------------------------------------------------------
    def _triangulate_and_fuse(self, kf: KeyFrame, triangulate: bool = True):
        """Synchronous dispatch + apply (async_keyframe=False path)."""
        pending = self._dispatch_triangulate(kf, triangulate)
        if pending is not None:
            self._apply_triangulate(pending)

    def _dispatch_triangulate(self, kf: KeyFrame, triangulate: bool = True):
        """Epipolar triangulation against strong covisible keyframes
        (LocalMapping::CreateNewMapPoints, LocalMapping.cc:258-450) and
        duplicate fusion (SearchInNeighbors + ORBmatcher::Fuse) in ONE
        fused device program (slam.keyframe_step), dispatch only; the
        host applies the pre-validated results in _apply_triangulate."""
        from ..slam.map import MapPoint
        from . import keyframe_step

        c = self.cfg
        N = kf.n
        _t0 = time.perf_counter()

        # up to MAX_NEIGHBORS triangulation partners with real baseline
        neighbors = []
        if triangulate:
            for other_id in kf.covisible_keyframes(4):
                other = self.map.keyframes.get(other_id)
                if other is None or other.bad:
                    continue
                base = np.linalg.norm(
                    kf.camera_center() - other.camera_center()
                )
                if base < 1e-3:
                    continue
                neighbors.append(other)
                if len(neighbors) == keyframe_step.MAX_NEIGHBORS:
                    break

        M = keyframe_step.MAX_NEIGHBORS
        # fusion candidates: neighbor map points not yet observed by kf
        neighbor_pts = {}
        for other_id in kf.covisible_keyframes(5):
            other = self.map.keyframes.get(other_id)
            if other is None:
                continue
            for p_id in other.map_point_ids:
                if p_id >= 0 and p_id not in neighbor_pts:
                    p = self.map.points.get(int(p_id))
                    if p is not None and not p.bad and kf.id not in p.observations:
                        neighbor_pts[p_id] = p
        pts = list(neighbor_pts.values())[: keyframe_step.FUSE_CAP]
        C = keyframe_step.FUSE_CAP
        fuse_pos = np.zeros((C, 3), np.float32)
        fuse_valid = np.zeros(C, np.float32)
        fuse_desc = np.zeros((C, 8), np.uint32)
        n_f = len(pts)
        if n_f:
            fuse_pos[:n_f] = np.stack([p.position for p in pts])
            fuse_valid[:n_f] = 1.0
            fuse_desc[:n_f] = np.stack([p.descriptor for p in pts])

        if not neighbors and not n_f:
            return None
        if self.telemetry is not None:
            self.telemetry.add("tri_host_prep", time.perf_counter() - _t0)
            _t0 = time.perf_counter()

        # neighbor feats enter the device program as a tuple of each
        # keyframe's RESIDENT copy (feats_jax); the stack happens inside
        # the jitted program. Eager stacking here used to cost 0.4-0.7 s
        # of per-op relay dispatches per keyframe (stage telemetry
        # tri_feats_stack). Empty slots reuse kf's own feats, masked by
        # nb_ok=0. Built after the early-out so no-op keyframes cost no
        # relay traffic.
        kf_dev = kf.feats_jax()
        nb_list = tuple(
            (neighbors[i].feats_jax() if i < len(neighbors) else kf_dev)
            for i in range(M)
        )
        nb_T = np.tile(np.eye(4, dtype=np.float32), (M, 1, 1))
        nb_has = np.ones((M, N), np.float32)
        nb_ok = np.zeros(M, np.float32)
        for i, other in enumerate(neighbors):
            nb_T[i] = other.T_cw
            nb_has[i] = (other.map_point_ids >= 0).astype(np.float32)
            nb_ok[i] = 1.0

        out = keyframe_step.keyframe_matching(
            kf_dev,           # reuses the on-device copy (no re-upload)
            kf.T_cw,
            (kf.map_point_ids >= 0).astype(np.float32),
            (
                (kf.depth > 0).astype(np.float32)
                if kf.depth is not None else np.zeros(N, np.float32)
            ),
            nb_list,
            nb_T, nb_has, nb_ok,
            fuse_pos, fuse_valid, fuse_desc, np.zeros(C, np.int32),
            self.intrinsics,
        )
        if self.telemetry is not None:
            self.telemetry.add("tri_call", time.perf_counter() - _t0)
        return {"out": out, "kf": kf, "neighbors": neighbors,
                "pts": pts, "n_f": n_f}

    def _apply_triangulate(self, pending):
        from ..slam.map import MapPoint

        out = {k: np.asarray(v) for k, v in pending["out"].items()}
        kf = pending["kf"]
        neighbors = pending["neighbors"]
        pts = pending["pts"]
        n_f = pending["n_f"]
        if kf.bad:
            return

        # mint triangulated points (host bookkeeping only)
        created = []
        cam = kf.camera_center()
        for i_nb, other in enumerate(neighbors):
            if other.bad:      # culled since dispatch (async path)
                continue
            idx = out["tri_idx"][i_nb]
            X = out["tri_X"][i_nb]
            ok = out["tri_ok"][i_nb]
            for i in np.nonzero(ok)[0]:
                j = int(idx[i])
                if kf.map_point_ids[i] >= 0 or other.map_point_ids[j] >= 0:
                    continue   # taken by the other neighbor this round
                p = MapPoint(
                    X[i].astype(np.float32), kf.feats["desc"][i], kf.id,
                    int(kf.feats["level"][i]),
                    float(np.linalg.norm(X[i] - cam)),
                )
                self.map.add_point(p)
                self.map.add_observation(p, kf, int(i))
                self.map.add_observation(p, other, j)
                created.append(p.id)
        if created:
            self.register_new_points(created, kf.id)
            self.map.update_covisibility(kf)

        # apply fusion matches
        idx = out["fuse_idx"]
        for j in range(n_f):
            if idx[j] < 0:
                continue
            kp = int(idx[j])
            existing_id = kf.map_point_ids[kp]
            p_new = pts[j]
            if p_new.bad:
                continue
            if existing_id < 0:
                self.map.add_observation(p_new, kf, kp)
            elif existing_id != p_new.id:
                existing = self.map.points.get(int(existing_id))
                if existing is None or existing.bad:
                    continue
                # keep the better-observed point
                keep, drop = (
                    (existing, p_new)
                    if existing.n_obs >= p_new.n_obs
                    else (p_new, existing)
                )
                self.map.replace_point(drop, keep)

    # ------------------------------------------------------------------
    def _cull_keyframes(self, kf: KeyFrame):
        """Drop redundant covisible keyframes: >=90% of their tracked
        close points are seen by >=3 other keyframes
        (LocalMapping::KeyFrameCulling, LocalMapping.cc:683-760)."""
        for other_id in kf.covisible_keyframes():
            other = self.map.keyframes.get(other_id)
            if other is None or other.bad or other.id == 0 or other.not_erase:
                continue
            total = redundant = 0
            for p_id in other.map_point_ids:
                if p_id < 0:
                    continue
                p = self.map.points.get(int(p_id))
                if p is None or p.bad:
                    continue
                total += 1
                if p.n_obs >= 4:   # seen by >= 3 others
                    redundant += 1
            if total > 20 and redundant > 0.9 * total:
                self._erase_keyframe(other)

    def _erase_keyframe(self, kf: KeyFrame):
        for kp_idx, p_id in enumerate(kf.map_point_ids):
            if p_id < 0:
                continue
            p = self.map.points.get(int(p_id))
            if p is not None:
                p.observations.pop(kf.id, None)
        # reattach children in the spanning tree to the parent
        parent = self.map.keyframes.get(kf.parent) if kf.parent is not None else None
        for child_id in kf.children:
            child = self.map.keyframes.get(child_id)
            if child is not None:
                child.parent = kf.parent
                if parent is not None:
                    parent.children.add(child_id)
        if parent is not None:
            parent.children.discard(kf.id)
        for other_id in kf.covis:
            other = self.map.keyframes.get(other_id)
            if other is not None:
                other.covis.pop(kf.id, None)
        kf.bad = True
        self.map.erase_keyframe(kf.id)

    # ------------------------------------------------------------------
    def local_bundle_adjust(self, kf: KeyFrame):
        """Synchronous pack + solve + write back (async_ba=False path
        and tests)."""
        pending = self.dispatch_bundle_adjust(kf)
        if pending is not None:
            self._apply_bundle_adjust(pending)

    def dispatch_bundle_adjust(self, kf: KeyFrame):
        """Pack the covisibility window and DISPATCH the device BA
        (no fetch — see LocalMapperConfig.async_ba).

        Mirrors the reference's local BA structure (Optimizer_util.cc:
        309-430): the covisibility window is optimized, and every OTHER
        keyframe observing a window point joins as a FIXED camera — its
        observations constrain the points so they cannot drift to fit
        only the window (omitting these was a map-corruption source).
        """
        window_ids = self.map.local_keyframes(kf, BA_WINDOW - 1)[:BA_WINDOW]
        if len(window_ids) < 2:
            return None

        # points observed by the window, strongest first; the compile
        # bucket grows with density so nothing truncates below the top cap
        pt_ids = self.map.points_seen_by(window_ids)
        pt_ids.sort(key=lambda p: -self.map.points[p].n_obs)
        if len(pt_ids) > BA_PT_CAP:
            # only past the LAST bucket do fixed device shapes truncate
            # (the reference's all-covisible window is unbounded,
            # Optimizer_util.cc:309-430): the weakest-observed points are
            # dropped from THIS solve only — surface it rather than
            # silently thin the constraint set on dense maps
            logging.getLogger(__name__).warning(
                "local BA point cap: %d observed, optimizing strongest %d",
                len(pt_ids), BA_PT_CAP,
            )
        pt_ids = pt_ids[:BA_PT_CAP]

        # fixed observers: KFs outside the window seeing window points
        window_set = set(window_ids)
        observer_counts: dict[int, int] = {}
        for p_id in pt_ids:
            for kf_id in self.map.points[p_id].observations:
                if kf_id not in window_set and kf_id in self.map.keyframes:
                    observer_counts[kf_id] = observer_counts.get(kf_id, 0) + 1
        fixed_ids = sorted(observer_counts, key=lambda k: -observer_counts[k])
        fixed_ids = fixed_ids[: BA_KF_CAP - len(window_ids)]

        all_ids = window_ids + fixed_ids
        kf_slot = {kf_id: i for i, kf_id in enumerate(all_ids)}
        K = BA_KF_CAP
        kf_poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        kf_fixed = np.ones(K, np.float32)     # padded + observer slots fixed
        for kf_id, i in kf_slot.items():
            kf_poses[i] = self.map.keyframes[kf_id].T_cw
            if kf_id in window_set:
                kf_fixed[i] = 0.0
        # gauge: fix the oldest window keyframe (and KF 0 if present)
        oldest = min(window_ids)
        kf_fixed[kf_slot[oldest]] = 1.0
        if 0 in kf_slot:
            kf_fixed[kf_slot[0]] = 1.0
        pt_slot = {p_id: i for i, p_id in enumerate(pt_ids)}
        P = ba_point_bucket(len(pt_ids))
        points = np.zeros((P, 3), np.float32)
        pt_valid = np.zeros(P, np.float32)
        for p_id, i in pt_slot.items():
            points[i] = self.map.points[p_id].position
            pt_valid[i] = 1.0

        O = BA_OBS_PER_PT * P
        obs_kf = np.zeros(O, np.int32)
        obs_pt = np.zeros(O, np.int32)
        obs_uvr = np.zeros((O, 3), np.float32)
        obs_stereo = np.zeros(O, np.float32)
        obs_inv_s2 = np.ones(O, np.float32)
        obs_valid = np.zeros(O, np.float32)
        n_obs = 0
        obs_refs = []    # (kf_id, kp_idx, p_id) for write-back of outliers
        for p_id in pt_ids:
            p = self.map.points[p_id]
            for kf_id, kp_idx in p.observations.items():
                if kf_id not in kf_slot or n_obs >= O:
                    continue
                okf = self.map.keyframes[kf_id]
                obs_kf[n_obs] = kf_slot[kf_id]
                obs_pt[n_obs] = pt_slot[p_id]
                xy = okf.feats["xy"][kp_idx]
                ur = okf.u_right[kp_idx] if okf.u_right is not None else -1.0
                obs_uvr[n_obs, :2] = xy
                if ur > 0:
                    obs_uvr[n_obs, 2] = ur
                    obs_stereo[n_obs] = 1.0
                obs_inv_s2[n_obs] = 1.0 / okf.feats["sigma2"][kp_idx]
                obs_valid[n_obs] = 1.0
                obs_refs.append((kf_id, kp_idx, p_id))
                n_obs += 1
        if n_obs >= O:
            logging.getLogger(__name__).warning(
                "local BA observation cap reached (%d): remaining "
                "observations dropped from this solve", O,
            )

        if n_obs < 20:
            return None

        # objects in the window -> joint BA edges
        obj_state = None
        obj_ids = []
        if not self.cfg.ba_objects:
            window_ids_for_objects = []
        else:
            window_ids_for_objects = window_ids
        for kf_id in window_ids_for_objects:
            okf = self.map.keyframes[kf_id]
            for obj_id in okf.object_associations.values():
                obj = self.map.objects.get(obj_id)
                if (
                    obj is not None and not obj.bad and not obj.dynamic
                    and obj_id not in obj_ids
                ):
                    obj_ids.append(obj_id)
        obj_ids = obj_ids[:BA_OBJ_CAP]
        if obj_ids:
            obj_slot = {o: i for i, o in enumerate(obj_ids)}
            M, Q = BA_OBJ_CAP, BA_EDGE_CAP
            obj_poses = np.tile(np.eye(4, dtype=np.float32), (M, 1, 1))
            obj_fixed = np.ones(M, np.float32)
            for o, i in obj_slot.items():
                obj_poses[i] = self.map.objects[o].T_wo_se3
                obj_fixed[i] = 0.0
            edge_kf = np.zeros(Q, np.int32)
            edge_obj = np.zeros(Q, np.int32)
            edge_Tco = np.tile(np.eye(4, dtype=np.float32), (Q, 1, 1))
            edge_valid = np.zeros(Q, np.float32)
            qn = 0
            for o in obj_ids:
                obj = self.map.objects[o]
                for kf_id, det_idx in obj.observations.items():
                    if kf_id not in kf_slot or qn >= Q:
                        continue
                    det = self.map.keyframes[kf_id].detections[det_idx]
                    T_co = getattr(det, "T_co_se3_measured", None)
                    if T_co is None:
                        continue
                    edge_kf[qn] = kf_slot[kf_id]
                    edge_obj[qn] = obj_slot[o]
                    edge_Tco[qn] = T_co
                    edge_valid[qn] = 1.0
                    qn += 1
            if qn > 0:
                obj_state = {
                    "poses": jnp.asarray(obj_poses),
                    "fixed": jnp.asarray(obj_fixed),
                    "edge_kf": jnp.asarray(edge_kf),
                    "edge_obj": jnp.asarray(edge_obj),
                    "edge_Tco": jnp.asarray(edge_Tco),
                    "edge_valid": jnp.asarray(edge_valid),
                }

        out = ba.bundle_adjust(
            jnp.asarray(kf_poses), jnp.asarray(kf_fixed), jnp.asarray(points),
            jnp.asarray(pt_valid), jnp.asarray(obs_kf), jnp.asarray(obs_pt),
            jnp.asarray(obs_uvr), jnp.asarray(obs_stereo),
            jnp.asarray(obs_inv_s2), jnp.asarray(obs_valid), self.intrinsics,
            1e-3, obj_state,
        )
        return {
            "out": out, "kf_slot": kf_slot, "kf_fixed": kf_fixed,
            "pt_slot": pt_slot, "obs_refs": obs_refs, "obs_valid": obs_valid,
            "obj_slot": obj_slot if obj_state is not None else None,
            "obj_fixed": obj_fixed if obj_state is not None else None,
        }

    def _apply_bundle_adjust(self, pending):
        """Fetch + write back — but never with a diverged solution, and
        never onto entities erased (culled/fused) since dispatch."""
        out = pending["out"]
        kf_slot, kf_fixed = pending["kf_slot"], pending["kf_fixed"]
        new_poses = np.asarray(out["kf_poses"])
        new_pts_all = np.asarray(out["points"])
        if not (np.isfinite(new_poses).all() and np.isfinite(new_pts_all).all()):
            return
        for kf_id, i in kf_slot.items():
            okf = self.map.keyframes.get(kf_id)
            if okf is not None and not okf.bad and kf_fixed[i] == 0.0:
                okf.T_cw = new_poses[i]
        for p_id, i in pending["pt_slot"].items():
            p = self.map.points.get(p_id)
            if p is not None and not p.bad:
                p.position = new_pts_all[i]
        inlier = np.asarray(out["obs_inlier"])
        obs_valid = pending["obs_valid"]
        for i, (kf_id, kp_idx, p_id) in enumerate(pending["obs_refs"]):
            if obs_valid[i] > 0 and inlier[i] == 0:
                p = self.map.points.get(p_id)
                okf = self.map.keyframes.get(kf_id)
                if p is not None and okf is not None:
                    p.observations.pop(kf_id, None)
                    if okf.map_point_ids[kp_idx] == p_id:
                        okf.map_point_ids[kp_idx] = -1
                    if p.n_obs == 0:
                        self.map.erase_point(p_id)
        if pending["obj_slot"] is not None:
            new_obj = np.asarray(out["obj_poses"])
            obj_fixed = pending["obj_fixed"]
            for o, i in pending["obj_slot"].items():
                obj = self.map.objects.get(o)
                if obj is not None and not obj.bad and obj_fixed[i] == 0.0:
                    obj.set_pose_se3(new_obj[i])
