"""Tracking front-end: per-frame state machine.

Host orchestration of the reference's Tracking thread (/root/reference/
src/Tracking.cc:275-517) over jitted device kernels:

  extract (frontend.orb) -> stereo depth (frontend.stereo) ->
  motion-model projection matching (frontend.matcher) ->
  motion-only pose GN (slam.pose_opt) -> local-map tracking ->
  keyframe decision -> map-point spawning from stereo depth.

All device calls are fixed-shape (feature caps from ORBParams, map-point
caps below), so each kernel compiles once for a sequence. The reference's
mutex/thread machinery disappears: the tracker is a plain object driven
by one host loop (SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from enum import Enum

import jax
import jax.numpy as jnp
import numpy as np

from ..frontend import matcher, orb, stereo
from . import pose_opt
from .map import Frame, KeyFrame, Map, MapPoint

LOCAL_POINT_CAP = 4096


class State(Enum):
    NOT_INITIALIZED = 0
    OK = 1
    LOST = 2


@dataclasses.dataclass
class TrackerConfig:
    fx: float = 707.0912
    fy: float = 707.0912
    cx: float = 601.8873
    cy: float = 183.1104
    bf: float = 379.8145
    width: int = 1241
    height: int = 376
    th_depth: float = 35.0              # "ThDepth": close-point gate in baselines
    max_frames_between_kf: int = 10     # fps
    min_frames_between_kf: int = 0
    min_init_features: int = 500
    min_track_matches: int = 10
    min_inliers: int = 10
    search_radius_motion: float = 15.0
    search_radius_local: float = 5.0
    # plumb-bob lens coefficients (k1, k2, p1, p2, k3); keypoints are
    # undistorted once per frame when any is nonzero
    # (Frame::UndistortKeyPoints, reference src/Frame.cc:405-434).
    # Stereo input must be rectified (reference asserts the same).
    dist_coeffs: tuple = (0.0, 0.0, 0.0, 0.0, 0.0)
    # constant-velocity model smoothing in the SE(3) tangent (1.0 = the
    # reference's raw frame-to-frame motion). Below 1, per-frame pose
    # noise enters the next prediction attenuated: the raw model feeds
    # estimation error back DOUBLED (pred = 2 e_k - e_{k-1}), which on
    # scenes with weakly-observed directions (far-plane-dominated
    # matches) amplifies a centimeter-level wobble into tracking loss
    # within ~5 frames.
    velocity_smoothing: float = 0.6
    # One-frame software pipelining of the fused stereo path: frame k+1
    # is dispatched (with motion prediction, velocity update and the
    # next motion-stage candidate set computed ON DEVICE) before frame
    # k's results are fetched, so the fetch round trip overlaps the next
    # frame's compute. Host state (map, keyframes, trajectory) runs one
    # frame behind the camera — the TPU-native analogue of the
    # reference's decoupled tracking/mapping threads. Callers must
    # flush() at sequence end.
    pipelined: bool = False
    # frames in flight before a result is finalized (pipelined mode).
    # 1 = the classic one-frame lag. 2 hides a full fetch round trip on
    # relay-attached devices (profile_mono: ~45-65 ms of un-overlapped
    # RTT per frame at depth 1) at the cost of one more frame of
    # host-side latency — use for throughput-bound offline/mono runs;
    # real-time paced loops should stay at 1.
    pipeline_depth: int = 1

    @property
    def intrinsics(self):
        return jnp.asarray([self.fx, self.fy, self.cx, self.cy, self.bf])

    @property
    def depth_threshold(self):
        """Close-point depth gate in meters: ThDepth * baseline
        (reference Tracking.cc: mThDepth = mbf * ThDepth / fx)."""
        return self.th_depth * self.bf / self.fx


def _prefetch_to_host(tree):
    """Request async device->host copies for every array in `tree` —
    called right after a pipelined dispatch so the result streams back
    DURING the next frame's compute window and the later fetch hits a
    local buffer instead of paying the full relay round trip."""
    for leaf in jax.tree_util.tree_leaves(tree):
        fn = getattr(leaf, "copy_to_host_async", None)
        if fn is not None:
            try:
                fn()
            except Exception:
                return


def _upload_image(img):
    """Host->device image upload preserving uint8 (4x less transfer than
    float32 — the dominant per-frame cost on relay-attached TPUs; device
    programs cast to f32 on entry). Pre-uploaded jax arrays pass through."""
    if isinstance(img, jnp.ndarray):
        return img
    a = np.asarray(img)
    if a.dtype == np.uint8:
        return jnp.asarray(a)
    return jnp.asarray(a, jnp.float32)


def _pack_map_points(entries, cap):
    """entries: (id, pos, desc, level, dist_create) -> padded arrays."""
    ids = np.full(cap, -1, np.int64)
    pos = np.zeros((cap, 3), np.float32)
    desc = np.zeros((cap, 8), np.uint32)
    level = np.zeros(cap, np.int32)
    dist0 = np.ones(cap, np.float32)
    n = min(len(entries), cap)
    for i in range(n):
        ids[i], pos[i], desc[i], level[i], dist0[i] = entries[i]
    valid = (ids >= 0).astype(np.float32)
    return ids, pos, desc, level, dist0, valid


def predicted_levels(level_create, dist_create, pos, T_cw, scale_factor,
                     n_levels):
    """Expected octave at the current viewing distance (the reference's
    MapPoint::PredictScale rule): one level per scale_factor of approach."""
    cam_center = -T_cw[:3, :3].T @ T_cw[:3, 3]
    dist = np.linalg.norm(pos - cam_center, axis=-1)
    shift = np.log(np.maximum(dist_create, 1e-3) / np.maximum(dist, 1e-3)) \
        / np.log(scale_factor)
    return np.clip(
        np.round(level_create + shift), 0, n_levels - 1
    ).astype(np.int32)


class Tracker:
    def __init__(self, config: TrackerConfig, slam_map: Map,
                 orb_params: orb.ORBParams = orb.ORBParams()):
        self.cfg = config
        self.map = slam_map
        self.orb_params = orb_params
        self.state = State.NOT_INITIALIZED
        self.last_frame: Frame | None = None
        self.velocity: np.ndarray | None = None   # T_cl: last->current motion
        self.ref_kf: KeyFrame | None = None
        self.last_kf_frame_id = -1
        self.frames_since_kf = 0
        self.new_keyframes: list[KeyFrame] = []   # queue for local mapping
        self.trajectory: list[tuple[float, np.ndarray, bool]] = []
        self.relocalizer = None                   # set by the system facade
        self.localization_only = False            # tracking against a frozen map
        self.mapper_idle_fn = None                # set by the system facade
        self.telemetry = None                     # optional StageTimer:
        # result_fetch spans = the frame's device->host wait, the
        # in-run relay-health signal (host compute stays flat when the
        # wire sags, so fetch p95 attributes a slow run to link vs work)
        # pipelined-mode state (cfg.pipelined)
        self.frame_seq = 0                        # per-call sequence index
        self._current_seq = -1                    # seq of the frame being finalized
        self._chain = None                        # device-side chain state tuple
        self._inflight: list = []                 # dispatched-not-finalized FIFO
        self._inflight_poisoned = False           # chain broke; redo from images

    # ------------------------------------------------------------------
    def process_stereo(self, img_l: np.ndarray, img_r: np.ndarray,
                       timestamp: float) -> Frame | None:
        """Per-frame stereo tracking. In the steady state the whole device
        pipeline runs as ONE fused program (slam.frame_step) — a single
        dispatch + a single fetch per frame; initialization, loss and
        fallback paths use the modular stage-by-stage code below.

        With cfg.pipelined the steady state additionally runs one frame
        BEHIND the camera (dispatch k+1, then fetch k): returns the
        previous frame's result, or None on the first pipelined call —
        callers flush() at sequence end."""
        self._current_seq = self.frame_seq
        self.frame_seq += 1
        steady = (
            self.state == State.OK
            and self.ref_kf is not None
            and (
                self._chain is not None
                or (self.velocity is not None and self.last_frame is not None)
            )
        )
        if self.cfg.pipelined:
            if steady:
                return self._process_stereo_pipelined(img_l, img_r, timestamp)
            self.flush()
            return self._process_stereo_modular(img_l, img_r, timestamp)
        if steady and self.velocity is not None and self.last_frame is not None:
            return self._process_stereo_fused(img_l, img_r, timestamp)
        return self._process_stereo_modular(img_l, img_r, timestamp)

    def _process_stereo_fused(self, img_l, img_r, timestamp: float) -> Frame:
        from . import frame_step

        jl = _upload_image(img_l)
        jr = _upload_image(img_r)
        last_ids_raw = self.last_frame.map_point_ids
        last_entries = self._entries_from_ids(last_ids_raw[last_ids_raw >= 0])
        lid, lpos, ldesc, llvl, ldist, lval = _pack_map_points(
            last_entries, LOCAL_POINT_CAP
        )
        (cid, cpos, _, _, _, cval), dev = self._local_pack()
        T_pred = (self.velocity @ self.last_frame.T_cw).astype(np.float32)

        feats_j, st_j, result_j = frame_step.track_frame_stereo(
            self.orb_params,
            (float(self.cfg.search_radius_motion), float(self.cfg.search_radius_local)),
            jl, jr, jnp.float32(self.cfg.bf), jnp.float32(self.cfg.bf / 0.5),
            self.cfg.intrinsics, jnp.asarray(T_pred),
            jnp.asarray(lpos), jnp.asarray(ldesc), jnp.asarray(llvl),
            jnp.asarray(ldist), jnp.asarray(lval),
            *dev,
        )
        # ONE round trip for everything the host needs this frame
        import time as _time

        t0 = _time.perf_counter()
        feats, st, result = jax.device_get((feats_j, st_j, result_j))
        if self.telemetry is not None:
            self.telemetry.add("result_fetch", _time.perf_counter() - t0)
        frame = Frame(timestamp, feats, depth=st["depth"], u_right=st["u_right"])
        frame, _ = self._apply_fused_result(frame, result, cid, cpos, cval)
        return frame

    def _apply_fused_result(self, frame, result, cid, cpos, cval,
                            velocity=None):
        """Host bookkeeping after a fused/pipelined device program: pose
        acceptance, match bookkeeping, stats, KF decision, fallbacks.
        Returns (frame, ok) — ok False means the device track was
        rejected and the modular fallback ran (recovered or LOST)."""
        n_in = int(result["n_inliers"])
        # motion-model acceptance mirrors the reference: the prediction
        # stage must find >= 20 matches (Tracking::TrackWithMotionModel
        # fails below that and tracking falls back to the prior-free
        # reference-keyframe search) — with a bad velocity prior the
        # motion stage can otherwise "confirm" an aliased wrong pose
        # with a handful of self-similar far-texture matches
        ok = int(result["n_motion"]) >= max(self.cfg.min_track_matches, 20) \
            and n_in >= max(self.cfg.min_inliers, 30) \
            and bool(np.isfinite(result["T_cw"]).all())
        if ok:
            frame.T_cw = np.asarray(result["T_cw"], np.float32)
            idx = result["match_idx"]
            inlier = result["inlier"]
            frame.map_point_ids[:] = -1
            for c in np.nonzero(inlier > 0)[0]:
                kp = int(idx[c])
                if kp >= 0 and cid[c] >= 0:
                    frame.map_point_ids[kp] = cid[c]
            self.n_inliers = n_in
            self.state = State.OK
            if velocity is not None:
                self.velocity = np.asarray(velocity, np.float32)
            else:
                self._update_velocity(frame)
            self._update_point_stats(frame, cid, cpos, cval)
            if self._need_new_keyframe(frame):
                self._create_keyframe(frame)
            self.frames_since_kf += 1
        else:
            # fall back to the modular path (reference-KF search etc.)
            mod_ok = self._track_reference_keyframe(frame)
            if mod_ok:
                mod_ok = self._track_local_map(frame)
            if mod_ok:
                self.state = State.OK
                self._update_velocity(frame)
                if self._need_new_keyframe(frame):
                    self._create_keyframe(frame)
                self.frames_since_kf += 1
            else:
                self.state = State.LOST
                if len(self.map.keyframes) <= 5 and self.relocalizer is None:
                    self.reset()
        self.trajectory.append(
            (frame.timestamp, frame.T_cw.copy(), self.state != State.OK)
        )
        self.last_frame = frame
        return frame, ok

    def _local_pack(self):
        """Packed local-map candidates, host + device copies. The set
        only changes when the map does (keyframe insertion / BA /
        culling) — cached between keyframes instead of re-walking the
        map and re-uploading ~250 KB every frame."""
        cache_key = (self.ref_kf.id, len(self.map.points), len(self.map.keyframes))
        if getattr(self, "_local_cache_key", None) != cache_key:
            kf_ids = self.map.local_keyframes(self.ref_kf, 20)
            local_entries = self._entries_from_ids(
                self.map.points_seen_by(kf_ids)
            )
            self._local_cache = _pack_map_points(local_entries, LOCAL_POINT_CAP)
            cid, cpos, cdesc, clvl, cdist, cval = self._local_cache
            self._local_cache_dev = tuple(
                jnp.asarray(a) for a in (cpos, cdesc, clvl, cdist, cval)
            )
            # object refs aligned with cid rows: _update_point_stats runs
            # every steady-state frame and the per-point dict lookups are
            # measurable host time — resolve them once per cache refresh
            self._local_cache_objs = [
                self.map.points.get(int(i)) if i >= 0 else None for i in cid
            ]
            self._local_cache_key = cache_key
        return self._local_cache, self._local_cache_dev

    # ------------------------------------------------------------------
    # pipelined steady-state paths (cfg.pipelined)
    def _seed_chain(self):
        """Seed the device chain state from host tracking state."""
        last_ids_raw = self.last_frame.map_point_ids
        last_entries = self._entries_from_ids(
            last_ids_raw[last_ids_raw >= 0]
        )
        _, lpos, ldesc, llvl, ldist, lval = _pack_map_points(
            last_entries, LOCAL_POINT_CAP
        )
        self._chain = (
            jnp.asarray(self.last_frame.T_cw),
            jnp.asarray(self.velocity),
            jnp.asarray(lpos), jnp.asarray(ldesc), jnp.asarray(llvl),
            jnp.asarray(ldist), jnp.asarray(lval),
        )

    def _redo_poisoned(self):
        """Re-track the poisoned in-flight frames synchronously, in
        order, from their retained image handles (their device chain
        was rejected). Returns the last recovered frame."""
        q, self._inflight = self._inflight, []
        self._inflight_poisoned = False
        out = None
        cur_seq = self._current_seq
        for h in q:
            if not (
                self.state == State.OK and self.velocity is not None
                and self.last_frame is not None and self.ref_kf is not None
            ):
                break
            self._current_seq = h["seq"]
            if h["mode"] == "stereo":
                out = self._process_stereo_fused(*h["imgs"], h["timestamp"])
            elif h["mode"] == "rgbd":
                out = self._process_rgbd_fused(*h["imgs"], h["timestamp"])
            else:
                out = self._process_mono_fused(h["imgs"][0], h["timestamp"])
        self._current_seq = cur_seq
        return out

    def _process_stereo_pipelined(self, img_l, img_r, timestamp: float):
        from . import frame_step

        if self._inflight and self._inflight_poisoned:
            self._redo_poisoned()
            if self.state != State.OK:
                return self._process_stereo_modular(img_l, img_r, timestamp)

        jl = _upload_image(img_l)
        jr = _upload_image(img_r)
        (cid, cpos, _, _, _, cval), dev = self._local_pack()
        if self._chain is None:
            self._seed_chain()
        feats_j, st_j, result_j, chain = frame_step.track_frame_stereo_chained(
            self.orb_params,
            (float(self.cfg.search_radius_motion),
             float(self.cfg.search_radius_local)),
            float(self.cfg.velocity_smoothing),
            jl, jr, jnp.float32(self.cfg.bf), jnp.float32(self.cfg.bf / 0.5),
            self.cfg.intrinsics, *self._chain, *dev,
        )
        self._inflight.append({
            "mode": "stereo", "seq": self._current_seq,
            "timestamp": timestamp, "imgs": (jl, jr),
            "feats_j": feats_j, "st_j": st_j, "result_j": result_j,
            "cid": cid, "cpos": cpos, "cval": cval,
        })
        # feats stay on device: Frame materializes them lazily (only
        # keyframes read them on the host), saving their ~250 KB/frame
        # of relay download bandwidth
        _prefetch_to_host((st_j, result_j))
        self._chain = chain
        return self._drain_inflight()

    def _process_mono_pipelined(self, img, timestamp: float):
        from . import frame_step

        if self._inflight and self._inflight_poisoned:
            self._redo_poisoned()
            if self.state != State.OK:
                return self._process_mono_modular(img, timestamp)

        j = _upload_image(img)
        (cid, cpos, _, _, _, cval), dev = self._local_pack()
        if self._chain is None:
            self._seed_chain()
        feats_j, result_j, chain = frame_step.track_frame_mono_chained(
            self.orb_params,
            (float(self.cfg.search_radius_motion),
             float(self.cfg.search_radius_local)),
            float(self.cfg.velocity_smoothing),
            j, self.cfg.intrinsics, *self._chain, *dev,
        )
        self._inflight.append({
            "mode": "mono", "seq": self._current_seq,
            "timestamp": timestamp, "imgs": (j,),
            "feats_j": feats_j, "st_j": None, "result_j": result_j,
            "cid": cid, "cpos": cpos, "cval": cval,
        })
        _prefetch_to_host(result_j)
        self._chain = chain
        return self._drain_inflight()

    def _drain_inflight(self):
        """Finalize queue entries beyond the configured pipeline depth.
        Returns the newest finalized frame (None while filling)."""
        out = None
        depth = max(int(self.cfg.pipeline_depth), 1)
        while len(self._inflight) > depth and not self._inflight_poisoned:
            out = self._finalize_inflight(self._inflight.pop(0))
        return out

    def _finalize_inflight(self, h) -> Frame:
        """Fetch + host bookkeeping for a dispatched frame (runs one
        frame behind in pipelined mode)."""
        import time as _time

        t0 = _time.perf_counter()
        if h["st_j"] is not None:
            st, result = jax.device_get((h["st_j"], h["result_j"]))
            frame = Frame(
                h["timestamp"], h["feats_j"],
                depth=st["depth"], u_right=st["u_right"],
            )
        else:
            result = jax.device_get(h["result_j"])
            frame = Frame(h["timestamp"], h["feats_j"])
        if self.telemetry is not None:
            self.telemetry.add("result_fetch", _time.perf_counter() - t0)
        cur_seq = self._current_seq
        self._current_seq = h["seq"]
        frame, ok = self._apply_fused_result(
            frame, result, h["cid"], h["cpos"], h["cval"],
            velocity=result.get("velocity"),
        )
        self._current_seq = cur_seq
        if not ok:
            # device chain carried a rejected pose: drop it and mark any
            # newer in-flight frames for synchronous re-tracking
            self._chain = None
            if self._inflight:
                self._inflight_poisoned = True
        return frame

    def flush(self) -> Frame | None:
        """Drain all pipelined in-flight frames (sequence end / mode
        switches). Returns the last finalized frame, if any."""
        out = None
        while self._inflight:
            if self._inflight_poisoned:
                out = self._redo_poisoned() or out
            else:
                got = self._finalize_inflight(self._inflight.pop(0))
                out = got or out
        return out

    def _process_stereo_modular(self, img_l, img_r, timestamp: float) -> Frame:
        # upload each image exactly once (host->device transfers dominate
        # on relay-attached TPUs); callers may pass pre-uploaded jax
        # arrays (e.g. a prefetching loader) to overlap transfer with
        # the previous frame's compute
        jl = _upload_image(img_l)
        jr = _upload_image(img_r)
        # two serial extracts beat a vmapped pair on v5e (batched gathers
        # in selection/descriptor stages dominate): 2 x 16 ms vs 38 ms
        feats_l = orb.extract(jl, self.orb_params)
        feats_r = orb.extract(jr, self.orb_params)
        st = stereo.stereo_match(
            feats_l, feats_r, jl, jr, jnp.float32(self.cfg.bf),
            jnp.float32(self.cfg.bf / 0.5),  # max disparity ~ minZ 0.5m
        )
        feats = {k: np.asarray(v) for k, v in feats_l.items()}
        frame = Frame(
            timestamp, feats,
            depth=np.asarray(st["depth"]), u_right=np.asarray(st["u_right"]),
        )
        self._track(frame)
        return frame

    def process_rgbd(self, img: np.ndarray, depth: np.ndarray,
                     timestamp: float) -> Frame | None:
        """RGB-D per-frame tracking. Steady state runs the fused
        one-program path with on-device depth lookup (pipelined under
        cfg.pipelined) for distortion-free cameras; distorted cameras
        stay modular (host undistortion after raw-pixel depth lookup)."""
        from ..frontend import undistort

        self._current_seq = self.frame_seq
        self.frame_seq += 1
        steady = (
            self.state == State.OK
            and self.ref_kf is not None
            and not undistort.has_distortion(self.cfg.dist_coeffs)
            and (
                self._chain is not None
                or (self.velocity is not None and self.last_frame is not None)
            )
        )
        if self.cfg.pipelined:
            if steady:
                return self._process_rgbd_pipelined(img, depth, timestamp)
            self.flush()
            return self._process_rgbd_modular(img, depth, timestamp)
        if steady and self.velocity is not None and self.last_frame is not None:
            return self._process_rgbd_fused(img, depth, timestamp)
        return self._process_rgbd_modular(img, depth, timestamp)

    def _process_rgbd_fused(self, img, depth, timestamp: float) -> Frame:
        from . import frame_step

        j = _upload_image(img)
        jd = depth if isinstance(depth, jnp.ndarray) \
            else jnp.asarray(depth, jnp.float32)
        last_ids_raw = self.last_frame.map_point_ids
        last_entries = self._entries_from_ids(last_ids_raw[last_ids_raw >= 0])
        lid, lpos, ldesc, llvl, ldist, lval = _pack_map_points(
            last_entries, LOCAL_POINT_CAP
        )
        (cid, cpos, _, _, _, cval), dev = self._local_pack()
        T_pred = (self.velocity @ self.last_frame.T_cw).astype(np.float32)
        feats_j, st_j, result_j = frame_step.track_frame_rgbd(
            self.orb_params,
            (float(self.cfg.search_radius_motion),
             float(self.cfg.search_radius_local)),
            j, jd, jnp.float32(self.cfg.bf), self.cfg.intrinsics,
            jnp.asarray(T_pred),
            jnp.asarray(lpos), jnp.asarray(ldesc), jnp.asarray(llvl),
            jnp.asarray(ldist), jnp.asarray(lval),
            *dev,
        )
        feats, st, result = jax.device_get((feats_j, st_j, result_j))
        frame = Frame(timestamp, feats, depth=st["depth"], u_right=st["u_right"])
        frame, _ = self._apply_fused_result(frame, result, cid, cpos, cval)
        return frame

    def _process_rgbd_pipelined(self, img, depth, timestamp: float):
        from . import frame_step

        if self._inflight and self._inflight_poisoned:
            self._redo_poisoned()
            if self.state != State.OK:
                return self._process_rgbd_modular(img, depth, timestamp)

        j = _upload_image(img)
        jd = depth if isinstance(depth, jnp.ndarray) \
            else jnp.asarray(depth, jnp.float32)
        (cid, cpos, _, _, _, cval), dev = self._local_pack()
        if self._chain is None:
            self._seed_chain()
        feats_j, st_j, result_j, chain = frame_step.track_frame_rgbd_chained(
            self.orb_params,
            (float(self.cfg.search_radius_motion),
             float(self.cfg.search_radius_local)),
            float(self.cfg.velocity_smoothing),
            j, jd, jnp.float32(self.cfg.bf), self.cfg.intrinsics,
            *self._chain, *dev,
        )
        self._inflight.append({
            "mode": "rgbd", "seq": self._current_seq,
            "timestamp": timestamp, "imgs": (j, jd),
            "feats_j": feats_j, "st_j": st_j, "result_j": result_j,
            "cid": cid, "cpos": cpos, "cval": cval,
        })
        _prefetch_to_host((st_j, result_j))
        self._chain = chain
        return self._drain_inflight()

    def _process_rgbd_modular(self, img: np.ndarray, depth: np.ndarray,
                              timestamp: float) -> Frame:
        feats_j = orb.extract(_upload_image(img), self.orb_params)
        feats = {k: np.asarray(v) for k, v in feats_j.items()}
        # depth lookup uses RAW pixel coords (the sensor image); geometry
        # downstream uses undistorted coords (Frame::ComputeStereoFromRGBD)
        xy = feats["xy"].astype(np.int32)
        xs = np.clip(xy[:, 0], 0, depth.shape[1] - 1)
        ys = np.clip(xy[:, 1], 0, depth.shape[0] - 1)
        d = depth[ys, xs].astype(np.float32)
        d = np.where(feats["valid"] > 0, d, -1.0)
        self._undistort_feats(feats)
        ur = np.where(d > 0, feats["xy"][:, 0] - self.cfg.bf / np.maximum(d, 1e-6), -1.0)
        frame = Frame(timestamp, feats, depth=d, u_right=ur)
        self._track(frame)
        return frame

    def process_mono(self, img: np.ndarray, timestamp: float) -> Frame | None:
        """Monocular per-frame tracking. Steady state runs the fused
        one-program path (pipelined under cfg.pipelined) when the camera
        is distortion-free; lens-distorted cameras stay modular (the
        fused program matches raw pixel coords, but geometry needs the
        host-undistorted ones — Frame::UndistortKeyPoints)."""
        from ..frontend import undistort

        self._current_seq = self.frame_seq
        self.frame_seq += 1
        steady = (
            self.state == State.OK
            and self.ref_kf is not None
            and not undistort.has_distortion(self.cfg.dist_coeffs)
            and (
                self._chain is not None
                or (self.velocity is not None and self.last_frame is not None)
            )
        )
        if self.cfg.pipelined:
            if steady:
                return self._process_mono_pipelined(img, timestamp)
            self.flush()
            return self._process_mono_modular(img, timestamp)
        if steady and self.velocity is not None and self.last_frame is not None:
            return self._process_mono_fused(img, timestamp)
        return self._process_mono_modular(img, timestamp)

    def _process_mono_modular(self, img, timestamp: float) -> Frame:
        feats_j = orb.extract(_upload_image(img), self.orb_params)
        feats = {k: np.asarray(v) for k, v in feats_j.items()}
        self._undistort_feats(feats)
        frame = Frame(timestamp, feats)
        self._track(frame, mono=True)
        return frame

    def _process_mono_fused(self, img, timestamp: float) -> Frame:
        from . import frame_step

        j = _upload_image(img)
        last_ids_raw = self.last_frame.map_point_ids
        last_entries = self._entries_from_ids(last_ids_raw[last_ids_raw >= 0])
        lid, lpos, ldesc, llvl, ldist, lval = _pack_map_points(
            last_entries, LOCAL_POINT_CAP
        )
        (cid, cpos, _, _, _, cval), dev = self._local_pack()
        T_pred = (self.velocity @ self.last_frame.T_cw).astype(np.float32)
        feats_j, result_j = frame_step.track_frame_mono(
            self.orb_params,
            (float(self.cfg.search_radius_motion),
             float(self.cfg.search_radius_local)),
            j, self.cfg.intrinsics, jnp.asarray(T_pred),
            jnp.asarray(lpos), jnp.asarray(ldesc), jnp.asarray(llvl),
            jnp.asarray(ldist), jnp.asarray(lval),
            *dev,
        )
        feats, result = jax.device_get((feats_j, result_j))
        frame = Frame(timestamp, feats)
        frame, _ = self._apply_fused_result(frame, result, cid, cpos, cval)
        return frame

    def _undistort_feats(self, feats):
        """Replace raw keypoint pixels with undistorted ones in-place
        (Frame::UndistortKeyPoints). No-op for zero coefficients."""
        from ..frontend import undistort as und

        if not und.has_distortion(self.cfg.dist_coeffs):
            return
        K = np.array(
            [[self.cfg.fx, 0, self.cfg.cx], [0, self.cfg.fy, self.cfg.cy],
             [0, 0, 1.0]], np.float64,
        )
        feats["xy"] = und.undistort_points(
            feats["xy"], K, self.cfg.dist_coeffs
        )

    # ------------------------------------------------------------------
    def _track(self, frame: Frame, mono: bool = False):
        if self.state == State.NOT_INITIALIZED:
            if mono:
                self._initialize_mono(frame)
            else:
                self._initialize_stereo(frame)
        elif self.state == State.LOST:
            ok = (
                self.relocalizer is not None
                and self.relocalizer.try_relocalize(frame)
            )
            if ok:
                ok = self._track_local_map(frame)
            if ok:
                self.state = State.OK
                self.velocity = None
        else:
            ok = self._track_with_motion_model(frame)
            if not ok:
                ok = self._track_reference_keyframe(frame)
            if ok:
                ok = self._track_local_map(frame)
            if ok:
                self.state = State.OK
                self._update_velocity(frame)
                if self._need_new_keyframe(frame):
                    self._create_keyframe(frame)
                self.frames_since_kf += 1
            else:
                self.state = State.LOST
                # reference failure recovery: if tracking is lost right
                # after initialization (<= 5 keyframes), reset the whole
                # map and re-initialize (Tracking.cc:483-491)
                if len(self.map.keyframes) <= 5 and self.relocalizer is None:
                    self.reset()
        self.trajectory.append(
            (frame.timestamp, frame.T_cw.copy(), self.state != State.OK)
        )
        self.last_frame = frame

    def _update_velocity(self, frame: Frame):
        """Constant-velocity model update, optionally smoothed on the
        SE(3) geodesic (velocity_smoothing < 1). The raw model
        (mVelocity = Tcw * LastTwc, Tracking.cc) doubles per-frame
        estimation noise into the next prediction; smoothing keeps the
        feedback gain below the runaway threshold on scenes whose match
        geometry under-constrains some pose directions."""
        if self.last_frame is None:
            return
        v_obs = (frame.T_cw @ self.last_frame.T_wc).astype(np.float32)
        a = float(self.cfg.velocity_smoothing)
        if self.velocity is None or a >= 1.0:
            self.velocity = v_obs
        else:
            from ..ops import lie_np

            self.velocity = lie_np.interp_se3(self.velocity, v_obs, a)

    def reset(self):
        """Full system reset: wipe the map and return to initialization
        (System::Reset / Tracking reset path)."""
        self.map.keyframes.clear()
        self.map.points.clear()
        self.map.objects.clear()
        self.state = State.NOT_INITIALIZED
        self.last_frame = None
        self.velocity = None
        self.ref_kf = None
        self.new_keyframes.clear()
        self._init_ref = None
        self._chain = None
        self._inflight = []
        self._inflight_poisoned = False
        self._local_cache_key = None
        self.frames_since_kf = 0

    # ------------------------------------------------------------------
    def _initialize_mono(self, frame: Frame):
        """Two-view initialization (reference MonocularInitialization,
        Tracking.cc:574-767): hold a reference frame, match against each
        new frame in wide windows, attempt H/F model recovery, spawn the
        first two keyframes + triangulated map points at median depth 1."""
        from . import initializer as init_mod
        from ..frontend import matcher as matcher_mod

        n_valid = int(frame.feats["valid"].sum())
        if getattr(self, "_init_ref", None) is None:
            if n_valid >= 100:
                self._init_ref = frame
            return
        ref = self._init_ref
        if n_valid < 100:
            self._init_ref = None
            return
        idx, _ = matcher_mod.match_in_windows(
            {k: jnp.asarray(v) for k, v in ref.feats.items()},
            {k: jnp.asarray(v) for k, v in frame.feats.items()},
            radius=100.0, max_dist=50, ratio=0.9,
        )
        idx = np.asarray(idx)
        m = np.nonzero(idx >= 0)[0]
        if len(m) < 80:
            self._init_ref = frame   # restart from the newer frame
            return
        p1 = ref.feats["xy"][m]
        p2 = frame.feats["xy"][idx[m]]
        K = np.array(
            [[self.cfg.fx, 0, self.cfg.cx], [0, self.cfg.fy, self.cfg.cy],
             [0, 0, 1.0]]
        )
        out = init_mod.initialize_two_view(p1, p2, K)
        if out is None:
            return
        ref.T_cw = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = out["R"]
        T2[:3, 3] = out["t"]
        frame.T_cw = T2
        kf1 = KeyFrame(ref)
        kf2 = KeyFrame(frame)
        kf1.seq_idx = kf2.seq_idx = self._current_seq
        self.map.add_keyframe(kf1)
        self.map.add_keyframe(kf2)
        good = out["good_mask"]
        for j in np.nonzero(good)[0]:
            kp_ref = int(m[j])
            kp_cur = int(idx[m[j]])
            p = MapPoint(
                out["points3d"][j], ref.feats["desc"][kp_ref], kf1.id,
                int(ref.feats["level"][kp_ref]),
                float(np.linalg.norm(out["points3d"][j])),
            )
            self.map.add_point(p)
            self.map.add_observation(p, kf1, kp_ref)
            self.map.add_observation(p, kf2, kp_cur)
            frame.map_point_ids[kp_cur] = p.id
            ref.map_point_ids[kp_ref] = p.id
        self.map.update_covisibility(kf1)
        self.map.update_covisibility(kf2)
        self.new_keyframes.extend([kf1, kf2])
        self.ref_kf = kf2
        self.last_kf_frame_id = frame.id
        self.frames_since_kf = 0
        self.state = State.OK
        self.velocity = (frame.T_cw @ np.linalg.inv(ref.T_cw)).astype(np.float32)
        self._init_ref = None

    # ------------------------------------------------------------------
    def _initialize_stereo(self, frame: Frame):
        n_valid = int(frame.feats["valid"].sum())
        if n_valid < self.cfg.min_init_features:
            return
        frame.T_cw = np.eye(4, dtype=np.float32)
        # stereo initialization creates a point for EVERY valid-depth
        # keypoint (Tracking::StereoInitialization), not just close ones
        kf = self._spawn_keyframe_with_points(frame, min_points=None)
        if kf is None:
            return
        self.ref_kf = kf
        self.state = State.OK
        self.velocity = np.eye(4, dtype=np.float32)

    # ------------------------------------------------------------------
    def _project_points(self, T_cw, pos):
        pc = pos @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = np.maximum(pc[:, 2], 1e-6)
        u = self.cfg.fx * pc[:, 0] / z + self.cfg.cx
        v = self.cfg.fy * pc[:, 1] / z + self.cfg.cy
        in_img = (
            (pc[:, 2] > 0.1)
            & (u >= 0) & (u < self.cfg.width)
            & (v >= 0) & (v < self.cfg.height)
        )
        return np.stack([u, v], -1).astype(np.float32), in_img

    def _match_and_optimize(self, frame: Frame, entries, radius) -> int:
        """Project candidate map points, match, run pose GN. Returns #inliers."""
        ids, pos, desc, level, dist0, valid = _pack_map_points(
            entries, LOCAL_POINT_CAP
        )
        proj_xy, in_img = self._project_points(frame.T_cw, pos)
        valid = valid * in_img
        if valid.sum() < self.cfg.min_track_matches:
            return 0
        level_pred = predicted_levels(
            level, dist0, pos, frame.T_cw, self.orb_params.scale_factor,
            self.orb_params.n_levels,
        )
        idx, dist = matcher.match_by_projection(
            jnp.asarray(proj_xy), jnp.asarray(valid), jnp.asarray(desc),
            jnp.asarray(level_pred),
            {k: jnp.asarray(v) for k, v in frame.feats.items()},
            radius=radius,
        )
        idx = np.asarray(idx)
        matched = np.nonzero(idx >= 0)[0]
        if len(matched) < self.cfg.min_track_matches:
            return 0
        # resolve conflicts: one keypoint can win several points; keep best
        kp_of = {}
        for m in matched:
            kp = int(idx[m])
            if kp not in kp_of or dist[m] < dist[kp_of[kp]]:
                kp_of[kp] = m
        kp_idx = np.asarray(list(kp_of.keys()), np.int64)
        pt_slot = np.asarray(list(kp_of.values()), np.int64)

        n = len(kp_idx)
        cap = LOCAL_POINT_CAP
        pts_w = np.zeros((cap, 3), np.float32)
        obs = np.zeros((cap, 3), np.float32)
        inv_s2 = np.ones(cap, np.float32)
        vmask = np.zeros(cap, np.float32)
        smask = np.zeros(cap, np.float32)
        pts_w[:n] = pos[pt_slot]
        obs[:n, :2] = frame.feats["xy"][kp_idx]
        ur = frame.u_right[kp_idx] if frame.u_right is not None else -np.ones(n)
        obs[:n, 2] = np.where(ur > 0, ur, 0)
        smask[:n] = (ur > 0).astype(np.float32)
        inv_s2[:n] = 1.0 / frame.feats["sigma2"][kp_idx]
        vmask[:n] = 1.0

        T, inlier, n_in = pose_opt.optimize_pose(
            jnp.asarray(frame.T_cw), jnp.asarray(pts_w), jnp.asarray(obs),
            jnp.asarray(inv_s2), jnp.asarray(vmask), jnp.asarray(smask),
            self.cfg.intrinsics,
        )
        inlier = np.asarray(inlier)[:n] > 0
        frame.T_cw = np.asarray(T)
        frame.map_point_ids[:] = -1
        frame.map_point_ids[kp_idx[inlier]] = ids[pt_slot[inlier]]
        return int(inlier.sum())

    def _track_with_motion_model(self, frame: Frame) -> bool:
        if self.velocity is None or self.last_frame is None:
            return False
        frame.T_cw = (self.velocity @ self.last_frame.T_cw).astype(np.float32)
        entries = self._entries_from_ids(
            self.last_frame.map_point_ids[self.last_frame.map_point_ids >= 0]
        )
        n_in = self._match_and_optimize(frame, entries, self.cfg.search_radius_motion)
        return n_in >= self.cfg.min_inliers

    def _track_reference_keyframe(self, frame: Frame) -> bool:
        if self.ref_kf is None:
            return False
        frame.T_cw = self.ref_kf.T_cw.copy() if self.last_frame is None \
            else self.last_frame.T_cw.copy()
        entries = self._entries_from_ids(
            self.ref_kf.map_point_ids[self.ref_kf.map_point_ids >= 0]
        )
        n_in = self._match_and_optimize(frame, entries, 3 * self.cfg.search_radius_motion)
        return n_in >= self.cfg.min_inliers

    def _track_local_map(self, frame: Frame) -> bool:
        if self.ref_kf is None:
            return False
        kf_ids = self.map.local_keyframes(self.ref_kf, 20)
        entries = self._entries_from_ids(self.map.points_seen_by(kf_ids))
        n_in = self._match_and_optimize(frame, entries, self.cfg.search_radius_local)
        self.n_inliers = n_in
        if entries:
            ids = np.array([e[0] for e in entries])
            pos = np.stack([e[1] for e in entries])
            self._update_point_stats(frame, ids, pos, np.ones(len(ids)))
        # reference accepts local-map tracking only with >= 30 inliers
        return n_in >= max(self.cfg.min_inliers, 30)

    def _entries_from_ids(self, ids):
        entries = []
        for p_id in ids:
            p = self.map.points.get(int(p_id))
            if p is None or p.bad:
                continue
            entries.append(
                (p.id, p.position, p.descriptor, p.level, p.dist_create)
            )
        return entries

    # ------------------------------------------------------------------
    def _update_point_stats(self, frame: Frame, ids, pos, valid):
        """IncreaseVisible for every local candidate in the frustum,
        IncreaseFound for tracked inliers (Tracking::SearchLocalPoints /
        TrackLocalMap). This asymmetry is what lets found_ratio decay
        for stale points: stereo-spawned depths age out of the chi2
        gate after a few metres of travel (reprojection error grows as
        travel/baseline * disparity-noise px, independent of depth), and
        points that stop matching must be culled, not kept as pose-opt
        poison."""
        T = frame.T_cw
        pc = pos @ T[:3, :3].T + T[:3, 3]
        z = pc[:, 2]
        zs = np.where(z > 1e-6, z, 1e-6)
        u = self.cfg.fx * pc[:, 0] / zs + self.cfg.cx
        v = self.cfg.fy * pc[:, 1] / zs + self.cfg.cy
        vis = (
            (np.asarray(valid) > 0) & (z > 0.1)
            & (u >= 0) & (u < self.cfg.width)
            & (v >= 0) & (v < self.cfg.height)
        )
        found = np.isin(ids, frame.map_point_ids[frame.map_point_ids >= 0])
        # steady-state frames pass the cached local pack: use its
        # pre-resolved object refs (ids[i] == objs[i].id by construction)
        # instead of ~2k dict lookups per frame; any other ids array
        # (modular fallback path) resolves through the map
        cache = getattr(self, "_local_cache", None)
        objs = (
            self._local_cache_objs
            if cache is not None and ids is cache[0]
            else None
        )
        for i in np.nonzero(vis)[0]:
            p = (
                objs[i] if objs is not None
                else self.map.points.get(int(ids[i]))
            )
            if p is not None:
                p.n_visible += 1
                if found[i]:
                    p.n_found += 1

    def _need_new_keyframe(self, frame: Frame) -> bool:
        """Keyframe policy (Tracking::NeedNewKeyFrame): insert when enough
        frames have passed, or when tracking support has visibly decayed
        relative to the reference keyframe AND a minimum spacing has
        elapsed — inserting on every weak frame cascades (each fresh
        keyframe resets the 75% baseline, spawns points and reruns BA,
        which weakens the next frame in turn)."""
        if self.localization_only or self.ref_kf is None:
            return False
        if self.frames_since_kf >= self.cfg.max_frames_between_kf:
            return True
        if self.frames_since_kf < max(self.cfg.min_frames_between_kf, 2):
            return False
        # decay-rule insertions require the local mapper to be idle
        # (reference NeedNewKeyFrame's AcceptKeyFrames() gate): with
        # async keyframe spreading, tracked counts dip until the
        # previous keyframe's triangulated points apply, and inserting
        # on that dip cascades keyframes
        if self.mapper_idle_fn is not None and not self.mapper_idle_fn():
            return False
        ref_matches = int((self.ref_kf.map_point_ids >= 0).sum())
        tracked = int((frame.map_point_ids >= 0).sum())
        if frame.depth is not None:
            close_untracked = (
                (frame.depth > 0)
                & (frame.depth < self.cfg.depth_threshold)
                & (frame.map_point_ids < 0)
            ).sum()
            if tracked < 100 and close_untracked > 70:
                return True
        return tracked < 0.5 * ref_matches and tracked > 15

    def _spawn_keyframe_with_points(self, frame: Frame, min_points=100):
        kf = KeyFrame(frame)
        kf.seq_idx = self._current_seq
        self.map.add_keyframe(kf)
        # carry over tracked points
        for kp_idx in np.nonzero(frame.map_point_ids >= 0)[0]:
            p = self.map.points.get(int(frame.map_point_ids[kp_idx]))
            if p is not None and not p.bad:
                self.map.add_observation(p, kf, int(kp_idx))
        # spawn new close points from stereo depth (Tracking.cc:1118-1160)
        if frame.depth is not None:
            depth = frame.depth
            candidates = np.nonzero(
                (depth > 0) & (frame.feats["valid"] > 0)
                & (frame.map_point_ids < 0)
            )[0]
            order = candidates[np.argsort(depth[candidates])]
            created = 0
            T_wc = frame.T_wc
            for kp_idx in order:
                z = float(depth[kp_idx])
                if (
                    min_points is not None
                    and z > self.cfg.depth_threshold
                    and created >= min_points
                ):
                    break
                u, v = frame.feats["xy"][kp_idx]
                xc = np.array(
                    [(u - self.cfg.cx) * z / self.cfg.fx,
                     (v - self.cfg.cy) * z / self.cfg.fy, z, 1.0], np.float32
                )
                xw = (T_wc @ xc)[:3]
                p = MapPoint(xw, frame.feats["desc"][kp_idx], kf.id,
                             int(frame.feats["level"][kp_idx]), z)
                self.map.add_point(p)
                self.map.add_observation(p, kf, int(kp_idx))
                frame.map_point_ids[kp_idx] = p.id
                created += 1
        self.map.update_covisibility(kf)
        self.new_keyframes.append(kf)
        self.last_kf_frame_id = frame.id
        self.frames_since_kf = 0
        return kf

    def _create_keyframe(self, frame: Frame):
        kf = self._spawn_keyframe_with_points(frame)
        self.ref_kf = kf
        return kf
