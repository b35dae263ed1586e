"""System facade: wiring tracker + local mapper + object pipeline + savers.

The counterpart of the reference's System class (/root/reference/src/
System.cc) minus the thread/GIL machinery: one host loop drives the
stages per frame. Output artifacts reproduce the reference's three text
formats byte-for-byte in layout (System_util.cc:108-149):
MapPoints.txt (xyz per line), MapObjects.txt (id / 3x4 Sim(3) Two row /
64-float code row), Cameras.txt (KITTI 3x4 T_wc rows, lost frames
skipped).
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..frontend import orb
from .local_mapping import LocalMapper, LocalMapperConfig
from .map import Map
from .tracking import State, Tracker, TrackerConfig


class SLAMSystem:
    def __init__(
        self,
        tracker_cfg: TrackerConfig | None = None,
        orb_params: orb.ORBParams | None = None,
        object_pipeline_factory=None,
        detection_source=None,
        local_mapper_cfg: LocalMapperConfig | None = None,
    ):
        self.map = Map()
        self.tracker_cfg = tracker_cfg or TrackerConfig()
        self.tracker = Tracker(
            self.tracker_cfg, self.map, orb_params or orb.ORBParams()
        )
        lm_cfg = local_mapper_cfg or LocalMapperConfig(
            fx=self.tracker_cfg.fx, fy=self.tracker_cfg.fy,
            cx=self.tracker_cfg.cx, cy=self.tracker_cfg.cy,
            bf=self.tracker_cfg.bf,
        )
        object_pipeline = (
            object_pipeline_factory(self.map) if object_pipeline_factory else None
        )
        self.local_mapper = LocalMapper(self.map, lm_cfg, object_pipeline)
        # NeedNewKeyFrame's AcceptKeyFrames() gate (Tracking.cc): weak-
        # tracking KF insertion waits for pending mapping work to apply
        self.tracker.mapper_idle_fn = self.local_mapper.accepting_keyframes
        self.detection_source = detection_source   # fn(frame_idx) -> list[Detection]
        self.loop_closer = None
        self.vocabulary = None
        self.kf_db = None
        self.frame_idx = 0
        self.telemetry = None          # optional utils.timing.StageTimer

    def attach_telemetry(self, timer):
        """Per-stage wall-clock attribution (dsp_slam.cc:76-115 chrono
        prints): every track_* call splits into tracker dispatch+fetch,
        keyframe drain (detectors + object GN + triangulation dispatch)
        and background poll (deferred applies). The local mapper adds
        its sub-stage spans to the same timer — together they make the
        benchmark artifact self-attributing (a slow run shows WHERE)."""
        self.telemetry = timer
        self.local_mapper.telemetry = timer
        self.tracker.telemetry = timer

    def attach_vocabulary(self, vocabulary):
        """Always-on KeyFrameDatabase + Relocalizer. The reference takes
        the vocabulary as a constructor argument and relocalization works
        in ALL modalities via the always-present database
        (System.cc:76-87, Tracking.cc:1374) — loop CLOSING stays opt-in
        and stereo-only (System.cc:124-132; use enable_loop_closing).
        Every new keyframe's BoW vector is added to the database; culled
        keyframes are compacted out (KeyFrameDatabase.cc erase parity)."""
        from ..place.vocabulary import KeyFrameDatabase
        from .relocalization import Relocalizer

        if self.vocabulary is vocabulary and self.kf_db is not None:
            return
        self.vocabulary = vocabulary
        self.kf_db = KeyFrameDatabase(vocabulary)
        self.map.keyframe_erase_hooks.append(self.kf_db.erase)
        c = self.tracker_cfg
        self.tracker.relocalizer = Relocalizer(
            self.map, vocabulary, self.kf_db,
            [c.fx, c.fy, c.cx, c.cy, c.bf],
        )

    def enable_loop_closing(self, vocabulary, fix_scale: bool = True):
        """Attach a loop closer (stereo default: fixed scale). The
        reference only runs LoopClosing for stereo (System.cc:124-132).
        Shares the always-on KeyFrameDatabase with the relocalizer."""
        from ..place.loop_closing import LoopCloser

        self.attach_vocabulary(vocabulary)
        c = self.tracker_cfg
        self.loop_closer = LoopCloser(
            self.map, vocabulary,
            [c.fx, c.fy, c.cx, c.cy, c.bf], fix_scale=fix_scale,
            db=self.kf_db,
        )

    # ------------------------------------------------------------------
    def track_stereo(self, img_l, img_r, timestamp: float):
        return self._track_common(
            lambda: self.tracker.process_stereo(img_l, img_r, timestamp)
        )

    def track_mono(self, img, timestamp: float):
        return self._track_common(
            lambda: self.tracker.process_mono(img, timestamp)
        )

    def track_rgbd(self, img, depth, timestamp: float):
        return self._track_common(
            lambda: self.tracker.process_rgbd(img, depth, timestamp)
        )

    def _track_common(self, track_fn):
        tel = self.telemetry
        if tel is None:
            frame = track_fn()
            self._drain_keyframes()
            self._poll_background()
        else:
            t0 = time.perf_counter()
            frame = track_fn()
            t1 = time.perf_counter()
            tel.add("track", t1 - t0)
            self._drain_keyframes()
            t2 = time.perf_counter()
            if t2 - t1 > 1e-4:          # only frames that did KF work
                tel.add("keyframe_drain", t2 - t1)
            self._poll_background()
            t3 = time.perf_counter()
            if t3 - t2 > 1e-4:
                tel.add("background_poll", t3 - t2)
        self.frame_idx += 1
        return frame

    def _poll_background(self):
        """One deferred-stage step per frame (async local mapping /
        backgrounded global BA)."""
        self.local_mapper.poll()
        if self.loop_closer is not None:
            self.loop_closer.poll()

    def flush(self):
        """Drain any pipelined in-flight frame, pending async BA and
        backgrounded GBA (sequence end). No-op in synchronous mode."""
        frame = self.tracker.flush()
        if frame is not None:
            self._drain_keyframes()
        self.local_mapper.flush()
        if self.loop_closer is not None:
            self.loop_closer.flush()
        return frame

    def activate_localization_mode(self):
        """Tracking-only: stop mapping, keep localizing against the
        current (frozen) map (System::ActivateLocalizationMode)."""
        self.tracker.localization_only = True

    def deactivate_localization_mode(self):
        self.tracker.localization_only = False

    def _drain_keyframes(self):
        while self.tracker.new_keyframes:
            kf = self.tracker.new_keyframes.pop(0)
            if self.loop_closer is not None:
                # a backgrounded GBA must land before new mapping work
                # packs the poses it will overwrite
                self.loop_closer.flush()
            if self.detection_source is not None:
                # kf.seq_idx: the track_* call that produced this KF — in
                # pipelined mode keyframes surface one call later, so
                # self.frame_idx would be off by one
                idx = kf.seq_idx if kf.seq_idx >= 0 else self.frame_idx
                kf.detections = self.detection_source(idx) or []
            if self.kf_db is not None and self.loop_closer is None:
                # no loop closer to do it: index the keyframe for
                # relocalization (Tracking.cc ComputeBoW + KFDB add)
                bow = self.vocabulary.bow_vector(
                    kf.feats["desc"], kf.feats["valid"]
                )
                kf.bow = bow
                self.kf_db.add(kf.id, bow)
            self.local_mapper.process(kf)
            if self.loop_closer is not None:
                if self.loop_closer.insert_keyframe(kf):
                    # the loop correction rewrote the poses the pending
                    # BA solve was computed from (reference mbAbortBA)
                    self.local_mapper.drop_pending_ba()
        # keyframe culling may have invalidated the tracker's reference
        ref = self.tracker.ref_kf
        if ref is not None and (ref.bad or ref.id not in self.map.keyframes):
            good = [k for k in sorted(self.map.keyframes) if not self.map.keyframes[k].bad]
            self.tracker.ref_kf = self.map.keyframes[good[-1]] if good else None

    # ------------------------------------------------------------------
    @property
    def state(self):
        return self.tracker.state

    def keyframe_poses(self):
        return {
            kf_id: kf.T_cw.copy()
            for kf_id, kf in sorted(self.map.keyframes.items())
        }

    # ------------------------------------------------------------------
    # savers (System_util.cc:108-149 formats)
    def save_map(self, out_dir: str):
        self.local_mapper.flush()      # saved map includes the last BA solve
        if self.loop_closer is not None:
            self.loop_closer.flush()
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "MapPoints.txt"), "w") as f:
            for p in self.map.points.values():
                if p.bad:
                    continue
                f.write(
                    f"{p.position[0]:.9f} {p.position[1]:.9f} {p.position[2]:.9f}\n"
                )
        with open(os.path.join(out_dir, "MapObjects.txt"), "w") as f:
            for obj_id in sorted(self.map.objects):
                obj = self.map.objects[obj_id]
                if obj.bad or obj.dynamic:
                    continue
                f.write(f"{obj.id}\n")
                Two = obj.T_wo
                f.write(
                    " ".join(f"{Two[i, j]:.9f}" for i in range(3) for j in range(4))
                    + "\n"
                )
                f.write(" ".join(f"{c:.9f}" for c in obj.code) + "\n")
        self.save_trajectory_kitti(os.path.join(out_dir, "Cameras.txt"))

    def save_map_current_frame(self, out_dir: str, frame_idx: int):
        """Per-frame incremental map dump (System::SaveMapCurrentFrame,
        System_util.cc:23-107): same three files, into a frame-numbered
        subdirectory."""
        self.save_map(os.path.join(out_dir, f"{frame_idx:06d}"))

    def save_trajectory_kitti(self, path: str):
        """KITTI format: 3x4 T_wc per tracked frame, lost frames skipped."""
        with open(path, "w") as f:
            for ts, T_cw, lost in self.tracker.trajectory:
                if lost:
                    continue
                R = T_cw[:3, :3]
                t = T_cw[:3, 3]
                Rwc = R.T
                twc = -Rwc @ t
                vals = np.concatenate([Rwc, twc[:, None]], axis=1).reshape(-1)
                f.write(" ".join(f"{v:.9f}" for v in vals) + "\n")

    def reset(self):
        """Full system reset (System::Reset): wipe the map, drop all
        deferred work, return to initialization."""
        self.local_mapper.drop_pending_ba()
        self.tracker.reset()
        if self.loop_closer is not None:
            self.loop_closer.flush()
        self.frame_idx = 0

    def shutdown(self):
        """System::Shutdown: drain all pipelines; the map/trajectory
        savers remain callable afterwards."""
        self.flush()

    def map_changed(self) -> bool:
        """System::MapChanged: True once after big map updates (loop
        closure / GBA / reset), tracked via the loop-closure counter and
        map cardinality."""
        state = (
            len(self.map.keyframes), len(self.map.points),
            self.loop_closer.loops_closed if self.loop_closer else 0,
        )
        changed = state != getattr(self, "_last_map_state", None)
        self._last_map_state = state
        return changed

    def save_keyframe_trajectory_tum(self, path: str):
        """TUM format over KEYFRAME poses only
        (System::SaveKeyFrameTrajectoryTUM, System.cc)."""
        from scipy.spatial.transform import Rotation

        with open(path, "w") as f:
            for kf_id in sorted(self.map.keyframes):
                kf = self.map.keyframes[kf_id]
                if kf.bad:
                    continue
                R = kf.T_cw[:3, :3].T
                t = -R @ kf.T_cw[:3, 3]
                q = Rotation.from_matrix(R).as_quat()
                f.write(
                    f"{kf.timestamp:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )

    def save_trajectory_tum(self, path: str):
        """TUM format: timestamp tx ty tz qx qy qz qw (System.cc:374-420)."""
        from scipy.spatial.transform import Rotation

        with open(path, "w") as f:
            for ts, T_cw, lost in self.tracker.trajectory:
                if lost:
                    continue
                R = T_cw[:3, :3].T
                t = -R @ T_cw[:3, 3]
                q = Rotation.from_matrix(R).as_quat()  # x, y, z, w
                f.write(
                    f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
                )
