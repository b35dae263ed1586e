"""Loop closing with objects: detect -> Sim(3) -> correct -> pose graph -> GBA.

Host orchestration of the reference's LoopClosing thread
(/root/reference/src/LoopClosing.cc + LoopClosing_util.cc):

* DetectLoop: BoW candidates above the covisible-minimum score, required
  to persist over `consistency` consecutive keyframes (LoopClosing.cc:
  113-239's covisibility-consistency groups, simplified to candidate-id
  persistence);
* ComputeSim3: brute-force descriptor matching between the two keyframes'
  map points, Horn RANSAC (fixed scale for stereo), acceptance by inlier
  count (Sim3Solver RANSAC + OptimizeSim3 of the reference);
* CorrectLoopWithObjects: propagate the corrected Sim(3) through the
  current keyframe's covisibility group, moving keyframes, map points
  AND map objects (LoopClosing_util.cc:69-152), fuse duplicate objects
  by centroid distance (SearchAndFuseObjects, <2 m replace,
  LoopClosing_util.cc:221-293), then optimize the essential graph and
  run a global joint BA (RunGlobalJointBundleAdjustment).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..backend import ba, pose_graph
from ..frontend import matcher
from ..ops import lie
from ..slam.map import Map
from . import sim3 as sim3_mod
from .vocabulary import KeyFrameDatabase, Vocabulary

GBA_KF_CAP = 32
GBA_PT_CAP = 4096
GBA_OBS_CAP = 16384
PG_KF_CAP = 128
PG_EDGE_CAP = 512
OBJ_FUSE_DIST = 2.0


class LoopCloser:
    def __init__(
        self,
        slam_map: Map,
        voc: Vocabulary,
        intrinsics,
        fix_scale: bool = True,
        consistency: int = 3,
        min_matches: int = 15,
    ):
        self.map = slam_map
        self.voc = voc
        self.db = KeyFrameDatabase(voc)
        self.intrinsics = jnp.asarray(intrinsics)
        self.fix_scale = fix_scale
        self.consistency = consistency
        self.min_matches = min_matches
        self.last_loop_kf_id = -1
        self._consistent: dict[int, int] = {}   # candidate kf_id -> streak
        self.loops_closed = 0

    # ------------------------------------------------------------------
    def insert_keyframe(self, kf) -> bool:
        """Returns True if a loop was closed on this keyframe."""
        bow = self.voc.bow_vector(kf.feats["desc"], kf.feats["valid"])
        kf.bow = bow
        closed = False
        cand = self._detect(kf, bow)
        if cand is not None:
            result = self._compute_sim3(kf, cand)
            if result is not None:
                S_cw_corr, loop_kf = result
                self._correct_loop(kf, loop_kf, S_cw_corr)
                closed = True
                self.loops_closed += 1
                self.last_loop_kf_id = kf.id
        self.db.add(kf.id, bow)
        return closed

    # ------------------------------------------------------------------
    def _detect(self, kf, bow):
        if kf.id < self.last_loop_kf_id + 10 or len(self.db.vectors) < 5:
            self._consistent = {}
            return None
        neighbors = set(kf.covis) | {kf.id}
        min_score = min(
            (
                Vocabulary.score(bow, self.map.keyframes[n].bow)
                for n in kf.covis
                if n in self.map.keyframes
                and self.map.keyframes[n].bow is not None
            ),
            default=0.3,
        )
        cands = self.db.query(bow, max(min_score, 0.05), exclude=neighbors)
        new_consistent = {}
        chosen = None
        for cand_id, _score in cands[:10]:
            # consistency streak: candidate (or its covis group) seen before
            cand_kf = self.map.keyframes.get(cand_id)
            if cand_kf is None or cand_kf.bad:
                continue
            group = set(cand_kf.covis) | {cand_id}
            streak = 1 + max(
                (self._consistent.get(g, 0) for g in group), default=0
            )
            for g in group:
                new_consistent[g] = max(new_consistent.get(g, 0), streak)
            if streak >= self.consistency and chosen is None:
                chosen = cand_kf
        self._consistent = new_consistent
        return chosen

    # ------------------------------------------------------------------
    def _compute_sim3(self, kf, cand_kf):
        idx, _ = matcher.match_features(
            {k: jnp.asarray(v) for k, v in kf.feats.items()},
            {k: jnp.asarray(v) for k, v in cand_kf.feats.items()},
            max_dist=matcher.TH_LOW,
        )
        idx = np.asarray(idx)
        p_cur, p_cand = [], []
        for i in np.nonzero(idx >= 0)[0]:
            pid_cur = kf.map_point_ids[i]
            pid_cand = cand_kf.map_point_ids[idx[i]]
            if pid_cur < 0 or pid_cand < 0:
                continue
            pc = self.map.points.get(int(pid_cur))
            pm = self.map.points.get(int(pid_cand))
            if pc is None or pm is None or pc.bad or pm.bad:
                continue
            x_cur = kf.T_cw[:3, :3] @ pc.position + kf.T_cw[:3, 3]
            x_cand = cand_kf.T_cw[:3, :3] @ pm.position + cand_kf.T_cw[:3, 3]
            p_cur.append(x_cur)
            p_cand.append(x_cand)
        if len(p_cur) < self.min_matches:
            return None
        S_12, inliers = sim3_mod.ransac_sim3(
            np.asarray(p_cur), np.asarray(p_cand), self.fix_scale,
            min_inliers=self.min_matches,
        )
        if S_12 is None:
            return None
        # corrected current pose: world -> cand cam -> current cam
        S_cw_corr = (S_12 @ cand_kf.T_cw).astype(np.float32)
        return S_cw_corr, cand_kf

    # ------------------------------------------------------------------
    def _correct_loop(self, kf, loop_kf, S_cw_corr):
        """Propagate correction through the covisibility group, correct
        points + objects, fuse objects, optimize the essential graph."""
        group = [kf.id] + list(kf.covis)
        T_cw_old = kf.T_cw.copy()
        corrections = {}   # kf_id -> (S_iw_old, S_iw_corr)
        for kf_id in group:
            okf = self.map.keyframes.get(kf_id)
            if okf is None or okf.bad:
                continue
            T_ic = okf.T_cw @ np.linalg.inv(T_cw_old)
            S_iw_corr = (T_ic @ S_cw_corr).astype(np.float32)
            corrections[kf_id] = (okf.T_cw.copy(), S_iw_corr)

        # move points observed by the group (once each)
        moved_pts = set()
        for kf_id, (T_old, S_new) in corrections.items():
            okf = self.map.keyframes[kf_id]
            S_wi_new = np.asarray(lie.inverse_sim3(jnp.asarray(S_new)))
            for p_id in okf.map_point_ids:
                if p_id < 0 or p_id in moved_pts:
                    continue
                p = self.map.points.get(int(p_id))
                if p is None or p.bad:
                    continue
                x_i = T_old[:3, :3] @ p.position + T_old[:3, 3]
                p.position = (S_wi_new[:3, :3] @ x_i + S_wi_new[:3, 3]).astype(
                    np.float32
                )
                moved_pts.add(p_id)
            # move objects observed by the group (LoopClosing_util.cc:131-146)
            for obj_id in set(okf.object_associations.values()):
                obj = self.map.objects.get(obj_id)
                if obj is None or obj.bad or obj_id in moved_pts:
                    continue
                T_io = T_old @ obj.T_wo_se3       # camera_i <- object (old world)
                T_wo_new = S_wi_new @ T_io
                s_new = float(np.linalg.det(T_wo_new[:3, :3])) ** (1 / 3)
                T_se3 = T_wo_new.copy()
                T_se3[:3, :3] /= s_new
                obj.set_pose_se3(T_se3.astype(np.float32), obj.scale * s_new)
                moved_pts.add(obj_id)
            okf.T_cw = S_new  # Sim(3) folded into pose (scale ~1 for stereo)

        kf.loop_edges.add(loop_kf.id)
        loop_kf.loop_edges.add(kf.id)
        self._fuse_objects()
        self._optimize_essential_graph(kf, loop_kf, corrections)
        self._global_ba()

    # ------------------------------------------------------------------
    def _fuse_objects(self):
        """Merge map objects whose centers coincide (<2 m)."""
        objs = [o for o in self.map.objects.values() if not o.bad]
        for i in range(len(objs)):
            for j in range(i + 1, len(objs)):
                a, b = objs[i], objs[j]
                if a.bad or b.bad:
                    continue
                d = np.linalg.norm(a.T_wo[:3, 3] - b.T_wo[:3, 3])
                if d < OBJ_FUSE_DIST:
                    keep, drop = (a, b) if a.id < b.id else (b, a)
                    self.map.replace_object(drop, keep)

    # ------------------------------------------------------------------
    def _optimize_essential_graph(self, kf, loop_kf, corrections):
        kf_ids = sorted(self.map.keyframes)[:PG_KF_CAP]
        slot = {k: i for i, k in enumerate(kf_ids)}
        K = PG_KF_CAP
        poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        fixed = np.ones(K, np.float32)
        for k, i in slot.items():
            poses[i] = self.map.keyframes[k].T_cw
            fixed[i] = 0.0
        if loop_kf.id in slot:
            fixed[slot[loop_kf.id]] = 1.0

        E = PG_EDGE_CAP
        edge_i = np.zeros(E, np.int32)
        edge_j = np.zeros(E, np.int32)
        edge_meas = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
        edge_valid = np.zeros(E, np.float32)
        n = 0

        def add_edge(i_id, j_id, meas):
            nonlocal n
            if n >= E or i_id not in slot or j_id not in slot:
                return
            edge_i[n] = slot[i_id]
            edge_j[n] = slot[j_id]
            edge_meas[n] = meas
            edge_valid[n] = 1.0
            n += 1

        for k in kf_ids:
            okf = self.map.keyframes[k]
            # spanning-tree edge
            if okf.parent is not None and okf.parent in slot:
                pkf = self.map.keyframes[okf.parent]
                meas = okf.T_cw @ np.asarray(
                    lie.inverse_sim3(jnp.asarray(pkf.T_cw))
                )
                add_edge(k, okf.parent, meas)
            # loop edges
            for l in okf.loop_edges:
                if l < k and l in slot:
                    lkf = self.map.keyframes[l]
                    meas = okf.T_cw @ np.asarray(
                        lie.inverse_sim3(jnp.asarray(lkf.T_cw))
                    )
                    add_edge(k, l, meas)
            # strong covisibility
            for other, w in okf.covis.items():
                if w >= 100 and other < k:
                    o = self.map.keyframes.get(other)
                    if o is None:
                        continue
                    meas = okf.T_cw @ np.asarray(
                        lie.inverse_sim3(jnp.asarray(o.T_cw))
                    )
                    add_edge(k, other, meas)

        if n < 2:
            return
        out = pose_graph.optimize_pose_graph(
            jnp.asarray(poses), jnp.asarray(fixed), jnp.asarray(edge_i),
            jnp.asarray(edge_j), jnp.asarray(edge_meas), jnp.asarray(edge_valid),
        )
        new_poses = np.asarray(out)
        for k, i in slot.items():
            if fixed[i] == 0.0:
                okf = self.map.keyframes[k]
                S_old = okf.T_cw.copy()
                S_new = new_poses[i]
                okf.T_cw = S_new
                # drag this keyframe's points along
                S_wi_new = np.asarray(lie.inverse_sim3(jnp.asarray(S_new)))
                for p_id in okf.map_point_ids:
                    p = self.map.points.get(int(p_id)) if p_id >= 0 else None
                    if p is None or p.bad or p.ref_kf_id != k:
                        continue
                    x_i = S_old[:3, :3] @ p.position + S_old[:3, 3]
                    p.position = (
                        S_wi_new[:3, :3] @ x_i + S_wi_new[:3, 3]
                    ).astype(np.float32)

    # ------------------------------------------------------------------
    def _global_ba(self):
        """Global joint BA over (capped) keyframes and points."""
        kf_ids = sorted(self.map.keyframes)[:GBA_KF_CAP]
        slot = {k: i for i, k in enumerate(kf_ids)}
        K = GBA_KF_CAP
        kf_poses = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        kf_fixed = np.ones(K, np.float32)
        for k, i in slot.items():
            kf_poses[i] = self.map.keyframes[k].T_cw
            kf_fixed[i] = 0.0
        kf_fixed[slot[min(kf_ids)]] = 1.0

        pt_ids = self.map.points_seen_by(kf_ids)[:GBA_PT_CAP]
        pslot = {p: i for i, p in enumerate(pt_ids)}
        P = GBA_PT_CAP
        points = np.zeros((P, 3), np.float32)
        pt_valid = np.zeros(P, np.float32)
        for p, i in pslot.items():
            points[i] = self.map.points[p].position
            pt_valid[i] = 1.0

        O = GBA_OBS_CAP
        obs = np.zeros((O, 3), np.float32)
        obs_kf = np.zeros(O, np.int32)
        obs_pt = np.zeros(O, np.int32)
        obs_stereo = np.zeros(O, np.float32)
        obs_is2 = np.ones(O, np.float32)
        obs_valid = np.zeros(O, np.float32)
        m = 0
        for p, i in pslot.items():
            mp = self.map.points[p]
            for kf_id, kp in mp.observations.items():
                if kf_id not in slot or m >= O:
                    continue
                okf = self.map.keyframes[kf_id]
                obs_kf[m] = slot[kf_id]
                obs_pt[m] = i
                obs[m, :2] = okf.feats["xy"][kp]
                ur = okf.u_right[kp] if okf.u_right is not None else -1
                if ur > 0:
                    obs[m, 2] = ur
                    obs_stereo[m] = 1.0
                obs_is2[m] = 1.0 / okf.feats["sigma2"][kp]
                obs_valid[m] = 1.0
                m += 1
        if m < 50:
            return
        out = ba.bundle_adjust(
            jnp.asarray(kf_poses), jnp.asarray(kf_fixed), jnp.asarray(points),
            jnp.asarray(pt_valid), jnp.asarray(obs_kf), jnp.asarray(obs_pt),
            jnp.asarray(obs), jnp.asarray(obs_stereo), jnp.asarray(obs_is2),
            jnp.asarray(obs_valid), self.intrinsics, 1e-3, None, (10,),
        )
        new_poses = np.asarray(out["kf_poses"])
        for k, i in slot.items():
            if kf_fixed[i] == 0.0:
                self.map.keyframes[k].T_cw = new_poses[i]
        new_pts = np.asarray(out["points"])
        for p, i in pslot.items():
            self.map.points[p].position = new_pts[i]
