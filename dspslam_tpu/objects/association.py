"""Detection -> MapObject data association.

Host-side re-expression of the reference's two association mechanisms:

* centroid gating (Tracking::ObjectDataAssociation, Tracking_util.cc:
  59-152): each new detection matches the nearest local map object by
  horizontal (x, z) camera-frame distance, with a 5 m gate, constant-
  velocity prediction for dynamic objects, and best-detection-wins when
  two detections compete for one object;
* map-point voting (Tracking::AssociateObjectsByProjection,
  Tracking_util.cc:209-287, mono): keypoints inside the detection mask
  vote with their map points' object ids.
"""

from __future__ import annotations

import numpy as np

ASSOC_GATE = 5.0       # meters, loose association gate
MIN_PTS_ASSOCIATED = 25
MIN_PTS_NEW = 50


def associate_detections_centroid(
    kf,                      # slam.map.KeyFrame with .detections set
    local_objects: list,     # list of MapObject candidates
    T_cw: np.ndarray,
    frame_gap: float = 1.0,
):
    """Greedy nearest-centroid gating. Mutates kf.object_associations and
    returns (assoc: {det_idx: object}, new_det_indices, bad_det_indices)."""
    assoc: dict[int, object] = {}
    new_dets: list[int] = []
    bad_dets: list[int] = []
    if not kf.detections:
        return assoc, new_dets, bad_dets
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    best_dist_per_obj: dict[int, tuple[float, int]] = {}  # obj id -> (dist, det)

    for i, det in enumerate(kf.detections):
        t_det = det.T_cam_obj[:3, 3]
        best_obj, best_d = None, np.inf
        for obj in local_objects:
            if obj is None or obj.bad:
                continue
            two = obj.T_wo[:3, 3]
            if obj.dynamic:
                two = two + obj.velocity * frame_gap
            d3 = R @ two + t - t_det
            d = float(np.hypot(d3[0], d3[2]))
            if d < best_d:
                best_d, best_obj = d, obj
        if best_obj is not None and best_d < ASSOC_GATE:
            if det.num_surface_points < MIN_PTS_ASSOCIATED:
                bad_dets.append(i)
            prev = best_dist_per_obj.get(best_obj.id)
            if prev is None or best_d < prev[0]:
                if prev is not None:
                    # previous winner becomes new
                    assoc.pop(prev[1], None)
                    new_dets.append(prev[1])
                best_dist_per_obj[best_obj.id] = (best_d, i)
                assoc[i] = best_obj
            else:
                new_dets.append(i)
        else:
            new_dets.append(i)
            if det.num_surface_points < MIN_PTS_NEW:
                bad_dets.append(i)

    for det_idx, obj in assoc.items():
        kf.object_associations[det_idx] = obj.id
        obj.observations[kf.id] = det_idx
    return assoc, new_dets, bad_dets


def associate_by_map_point_votes(
    kf, frame_map_point_ids: np.ndarray, kp_in_mask: list[np.ndarray], points, objects
):
    """Mono path: for each detection, keypoints inside its mask vote with
    their map-point object ids; majority wins (Tracking_util.cc:209-287).

    kp_in_mask: per-detection boolean array over frame keypoints.
    Returns {det_idx: object_id_or_-1_for_new}.
    """
    out = {}
    for i, in_mask in enumerate(kp_in_mask):
        votes: dict[int, int] = {}
        for kp_idx in np.nonzero(in_mask)[0]:
            p_id = frame_map_point_ids[kp_idx]
            if p_id < 0:
                continue
            p = points.get(p_id)
            if p is None or p.bad or not p.in_any_object:
                continue
            votes[p.object_id] = votes.get(p.object_id, 0) + 1
        if votes:
            best = max(votes, key=votes.get)
            if votes[best] >= 5 and best in objects and not objects[best].bad:
                out[i] = best
                continue
        out[i] = -1
    return out


def classify_motion(
    obj, T_co_measured: np.ndarray, T_cw: np.ndarray, frame_gap: float,
    translation_thresh: float = 1.0,
):
    """Static/dynamic classification from the pose-only GN result
    (LocalMapping::GetNewObservations, LocalMapping_util.cc:117-151):
    if the newly measured object center moved more than `thresh` against
    the map prediction, flag dynamic and update the velocity estimate."""
    T_wc = np.linalg.inv(T_cw)
    two_measured = (T_wc @ T_co_measured)[:3, 3]
    two_map = obj.T_wo[:3, 3]
    motion = two_measured - two_map
    dist = float(np.linalg.norm(motion))
    if dist > translation_thresh:
        obj.dynamic = True
        obj.velocity = motion / max(frame_gap, 1e-6)
        return True
    return False
