"""SLAM map checkpoint / resume.

The reference has no state resume — its outputs are restart-from-zero
text artifacts (SURVEY.md §5). Here the full map (keyframes with feature
arrays, map points with observation graphs, objects with codes and
meshes) round-trips through one compressed npz, so a mapping session can
be suspended, inspected, or continued (e.g. localization-only runs
against a prebuilt map).
"""

from __future__ import annotations

import numpy as np

from .map import KeyFrame, Map, MapObject, MapPoint

_FEAT_KEYS = ("xy", "desc", "angle", "level", "sigma2", "response", "valid")


def save_state(slam_map: Map, path: str):
    data = {}
    kf_ids = sorted(k for k, kf in slam_map.keyframes.items() if not kf.bad)
    data["kf_ids"] = np.asarray(kf_ids, np.int64)
    for i, kf_id in enumerate(kf_ids):
        kf = slam_map.keyframes[kf_id]
        data[f"kf{i}_T_cw"] = kf.T_cw
        data[f"kf{i}_mpids"] = kf.map_point_ids
        data[f"kf{i}_ts"] = np.float64(kf.timestamp)
        data[f"kf{i}_parent"] = np.int64(kf.parent if kf.parent is not None else -1)
        data[f"kf{i}_covis"] = np.asarray(
            [[k, v] for k, v in kf.covis.items()], np.int64
        ).reshape(-1, 2)
        data[f"kf{i}_loops"] = np.asarray(sorted(kf.loop_edges), np.int64)
        for key in _FEAT_KEYS:
            if key in kf.feats:
                data[f"kf{i}_f_{key}"] = kf.feats[key]
        if kf.depth is not None:
            data[f"kf{i}_depth"] = kf.depth
        if kf.u_right is not None:
            data[f"kf{i}_uright"] = kf.u_right

    pt_ids = sorted(p for p, pt in slam_map.points.items() if not pt.bad)
    data["pt_ids"] = np.asarray(pt_ids, np.int64)
    data["pt_pos"] = np.stack(
        [slam_map.points[p].position for p in pt_ids]
    ) if pt_ids else np.zeros((0, 3), np.float32)
    data["pt_desc"] = np.stack(
        [slam_map.points[p].descriptor for p in pt_ids]
    ) if pt_ids else np.zeros((0, 8), np.uint32)
    data["pt_ref"] = np.asarray(
        [slam_map.points[p].ref_kf_id for p in pt_ids], np.int64
    )
    obs = []
    for pi, p in enumerate(pt_ids):
        for kf_id, kp in slam_map.points[p].observations.items():
            obs.append([pi, kf_id, kp])
    data["pt_obs"] = np.asarray(obs, np.int64).reshape(-1, 3)
    data["pt_obj"] = np.asarray(
        [
            [int(slam_map.points[p].in_any_object), slam_map.points[p].object_id]
            for p in pt_ids
        ],
        np.int64,
    ).reshape(-1, 2)

    obj_ids = sorted(o for o, ob in slam_map.objects.items() if not ob.bad)
    data["obj_ids"] = np.asarray(obj_ids, np.int64)
    for i, o in enumerate(obj_ids):
        obj = slam_map.objects[o]
        data[f"obj{i}_Two"] = obj.T_wo
        data[f"obj{i}_code"] = obj.code
        data[f"obj{i}_ref"] = np.int64(obj.ref_kf_id)
        data[f"obj{i}_dyn"] = np.int64(obj.dynamic)
        data[f"obj{i}_vel"] = obj.velocity
        data[f"obj{i}_obs"] = np.asarray(
            [[k, v] for k, v in obj.observations.items()], np.int64
        ).reshape(-1, 2)
        if obj.vertices is not None:
            data[f"obj{i}_verts"] = obj.vertices
            data[f"obj{i}_faces"] = obj.faces
    np.savez_compressed(path, **data)


def load_state(path: str) -> Map:
    z = np.load(path)
    slam_map = Map()
    id_remap = {}

    for i, kf_id in enumerate(z["kf_ids"]):
        feats = {
            key: z[f"kf{i}_f_{key}"] for key in _FEAT_KEYS
            if f"kf{i}_f_{key}" in z
        }
        kf = KeyFrame.__new__(KeyFrame)
        kf.id = int(kf_id)
        kf.frame_id = -1
        kf.timestamp = float(z[f"kf{i}_ts"])
        kf.feats = feats
        kf.n = len(feats["xy"])
        kf.depth = z[f"kf{i}_depth"] if f"kf{i}_depth" in z else None
        kf.u_right = z[f"kf{i}_uright"] if f"kf{i}_uright" in z else None
        kf.T_cw = z[f"kf{i}_T_cw"]
        kf.map_point_ids = z[f"kf{i}_mpids"]
        kf.covis = {int(k): int(v) for k, v in z[f"kf{i}_covis"]}
        parent = int(z[f"kf{i}_parent"])
        kf.parent = parent if parent >= 0 else None
        kf.children = set()
        kf.loop_edges = set(int(v) for v in z[f"kf{i}_loops"])
        kf.bad = False
        kf.not_erase = False
        kf.to_be_erased = False
        kf.bow = None
        kf.detections = []
        kf.object_associations = {}
        kf.T_cw_before_gba = None
        slam_map.add_keyframe(kf)
    for kf in slam_map.keyframes.values():
        if kf.parent is not None and kf.parent in slam_map.keyframes:
            slam_map.keyframes[kf.parent].children.add(kf.id)

    pt_ids = z["pt_ids"]
    for i, p_id in enumerate(pt_ids):
        p = MapPoint.__new__(MapPoint)
        p.id = int(p_id)
        p.position = z["pt_pos"][i]
        p.descriptor = z["pt_desc"][i]
        p.ref_kf_id = int(z["pt_ref"][i])
        p.level = 0
        p.dist_create = 1.0
        p.observations = {}
        p.normal = np.zeros(3, np.float32)
        p.min_distance, p.max_distance = 0.0, np.inf
        p.n_visible = p.n_found = 1
        p.bad = False
        p.replaced_by = None
        p.in_any_object = bool(z["pt_obj"][i, 0])
        p.object_id = int(z["pt_obj"][i, 1])
        p.keyframe_id_added_to_object = -1
        p.outlier_in_object = False
        slam_map.points[p.id] = p
    for pi, kf_id, kp in z["pt_obs"]:
        p = slam_map.points[int(pt_ids[pi])]
        p.observations[int(kf_id)] = int(kp)

    for i, o_id in enumerate(z["obj_ids"]):
        obj = MapObject.__new__(MapObject)
        obj.id = int(o_id)
        obj.code = z[f"obj{i}_code"]
        obj.ref_kf_id = int(z[f"obj{i}_ref"])
        obj.observations = {int(k): int(v) for k, v in z[f"obj{i}_obs"]}
        obj.bad = False
        obj.dynamic = bool(z[f"obj{i}_dyn"])
        obj.velocity = z[f"obj{i}_vel"]
        obj.vertices = z[f"obj{i}_verts"] if f"obj{i}_verts" in z else None
        obj.faces = z[f"obj{i}_faces"] if f"obj{i}_faces" in z else None
        obj.point_ids = set()
        obj.replaced_by = None
        obj.n_observed = 1
        obj.set_pose_sim3(z[f"obj{i}_Two"])
        slam_map.objects[obj.id] = obj
    for p in slam_map.points.values():
        if p.in_any_object and p.object_id in slam_map.objects:
            slam_map.objects[p.object_id].point_ids.add(p.id)

    # fast-forward the class-level id generators past the loaded ids, or a
    # continued session would mint entities starting at 0 that silently
    # overwrite loaded map entries
    import itertools

    for cls, ids in (
        (KeyFrame, slam_map.keyframes),
        (MapPoint, slam_map.points),
        (MapObject, slam_map.objects),
    ):
        current = next(cls._ids)          # peek (consumes one id; harmless)
        floor = max(ids, default=-1) + 1
        cls._ids = itertools.count(max(current, floor))
    return slam_map
