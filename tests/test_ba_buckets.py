"""Local-BA point-count compile buckets: dense windows must optimize
every point (the reference's local BA window is unbounded,
/root/reference/src/Optimizer_util.cc:309-430), and a hard cap measurably
hurts — the divergence that motivated bucketing."""

import numpy as np
import pytest

from dspslam_tpu.slam import local_mapping as lm_mod
from dspslam_tpu.slam.local_mapping import LocalMapper, LocalMapperConfig
from dspslam_tpu.slam.map import Frame, KeyFrame, Map, MapPoint

FX, FY, CX, CY, BF = 500.0, 500.0, 320.0, 240.0, 100.0
RNG = np.random.default_rng(7)


def test_bucket_selection():
    assert lm_mod.ba_point_bucket(1) == 1024
    assert lm_mod.ba_point_bucket(1024) == 1024
    assert lm_mod.ba_point_bucket(1025) == 2048
    assert lm_mod.ba_point_bucket(3500) == 4096
    assert lm_mod.ba_point_bucket(5000) == 8192
    # beyond the last bucket: truncation cap
    assert lm_mod.ba_point_bucket(9000) == 8192


def _make_feats(uv, n_slots):
    f = {
        "xy": np.zeros((n_slots, 2), np.float32),
        "desc": np.zeros((n_slots, 8), np.uint32),
        "angle": np.zeros(n_slots, np.float32),
        "level": np.zeros(n_slots, np.int32),
        "sigma2": np.ones(n_slots, np.float32),
        "response": np.zeros(n_slots, np.float32),
        "valid": np.zeros(n_slots, np.float32),
    }
    n = len(uv)
    f["xy"][:n] = uv
    f["valid"][:n] = 1.0
    return f


def _build_dense_window(n_pts=1300, n_kf=3, noise=0.05):
    """A 3-KF window observing n_pts landmarks; point estimates carry
    gaussian noise, cameras sit at truth. Returns (map, newest kf,
    point ids, true positions)."""
    truth = np.stack(
        [
            RNG.uniform(-6, 6, n_pts),
            RNG.uniform(-3, 3, n_pts),
            RNG.uniform(8, 18, n_pts),
        ],
        axis=-1,
    ).astype(np.float32)

    slam_map = Map()
    kfs = []
    for k in range(n_kf):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -0.4 * k
        pc = truth @ T[:3, :3].T + T[:3, 3]
        u = FX * pc[:, 0] / pc[:, 2] + CX
        v = FY * pc[:, 1] / pc[:, 2] + CY
        frame = Frame(float(k), _make_feats(np.stack([u, v], -1), n_pts))
        frame.T_cw = T
        kf = KeyFrame(frame)
        kf.u_right = (u - BF / pc[:, 2]).astype(np.float32)
        slam_map.add_keyframe(kf)
        kfs.append(kf)

    noisy = truth + RNG.normal(0, noise, truth.shape).astype(np.float32)
    pt_ids = []
    for i in range(n_pts):
        p = MapPoint(noisy[i], np.zeros(8, np.uint32), kfs[0].id)
        slam_map.add_point(p)
        for kf in kfs:
            slam_map.add_observation(p, kf, i)
        pt_ids.append(p.id)
    for kf in kfs:
        slam_map.update_covisibility(kf)
    return slam_map, kfs[-1], pt_ids, truth


def _mean_point_err(slam_map, pt_ids, truth):
    errs = [
        np.linalg.norm(slam_map.points[p_id].position - truth[i])
        for i, p_id in enumerate(pt_ids)
        if p_id in slam_map.points
    ]
    return float(np.mean(errs))


def _run_ba(slam_map, kf):
    mapper = LocalMapper(
        slam_map,
        LocalMapperConfig(fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, async_ba=False),
    )
    pending = mapper.dispatch_bundle_adjust(kf)
    assert pending is not None
    mapper._apply_bundle_adjust(pending)
    return pending


def test_dense_window_optimizes_all_points():
    slam_map, kf, pt_ids, truth = _build_dense_window()
    err_before = _mean_point_err(slam_map, pt_ids, truth)
    pending = _run_ba(slam_map, kf)
    # every point entered the solve: the 2048 bucket holds 1300 points
    assert len(pending["pt_slot"]) == len(pt_ids)
    assert pending["out"]["points"].shape[0] == 2048
    err_after = _mean_point_err(slam_map, pt_ids, truth)
    assert err_after < 0.35 * err_before


def test_hard_cap_diverges_from_uncapped(monkeypatch):
    """The pre-bucketing behaviour (one fixed cap below window density)
    leaves the weakest points unoptimized — the accuracy cliff the
    buckets remove."""
    slam_map, kf, pt_ids, truth = _build_dense_window()
    monkeypatch.setattr(lm_mod, "BA_PT_BUCKETS", (512,))
    monkeypatch.setattr(lm_mod, "BA_PT_CAP", 512)
    pending = _run_ba(slam_map, kf)
    assert len(pending["pt_slot"]) == 512
    err_capped = _mean_point_err(slam_map, pt_ids, truth)

    slam_map2, kf2, pt_ids2, truth2 = _build_dense_window()
    monkeypatch.setattr(lm_mod, "BA_PT_BUCKETS", (2048,))
    monkeypatch.setattr(lm_mod, "BA_PT_CAP", 2048)
    _run_ba(slam_map2, kf2)
    err_full = _mean_point_err(slam_map2, pt_ids2, truth2)
    # capped run leaves ~60% of points at their noisy positions
    assert err_capped > 2.0 * err_full


def test_warmup_compiles_bucket():
    mapper = LocalMapper(
        Map(),
        LocalMapperConfig(fx=FX, fy=FY, cx=CX, cy=CY, bf=BF),
    )
    mapper.warmup_ba_buckets(buckets=(1024,), with_objects=False)
