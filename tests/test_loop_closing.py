"""Loop-closing integration on a fabricated drifted map.

Builds an out-and-back keyframe trajectory with known ground truth and
injected odometry drift, synthetic world landmarks whose descriptors are
REUSED on revisit (same place -> same content), then drives
LoopCloser.insert_keyframe over all keyframes and checks that

  * the loop is detected on the revisit,
  * Sim(3) RANSAC finds the right correction,
  * keyframe poses and landmark positions are pulled back toward truth.

This isolates the loop-closing machinery from the image frontend (which
has its own tests)."""

import numpy as np
import pytest

from dspslam_tpu.place.loop_closing import LoopCloser
from dspslam_tpu.place.vocabulary import Vocabulary
from dspslam_tpu.slam.map import Frame, KeyFrame, Map, MapPoint

FX = FY = 500.0
CX, CY = 320.0, 240.0
BF = 200.0
N_LMK_PER_CELL = 25
CELL = 1.0           # world cell size along x
RNG = np.random.default_rng(5)


def build_world(x_max=12):
    """Landmarks + persistent descriptors per 1m world cell."""
    lmk_pos, lmk_desc = [], []
    for cell in range(x_max + 3):
        for _ in range(N_LMK_PER_CELL):
            p = np.array(
                [cell * CELL + RNG.uniform(0, 1), RNG.uniform(-2, 2),
                 RNG.uniform(6, 10)], np.float32
            )
            lmk_pos.append(p)
            lmk_desc.append(RNG.integers(0, 2**32, 8, dtype=np.uint32))
    return np.stack(lmk_pos), np.stack(lmk_desc)


def make_feats(uv, desc, n_slots=220):
    f = {
        "xy": np.zeros((n_slots, 2), np.float32),
        "desc": np.zeros((n_slots, 8), np.uint32),
        "angle": np.zeros(n_slots, np.float32),
        "level": np.zeros(n_slots, np.int32),
        "sigma2": np.ones(n_slots, np.float32),
        "response": np.zeros(n_slots, np.float32),
        "valid": np.zeros(n_slots, np.float32),
    }
    n = min(len(uv), n_slots)
    f["xy"][:n] = uv[:n]
    f["desc"][:n] = desc[:n]
    f["valid"][:n] = 1.0
    return f


def project(T_cw, X):
    pc = X @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = pc[:, 2]
    u = FX * pc[:, 0] / z + CX
    v = FY * pc[:, 1] / z + CY
    ok = (z > 0.5) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
    return np.stack([u, v], -1), ok


def test_fabricated_loop_correction():
    lmk_pos, lmk_desc = build_world()
    slam_map = Map()

    # trajectory: x = 0..10 out, 10..0 back; drift accumulates on return
    xs = list(range(0, 11)) + list(range(9, -1, -1))
    DRIFT_RATE = 0.06
    kfs = []
    point_of_lmk: dict[int, int] = {}
    true_poses = []
    for step, x in enumerate(xs):
        if step == 11:
            # return pass: drift breaks data association, so revisited
            # landmarks mint NEW map points (this is what makes a loop
            # closure necessary in the first place)
            point_of_lmk = {}
        drift = max(0, step - 10) * DRIFT_RATE
        T_true = np.eye(4, dtype=np.float32)
        T_true[0, 3] = -x
        T_est = np.eye(4, dtype=np.float32)
        T_est[0, 3] = -(x + drift)      # estimated camera sits ahead of truth
        uv_true, ok = project(T_true, lmk_pos)
        vis = np.nonzero(ok)[0]
        feats = make_feats(uv_true[vis], lmk_desc[vis])
        frame = Frame(float(step), feats)
        frame.T_cw = T_est
        kf = KeyFrame(frame)
        slam_map.add_keyframe(kf)
        true_poses.append(T_true)
        # landmarks -> map points (created once, positioned with creator's
        # drift so geometry is self-consistent with the estimate)
        T_wc_est = np.linalg.inv(T_est)
        for slot, li in enumerate(vis[:220]):
            if li in point_of_lmk:
                p = slam_map.points.get(point_of_lmk[li])
                if p is not None:
                    slam_map.add_observation(p, kf, slot)
                continue
            x_cam = (T_true[:3, :3] @ lmk_pos[li] + T_true[:3, 3])
            x_world_est = T_wc_est[:3, :3] @ x_cam + T_wc_est[:3, 3]
            p = MapPoint(x_world_est, lmk_desc[li], kf.id)
            slam_map.add_point(p)
            slam_map.add_observation(p, kf, slot)
            point_of_lmk[li] = p.id
        slam_map.update_covisibility(kf)
        kfs.append(kf)

    # vocabulary trained on the world's descriptors
    voc = Vocabulary.train(lmk_desc, branching=6, levels=2, seed=1)
    closer = LoopCloser(
        slam_map, voc, [FX, FY, CX, CY, BF], fix_scale=True, min_matches=12
    )
    closed_at = []
    for kf in kfs:
        if closer.insert_keyframe(kf):
            closed_at.append(kf.id)

    assert closer.loops_closed >= 1, "revisit did not close a loop"

    # final keyframe (back at x=0, drifted to -0.66) pulled back to truth
    end_err_before = abs(-(0 + 10 * DRIFT_RATE) - 0.0)
    end_err_after = abs(kfs[-1].T_cw[0, 3] - 0.0)
    assert end_err_after < 0.5 * end_err_before, (
        f"endpoint error {end_err_after} vs drift {end_err_before}"
    )
    # all poses finite, map finite
    for kf in kfs:
        assert np.isfinite(kf.T_cw).all()
    for p in slam_map.points.values():
        assert np.isfinite(p.position).all()


@pytest.mark.slow
def test_image_based_out_and_back_consistency():
    """Image-driven out-and-back (16 m travelled): with guaranteed
    two-layer depth structure the tracker re-associates on the return
    pass, bounding drift without needing an explicit loop closure (the
    fabricated-map test above exercises the BoW path). Asserts the
    trajectory closes near the origin and the map stays finite."""
    import jax.numpy as jnp

    from dspslam_tpu.frontend import orb
    from dspslam_tpu.slam.system import SLAMSystem
    from dspslam_tpu.slam.tracking import State, TrackerConfig

    from dspslam_tpu.datasets.synthetic import LayeredWorld

    FX = 500.0
    CX, CY = 320.0, 120.0
    BASELINE = 0.4
    H, W = 240, 640
    # ground plane + three depth layers: near structure everywhere, so
    # camera y/z stay observable (fronto-parallel-only worlds random-walk
    # in z under the constant-velocity model); subpixel rendering keeps
    # stereo free of position-dependent disparity-rounding bias
    world = LayeredWorld(W, H, FX, cx=CX, cy=CY, x_range=(-1.0, 9.0),
                         seed=12)

    def render(cam_x, b=0.0):
        return world.render(cam_x, b)

    params = orb.ORBParams(n_features=600, n_levels=3)
    cfg = TrackerConfig(
        fx=FX, fy=FX, cx=CX, cy=CY, bf=FX * BASELINE, width=W, height=H,
        min_init_features=150, max_frames_between_kf=3,
        search_radius_motion=50.0,
    )
    system = SLAMSystem(tracker_cfg=cfg, orb_params=params)
    xs = list(np.arange(0, 8.0, 0.4)) + list(np.arange(8.0, -0.01, -0.4))
    for k, x in enumerate(xs):
        system.track_stereo(render(x), render(x, BASELINE), 0.1 * k)
    assert system.state == State.OK
    T = system.tracker.trajectory[-1][1]
    estx = float((-T[:3, :3].T @ T[:3, 3])[0])
    # no loop closure here, so only bound the open-loop drift: <10% of the
    # 16 m travelled (the synthetic turnaround is the worst case; with the
    # BoW loop closure enabled the fabricated-map test above shows the
    # residual drift being corrected)
    assert abs(estx) < 1.6, f"endpoint {estx}"
    lost = sum(1 for _, _, l in system.tracker.trajectory if l)
    assert lost == 0
    pos = np.stack([p.position for p in system.map.points.values()])
    assert np.isfinite(pos).all()
