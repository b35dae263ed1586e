"""Perceptual-aliasing rejection (VERDICT r4 #5).

Two identical storefronts: a corridor with an exact repeated landmark
patch — same descriptors, same local 3D layout — at x~3 (A) and x~17
(B), surrounded by distinct landmarks. Driving straight past B, the BoW
database persistently returns A's keyframes as loop candidates
(identical content), the covisibility-consistency groups mature, and
Horn RANSAC + the mutual-reprojection Sim(3) refinement both SUCCEED on
the repeated patch (its geometry is an exact copy). What tells the
truth apart is the loop NEIGHBORHOOD: a true revisit shares its whole
surroundings with the candidate's covisibility group, an alias shares
only the repeated structure. The reference encodes this as the
SearchByProjection nTotalMatches >= 40 acceptance
(/root/reference/src/LoopClosing.cc:370-401); here it is
LoopCloser.min_total_matches.

The A arm (gate enabled, default) must close ZERO loops; the B arm
(gate disabled) must close the FALSE loop — proving candidate
persistence + Horn + refinement alone accept the alias and the
neighborhood gate is what rejects it.
"""

import numpy as np

from dspslam_tpu.place.loop_closing import LoopCloser
from dspslam_tpu.place.vocabulary import Vocabulary
from dspslam_tpu.slam.map import Frame, KeyFrame, Map, MapPoint

FX = FY = 500.0
CX, CY = 320.0, 240.0
BF = 200.0
RNG = np.random.default_rng(11)

PATCH_N = 18          # repeated-patch landmarks: enough for Horn RANSAC
                      # (min_matches=12) but fewer than the neighborhood
                      # gate (2 * 12 = 24 by default)
STORE_A_X = 3.0
STORE_B_X = 17.0


def _make_world():
    """Corridor landmarks (distinct) + the repeated storefront patch."""
    lmk_pos, lmk_desc = [], []
    for cell in range(25):
        for _ in range(6):
            lmk_pos.append(np.array(
                [cell + RNG.uniform(0, 1), RNG.uniform(-2, 2),
                 RNG.uniform(6, 10)], np.float32))
            lmk_desc.append(RNG.integers(0, 2**32, 8, dtype=np.uint32))
    # storefront A: tight textured patch
    patch_off = np.stack([
        RNG.uniform(-0.6, 0.6, PATCH_N),
        RNG.uniform(-1.5, 1.5, PATCH_N),
        RNG.uniform(7.0, 9.0, PATCH_N),
    ], -1).astype(np.float32)
    patch_desc = RNG.integers(0, 2**32, (PATCH_N, 8), dtype=np.uint32)
    for k in range(PATCH_N):
        lmk_pos.append(np.array([STORE_A_X, 0, 0], np.float32)
                       + patch_off[k])
        lmk_desc.append(patch_desc[k])
    # storefront B: EXACT copy, translated — identical descriptors,
    # identical local geometry
    for k in range(PATCH_N):
        lmk_pos.append(np.array([STORE_B_X, 0, 0], np.float32)
                       + patch_off[k])
        lmk_desc.append(patch_desc[k])
    return np.stack(lmk_pos), np.stack(lmk_desc)


def _project(T_cw, X):
    pc = X @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = pc[:, 2]
    u = FX * pc[:, 0] / np.maximum(z, 1e-6) + CX
    v = FY * pc[:, 1] / np.maximum(z, 1e-6) + CY
    ok = (z > 0.5) & (u > 0) & (u < 640) & (v > 0) & (v < 480)
    return np.stack([u, v], -1), ok


def _feats(uv, desc, n_slots=200):
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


def _drive_corridor(closer_kwargs):
    """Build the corridor map keyframe-by-keyframe and run the loop
    closer live. Returns the LoopCloser after the drive."""
    lmk_pos, lmk_desc = _make_world()
    slam_map = Map()
    voc = Vocabulary.train(lmk_desc, branching=6, levels=2, seed=2)
    closer = LoopCloser(
        slam_map, voc, [FX, FY, CX, CY, BF], fix_scale=True,
        min_matches=12, **closer_kwargs,
    )
    point_of_lmk: dict[int, int] = {}
    for step, x in enumerate(np.arange(0.0, 23.0, 1.0)):
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -x
        uv, ok = _project(T, lmk_pos)
        vis = np.nonzero(ok)[0]
        feats = _feats(uv[vis], lmk_desc[vis])
        frame = Frame(float(step), feats)
        frame.T_cw = T
        kf = KeyFrame(frame)
        slam_map.add_keyframe(kf)
        T_wc = np.linalg.inv(T)
        for slot, li in enumerate(vis[:200]):
            li = int(li)
            if li in point_of_lmk:
                p = slam_map.points.get(point_of_lmk[li])
                if p is not None:
                    slam_map.add_observation(p, kf, slot)
                continue
            p = MapPoint(lmk_pos[li], lmk_desc[li], kf.id)
            slam_map.add_point(p)
            slam_map.add_observation(p, kf, slot)
            point_of_lmk[li] = p.id
        slam_map.update_covisibility(kf)
        closer.insert_keyframe(kf)
    closer.flush()
    return closer


def test_aliased_storefront_rejected_by_neighborhood_gate():
    closer = _drive_corridor({})
    assert closer.loops_closed == 0, (
        "perceptually-aliased storefront accepted as a loop despite the "
        "neighborhood projection gate"
    )


def test_alias_would_pass_without_the_gate():
    """The adversarial control: with the neighborhood total-match gate
    disabled, candidate persistence + Horn RANSAC + Sim(3) refinement
    ACCEPT the false loop (the repeated patch is an exact geometric
    copy, so every per-match test passes). This pins that the gate is
    load-bearing — if this arm stops closing, the fixture no longer
    exercises the gate and the test above proves nothing."""
    closer = _drive_corridor({"min_total_matches": 0})
    assert closer.loops_closed >= 1, (
        "fixture no longer aliases: the false loop was rejected before "
        "the neighborhood gate"
    )
