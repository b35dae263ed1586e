"""Monocular object SLAM end-to-end: the mono analogue of
test_slam_objects (reference dsp_slam_mono.cc + LocalMapping_util.cc:
210-438 behavior).

A textured sphere sits in a two-depth-layer mono world. The run must:
two-view initialize, track 26 frames, accumulate map points on the
sphere through keyframe triangulation, associate them to one MapObject
via mask voting (CreateNewObjectsFromDetections), seed its pose from
the PCA cuboid, run the flip-disambiguated Sim(3)+code GN with member
points as surface evidence and mask background rays as render evidence
(ProcessDetectedObjects), and land the object at the right world pose
with plausible scale — all up to the mono gauge freedom, which the test
resolves from the known camera step.
"""

import numpy as np
import pytest

from dspslam_tpu.datasets.mono import build_mono_detection
from dspslam_tpu.frontend import orb
from dspslam_tpu.models import deepsdf
from dspslam_tpu.objects.mono_pipeline import MonoObjectPipeline
from dspslam_tpu.shape import gn
from dspslam_tpu.slam.system import SLAMSystem
from dspslam_tpu.slam.tracking import State, TrackerConfig

FX = FY = 500.0
CX, CY = 320.0, 120.0
FAR_Z, NEAR_Z = 8.0, 3.5
H, W = 240, 640
CODE_LEN = 8

SPHERE_C = np.array([0.8, 0.25, 5.0], np.float32)   # world = first cam frame
SPHERE_R = 0.8
STEP = 0.15
N_FRAMES = 26

K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
INVK = np.linalg.inv(K).astype(np.float32)


def layered_background(seed=11):
    """Far plane + large internally-textured near patches (two depth
    layers — a single plane leaves yaw/translation indistinguishable)."""
    rng = np.random.default_rng(seed)
    far = rng.normal(80, 10, (H, 4 * W)).astype(np.float32)
    for _ in range(700):
        y, x = rng.integers(10, H - 20), rng.integers(10, 4 * W - 20)
        s = rng.integers(4, 12)
        far[y : y + s, x : x + s] = rng.uniform(150, 230)
    near = np.full((H, 8 * W), np.nan, np.float32)
    for _ in range(150):
        y, x = rng.integers(10, H - 48), rng.integers(10, 8 * W - 48)
        s = int(rng.integers(24, 44))
        patch = rng.normal(120, 25, (s, s)).astype(np.float32)
        for _ in range(6):
            py, px = rng.integers(2, s - 10, 2)
            q = rng.integers(4, 8)
            patch[py : py + q, px : px + q] = rng.uniform(30, 240)
        near[y : y + s, x : x + s] = patch
    return far, near


# blocky 3D texture sampled at world coordinates: view-consistent
# high-contrast corners all over the sphere surface
_TEX_N, _TEX_FREQ = 64, 20.0
_TEX = np.random.default_rng(5).uniform(30, 235, (_TEX_N,) * 3).astype(
    np.float32
)


def sphere_texture(p_world: np.ndarray) -> np.ndarray:
    idx = np.floor(p_world * _TEX_FREQ).astype(np.int64) % _TEX_N
    return _TEX[idx[..., 0], idx[..., 1], idx[..., 2]]


_UV = np.stack(
    np.meshgrid(np.arange(W, dtype=np.float32),
                np.arange(H, dtype=np.float32)),
    axis=-1,
)  # (H, W, 2) of (u, v)


def sphere_hit(cam_x: float):
    """Per-pixel ray-sphere intersection. Returns (mask (H,W) bool,
    p_world (H,W,3) surface points where hit)."""
    d = np.concatenate(
        [(_UV[..., :1] - CX) / FX, (_UV[..., 1:2] - CY) / FY,
         np.ones((H, W, 1), np.float32)],
        axis=-1,
    )
    c = SPHERE_C - np.array([cam_x, 0, 0], np.float32)
    b = d @ c
    dd = np.sum(d * d, axis=-1)
    disc = b * b - dd * (c @ c - SPHERE_R**2)
    hit = disc > 0
    t = (b - np.sqrt(np.maximum(disc, 0.0))) / np.maximum(dd, 1e-9)
    hit &= t > 0.1
    p_cam = t[..., None] * d
    p_world = p_cam + np.array([cam_x, 0, 0], np.float32)
    return hit, p_world


def render(world, cam_x: float):
    far, near = world
    sf = int(round(FX * cam_x / FAR_Z))
    sn = int(round(FX * cam_x / NEAR_Z))
    img = far[:, W + sf : 2 * W + sf].copy()
    crop = near[:, W + sn : W + sn + W]
    m = ~np.isnan(crop)
    img[m] = crop[m]
    hit, p_world = sphere_hit(cam_x)
    img[hit] = sphere_texture(p_world[hit])
    return img


def make_detection(cam_x: float):
    hit, _ = sphere_hit(cam_x)
    if hit.sum() < 1200:
        return []
    ys, xs = np.nonzero(hit)
    bbox = np.array(
        [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1], np.float32
    )
    det = build_mono_detection(
        hit[None].astype(bool), bbox[None], INVK, min_mask_area=1000.0
    )
    return [det] if det is not None else []


@pytest.fixture(scope="module")
def mono_objects_run():
    world = layered_background()
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, width=W, height=H,
        max_frames_between_kf=3, search_radius_motion=40.0,
    )
    cam_xs = {}

    def detection_source(frame_idx):
        return make_detection(cam_xs[frame_idx])

    def pipeline_factory(slam_map):
        return MonoObjectPipeline(
            slam_map,
            deepsdf.sphere_decoder_fn,
            deepsdf.make_sphere_params(code_len=CODE_LEN),
            gn.GNConfig(code_len=CODE_LEN, k4=0.0, num_iterations=8,
                        max_grad_points=256),
            max_surface_points=128, max_rays=256,
            extract_meshes=True, voxels_dim=17,
            warmup_kfs=5, recon_every=2,
        )

    system = SLAMSystem(
        tracker_cfg=cfg,
        orb_params=orb.ORBParams(n_features=800, n_levels=4),
        object_pipeline_factory=pipeline_factory,
        detection_source=detection_source,
    )
    for k in range(N_FRAMES):
        cam_xs[k] = k * STEP
        system.track_mono(render(world, cam_xs[k]), timestamp=k * 0.1)
    return system


def _gauge_scale(system):
    """map-units-per-meter from the known camera step (mono gauge)."""
    kfs = sorted(system.map.keyframes.values(), key=lambda kf: kf.id)
    t0, t1 = kfs[0], kfs[-1]
    est = np.linalg.norm(t1.T_wc[:3, 3] - t0.T_wc[:3, 3])
    true = abs(t1.timestamp - t0.timestamp) / 0.1 * STEP
    return est / true


class TestMonoObjectSLAM:
    def test_tracked_to_the_end(self, mono_objects_run):
        sys_ = mono_objects_run
        assert sys_.state == State.OK
        assert len(sys_.map.keyframes) >= 6

    def test_object_created_with_member_points(self, mono_objects_run):
        objs = [o for o in mono_objects_run.map.objects.values() if not o.bad]
        assert len(objs) >= 1
        assert max(len(o.point_ids) for o in objs) >= 50

    def test_object_reconstructed_at_world_pose(self, mono_objects_run):
        sys_ = mono_objects_run
        objs = [
            o for o in sys_.map.objects.values()
            if not o.bad and o.has_valid_pose
        ]
        assert len(objs) >= 1, "no object survived GN reconstruction"
        s = _gauge_scale(sys_)
        obj = max(objs, key=lambda o: len(o.point_ids))
        center_m = obj.T_wo[:3, 3] / s
        err = np.linalg.norm(center_m - SPHERE_C)
        assert err < 0.5 * SPHERE_R, (center_m, SPHERE_C, s)

    def test_object_scale_plausible(self, mono_objects_run):
        sys_ = mono_objects_run
        objs = [
            o for o in sys_.map.objects.values()
            if not o.bad and o.has_valid_pose
        ]
        obj = max(objs, key=lambda o: len(o.point_ids))
        s = _gauge_scale(sys_)
        # decoder radius = r0 + w.code = 0.5 + 0.3*code[0]
        r_obj = 0.5 + 0.3 * float(obj.code[0])
        r_world_m = obj.scale * r_obj / s
        assert 0.5 * SPHERE_R < r_world_m < 1.6 * SPHERE_R, (
            r_world_m, SPHERE_R, obj.scale, r_obj, s
        )

    def test_mesh_extracted(self, mono_objects_run):
        objs = [
            o for o in mono_objects_run.map.objects.values()
            if not o.bad and o.has_valid_pose
        ]
        obj = max(objs, key=lambda o: len(o.point_ids))
        assert obj.vertices is not None and len(obj.vertices) > 0
