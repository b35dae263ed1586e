"""Full object-aware SLAM integration: stereo tracking + per-keyframe
synthetic LiDAR/mask detections -> association -> batched GN recon ->
MapObjects in the world map -> joint BA with object edges."""

import numpy as np
import pytest

from dspslam_tpu.frontend import orb
from dspslam_tpu.models import deepsdf
from dspslam_tpu.objects.detections import Detection
from dspslam_tpu.objects.pipeline import ObjectPipeline
from dspslam_tpu.shape import gn
from dspslam_tpu.slam.system import SLAMSystem
from dspslam_tpu.slam.tracking import State, TrackerConfig

FX = FY = 500.0
CX, CY = 320.0, 120.0
BASELINE = 0.4
BF = FX * BASELINE
PLANE_Z = 10.0
H, W = 240, 640
CODE_LEN = 8

# two spheres in world frame (= first camera frame), radius 1
SPHERES_W = np.array([[1.0, 0.6, 6.0], [2.5, 0.4, 7.5]], np.float32)
RADIUS = 1.0
RNG = np.random.default_rng(9)


NEAR_Z = 5.0


def textured_world(seed=0):
    """Far plane + sparse near posts: depth variation avoids the planar
    translation/yaw degeneracy that otherwise corrupts pose estimates."""
    rng = np.random.default_rng(seed)
    far = rng.normal(80, 10, (H, 3 * W)).astype(np.float32)
    for _ in range(350):
        y, x = rng.integers(10, H - 20), rng.integers(10, 3 * W - 20)
        s = rng.integers(4, 12)
        far[y : y + s, x : x + s] = rng.uniform(150, 230)
    near = np.full((H, 6 * W), np.nan, np.float32)
    for _ in range(220):
        y, x = rng.integers(10, H - 30), rng.integers(10, 6 * W - 30)
        s = rng.integers(6, 14)
        near[y : y + s, x : x + s] = rng.uniform(40, 250)
    return far, near


def render(world, cam_x, baseline_m=0.0):
    far, near = world
    sf = int(round(FX * (cam_x + baseline_m) / PLANE_Z))
    sn = int(round(FX * (cam_x + baseline_m) / NEAR_Z))
    img = far[:, W + sf : 2 * W + sf].copy()
    crop = near[:, W + sn : W + sn + W]
    m = ~np.isnan(crop)
    img[m] = crop[m]
    return img


def make_detections(cam_x):
    """Synthetic per-frame sphere measurements in the current camera frame."""
    dets = []
    for c_w in SPHERES_W:
        c = c_w - np.array([cam_x, 0, 0], np.float32)   # camera frame
        if c[2] < 2.0:
            continue
        d = RNG.normal(size=(160, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        to_cam = -c / np.linalg.norm(c)
        d = d[(d @ to_cam) > 0.1][:120]
        pts = (c + RADIUS * d).astype(np.float32)
        # pose init: sphere decoder radius 0.5 -> scale 2, slight noise
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] *= 2.0 * (1 + RNG.uniform(-0.05, 0.05))
        T[:3, 3] = c + RNG.normal(0, 0.05, 3)
        # foreground rays from the surface points
        uv = pts[:, :2] / pts[:, 2:3]
        rays = np.concatenate([uv, np.ones((len(uv), 1))], -1).astype(np.float32)
        # background rays just outside the silhouette
        bg_dir = (c / np.linalg.norm(c))[None, :] + RNG.normal(0, 0.35, (60, 3))
        bg_dir[:, 2] = np.abs(bg_dir[:, 2]) + 0.5
        bg = (bg_dir / bg_dir[:, 2:3]).astype(np.float32)
        bg = bg[
            np.linalg.norm(np.cross(bg / np.linalg.norm(bg, axis=-1, keepdims=True), c),
                           axis=-1) > RADIUS * 1.15
        ][:40]
        det = Detection(
            T_cam_obj=T,
            scale=2.0,
            box_size=np.array([2.0, 2.0, 2.0], np.float32),
            surface_points=pts,
            rays=np.concatenate([rays, bg], axis=0),
            depth=pts[:, 2].astype(np.float32),
            num_foreground=len(rays),
        )
        dets.append(det)
    return dets


@pytest.fixture(scope="module")
def slam_with_objects():
    world = textured_world()
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=4,
    )
    cam_xs = {}

    def detection_source(frame_idx):
        return make_detections(cam_xs[frame_idx])

    def pipeline_factory(slam_map):
        return ObjectPipeline(
            slam_map,
            deepsdf.sphere_decoder_fn,
            deepsdf.make_sphere_params(code_len=CODE_LEN),
            gn.GNConfig(code_len=CODE_LEN, k4=0.0, num_iterations=8,
                        max_grad_points=256),
            max_detections=4, max_surface_points=128, max_rays=256,
            extract_meshes=True, voxels_dim=17,
        )

    system = SLAMSystem(
        tracker_cfg=cfg,
        orb_params=orb.ORBParams(n_features=600, n_levels=4),
        object_pipeline_factory=pipeline_factory,
        detection_source=detection_source,
    )
    step = 0.15
    for k in range(8):
        cam_xs[k] = k * step
        img_l = render(world, cam_xs[k])
        img_r = render(world, cam_xs[k], baseline_m=BASELINE)
        system.track_stereo(img_l, img_r, timestamp=k * 0.1)
    return system


def test_pipelined_object_slam_reconstructs():
    """Object-aware SLAM under one-frame-lag pipelined tracking (the
    benchmark's configuration): keyframes surface one call late with
    correct seq indices, detections attach to the right frames, and
    objects reconstruct at the right world positions."""
    world = textured_world(seed=3)
    cfg = TrackerConfig(
        fx=FX, fy=FY, cx=CX, cy=CY, bf=BF, width=W, height=H,
        min_init_features=150, max_frames_between_kf=4,
        pipelined=True,
    )
    cam_xs = {}
    rng = np.random.default_rng(5)

    def detection_source(frame_idx):
        return make_detections(cam_xs[frame_idx])

    def pipeline_factory(slam_map):
        return ObjectPipeline(
            slam_map,
            deepsdf.sphere_decoder_fn,
            deepsdf.make_sphere_params(code_len=CODE_LEN),
            gn.GNConfig(code_len=CODE_LEN, k4=0.0, num_iterations=8,
                        max_grad_points=256),
            max_detections=4, max_surface_points=128, max_rays=256,
            extract_meshes=False,
        )

    system = SLAMSystem(
        tracker_cfg=cfg,
        orb_params=orb.ORBParams(n_features=600, n_levels=4),
        object_pipeline_factory=pipeline_factory,
        detection_source=detection_source,
    )
    step = 0.15
    for k in range(9):
        cam_xs[k] = k * step
        system.track_stereo(
            render(world, cam_xs[k]),
            render(world, cam_xs[k], baseline_m=BASELINE),
            timestamp=k * 0.1,
        )
    system.flush()
    assert system.state == State.OK
    objs = [o for o in system.map.objects.values() if not o.bad]
    assert len(objs) >= 1
    errs = []
    for o in objs:
        d = np.linalg.norm(SPHERES_W - o.T_wo[:3, 3][None], axis=-1).min()
        errs.append(d)
    assert min(errs) < 0.3, errs


class TestObjectSLAM:
    def test_tracks_and_reconstructs(self, slam_with_objects):
        system = slam_with_objects
        assert system.state == State.OK
        objs = [o for o in system.map.objects.values() if not o.bad]
        assert 1 <= len(objs) <= 2, f"{len(objs)} objects"

    def test_object_world_positions(self, slam_with_objects):
        system = slam_with_objects
        objs = [o for o in system.map.objects.values() if not o.bad]
        for obj in objs:
            two = obj.T_wo[:3, 3]
            d = np.linalg.norm(SPHERES_W - two, axis=-1).min()
            assert d < 0.35, f"object at {two}, nearest true {d}"

    def test_object_scale_and_mesh(self, slam_with_objects):
        system = slam_with_objects
        for obj in system.map.objects.values():
            if obj.bad:
                continue
            world_r = obj.scale * (0.5 + 0.3 * obj.code[0])
            assert world_r == pytest.approx(RADIUS, rel=0.12)
            assert obj.vertices is not None and len(obj.vertices) > 30

    def test_repeat_observations_associate(self, slam_with_objects):
        system = slam_with_objects
        objs = [o for o in system.map.objects.values() if not o.bad]
        # at least one object observed from multiple keyframes
        assert max(len(o.observations) for o in objs) >= 2
