"""CLI app tests on a synthesized on-disk KITTI-format sequence:
dsp_slam -> saved map -> extract_map_objects -> visualize_map."""

import os

import numpy as np
import pytest
from PIL import Image

FX = FY = 500.0
CX, CY = 320.0, 120.0
BASELINE = 0.4
BF = FX * BASELINE
PLANE_Z, NEAR_Z = 10.0, 5.0
H, W = 240, 640
RADIUS = 1.0
# sphere centers in cam-0/world frame, separated by more than the crop
# boxes' 2 m half-extent so neither box sweeps the other's points
SPHERES_W = np.array([[1.0, 0.6, 6.0], [-2.0, 0.2, 8.5]], np.float32)
# velodyne frame: x fwd (cam z), y left (-cam x), z up (-cam y)
T_CAM_VELO = np.array(
    [[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0], [0, 0, 0, 1]], np.float32
)
T_VELO_CAM = np.linalg.inv(T_CAM_VELO).astype(np.float32)
N_FRAMES = 8
STEP = 0.15
RNG = np.random.default_rng(21)


def build_world(seed=0):
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
    return np.clip(img, 0, 255).astype(np.uint8)


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("kitti_seq")
    (root / "image_2").mkdir()
    (root / "image_3").mkdir()
    (root / "velodyne").mkdir()
    (root / "labels_2d").mkdir()
    (root / "labels_3d").mkdir()
    world = build_world()

    K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], np.float32)
    invK = np.linalg.inv(K)
    # calib.txt: P2 for cam2 (no offset), Tr velodyne->cam0
    tr = T_CAM_VELO[:3, :].reshape(-1)
    with open(root / "calib.txt", "w") as f:
        f.write("P2: " + " ".join(
            str(v) for v in np.array(
                [[FX, 0, CX, 0], [0, FY, CY, 0], [0, 0, 1, 0]]
            ).reshape(-1)
        ) + "\n")
        f.write("Tr: " + " ".join(str(v) for v in tr) + "\n")
    with open(root / "times.txt", "w") as f:
        for k in range(N_FRAMES):
            f.write(f"{k * 0.1:.6f}\n")

    # per-frame images, velodyne, labels
    vv, uu = np.mgrid[0:H, 0:W]
    pix = np.stack([uu.ravel(), vv.ravel(), np.ones(H * W)], axis=-1)
    cam_rays = pix @ invK.T
    cam_rays /= np.linalg.norm(cam_rays, axis=-1, keepdims=True)

    for k in range(N_FRAMES):
        cam_x = k * STEP
        Image.fromarray(render(world, cam_x)).save(
            root / "image_2" / f"{k:06d}.png"
        )
        Image.fromarray(render(world, cam_x, baseline_m=BASELINE)).save(
            root / "image_3" / f"{k:06d}.png"
        )
        # velodyne scan: sphere surfaces + ground, in current velo frame
        clouds = []
        for c_w in SPHERES_W:
            c_cam = c_w - np.array([cam_x, 0, 0], np.float32)
            d = RNG.normal(size=(500, 3))
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            toc = -c_cam / np.linalg.norm(c_cam)
            d = d[(d @ toc) > 0.05]
            clouds.append(c_cam + RADIUS * d)
        # ground well below the (oversized) 3D boxes, which reach y ~ 2.6;
        # otherwise the LiDAR crop sweeps ground returns into the object's
        # surface evidence
        ground = np.stack(
            [RNG.uniform(-5, 5, 1500), np.full(1500, 3.2),
             RNG.uniform(3, 25, 1500)], axis=-1,
        )
        pts_cam = np.concatenate(clouds + [ground]).astype(np.float32)
        pts_velo = pts_cam @ T_VELO_CAM[:3, :3].T + T_VELO_CAM[:3, 3]
        velo = np.concatenate(
            [pts_velo, np.ones((len(pts_velo), 1), np.float32)], axis=-1
        )
        velo.astype(np.float32).tofile(root / "velodyne" / f"{k:06d}.bin")
        # 3D labels (velodyne frame), box sized so scale*0.5 = radius
        box_len = 4 * RADIUS / 1.1
        boxes = []
        for c_w in SPHERES_W:
            c_cam = c_w - np.array([cam_x, 0, 0], np.float32)
            c_velo = T_VELO_CAM[:3, :3] @ c_cam + T_VELO_CAM[:3, 3]
            boxes.append(
                [c_velo[0], c_velo[1], c_velo[2] - box_len / 2,
                 box_len, box_len, box_len, 0.0]
            )
        np.savez_compressed(
            root / "labels_3d" / f"{k:06d}.npz",
            boxes_3d=np.asarray(boxes, np.float32),
        )
        # 2D masks by ray-sphere distance
        masks, bxs = [], []
        for c_w in SPHERES_W:
            c_cam = c_w - np.array([cam_x, 0, 0], np.float32)
            t_along = cam_rays @ c_cam
            dist = np.linalg.norm(cam_rays * t_along[:, None] - c_cam, axis=-1)
            m = ((dist < RADIUS) & (t_along > 0)).reshape(H, W)
            masks.append(m)
            ys, xs = np.nonzero(m)
            bxs.append(
                [xs.min(), ys.min(), xs.max(), ys.max()] if len(xs) else [0, 0, 0, 0]
            )
        np.savez_compressed(
            root / "labels_2d" / f"{k:06d}.npz",
            pred_boxes=np.asarray(bxs, np.float32),
            pred_masks=np.stack(masks),
        )

    # settings yaml + dataset json (reference formats)
    (root / "settings.yaml").write_text(
        "%YAML:1.0\n"
        f"Camera.fx: {FX}\nCamera.fy: {FY}\nCamera.cx: {CX}\nCamera.cy: {CY}\n"
        f"Camera.width: {W}\nCamera.height: {H}\nCamera.fps: 4.0\n"
        f"Camera.bf: {BF}\nThDepth: 35.0\n"
        "ORBextractor.nFeatures: 600\nORBextractor.scaleFactor: 1.2\n"
        "ORBextractor.nLevels: 4\nORBextractor.iniThFAST: 20\n"
        "ORBextractor.minThFAST: 7\n"
    )
    import json

    (root / "config.json").write_text(json.dumps({
        "data_type": "KITTI",
        "detect_online": False,
        "path_label_2d": str(root / "labels_2d"),
        "path_label_3d": str(root / "labels_3d"),
        "min_mask_area": 200,
        "num_lidar_max": 250,
        "num_lidar_min": 10,
        "voxels_dim": 17,
        "optimizer": {
            "code_len": 8, "num_depth_samples": 50, "cut_off_threshold": 0.01,
            "joint_optim": {
                "k1": 1.0, "k2": 100.0, "k3": 0.25, "k4": 0.0,
                "b1": 0.2, "b2": 0.025, "num_iterations": 8,
                "learning_rate": 1.0, "scale_damping": 1.0,
            },
            "pose_only_optim": {"num_iterations": 5, "learning_rate": 1.0},
        },
    }))
    return root


@pytest.fixture(scope="module")
def slam_run(kitti_dir, tmp_path_factory):
    from dspslam_tpu.apps import dsp_slam

    map_dir = str(tmp_path_factory.mktemp("map_out"))
    system = dsp_slam.main([
        "--sequence_dir", str(kitti_dir),
        "--settings", str(kitti_dir / "settings.yaml"),
        "--config", str(kitti_dir / "config.json"),
        "--map_dir", map_dir,
    ])
    return system, map_dir


class TestDspSlamApp:
    def test_tracks_and_maps(self, slam_run):
        system, _ = slam_run
        from dspslam_tpu.slam.tracking import State

        assert system.state == State.OK
        assert len(system.map.keyframes) >= 2
        assert len(system.map.points) > 100

    def test_objects_reconstructed(self, slam_run):
        system, _ = slam_run
        objs = [o for o in system.map.objects.values() if not o.bad]
        assert len(objs) >= 1
        for obj in objs:
            two = obj.T_wo[:3, 3]
            d = np.linalg.norm(SPHERES_W - two, axis=-1).min()
            assert d < 0.4, f"object at {two}"

    def test_map_files_written(self, slam_run):
        _, map_dir = slam_run
        for fname in ("MapPoints.txt", "MapObjects.txt", "Cameras.txt"):
            assert os.path.exists(os.path.join(map_dir, fname)), fname
        cams = np.loadtxt(os.path.join(map_dir, "Cameras.txt"))
        assert cams.shape[1] == 12

    def test_extract_and_visualize(self, slam_run, kitti_dir):
        _, map_dir = slam_run
        from dspslam_tpu.apps import extract_map_objects, visualize_map

        objs = extract_map_objects.main([
            "--map_dir", map_dir, "--config", str(kitti_dir / "config.json"),
            "--voxels_dim", "17",
        ])
        assert len(objs) >= 1
        mesh_dir = os.path.join(map_dir, "meshes")
        plys = [f for f in os.listdir(mesh_dir) if f.endswith(".ply")]
        assert len(plys) >= 1
        visualize_map.main(["--map_dir", map_dir])
        assert os.path.exists(os.path.join(map_dir, "joint_map.ply"))

    def test_follow_mode_renders_growing_map(self, slam_run, tmp_path):
        system, _ = slam_run
        from dspslam_tpu.apps import visualize_map

        frames_dir = tmp_path / "frames"
        frames_dir.mkdir()
        for i in (0, 4, 9):
            system.save_map_current_frame(str(frames_dir), i)
        out_dir = tmp_path / "anim"
        n = visualize_map.follow(
            str(frames_dir), out_dir=str(out_dir), once=True
        )
        assert n == 3
        pngs = sorted(os.listdir(out_dir))
        assert len(pngs) == 3 and all(f.endswith(".png") for f in pngs)


class TestRenderer:
    def test_rasterize_sphere_mesh(self):
        from dspslam_tpu.shape import mesh as mesh_mod
        from dspslam_tpu.viz import renderer

        D = 25
        grid = mesh_mod.create_voxel_grid(D)
        sdf = (np.linalg.norm(grid, axis=-1) - 0.6).reshape(D, D, D)
        v, f = mesh_mod.marching_tetrahedra(sdf)
        K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1]])
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 3.0
        depth, ids, shade = renderer.rasterize_mesh(v, f, K, T, (240, 320))
        hit = ids > 0
        assert hit.sum() > 500
        # depth of the nearest point ~ 3.0 - 0.6
        assert abs(depth[hit].min() - 2.4) < 0.1
        # silhouette roughly circular around the principal point
        ys, xs = np.nonzero(hit)
        assert abs(xs.mean() - 160) < 6 and abs(ys.mean() - 120) < 6


class TestNativeConfigs:
    def test_shipped_configs_load_and_roundtrip(self):
        import glob

        from dspslam_tpu.config import SystemConfig

        paths = sorted(glob.glob("configs/*.json"))
        assert len(paths) >= 5
        for p in paths:
            cfg = SystemConfig.load(p)
            assert cfg.camera.fx > 100
            assert cfg.orb.n_features in (2000, 4000)
            s = cfg.to_json()
            assert '"camera"' in s

    def test_loader_sniffs_reference_format(self, kitti_dir):
        from dspslam_tpu.config import SystemConfig

        cfg = SystemConfig.load(str(kitti_dir / "config.json"))
        assert cfg.optimizer.code_len >= 8


def test_pipelined_run_writes_overlays(kitti_dir, tmp_path):
    """--overlay_dir under --pipeline: overlays are written when each
    frame finalizes (one frame late), not disabled (round-2 gap #3;
    reference FrameDrawer.cc:30-80 draws the last finished frame)."""
    from dspslam_tpu.apps import dsp_slam

    overlay_dir = tmp_path / "overlays"
    dsp_slam.main([
        "--sequence_dir", str(kitti_dir),
        "--settings", str(kitti_dir / "settings.yaml"),
        "--config", str(kitti_dir / "config.json"),
        "--map_dir", str(tmp_path / "map"),
        "--no_objects", "--pipeline",
        "--overlay_dir", str(overlay_dir),
    ])
    pngs = sorted(os.listdir(overlay_dir))
    # every tracked frame gets an overlay, including the flushed final
    # in-flight frame
    assert len(pngs) >= N_FRAMES - 1, pngs
    from PIL import Image

    img = np.asarray(Image.open(overlay_dir / pngs[-1]))
    assert img.ndim == 3 and img.shape[2] == 3


def test_live_viewer_serves_during_run(kitti_dir, tmp_path):
    """--live_view_dir: the headless Viewer-thread equivalent refreshes
    map.png / frame.png / index.html during the run and serves them over
    HTTP (reference Viewer.cc:59-176 parity for display-less hosts)."""
    import urllib.request

    from dspslam_tpu.apps import dsp_slam

    view_dir = tmp_path / "live"
    port = 18731
    dsp_slam.main([
        "--sequence_dir", str(kitti_dir),
        "--settings", str(kitti_dir / "settings.yaml"),
        "--config", str(kitti_dir / "config.json"),
        "--map_dir", str(tmp_path / "map"),
        "--no_objects",
        "--live_view_dir", str(view_dir),
        "--live_view_port", str(port),
        "--live_view_every", "2",
    ])
    assert (view_dir / "map.png").exists()
    assert (view_dir / "frame.png").exists()
    html = (view_dir / "index.html").read_text()
    assert "frame.png" in html and "map.png" in html
    # the server thread is shut down at exit; artifacts remain readable
    from PIL import Image

    img = np.asarray(Image.open(view_dir / "frame.png"))
    assert img.ndim == 3


def test_save_frames_dir_feeds_follow_viewer(kitti_dir, tmp_path):
    """dsp_slam --save_frames_dir writes per-frame dumps that the follow
    viewer can animate (the reference's SaveMapCurrentFrame loop)."""
    from dspslam_tpu.apps import dsp_slam, visualize_map

    frames_dir = tmp_path / "live"
    dsp_slam.main([
        "--sequence_dir", str(kitti_dir),
        "--settings", str(kitti_dir / "settings.yaml"),
        "--config", str(kitti_dir / "config.json"),
        "--map_dir", str(tmp_path / "map"),
        "--no_objects", "--frames", "6",
        "--save_frames_dir", str(frames_dir),
        "--save_frames_every", "2",
    ])
    dumps = sorted(os.listdir(frames_dir))
    assert len(dumps) == 3 and all(d.isdigit() for d in dumps)
    out = tmp_path / "anim"
    n = visualize_map.follow(str(frames_dir), out_dir=str(out), once=True)
    assert n == 3
