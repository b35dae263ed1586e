"""Milestone A: end-to-end single-frame reconstruction on the synthetic
scene — measurement build, association, batched GN, mesh export, offline
label round-trip, config ingestion."""

import numpy as np
import pytest

from dspslam_tpu import config as cfg_mod
from dspslam_tpu.detect import offline, synthetic
from dspslam_tpu.objects import detections as det_mod
from dspslam_tpu.utils import io as io_mod


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_sphere_scene()


@pytest.fixture(scope="module")
def dets(scene):
    return det_mod.build_frame_detections(
        scene.boxes_3d, scene.masks_2d, scene.boxes_2d, scene.velo_pts,
        scene.K, scene.invK, scene.T_cam_velo, scene.image_hw,
    )


class TestMeasurementBuild:
    def test_detections_built_with_masks_and_rays(self, scene, dets):
        assert len(dets) == 2
        for d in dets:
            assert d.num_surface_points > 50
            assert d.mask is not None, "mask association failed"
            assert d.rays is not None
            assert d.num_foreground > 0
            assert len(d.depth) == d.num_foreground

    def test_surface_points_on_sphere(self, scene, dets):
        for d, c in zip(dets, scene.centers_velo[np.argsort(scene.centers_velo[:, 0])]):
            c_cam = scene.T_cam_velo[:3, :3] @ c + scene.T_cam_velo[:3, 3]
            r = np.linalg.norm(d.surface_points - c_cam, axis=-1)
            np.testing.assert_allclose(r, scene.radius, atol=1e-3)

    def test_pose_scale_matches_sphere(self, scene, dets):
        # baked scale * canonical radius 0.5 == world radius
        for d in dets:
            s = np.linalg.det(d.T_cam_obj[:3, :3]) ** (1 / 3)
            np.testing.assert_allclose(s * 0.5, scene.radius, rtol=0.01)

    def test_occlusion_ordering(self, dets):
        # nearest object first, so its occlusion mask is empty
        assert dets[0].occlusion_mask.sum() == 0

    def test_padding_shapes(self, dets):
        batch = det_mod.pad_detections(dets, 8, 256, 512)
        assert batch["pts"].shape == (8, 256, 3)
        assert batch["valid"].sum() == 2
        assert batch["ray_mask"][0].sum() > 0
        assert (batch["fg_mask"] <= batch["ray_mask"]).all()


class TestEndToEnd:
    def test_reconstruct_frame_synthetic(self, tmp_path):
        from dspslam_tpu.apps import reconstruct_frame

        summary = reconstruct_frame.main(
            ["--synthetic", "--output_dir", str(tmp_path), "--voxels_dim", "33"]
        )
        assert len(summary) == 2
        assert all(r["is_good"] for r in summary)
        scene = synthetic.make_sphere_scene()
        order = np.argsort(scene.centers_velo[:, 0])
        for r, c in zip(summary, scene.centers_velo[order]):
            T = np.asarray(r["t_cam_obj"])
            c_cam = scene.T_cam_velo[:3, :3] @ c + scene.T_cam_velo[:3, 3]
            # recovered object center within 10 cm of truth
            np.testing.assert_allclose(T[:3, 3], c_cam, atol=0.1)
            # reconstructed world radius within 5%
            s = np.linalg.det(T[:3, :3]) ** (1 / 3)
            world_r = s * (0.5 + 0.3 * r["code"][0])
            np.testing.assert_allclose(world_r, scene.radius, rtol=0.05)
            # mesh written and readable
            v, f = io_mod.read_mesh_ply(r["mesh"])
            assert len(v) > 50 and len(f) > 50


class TestOfflineLabels:
    def test_npz_roundtrip(self, scene, tmp_path):
        d2 = str(tmp_path / "2d")
        d3 = str(tmp_path / "3d")
        offline.save_labels_npz(
            d2, d3, 0, scene.boxes_3d, scene.boxes_2d, scene.masks_2d
        )
        boxes3 = offline.load_labels_3d(d3, 0)
        np.testing.assert_allclose(boxes3, scene.boxes_3d)
        boxes2, masks2 = offline.load_labels_2d(d2, 0)
        np.testing.assert_allclose(boxes2, scene.boxes_2d)
        assert masks2.dtype == bool

    def test_reference_lbl_format(self, scene, tmp_path):
        """torch.save'd .lbl files (the reference's cached-label format)."""
        import torch

        d = tmp_path / "lbl"
        d.mkdir()
        torch.save(scene.boxes_3d, d / "000005.lbl")
        out = offline.load_labels_3d(str(d), 5)
        np.testing.assert_allclose(out, scene.boxes_3d)
        torch.save(
            {"pred_boxes": scene.boxes_2d, "pred_masks": scene.masks_2d},
            d / "000006.lbl",
        )
        b, m = offline.load_labels_2d(str(d), 6)
        assert m.shape == scene.masks_2d.shape


class TestConfig:
    def test_loads_reference_kitti_json(self):
        cfg = cfg_mod.SystemConfig.from_reference_json(
            "/root/reference/configs/config_kitti.json"
        )
        assert cfg.optimizer.k2 == 100.0
        assert cfg.optimizer.k4 == 1e7
        assert cfg.optimizer.num_iterations == 10
        assert cfg.optimizer.pose_only_iterations == 5
        assert cfg.detection.num_lidar_max == 250
        assert cfg.voxels_dim == 32

    def test_loads_reference_mono_json(self):
        cfg = cfg_mod.SystemConfig.from_reference_json(
            "/root/reference/configs/config_redwood_01053.json"
        )
        assert cfg.optimizer.k1 == 10.0
        assert cfg.optimizer.k4 == 0.0
        assert cfg.optimizer.scale_damping == 100.0


class TestKittiCalib:
    def test_cam2_calibration(self, tmp_path):
        calib_txt = (
            "P0: 707.0912 0 601.8873 0 0 707.0912 183.1104 0 0 0 1 0\n"
            "P2: 707.0912 0 601.8873 46.82 0 707.0912 183.1104 0 0 0 1 0\n"
            "Tr: 0.0002 -0.9999 -0.0106 -0.0027 0.0104 0.0106 -0.9998 -0.0752 "
            "0.9999 0.0001 0.0105 -0.2721\n"
        )
        path = tmp_path / "calib.txt"
        path.write_text(calib_txt)
        calib = io_mod.read_kitti_calib(str(path))
        K, T_cam_velo = io_mod.kitti_cam2_calibration(calib)
        assert K[0, 0] == pytest.approx(707.0912)
        assert T_cam_velo[0, 3] == pytest.approx(46.82 / 707.0912 - 0.0027, abs=1e-3)
        # rotation block orthonormal
        np.testing.assert_allclose(
            T_cam_velo[:3, :3] @ T_cam_velo[:3, :3].T, np.eye(3), atol=1e-3
        )


class TestScaleInitCalibration:
    """ObjectPipeline seeds new-object GN scale from the decoder's
    zero-code half-extent (the reference bakes this prior as fixed
    factors: MapObject.cc:324-435 T=0.40*l*R)."""

    def _pipeline(self, **kw):
        from dspslam_tpu.models import deepsdf
        from dspslam_tpu.objects.pipeline import ObjectPipeline
        from dspslam_tpu.shape import gn
        from dspslam_tpu.slam.map import Map

        return ObjectPipeline(
            Map(), deepsdf.sphere_decoder_fn,
            deepsdf.make_sphere_params(code_len=8),
            gn.GNConfig(code_len=8, num_iterations=2),
            extract_meshes=False, **kw,
        )

    def test_measures_canonical_surface_radius(self):
        pipe = self._pipeline()
        # analytic zero-code sphere has surface radius 0.5
        assert pipe.canonical_half_extent == pytest.approx(0.5, abs=0.06)

    def test_calibrated_init_rescales_to_surface_points(self):
        pipe = self._pipeline()
        r0 = pipe.canonical_half_extent
        t = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
        t[:, :3, :3] *= 2.0
        t[:, 2, 3] = 10.0
        rng = np.random.default_rng(0)
        d = rng.normal(size=(120, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)

        class DetStub:
            # surface points on a radius-1.4 sphere about the center
            surface_points = (
                np.array([0, 0, 10.0], np.float32) + 1.4 * d
            ).astype(np.float32)
            num_surface_points = 120

        class NoPts:
            surface_points = None
            num_surface_points = 0

        out = pipe._calibrated_t_init(t.copy(), [DetStub(), NoPts()])
        s0 = np.linalg.det(out[0, :3, :3]) ** (1 / 3)
        assert s0 == pytest.approx(1.4 / r0, rel=1e-3)
        # detections without points keep their original scale
        s1 = np.linalg.det(out[1, :3, :3]) ** (1 / 3)
        assert s1 == pytest.approx(2.0, rel=1e-4)

    def test_opt_out(self):
        pipe = self._pipeline(calibrate_scale_init=False)
        assert pipe.canonical_half_extent is None
        t = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1)) * 2.0
        out = pipe._calibrated_t_init(t.copy(), [object()])
        assert np.allclose(out, t)
