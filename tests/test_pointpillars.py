"""PointPillars detector tests: pillarization, network shapes, box
decoding, NMS, and mmdet3d checkpoint ingestion structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.detect import pointpillars as pp

# small config for CPU tests
CFG = pp.PointPillarsConfig(
    pc_range=(0.0, -10.24, -3.0, 20.48, 10.24, 1.0),
    voxel_size=(0.32, 0.32, 4.0),
    max_pillars=1024,
    max_points_per_pillar=16,
    pfn_channels=32,
    backbone_layers=(2, 2, 2),
    backbone_channels=(32, 64, 128),
    fpn_channels=(32, 32, 32),
    nms_pre=64,
    max_detections=10,
)
RNG = np.random.default_rng(17)


def car_scan(centers=((8.0, 2.0),), n_bg=2000):
    """Synthetic scan: car-sized point blobs + ground."""
    pts = [
        np.concatenate(
            [
                RNG.normal([cx, cy, -1.5], [1.0, 0.4, 0.3], (300, 3)),
                np.ones((300, 1)),
            ],
            axis=-1,
        )
        for cx, cy in centers
    ]
    ground = np.concatenate(
        [
            np.stack(
                [RNG.uniform(0, 20, n_bg), RNG.uniform(-10, 10, n_bg),
                 np.full(n_bg, -2.0)], axis=-1,
            ),
            np.ones((n_bg, 1)),
        ],
        axis=-1,
    )
    return np.concatenate(pts + [ground]).astype(np.float32)


class TestPillarize:
    def test_shapes_and_masks(self):
        scan = car_scan()
        out = pp.pillarize(scan, CFG)
        P, M = CFG.max_pillars, CFG.max_points_per_pillar
        assert out["features"].shape == (P, M, 10)
        assert out["mask"].shape == (P, M)
        assert 0 < out["pillar_mask"].sum() <= P
        # pillar coords in grid bounds
        nx, ny = CFG.grid_size
        live = out["pillar_mask"] > 0
        assert out["coords"][live, 0].max() < nx
        assert out["coords"][live, 1].max() < ny

    def test_centroid_offsets_zero_mean(self):
        scan = car_scan()
        out = pp.pillarize(scan, CFG)
        live = out["pillar_mask"] > 0
        # per-pillar centroid offsets sum to ~0 over live points
        s = (out["features"][live][:, :, 4:7] * out["mask"][live][..., None]).sum(1)
        np.testing.assert_allclose(s, 0.0, atol=1e-3)

    def test_out_of_range_dropped(self):
        pts = np.array([[100.0, 0, 0, 1], [5.0, 0, -1.5, 1]], np.float32)
        out = pp.pillarize(pts, CFG)
        assert out["pillar_mask"].sum() == 1


class TestNetwork:
    def test_forward_shapes(self):
        params = pp.init_params(CFG, jax.random.PRNGKey(0))
        pil = pp.pillarize(car_scan(), CFG)
        pil = {k: jnp.asarray(v) for k, v in pil.items()}
        cls, box, direc = pp.forward(params, pil, CFG)
        nx, ny = CFG.grid_size
        A = (nx // 2) * (ny // 2) * 2
        assert cls.shape == (A,)
        assert box.shape == (A, 7)
        assert direc.shape == (A, 2)
        assert np.isfinite(np.asarray(cls)).all()

    def test_decode_identity_deltas(self):
        anchors = jnp.asarray(
            [[5.0, 1.0, -1.78, 1.6, 3.9, 1.56, 0.0]], jnp.float32
        )
        boxes = pp.decode_boxes(jnp.zeros((1, 7)), anchors)
        np.testing.assert_allclose(np.asarray(boxes)[0], np.asarray(anchors)[0],
                                   atol=1e-6)

    def test_decode_shift_and_scale(self):
        anchors = jnp.asarray(
            [[0.0, 0.0, -1.78, 1.6, 3.9, 1.56, 0.0]], jnp.float32
        )
        diag = np.sqrt(1.6**2 + 3.9**2)
        deltas = jnp.asarray([[1.0, 0.0, 0.0, np.log(2.0), 0, 0, 0.3]])
        b = np.asarray(pp.decode_boxes(deltas, anchors))[0]
        assert b[0] == pytest.approx(diag, rel=1e-5)
        assert b[3] == pytest.approx(3.2, rel=1e-5)
        assert b[6] == pytest.approx(0.3, rel=1e-5)


class TestNMS:
    def test_suppresses_duplicates_keeps_distant(self):
        A = 64
        cls = jnp.full((A,), -10.0)
        boxes = jnp.zeros((A, 7)).at[:, 3:6].set(jnp.asarray([1.6, 3.9, 1.56]))
        # three candidates: two overlapping at (5, 0), one far at (15, 5)
        cls = cls.at[0].set(4.0).at[1].set(3.0).at[2].set(2.0)
        boxes = boxes.at[0, :2].set(jnp.asarray([5.0, 0.0]))
        boxes = boxes.at[1, :2].set(jnp.asarray([5.3, 0.1]))
        boxes = boxes.at[2, :2].set(jnp.asarray([15.0, 5.0]))
        dirs = jnp.zeros((A, 2))
        cfg = pp.PointPillarsConfig(nms_pre=A, max_detections=5)
        out, scores, valid = pp.select_detections(cls, boxes, dirs, cfg)
        v = np.asarray(valid) > 0
        assert v.sum() == 2
        kept = np.asarray(out)[v]
        assert any(abs(k[0] - 5.0) < 0.5 for k in kept)
        assert any(abs(k[0] - 15.0) < 0.5 for k in kept)

    def test_direction_flip(self):
        A = 64
        cls = jnp.full((A,), -10.0).at[0].set(4.0)
        boxes = jnp.zeros((A, 7)).at[0, :2].set(jnp.asarray([5.0, 0.0]))
        boxes = boxes.at[:, 3:6].set(jnp.asarray([1.6, 3.9, 1.56]))
        dirs = jnp.zeros((A, 2)).at[0, 1].set(5.0)   # flip class wins
        cfg = pp.PointPillarsConfig(nms_pre=A, max_detections=5)
        out, _, valid = pp.select_detections(cls, boxes, dirs, cfg)
        assert np.asarray(out)[0, 6] == pytest.approx(np.pi, abs=1e-5)


class TestDetectorAPI:
    def test_make_prediction_runs(self):
        det = pp.Detector3D(cfg=CFG)
        out = det.make_prediction(car_scan())
        assert out.ndim == 2 and out.shape[1] == 7


class TestCheckpointIngestion:
    def test_load_mmdet3d_state_dict(self, tmp_path):
        """Synthesize a state dict with mmdet3d key conventions and check
        it loads with BN folding and correct shapes."""
        import torch

        cfg = CFG
        sd = {}
        sd["voxel_encoder.pfn_layers.0.linear.weight"] = torch.randn(
            cfg.pfn_channels, 10
        )
        for suffix, shape in (
            ("weight", (cfg.pfn_channels,)), ("bias", (cfg.pfn_channels,)),
            ("running_mean", (cfg.pfn_channels,)),
        ):
            sd[f"voxel_encoder.pfn_layers.0.norm.{suffix}"] = torch.randn(shape)
        sd["voxel_encoder.pfn_layers.0.norm.running_var"] = torch.rand(
            cfg.pfn_channels
        ) + 0.5
        cin = cfg.pfn_channels
        for bi, (n, cout) in enumerate(zip(cfg.backbone_layers, cfg.backbone_channels)):
            for li in range(n + 1):
                ci = cin if li == 0 else cout
                sd[f"backbone.blocks.{bi}.{li * 3}.weight"] = torch.randn(
                    cout, ci, 3, 3
                )
                bn = f"backbone.blocks.{bi}.{li * 3 + 1}"
                sd[bn + ".weight"] = torch.randn(cout)
                sd[bn + ".bias"] = torch.randn(cout)
                sd[bn + ".running_mean"] = torch.randn(cout)
                sd[bn + ".running_var"] = torch.rand(cout) + 0.5
            cin = cout
        for di, (ci, co) in enumerate(zip(cfg.backbone_channels, cfg.fpn_channels)):
            sd[f"neck.deblocks.{di}.0.weight"] = torch.randn(ci, co, 2, 2)
            bn = f"neck.deblocks.{di}.1"
            sd[bn + ".weight"] = torch.randn(co)
            sd[bn + ".bias"] = torch.randn(co)
            sd[bn + ".running_mean"] = torch.randn(co)
            sd[bn + ".running_var"] = torch.rand(co) + 0.5
        feat = sum(cfg.fpn_channels)
        sd["bbox_head.conv_cls.weight"] = torch.randn(2, feat, 1, 1)
        sd["bbox_head.conv_cls.bias"] = torch.randn(2)
        sd["bbox_head.conv_reg.weight"] = torch.randn(14, feat, 1, 1)
        sd["bbox_head.conv_reg.bias"] = torch.randn(14)
        sd["bbox_head.conv_dir_cls.weight"] = torch.randn(4, feat, 1, 1)
        sd["bbox_head.conv_dir_cls.bias"] = torch.randn(4)
        path = tmp_path / "pp.pth"
        torch.save({"state_dict": sd}, path)

        params = pp.load_mmdet3d_checkpoint(str(path), cfg)
        assert params["pfn"]["w"].shape == (10, cfg.pfn_channels)
        # loaded detector runs end-to-end
        det = pp.Detector3D(params=params, cfg=cfg)
        out = det.make_prediction(car_scan())
        assert out.shape[1] == 7


class TestSparsePillarize:
    def test_device_build_matches_dense_host(self):
        """pillarize_sparse + build_pillars_device must reproduce the
        dense host pillarize tensors (modulo per-pillar point order,
        which both derive from the same stable sort, and the 2 mm
        fixed-point transport quantization — offsets difference two
        quantized values, so 4 mm worst case)."""
        import jax.numpy as jnp

        scan = car_scan()
        dense = pp.pillarize(scan, CFG)
        sp = pp.pillarize_sparse(scan, CFG)
        built = pp.build_pillars_device(
            {k: jnp.asarray(v) for k, v in sp.items()}, CFG
        )
        np.testing.assert_allclose(
            np.asarray(built["mask"]), dense["mask"], atol=0
        )
        np.testing.assert_array_equal(
            np.asarray(built["coords"]), dense["coords"]
        )
        np.testing.assert_allclose(
            np.asarray(built["pillar_mask"]), dense["pillar_mask"]
        )
        np.testing.assert_allclose(
            np.asarray(built["features"]), dense["features"],
            atol=2.5 * pp.PT_QUANT,
        )

    def test_compact_transport_is_small(self):
        """The whole sparse upload stays under ~0.75 MB for a 60k-point
        scan (the r2 naive-sparse layout was 1.6 MB; dense is 15 MB)."""
        rng = np.random.default_rng(0)
        scan = np.concatenate([
            rng.uniform([0, -30, -2.5, 0], [45, 30, 0.5, 1], (60_000, 4))
        ]).astype(np.float32)
        sp = pp.pillarize_sparse(scan, CFG)
        total = sum(
            v.nbytes if hasattr(v, "nbytes") else 4 for v in sp.values()
        )
        assert total < 0.75 * 2**20, f"{total / 2**20:.2f} MB"

    def test_point_cap_truncates_safely(self):
        import jax.numpy as jnp

        scan = car_scan()
        sp = pp.pillarize_sparse(scan, CFG, point_cap=64)
        assert sp["pts_q"].shape == (64, 4)
        built = pp.build_pillars_device(
            {k: jnp.asarray(v) for k, v in sp.items()}, CFG
        )
        assert np.isfinite(np.asarray(built["features"])).all()


class TestDeviceAssignment:
    """build_pillars_from_points (on-device sort/segment/top-k pillar
    assignment) vs the host pillarize_sparse + build_pillars_device
    reference path."""

    @staticmethod
    def _canvas(pil, cfg):
        """Scatter pillar tensors onto the BEV grid keyed by coords —
        slot order is irrelevant to the network, so parity is defined
        at canvas level (forward() consumes exactly this scatter)."""
        nx, ny = cfg.grid_size
        feats = np.zeros((ny, nx, cfg.max_points_per_pillar, 10), np.float32)
        mask = np.zeros((ny, nx, cfg.max_points_per_pillar), np.float32)
        c = np.asarray(pil["coords"])
        pm = np.asarray(pil["pillar_mask"])
        f = np.asarray(pil["features"])
        m = np.asarray(pil["mask"])
        for j in range(len(c)):
            if pm[j] > 0:
                feats[c[j, 1], c[j, 0]] = f[j]
                mask[c[j, 1], c[j, 0]] = m[j]
        return feats, mask

    def test_matches_host_path_exactly_under_cap(self):
        scan = car_scan(centers=((8.0, 2.0), (14.0, -4.0)))
        # the host path assigns pillars from float coords, the device
        # path from the 2 mm-quantized transport values: points within
        # quantization distance of a voxel edge can legitimately land
        # one cell over. Exact parity is defined away from edges.
        fx = (scan[:, 0] - CFG.pc_range[0]) / CFG.voxel_size[0] % 1.0
        fy = (scan[:, 1] - CFG.pc_range[1]) / CFG.voxel_size[1] % 1.0
        margin = 0.01
        scan = scan[
            (fx > margin) & (fx < 1 - margin)
            & (fy > margin) & (fy < 1 - margin)
        ]
        # exact parity needs every occupied pillar kept (past the cap
        # both paths keep the densest P but break count TIES freely)
        cfg = pp.PointPillarsConfig(
            pc_range=CFG.pc_range, voxel_size=CFG.voxel_size,
            max_pillars=4096, max_points_per_pillar=CFG.max_points_per_pillar,
        )
        host = pp.build_pillars_device(
            {k: jnp.asarray(v) for k, v in pp.pillarize_sparse(scan, cfg).items()},
            cfg,
        )
        dev = pp.build_pillars_from_points(
            {k: jnp.asarray(v)
             for k, v in pp.crop_quantize_points(scan, cfg).items()},
            cfg,
        )
        assert float(np.asarray(host["pillar_mask"]).sum()) < cfg.max_pillars
        fh, mh = self._canvas(host, cfg)
        fd, md = self._canvas(dev, cfg)
        np.testing.assert_array_equal(mh, md)
        np.testing.assert_allclose(fh, fd, atol=1e-5)
        assert float(np.asarray(dev["pillar_mask"]).sum()) == float(
            np.asarray(host["pillar_mask"]).sum()
        )

    def test_pillar_cap_keeps_densest(self):
        # more occupied pillars than max_pillars: the kept set must be
        # the densest ones (count ties may fall either way)
        cfg = pp.PointPillarsConfig(
            pc_range=CFG.pc_range, voxel_size=CFG.voxel_size,
            max_pillars=8, max_points_per_pillar=16,
        )
        rng = np.random.default_rng(3)
        # 20 pillars with strictly increasing point counts 1..20
        pts = []
        for i in range(20):
            cx = 0.16 + 0.32 * i
            n = i + 1
            pts.append(np.concatenate([
                np.stack([np.full(n, cx), np.full(n, 0.16),
                          np.full(n, -1.0)], -1)
                + rng.uniform(-0.05, 0.05, (n, 3)),
                np.ones((n, 1)),
            ], -1))
        scan = np.concatenate(pts).astype(np.float32)
        dev = pp.build_pillars_from_points(
            {k: jnp.asarray(v)
             for k, v in pp.crop_quantize_points(scan, cfg).items()},
            cfg,
        )
        kept_ix = sorted(np.asarray(dev["coords"])[:, 0].tolist())
        assert kept_ix == list(range(12, 20))  # the 8 densest pillars
        # kept points respect the per-pillar cap
        want = sum(min(c, cfg.max_points_per_pillar) for c in range(13, 21))
        assert float(np.asarray(dev["mask"]).sum()) == want

    def test_empty_scan(self):
        dev = pp.build_pillars_from_points(
            {k: jnp.asarray(v)
             for k, v in pp.crop_quantize_points(
                 np.zeros((0, 4), np.float32), CFG).items()},
            CFG,
        )
        assert float(np.asarray(dev["pillar_mask"]).sum()) == 0.0
        assert float(np.asarray(dev["mask"]).sum()) == 0.0

    def test_points_per_pillar_cap_keeps_scan_order(self):
        # one pillar with 3x the per-pillar cap: first M in scan order kept
        n = CFG.max_points_per_pillar * 3
        scan = np.concatenate([
            np.stack([np.full(n, 5.01), np.full(n, 0.01),
                      np.linspace(-2.9, 0.9, n)], -1),
            np.linspace(0, 1, n)[:, None],
        ], -1).astype(np.float32)
        dev = pp.build_pillars_from_points(
            {k: jnp.asarray(v)
             for k, v in pp.crop_quantize_points(scan, CFG).items()},
            CFG,
        )
        m = np.asarray(dev["mask"])
        assert float(m.sum()) == CFG.max_points_per_pillar
        slot = int(np.asarray(dev["pillar_mask"]).argmax())
        f = np.asarray(dev["features"])[slot]
        # z of kept points = the FIRST M scan points' z (2 mm quantized)
        want = np.round(
            np.linspace(-2.9, 0.9, n)[: CFG.max_points_per_pillar] / 0.002
        ) * 0.002
        np.testing.assert_allclose(f[:, 2], want, atol=1e-5)

    def test_detector_api_device_assign_runs(self):
        det = pp.Detector3D(cfg=CFG)
        assert det.device_assign
        boxes = det.make_prediction(car_scan())
        assert boxes.ndim == 2 and boxes.shape[1] == 7
