"""Mask R-CNN detector tests: backbone/FPN shapes, RoIAlign correctness,
NMS, end-to-end API, validity filter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.detect import maskrcnn as mr

CFG = mr.MaskRCNNConfig(
    num_classes=4, stage_blocks=(1, 1, 1, 1), fpn_channels=32, fc_dim=64,
    rpn_pre_nms=64, rpn_post_nms=16, max_detections=5,
)
RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def params():
    return mr.init_params(CFG, jax.random.PRNGKey(0))


class TestBackbone:
    def test_fpn_pyramid_shapes(self, params):
        img = jnp.asarray(RNG.normal(size=(1, 3, 128, 160)), jnp.float32)
        feats = mr.resnet_fpn(params, img, CFG)
        assert len(feats) == 5
        # strides 4, 8, 16, 32, 64
        for f, s in zip(feats, [4, 8, 16, 32, 64]):
            assert f.shape[-2:] == (-(-128 // s), -(-160 // s)), (f.shape, s)
            assert f.shape[1] == CFG.fpn_channels


class TestRoIAlign:
    def test_constant_region(self):
        feat = jnp.zeros((1, 32, 32)).at[:, 8:16, 8:16].set(5.0)
        out = mr.roi_align(feat, jnp.asarray([[8.0, 8.0, 16.0, 16.0]]), 4)
        np.testing.assert_allclose(np.asarray(out)[0, 0], 5.0, atol=0.5)

    def test_matmul_formulation_parity(self):
        # roi_align_matmul must reproduce the gather formulation's
        # samples (same positions/weights, matmul associativity only)
        rng = np.random.default_rng(7)
        feat = jnp.asarray(rng.normal(size=(16, 40, 56)).astype(np.float32))
        x0 = rng.uniform(0, 40, 12)
        y0 = rng.uniform(0, 28, 12)
        boxes = np.stack(
            [x0, y0, x0 + rng.uniform(2, 14, 12),
             y0 + rng.uniform(2, 10, 12)], -1
        ).astype(np.float32)
        # include boxes spilling past every border (index-clamp path)
        boxes[-3] = [-5.0, -3.0, 10.0, 8.0]
        boxes[-2] = [48.0, 32.0, 60.0, 45.0]
        boxes[-1] = [-4.0, -4.0, 60.0, 44.0]
        boxes = jnp.asarray(boxes)
        a = np.asarray(mr.roi_align(feat, boxes, 7))
        b = np.asarray(mr.roi_align_matmul(feat, boxes, 7))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_gradient_region(self):
        # feature = x coordinate; crop of [4, 12] spans values 4..12
        f = jnp.broadcast_to(jnp.arange(32, dtype=jnp.float32), (1, 32, 32))
        out = mr.roi_align(f, jnp.asarray([[4.0, 0.0, 12.0, 8.0]]), 5)
        row = np.asarray(out)[0, 0, 0]
        # bin centers: 4 + (k + 0.5)/5 * 8 -> 4.8 .. 11.2
        assert row[0] == pytest.approx(4.8, abs=0.3)
        assert row[-1] == pytest.approx(11.2, abs=0.3)
        assert np.all(np.diff(row) > 0)


class TestNMS:
    def test_greedy_nms(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [30, 30, 40, 40], [0, 0, 0, 0]],
            jnp.float32,
        )
        scores = jnp.asarray([0.9, 0.8, 0.7, -1e9])
        kb, ks, kv = mr.greedy_nms(boxes, scores, 3, 0.5, score_thresh=0.0)
        v = np.asarray(kv) > 0
        assert v.sum() == 2
        np.testing.assert_allclose(np.asarray(kb)[0], [0, 0, 10, 10])
        np.testing.assert_allclose(np.asarray(kb)[1], [30, 30, 40, 40])

    def test_iou_matrix(self):
        a = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        b = jnp.asarray([[5, 0, 15, 10], [20, 20, 30, 30]], jnp.float32)
        iou = np.asarray(mr.iou_matrix(a, b))
        assert iou[0, 0] == pytest.approx(50.0 / 150.0, abs=1e-5)
        assert iou[0, 1] == 0.0


class TestEndToEnd:
    def test_detect_runs_fixed_shapes(self, params):
        img = RNG.uniform(0, 255, (128, 160, 3)).astype(np.float32)
        out = mr.detect(params, jnp.asarray(img), (128, 160), CFG)
        assert out["boxes"].shape == (CFG.max_detections, 4)
        assert out["mask_logits"].shape[0] == CFG.max_detections
        assert np.isfinite(np.asarray(out["boxes"])).all()

    def test_detector_api(self, params):
        det = mr.Detector2D(params=params, cfg=CFG, object_class="cars")
        det.class_ids = [0, 1, 2, 3]
        out = det.make_prediction(RNG.uniform(0, 255, (128, 160, 3)))
        assert "pred_boxes" in out and "pred_masks" in out
        assert out["pred_masks"].ndim == 3


class TestValidityFilter:
    def test_reference_margin_and_area_rules(self):
        boxes = np.asarray(
            [
                [100, 50, 300, 200, 0.9],     # valid
                [5, 50, 300, 200, 0.9],       # too close to left margin
                [100, 50, 130, 70, 0.9],      # too small
                [100, 50, 300, 200, 0.5],     # low score
            ],
            np.float32,
        )
        masks = np.ones((4, 376, 1241), bool)
        kb, km = mr.get_valid_detections(boxes, masks, (376, 1241))
        assert len(kb) == 1
        np.testing.assert_allclose(kb[0][:4], [100, 50, 300, 200])


class TestCheckpointIngestion:
    def test_load_mmdet_state_dict(self, tmp_path):
        import torch

        cfg = CFG
        sd = {}

        def add_conv_bn(conv, bn, cout, cin, k):
            sd[conv + ".weight"] = torch.randn(cout, cin, k, k)
            sd[bn + ".weight"] = torch.randn(cout)
            sd[bn + ".bias"] = torch.randn(cout)
            sd[bn + ".running_mean"] = torch.randn(cout)
            sd[bn + ".running_var"] = torch.rand(cout) + 0.5

        add_conv_bn("backbone.conv1", "backbone.bn1", 64, 3, 7)
        cin, width = 64, 64
        for si in range(4):
            cout = width * 4
            for bi in range(cfg.stage_blocks[si]):
                base = f"backbone.layer{si + 1}.{bi}"
                ci = cin if bi == 0 else cout
                add_conv_bn(base + ".conv1", base + ".bn1", width, ci, 1)
                add_conv_bn(base + ".conv2", base + ".bn2", width, width, 3)
                add_conv_bn(base + ".conv3", base + ".bn3", cout, width, 1)
                if bi == 0:
                    add_conv_bn(
                        base + ".downsample.0", base + ".downsample.1",
                        cout, cin, 1,
                    )
            cin, width = cout, width * 2

        def add_conv(key, cout, cin, k):
            sd[key + ".weight"] = torch.randn(cout, cin, k, k)
            sd[key + ".bias"] = torch.randn(cout)

        c = cfg.fpn_channels
        for i, ch in enumerate((256, 512, 1024, 2048)):
            add_conv(f"neck.lateral_convs.{i}.conv", c, ch, 1)
            add_conv(f"neck.fpn_convs.{i}.conv", c, c, 3)
        n_anchor = 3
        add_conv("rpn_head.rpn_conv", c, c, 3)
        add_conv("rpn_head.rpn_cls", n_anchor, c, 1)
        add_conv("rpn_head.rpn_reg", n_anchor * 4, c, 1)
        din = c * cfg.roi_size**2
        sd["roi_head.bbox_head.shared_fcs.0.weight"] = torch.randn(cfg.fc_dim, din)
        sd["roi_head.bbox_head.shared_fcs.0.bias"] = torch.randn(cfg.fc_dim)
        sd["roi_head.bbox_head.shared_fcs.1.weight"] = torch.randn(
            cfg.fc_dim, cfg.fc_dim
        )
        sd["roi_head.bbox_head.shared_fcs.1.bias"] = torch.randn(cfg.fc_dim)
        sd["roi_head.bbox_head.fc_cls.weight"] = torch.randn(
            cfg.num_classes + 1, cfg.fc_dim
        )
        sd["roi_head.bbox_head.fc_cls.bias"] = torch.randn(cfg.num_classes + 1)
        sd["roi_head.bbox_head.fc_reg.weight"] = torch.randn(
            cfg.num_classes * 4, cfg.fc_dim
        )
        sd["roi_head.bbox_head.fc_reg.bias"] = torch.randn(cfg.num_classes * 4)
        for i in range(4):
            add_conv(f"roi_head.mask_head.convs.{i}.conv", c, c, 3)
        sd["roi_head.mask_head.upsample.weight"] = torch.randn(c, c, 2, 2)
        sd["roi_head.mask_head.upsample.bias"] = torch.randn(c)
        add_conv("roi_head.mask_head.conv_logits", cfg.num_classes, c, 1)

        path = tmp_path / "mrcnn.pth"
        torch.save({"state_dict": sd}, path)
        params = mr.load_mmdet_checkpoint(str(path), cfg)
        # loaded net runs
        img = RNG.uniform(0, 255, (128, 160, 3)).astype(np.float32)
        out = mr.detect(params, jnp.asarray(img), (128, 160), cfg)
        assert np.isfinite(np.asarray(out["scores"])).all()


class TestFPNLevelAssignment:
    def test_matches_mmdet_formula(self):
        import numpy as np
        from dspslam_tpu.detect.maskrcnn import fpn_level_of

        rng = np.random.default_rng(0)
        boxes = []
        for _ in range(50):
            w = rng.uniform(8, 900)
            h = rng.uniform(8, 900)
            x, y = rng.uniform(0, 100, 2)
            boxes.append([x, y, x + w, y + h])
        boxes = np.asarray(boxes, np.float32)
        got = np.asarray(fpn_level_of(boxes))
        wh = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        expect = np.floor(4 + np.log2(np.sqrt(wh) / 224 + 1e-8))
        expect = np.clip(expect, 2, 5) - 2
        np.testing.assert_array_equal(got, expect.astype(np.int32))

    def test_small_box_uses_p2_large_uses_p5(self):
        import numpy as np
        from dspslam_tpu.detect.maskrcnn import fpn_level_of

        boxes = np.array(
            [[0, 0, 32, 32], [0, 0, 1000, 800]], np.float32
        )
        lv = np.asarray(fpn_level_of(boxes))
        assert lv[0] == 0 and lv[1] == 3
