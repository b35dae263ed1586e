"""Exact BEV rotated IoU vs a brute-force rasterization oracle."""

import numpy as np
import pytest

from dspslam_tpu.ops.rotated_iou import box_corners_bev, rotated_iou_matrix


def raster_iou(b1, b2, res=0.02):
    """Rasterization oracle: count overlap cells on a fine grid."""
    def corners(b):
        x, y, _, w, l, _, yaw = b
        c, s = np.cos(yaw), np.sin(yaw)
        dx = np.array([l, -l, -l, l]) / 2
        dy = np.array([w, w, -w, -w]) / 2
        return np.stack([x + dx * c - dy * s, y + dx * s + dy * c], -1)

    def inside(pts, b):
        x, y, _, w, l, _, yaw = b
        c, s = np.cos(yaw), np.sin(yaw)
        lx = (pts[..., 0] - x) * c + (pts[..., 1] - y) * s
        ly = -(pts[..., 0] - x) * s + (pts[..., 1] - y) * c
        return (np.abs(lx) <= l / 2) & (np.abs(ly) <= w / 2)

    cs = np.concatenate([corners(b1), corners(b2)])
    lo, hi = cs.min(0) - res, cs.max(0) + res
    xs = np.arange(lo[0], hi[0], res)
    ys = np.arange(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx, gy], -1)
    m1, m2 = inside(pts, b1), inside(pts, b2)
    inter = (m1 & m2).sum() * res * res
    union = (m1 | m2).sum() * res * res
    return inter / union if union > 0 else 0.0


def make_box(x, y, w, l, yaw):
    return np.array([x, y, 0.0, w, l, 1.5, yaw], np.float32)


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = make_box(1.0, 2.0, 1.6, 3.9, 0.3)
        iou = np.asarray(rotated_iou_matrix(b[None], b[None]))[0, 0]
        assert abs(iou - 1.0) < 1e-4

    def test_disjoint(self):
        b1 = make_box(0, 0, 1.6, 3.9, 0.0)
        b2 = make_box(10, 10, 1.6, 3.9, 1.0)
        iou = np.asarray(rotated_iou_matrix(b1[None], b2[None]))[0, 0]
        assert iou == 0.0

    def test_axis_aligned_half_overlap(self):
        # 2x2 squares offset by 1 in x: inter 2, union 6 -> 1/3
        b1 = make_box(0, 0, 2, 2, 0.0)
        b2 = make_box(1, 0, 2, 2, 0.0)
        iou = np.asarray(rotated_iou_matrix(b1[None], b2[None]))[0, 0]
        assert abs(iou - 1.0 / 3.0) < 1e-4

    def test_crossed_rectangles(self):
        # two 1x4 rects crossed at 90 deg through the center:
        # inter = 1, union = 4 + 4 - 1 = 7
        b1 = make_box(0, 0, 1, 4, 0.0)
        b2 = make_box(0, 0, 1, 4, np.pi / 2)
        iou = np.asarray(rotated_iou_matrix(b1[None], b2[None]))[0, 0]
        assert abs(iou - 1.0 / 7.0) < 1e-4

    def test_random_pairs_vs_raster_oracle(self):
        rng = np.random.default_rng(7)
        boxes = []
        for _ in range(12):
            boxes.append(
                make_box(
                    rng.uniform(-2, 2), rng.uniform(-2, 2),
                    rng.uniform(1.0, 2.5), rng.uniform(2.5, 5.0),
                    rng.uniform(-np.pi, np.pi),
                )
            )
        boxes = np.stack(boxes)
        M = np.asarray(rotated_iou_matrix(boxes, boxes))
        # symmetry + diagonal
        np.testing.assert_allclose(M, M.T, atol=1e-4)
        np.testing.assert_allclose(np.diag(M), 1.0, atol=1e-4)
        for i in range(0, 12, 3):
            for j in range(1, 12, 4):
                oracle = raster_iou(boxes[i], boxes[j])
                assert abs(M[i, j] - oracle) < 0.02, (i, j, M[i, j], oracle)

    def test_corners_ccw(self):
        c = np.asarray(box_corners_bev(make_box(0, 0, 1.6, 3.9, 0.7)[None]))[0]
        # CCW winding -> positive shoelace area == w*l
        area = 0.5 * np.sum(
            c[:, 0] * np.roll(c[:, 1], -1) - c[:, 1] * np.roll(c[:, 0], -1)
        )
        assert area > 0
        assert abs(area - 1.6 * 3.9) < 1e-4
