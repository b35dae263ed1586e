"""Exact rotated-rectangle IoU in the BEV plane, fixed-shape JAX.

The reference's PointPillars path uses mmcv's CUDA rotated-NMS
(nms_gpu over BEV rectangles); this is the TPU-native equivalent:
convex polygon intersection by Sutherland-Hodgman clipping, expressed
with fixed-size vertex buffers + validity counts so the whole pairwise
IoU matrix compiles to one dense program (no data-dependent shapes).

A 4-gon clipped by a 4-gon has at most 8 vertices; buffers are padded
to 16 for slack. Degenerate (zero-area) inputs yield IoU 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_V = 16          # vertex buffer size (>= 8 needed)


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """Boxes (..., 7) [x, y, z, w, l, h, yaw] -> BEV corners (..., 4, 2).

    The rectangle spans l along the heading axis and w across it
    (mmdet3d LiDAR box convention). Corners are emitted counter-
    clockwise — the Sutherland-Hodgman inside test requires it."""
    x, y = boxes[..., 0], boxes[..., 1]
    w, l, yaw = boxes[..., 3], boxes[..., 4], boxes[..., 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    dx = jnp.stack([l, -l, -l, l], axis=-1) * 0.5
    dy = jnp.stack([w, w, -w, -w], axis=-1) * 0.5
    cx = x[..., None] + dx * c[..., None] - dy * s[..., None]
    cy = y[..., None] + dx * s[..., None] + dy * c[..., None]
    return jnp.stack([cx, cy], axis=-1)


def _polygon_area(poly: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of the first n vertices of poly (V, 2)."""
    idx = jnp.arange(_V)
    nxt = jnp.take(poly, jnp.where(n > 0, (idx + 1) % jnp.maximum(n, 1), 0),
                   axis=0)
    valid = (idx < n).astype(poly.dtype)
    cross = poly[:, 0] * nxt[:, 1] - poly[:, 1] * nxt[:, 0]
    return 0.5 * jnp.abs(jnp.sum(cross * valid))


def _clip_halfplane(poly, n, a, b):
    """Clip polygon (first n of (V, 2)) against the half-plane to the
    LEFT of directed edge a->b. Returns (poly', n')."""
    idx = jnp.arange(_V)
    safe_n = jnp.maximum(n, 1)
    nxt_idx = jnp.where(n > 0, (idx + 1) % safe_n, 0)
    cur = poly
    nxt = jnp.take(poly, nxt_idx, axis=0)
    e = b - a
    side_cur = e[0] * (cur[:, 1] - a[1]) - e[1] * (cur[:, 0] - a[0])
    side_nxt = e[0] * (nxt[:, 1] - a[1]) - e[1] * (nxt[:, 0] - a[0])
    in_cur = side_cur >= 0
    in_nxt = side_nxt >= 0
    denom = side_cur - side_nxt
    t = side_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = cur + t[:, None] * (nxt - cur)

    live = idx < n
    emit_cur = in_cur & live
    emit_int = (in_cur != in_nxt) & live
    # interleave: slot 2i = cur_i, slot 2i+1 = intersection_i
    pts = jnp.zeros((2 * _V, 2), poly.dtype)
    pts = pts.at[0::2].set(cur).at[1::2].set(inter)
    val = jnp.zeros((2 * _V,), bool)
    val = val.at[0::2].set(emit_cur).at[1::2].set(emit_int)
    # stable compaction of valid points to the front
    pos = jnp.cumsum(val.astype(jnp.int32)) - 1
    out = jnp.zeros((_V, 2), poly.dtype)
    write = jnp.where(val, jnp.minimum(pos, _V - 1), _V - 1)
    # scatter valid points; invalid ones all collide on slot V-1 and are
    # masked out by the count
    out = out.at[write].set(jnp.where(val[:, None], pts, 0.0), mode="drop")
    n_new = jnp.minimum(jnp.sum(val.astype(jnp.int32)), _V)
    return out, n_new


def _pair_intersection_area(corners_a: jnp.ndarray, corners_b: jnp.ndarray):
    """Intersection area of two convex quads (4, 2) each."""
    poly = jnp.zeros((_V, 2), corners_a.dtype).at[:4].set(corners_a)
    n = jnp.int32(4)
    for i in range(4):
        a = corners_b[i]
        b = corners_b[(i + 1) % 4]
        poly, n = _clip_halfplane(poly, n, a, b)
    return _polygon_area(poly, n)


def rotated_iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """(N, 7) x (M, 7) -> (N, M) exact BEV rotated IoU."""
    ca = box_corners_bev(boxes_a)                       # (N, 4, 2)
    cb = box_corners_bev(boxes_b)                       # (M, 4, 2)
    # corner winding: box_corners_bev emits counter-clockwise order for
    # positive w/l (left-of-edge test assumes CCW clip polygon)
    inter = jax.vmap(
        lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(cb)
    )(ca)                                               # (N, M)
    area_a = boxes_a[:, 3] * boxes_a[:, 4]
    area_b = boxes_b[:, 3] * boxes_b[:, 4]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 1e-9, inter / jnp.maximum(union, 1e-9), 0.0)
