"""PointPillars 3D object detector, TPU-native inference.

Replaces the reference's mmdet3d VoxelNet wrapper (/root/reference/
reconstruct/detector3d.py + configs/config_pointpillars.py) with a
from-scratch JAX implementation of the same architecture:

  pillarize (host/native) -> PillarFeatureNet (linear+BN+ReLU+max)
  -> scatter to BEV canvas -> SECOND backbone (3 conv stages)
  -> SECONDFPN neck (upsample + concat) -> Anchor3DHead
  -> sigmoid scores + delta decoding + rotated-NMS-lite -> (N, 7) boxes

TPU-first choices: the pillar stage runs as dense fixed-cap tensors
(max_pillars x max_points), the BEV scatter is one `.at[].set`, the
backbone/neck/head are NCHW convs (MXU), and NMS is a fixed-K iterative
suppression under `lax.fori_loop`. BatchNorm is folded into conv weights
at load time (inference only). `load_mmdet3d_checkpoint` ingests the
reference's .pth weights by mmdet3d key convention.

Defaults mirror config_pointpillars.py: range [-20,-39.68,-3, 49.12,
39.68, 1], voxel 0.16x0.16x4, car anchor (1.6, 3.9, 1.56) at z=-1.78
with rotations {0, pi/2}, score threshold 0.1, 50 boxes max.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class PointPillarsConfig:
    pc_range: tuple = (-20.0, -39.68, -3.0, 49.12, 39.68, 1.0)
    voxel_size: tuple = (0.16, 0.16, 4.0)
    max_points_per_pillar: int = 32
    max_pillars: int = 12000
    pfn_channels: int = 64
    backbone_layers: tuple = (3, 5, 5)
    backbone_strides: tuple = (2, 2, 2)
    backbone_channels: tuple = (64, 128, 256)
    fpn_upsample: tuple = (1, 2, 4)
    fpn_channels: tuple = (128, 128, 128)
    anchor_size: tuple = (1.6, 3.9, 1.56)     # (w, l, h)
    anchor_z: float = -1.78
    anchor_rotations: tuple = (0.0, 1.57)
    score_threshold: float = 0.1
    nms_iou_threshold: float = 0.5
    nms_pre: int = 100
    max_detections: int = 50

    @property
    def grid_size(self):
        nx = int(round((self.pc_range[3] - self.pc_range[0]) / self.voxel_size[0]))
        ny = int(round((self.pc_range[4] - self.pc_range[1]) / self.voxel_size[1]))
        return nx, ny   # 432, 496


# ---------------------------------------------------------------------------
# Pillarization (host; cheap and data-dependent)


def pillarize(points: np.ndarray, cfg: PointPillarsConfig):
    """Raw scan (N, 4) -> fixed-cap pillar tensors.

    Returns dict(features (P, M, 10), mask (P, M), coords (P, 2) [ix, iy],
    pillar_mask (P,)) with P = max_pillars, M = max_points_per_pillar.
    The 10 per-point features follow PillarFeatureNet: x, y, z, r,
    offsets to the pillar centroid (3), offsets to the pillar center (2),
    plus z offset to the anchor plane.
    """
    x0, y0, z0, x1, y1, z1 = cfg.pc_range
    vx, vy, _ = cfg.voxel_size
    P, M = cfg.max_pillars, cfg.max_points_per_pillar

    keep = (
        (points[:, 0] >= x0) & (points[:, 0] < x1)
        & (points[:, 1] >= y0) & (points[:, 1] < y1)
        & (points[:, 2] >= z0) & (points[:, 2] < z1)
    )
    pts = points[keep]
    ix = ((pts[:, 0] - x0) / vx).astype(np.int64)
    iy = ((pts[:, 1] - y0) / vy).astype(np.int64)
    nx, ny = cfg.grid_size
    key = iy * nx + ix
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    order = np.argsort(-counts)[:P]             # densest pillars first
    slot_of = np.full(len(uniq), -1, np.int64)
    slot_of[order] = np.arange(len(order))
    slots = slot_of[inv]

    feats = np.zeros((P, M, 10), np.float32)
    mask = np.zeros((P, M), np.float32)
    coords = np.zeros((P, 2), np.int32)
    coords[: len(order), 0] = (uniq[order] % nx).astype(np.int32)
    coords[: len(order), 1] = (uniq[order] // nx).astype(np.int32)
    # vectorized fill: sort points by slot, rank each point within its
    # slot via searchsorted, scatter the first M per slot (the per-point
    # Python loop here took seconds on a 120k-point scan)
    pt_order = np.argsort(slots, kind="stable")
    ss = slots[pt_order]
    ranks = np.arange(len(ss)) - np.searchsorted(ss, ss)
    sel = (ss >= 0) & (ranks < M)
    s_idx = ss[sel]
    r_idx = ranks[sel]
    p_sel = pts[pt_order[sel]]
    feats[s_idx, r_idx, :4] = p_sel[:, :4]
    mask[s_idx, r_idx] = 1.0
    n_per = np.bincount(s_idx, minlength=P).astype(np.float32)
    pillar_mask = (n_per > 0).astype(np.float32)

    # centroid / center offsets, computed sparsely over the kept points
    # (dense (P, M) broadcasting was the remaining host-time hotspot)
    denom = np.maximum(n_per, 1.0)
    cent = np.stack(
        [
            np.bincount(s_idx, weights=p_sel[:, c], minlength=P) / denom
            for c in range(3)
        ],
        axis=-1,
    ).astype(np.float32)                                       # (P, 3)
    feats[s_idx, r_idx, 4:7] = p_sel[:, :3] - cent[s_idx]
    cx = coords[:, 0] * vx + x0 + vx / 2.0
    cy = coords[:, 1] * vy + y0 + vy / 2.0
    feats[s_idx, r_idx, 7] = p_sel[:, 0] - cx[s_idx]
    feats[s_idx, r_idx, 8] = p_sel[:, 1] - cy[s_idx]
    feats[s_idx, r_idx, 9] = p_sel[:, 2] - cfg.anchor_z
    return {
        "features": feats, "mask": mask, "coords": coords,
        "pillar_mask": pillar_mask,
    }


PT_QUANT = 0.002    # fixed-point transport resolution (meters / unit)


def pillarize_sparse(points: np.ndarray, cfg: PointPillarsConfig,
                     point_cap: int | None = None):
    """Host pillar ASSIGNMENT only — returns fixed-cap SPARSE arrays
    instead of the dense (P, M, 10) tensor (~15 MB): on relay-attached
    TPUs the dense upload costs ~200 ms/scan, 6x the whole network.
    build_pillars_device scatters them on device.

    Transport is compacted for bandwidth-starved links (~0.6 MB/scan vs
    1.6 MB naive sparse vs 15 MB dense): points ride as 2 mm fixed-point
    int16 (exact to 2 mm everywhere — better than float16's 5 cm at
    50 m), indices as uint16/uint8, and validity as one scalar count
    (points are packed contiguously).

    Returns dict(pts_q (C, 4) i16, s_idx (C,) u16, r_idx (C,) u8,
    n_pts () i32, coords (P, 2) i16, n_per (P,) u8) with C = point_cap
    (default: the kept-point count rounded up to a 16384 multiple, so
    the jitted consumer sees a stable shape across a sequence)."""
    x0, y0, z0, x1, y1, z1 = cfg.pc_range
    vx, vy, _ = cfg.voxel_size
    P, M = cfg.max_pillars, cfg.max_points_per_pillar
    assert P < 65536 and M < 256, "index transport dtypes too narrow"

    keep = (
        (points[:, 0] >= x0) & (points[:, 0] < x1)
        & (points[:, 1] >= y0) & (points[:, 1] < y1)
        & (points[:, 2] >= z0) & (points[:, 2] < z1)
    )
    pts = points[keep]
    C = point_cap or max(16384, -(-len(pts) // 16384) * 16384)
    ix = ((pts[:, 0] - x0) / vx).astype(np.int64)
    iy = ((pts[:, 1] - y0) / vy).astype(np.int64)
    nx, ny = cfg.grid_size
    key = iy * nx + ix
    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    order = np.argsort(-counts)[:P]
    slot_of = np.full(len(uniq), -1, np.int64)
    slot_of[order] = np.arange(len(order))
    slots = slot_of[inv]

    coords = np.zeros((P, 2), np.int16)
    coords[: len(order), 0] = (uniq[order] % nx).astype(np.int16)
    coords[: len(order), 1] = (uniq[order] // nx).astype(np.int16)
    pt_order = np.argsort(slots, kind="stable")
    ss = slots[pt_order]
    ranks = np.arange(len(ss)) - np.searchsorted(ss, ss)
    sel = (ss >= 0) & (ranks < M)
    s_idx = ss[sel][:C]
    r_idx = ranks[sel][:C]
    p_sel = pts[pt_order[sel]][:C]
    n = len(s_idx)
    n_per = np.bincount(s_idx, minlength=P).astype(np.uint8)

    out = {
        "s_idx": np.zeros(C, np.uint16),
        "r_idx": np.zeros(C, np.uint8),
        "pts_q": np.zeros((C, 4), np.int16),
        "n_pts": np.int32(n),
        "coords": coords,
        "n_per": n_per,
    }
    out["s_idx"][:n] = s_idx
    out["r_idx"][:n] = r_idx
    out["pts_q"][:n] = np.clip(
        np.round(p_sel[:, :4] / PT_QUANT), -32767, 32767
    ).astype(np.int16)
    return out


def crop_quantize_points(points: np.ndarray, cfg: PointPillarsConfig,
                         point_cap: int | None = None):
    """Minimal host half of DEVICE pillar assignment: range-crop and
    2 mm fixed-point quantize only. Transport is pts_q + one count —
    ~8 B/point, 35% less than pillarize_sparse's 11 B/point (the pillar
    indices it ships are recomputed on device by
    build_pillars_from_points), and the host's ~15-35 ms/scan
    sort/unique/bincount work moves onto the chip."""
    x0, y0, z0, x1, y1, z1 = cfg.pc_range
    keep = (
        (points[:, 0] >= x0) & (points[:, 0] < x1)
        & (points[:, 1] >= y0) & (points[:, 1] < y1)
        & (points[:, 2] >= z0) & (points[:, 2] < z1)
    )
    pts = points[keep]
    C = point_cap or max(16384, -(-len(pts) // 16384) * 16384)
    pts = pts[:C]
    out = {"pts_q": np.zeros((C, 4), np.int16), "n_pts": np.int32(len(pts))}
    out["pts_q"][: len(pts)] = np.clip(
        np.round(pts[:, :4] / PT_QUANT), -32767, 32767
    ).astype(np.int16)
    return out


@partial(jax.jit, static_argnums=(1,))
def build_pillars_from_points(sparse: dict, cfg: PointPillarsConfig):
    """ON-DEVICE pillar assignment + dense pillar build: quantized
    points in, PillarFeatureNet input out. The host pillarize's
    unique/argsort/bincount becomes one stable device sort over the
    flat pillar key, head-flag segmentation, a segment-sum histogram
    and a top-k for the densest-P selection — all fixed-shape.

    Matches pillarize_sparse + build_pillars_device exactly whenever the
    occupied-pillar count fits cfg.max_pillars (both keep the first
    max_points_per_pillar points per pillar in scan order); past the cap
    both keep the densest P pillars and may differ only in count ties.
    """
    x0, y0, _, _, _, _ = cfg.pc_range
    vx, vy, _ = cfg.voxel_size
    P, M = cfg.max_pillars, cfg.max_points_per_pillar
    nx, ny = cfg.grid_size
    C = sparse["pts_q"].shape[0]

    live = jnp.arange(C, dtype=jnp.int32) < sparse["n_pts"]
    pts = sparse["pts_q"].astype(jnp.float32) * PT_QUANT
    ix = jnp.clip(((pts[:, 0] - x0) / vx).astype(jnp.int32), 0, nx - 1)
    iy = jnp.clip(((pts[:, 1] - y0) / vy).astype(jnp.int32), 0, ny - 1)
    key = jnp.where(live, iy * nx + ix, nx * ny)   # dead points sort last

    order = jnp.argsort(key)                        # stable: scan order kept
    k_s = key[order]
    pts_s = pts[order]
    live_s = live[order]
    idx = jnp.arange(C, dtype=jnp.int32)
    head = live_s & ((idx == 0) | (k_s != jnp.roll(k_s, 1)))
    g = jnp.maximum(jnp.cumsum(head.astype(jnp.int32)) - 1, 0)  # group id
    seg_start = jax.lax.cummax(jnp.where(head, idx, 0))
    rank = idx - seg_start                          # scan-order rank in pillar

    counts = jnp.zeros(C, jnp.int32).at[g].add(live_s.astype(jnp.int32))
    top_counts, top_g = jax.lax.top_k(counts, P)    # densest pillars first
    slot_of_g = jnp.full(C, -1, jnp.int32).at[top_g].set(
        jnp.arange(P, dtype=jnp.int32)
    )
    s = slot_of_g[g]                                # (C,) slot or -1
    sel = (live_s & (s >= 0) & (rank < M)).astype(jnp.float32)
    s_safe = jnp.where(sel > 0, s, P - 1)
    r_safe = jnp.where(sel > 0, rank, M - 1)

    key_by_g = jnp.zeros(C, jnp.int32).at[g].max(
        jnp.where(live_s, k_s, 0)
    )
    key_of_slot = key_by_g[top_g]
    pillar_mask = (top_counts > 0).astype(jnp.float32)
    coords = jnp.stack(
        [key_of_slot % nx, key_of_slot // nx], axis=-1
    ).astype(jnp.int32) * pillar_mask[:, None].astype(jnp.int32)

    n_per = jnp.zeros(P, jnp.float32).at[s_safe].add(sel)
    denom = jnp.maximum(n_per, 1.0)
    cent = jnp.stack([
        jnp.zeros(P).at[s_safe].add(pts_s[:, c] * sel) / denom
        for c in range(3)
    ], axis=-1)                                     # (P, 3) kept-point mean
    cx = coords[:, 0].astype(jnp.float32) * vx + x0 + vx / 2.0
    cy = coords[:, 1].astype(jnp.float32) * vy + y0 + vy / 2.0

    f10 = jnp.concatenate([
        pts_s[:, :4],
        pts_s[:, :3] - cent[s_safe],
        (pts_s[:, 0] - cx[s_safe])[:, None],
        (pts_s[:, 1] - cy[s_safe])[:, None],
        (pts_s[:, 2] - cfg.anchor_z)[:, None],
    ], axis=-1) * sel[:, None]
    feats = jnp.zeros((P, M, 10)).at[s_safe, r_safe].add(f10)
    mask = jnp.minimum(jnp.zeros((P, M)).at[s_safe, r_safe].add(sel), 1.0)
    return {
        "features": feats, "mask": mask, "coords": coords,
        "pillar_mask": pillar_mask,
    }


@partial(jax.jit, static_argnums=(1,))
def build_pillars_device(sparse: dict, cfg: PointPillarsConfig):
    """Scatter the sparse per-point arrays into the dense PillarFeatureNet
    input ON DEVICE (features (P, M, 10), mask (P, M)); centroids via
    segment-sums over the pillar axis. Decodes the compact transport
    (fixed-point points, scalar validity count)."""
    x0, y0, _, _, _, _ = cfg.pc_range
    vx, vy, _ = cfg.voxel_size
    P, M = cfg.max_pillars, cfg.max_points_per_pillar
    C = sparse["s_idx"].shape[0]
    live = (
        jnp.arange(C, dtype=jnp.int32) < sparse["n_pts"]
    ).astype(jnp.float32)
    s = sparse["s_idx"].astype(jnp.int32)
    r = sparse["r_idx"].astype(jnp.int32)
    pts = sparse["pts_q"].astype(jnp.float32) * PT_QUANT
    # dead padded entries all collide on slot (P-1, M-1) with weight 0
    s = jnp.where(live > 0, s, P - 1)
    r = jnp.where(live > 0, r, M - 1)

    denom = jnp.maximum(sparse["n_per"].astype(jnp.float32), 1.0)
    cent = jnp.stack([
        jnp.zeros((P,)).at[s].add(pts[:, c] * live) / denom for c in range(3)
    ], axis=-1)                                                # (P, 3)
    coords = sparse["coords"]
    cx = coords[:, 0].astype(jnp.float32) * vx + x0 + vx / 2.0
    cy = coords[:, 1].astype(jnp.float32) * vy + y0 + vy / 2.0

    f10 = jnp.concatenate([
        pts[:, :4],
        pts[:, :3] - cent[s],
        (pts[:, 0] - cx[s])[:, None],
        (pts[:, 1] - cy[s])[:, None],
        (pts[:, 2] - cfg.anchor_z)[:, None],
    ], axis=-1) * live[:, None]                                # (C, 10)
    feats = jnp.zeros((P, M, 10)).at[s, r].add(f10)
    mask = jnp.zeros((P, M)).at[s, r].add(live)
    return {
        "features": feats, "mask": jnp.minimum(mask, 1.0),
        "coords": coords.astype(jnp.int32),
        "pillar_mask": (sparse["n_per"] > 0).astype(jnp.float32),
    }


# ---------------------------------------------------------------------------
# Network


def _conv_init(key, cin, cout, k=3):
    w = jax.random.normal(key, (cout, cin, k, k)) * np.sqrt(2.0 / (cin * k * k))
    return {"w": w.astype(jnp.float32), "b": jnp.zeros((cout,), jnp.float32)}


def init_params(cfg: PointPillarsConfig, key: jax.Array) -> dict:
    keys = iter(jax.random.split(key, 64))
    params = {
        "pfn": {
            "w": jax.random.normal(next(keys), (10, cfg.pfn_channels))
            * np.sqrt(2.0 / 10),
            "b": jnp.zeros((cfg.pfn_channels,)),
        },
        "blocks": [],
        "deblocks": [],
    }
    cin = cfg.pfn_channels
    for n_layers, cout in zip(cfg.backbone_layers, cfg.backbone_channels):
        block = [_conv_init(next(keys), cin, cout)]
        block += [_conv_init(next(keys), cout, cout) for _ in range(n_layers)]
        params["blocks"].append(block)
        cin = cout
    for cin_b, cout in zip(cfg.backbone_channels, cfg.fpn_channels):
        params["deblocks"].append(_conv_init(next(keys), cin_b, cout))
    feat = sum(cfg.fpn_channels)
    n_anchor = len(cfg.anchor_rotations)
    params["head_cls"] = _conv_init(next(keys), feat, n_anchor, k=1)
    # focal-loss prior bias (RetinaNet init, mmdet bias_prob=0.01):
    # start the classifier at P(object) ~= 0.01 so the ~10^4:1
    # negative:positive anchor imbalance doesn't spend the early
    # schedule suppressing negatives through the shared trunk
    params["head_cls"]["b"] = jnp.full(
        (n_anchor,), -float(np.log(99.0)), jnp.float32
    )
    params["head_box"] = _conv_init(next(keys), feat, n_anchor * 7, k=1)
    params["head_dir"] = _conv_init(next(keys), feat, n_anchor * 2, k=1)
    return params


def _conv(x, p, stride=1):
    # weights follow the activation dtype (bf16 backbone, see forward);
    # the MXU accumulates in f32 either way
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=x.dtype,
    ) + p["b"].astype(x.dtype)[None, :, None, None]


def _deconv(x, p, factor):
    if factor == 1:
        return _conv(x, p)
    # resize-upsample + conv (TPU-friendly transposed-conv substitute)
    n, c, h, w = x.shape
    x = jax.image.resize(x, (n, c, h * factor, w * factor), "nearest")
    return _conv(x, p)


@partial(jax.jit, static_argnums=(2,))
def forward(params: dict, pillars: dict, cfg: PointPillarsConfig):
    """Pillar tensors -> (cls (A,), boxes (A, 7), dirs (A, 2)) flattened
    over the BEV anchor grid."""
    f = pillars["features"]                    # (P, M, 10)
    m = pillars["mask"]                        # (P, M)
    h = jnp.maximum(
        jnp.dot(f, params["pfn"]["w"], preferred_element_type=jnp.float32)
        + params["pfn"]["b"], 0.0,
    )                                          # (P, M, C)
    h = jnp.max(jnp.where(m[..., None] > 0, h, -1e9), axis=1)
    h = h * pillars["pillar_mask"][:, None]    # (P, C)

    nx, ny = cfg.grid_size
    canvas = jnp.zeros((cfg.pfn_channels, ny, nx))
    canvas = canvas.at[:, pillars["coords"][:, 1], pillars["coords"][:, 0]].set(
        h.T * pillars["pillar_mask"][None, :]
    )
    # the BEV backbone runs in bfloat16 (inference-standard on TPU; the
    # MXU accumulates partial sums in f32, and detection heads recover
    # f32 below) — ~2x conv throughput on v5e
    x = canvas[None].astype(jnp.bfloat16)      # (1, C, H, W)

    outs = []
    for block, (stride, factor, dp) in zip(
        params["blocks"],
        zip(cfg.backbone_strides, cfg.fpn_upsample, params["deblocks"]),
    ):
        x = jnp.maximum(_conv(x, block[0], stride), 0.0)
        for layer in block[1:]:
            x = jnp.maximum(_conv(x, layer), 0.0)
        outs.append(jnp.maximum(_deconv(x, dp, factor), 0.0))
    feat = jnp.concatenate(outs, axis=1)       # (1, 384, H/2, W/2)

    cls = _conv(feat, params["head_cls"])[0].astype(jnp.float32)
    box = _conv(feat, params["head_box"])[0].astype(jnp.float32)
    direc = _conv(feat, params["head_dir"])[0].astype(jnp.float32)

    n_rot = len(cfg.anchor_rotations)
    H, W = cls.shape[-2:]
    cls = cls.reshape(n_rot, H, W).transpose(1, 2, 0).reshape(-1)
    box = box.reshape(n_rot, 7, H, W).transpose(2, 3, 0, 1).reshape(-1, 7)
    direc = direc.reshape(n_rot, 2, H, W).transpose(2, 3, 0, 1).reshape(-1, 2)
    return cls, box, direc


def _anchors(cfg: PointPillarsConfig, feat_hw):
    """Flattened anchor boxes matching the head layout: (A, 7)."""
    H, W = feat_hw
    x0, y0 = cfg.pc_range[0], cfg.pc_range[1]
    sx = (cfg.pc_range[3] - x0) / W
    sy = (cfg.pc_range[4] - y0) / H
    xs = x0 + (np.arange(W) + 0.5) * sx
    ys = y0 + (np.arange(H) + 0.5) * sy
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    w, l, h = cfg.anchor_size
    out = []
    for r in cfg.anchor_rotations:
        a = np.zeros((H, W, 7), np.float32)
        a[..., 0] = gx
        a[..., 1] = gy
        a[..., 2] = cfg.anchor_z
        a[..., 3:6] = (w, l, h)
        a[..., 6] = r
        out.append(a)
    return np.stack(out, axis=2).reshape(-1, 7)   # (H*W*n_rot, 7)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """DeltaXYZWLHR decoding: (A, 7) deltas + anchors -> boxes
    [x, y, z, w, l, h, yaw]."""
    diag = jnp.sqrt(anchors[:, 3] ** 2 + anchors[:, 4] ** 2)
    x = deltas[:, 0] * diag + anchors[:, 0]
    y = deltas[:, 1] * diag + anchors[:, 1]
    z = deltas[:, 2] * anchors[:, 5] + anchors[:, 2]
    w = jnp.exp(deltas[:, 3]) * anchors[:, 3]
    l = jnp.exp(deltas[:, 4]) * anchors[:, 4]
    h = jnp.exp(deltas[:, 5]) * anchors[:, 5]
    yaw = deltas[:, 6] + anchors[:, 6]
    return jnp.stack([x, y, z, w, l, h, yaw], axis=-1)


@partial(jax.jit, static_argnums=(3,))
def select_detections(cls_logits, boxes, dir_logits, cfg: PointPillarsConfig):
    """Scores -> top-k pre-NMS -> exact BEV rotated-IoU NMS (fixed shape).

    Returns (boxes (K, 7), scores (K,), valid (K,)) with K = max_detections.
    The pairwise rotated IoU matrix (ops.rotated_iou, Sutherland-Hodgman
    clipping) is computed once over the nms_pre candidates; the greedy
    suppression loop then just indexes it — the TPU-native equivalent of
    mmcv's CUDA rotated NMS the reference's detector3d relies on.
    """
    from ..ops.rotated_iou import rotated_iou_matrix

    scores = jax.nn.sigmoid(cls_logits)
    top_scores, idx = jax.lax.top_k(scores, cfg.nms_pre)
    cand_boxes = boxes[idx]
    # direction correction: flip yaw by pi if dir classifier says so
    flip = (dir_logits[idx, 1] > dir_logits[idx, 0]).astype(jnp.float32)
    cand_boxes = cand_boxes.at[:, 6].add(flip * jnp.pi)

    K = cfg.max_detections
    iou = rotated_iou_matrix(cand_boxes, cand_boxes)    # (nms_pre, nms_pre)

    def body(k, state):
        keep_boxes, keep_scores, keep_valid, alive = state
        # best remaining candidate
        masked = jnp.where(alive > 0, top_scores, -1.0)
        j = jnp.argmax(masked)
        s = masked[j]
        ok = s >= cfg.score_threshold
        b = cand_boxes[j]
        keep_boxes = keep_boxes.at[k].set(jnp.where(ok, b, 0.0))
        keep_scores = keep_scores.at[k].set(jnp.where(ok, s, 0.0))
        keep_valid = keep_valid.at[k].set(ok.astype(jnp.float32))
        suppress = iou[j] > cfg.nms_iou_threshold
        alive = jnp.where(ok & suppress, 0.0, alive).at[j].set(0.0)
        return keep_boxes, keep_scores, keep_valid, alive

    init = (
        jnp.zeros((K, 7)), jnp.zeros((K,)), jnp.zeros((K,)),
        jnp.ones((cfg.nms_pre,)),
    )
    keep_boxes, keep_scores, keep_valid, _ = jax.lax.fori_loop(0, K, body, init)
    return keep_boxes, keep_scores, keep_valid


class Detector3D:
    """Drop-in online 3D detector (reference detector3d.py API).

    device_assign=True (default) ships quantized points only and runs
    pillar assignment inside the jitted program (sort/segment/top-k on
    the chip): ~35% less upload and no host sort on the keyframe path.
    device_assign=False keeps the host pillarize_sparse transport."""

    def __init__(self, params=None,
                 cfg: PointPillarsConfig = PointPillarsConfig(),
                 device_assign: bool = True):
        self.cfg = cfg
        self.device_assign = device_assign
        self.params = params or init_params(cfg, jax.random.PRNGKey(0))
        H = cfg.grid_size[1] // 2
        W = cfg.grid_size[0] // 2
        self.anchors = jnp.asarray(_anchors(cfg, (H, W)))

        # whole-network jit: sparse pillar tensors in, NMS'd boxes out —
        # ONE dispatch per scan instead of op-by-op eager execution
        def _make(build):
            def _run(params, sparse, anchors):
                pil = build(sparse, self.cfg)
                cls, deltas, dirs = forward(params, pil, self.cfg)
                boxes = decode_boxes(deltas, anchors)
                return select_detections(cls, boxes, dirs, self.cfg)
            return jax.jit(_run)

        self._run = _make(build_pillars_device)
        self._run_points = _make(build_pillars_from_points)

    def dispatch(self, velo_points: np.ndarray):
        """Async half of make_prediction: crop+quantize (host), upload
        the compact tensors, launch the jitted network, and start
        streaming the outputs back (copy_to_host_async) WITHOUT waiting.
        Lets the keyframe path overlap both detectors and the object GN
        on relay-attached devices (the round trip is the cost, not the
        compute). Returns a handle for collect()."""
        if self.device_assign:
            sp = crop_quantize_points(velo_points, self.cfg)
            run = self._run_points
        else:
            sp = pillarize_sparse(velo_points, self.cfg)
            run = self._run
        out_boxes, scores, valid = run(
            self.params, {k: jnp.asarray(v) for k, v in sp.items()},
            self.anchors,
        )
        for a in (out_boxes, valid):
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        return out_boxes, valid

    @staticmethod
    def collect(handle) -> np.ndarray:
        out_boxes, valid = handle
        return np.asarray(out_boxes)[np.asarray(valid) > 0]

    def make_prediction(self, velo_points: np.ndarray) -> np.ndarray:
        """(N, 4) scan -> (K, 7) [x, y, z, w, l, h, yaw] car boxes."""
        return self.collect(self.dispatch(velo_points))


# ---------------------------------------------------------------------------
# mmdet3d checkpoint ingestion


def _fold_bn(w, b, bn_w, bn_b, bn_mean, bn_var, eps=1e-3):
    """Fold BatchNorm into the preceding conv/linear (inference)."""
    scale = bn_w / np.sqrt(bn_var + eps)
    if w.ndim == 4:
        w = w * scale[:, None, None, None]
    else:
        w = w * scale[:, None]
    b = (b - bn_mean) * scale + bn_b
    return w, b


def load_mmdet3d_checkpoint(path: str, cfg: PointPillarsConfig = PointPillarsConfig()):
    """Ingest an mmdet3d PointPillars .pth (key conventions of the
    reference's configs/config_pointpillars.py model)."""
    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    sd = saved.get("state_dict", saved)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    def get(k):
        return sd[k]

    params = init_params(cfg, jax.random.PRNGKey(0))
    # PFN: linear + BN1d folded
    w = get("voxel_encoder.pfn_layers.0.linear.weight")   # (64, 10)
    bnw = get("voxel_encoder.pfn_layers.0.norm.weight")
    bnb = get("voxel_encoder.pfn_layers.0.norm.bias")
    bnm = get("voxel_encoder.pfn_layers.0.norm.running_mean")
    bnv = get("voxel_encoder.pfn_layers.0.norm.running_var")
    wf, bf = _fold_bn(w, np.zeros(w.shape[0]), bnw, bnb, bnm, bnv)
    params["pfn"]["w"] = jnp.asarray(wf.T, jnp.float32)
    params["pfn"]["b"] = jnp.asarray(bf, jnp.float32)

    # backbone blocks: conv (no bias) + BN pairs
    for bi in range(len(cfg.backbone_layers)):
        n_layers = cfg.backbone_layers[bi] + 1
        for li in range(n_layers):
            base = f"backbone.blocks.{bi}.{li * 3}"
            w = get(base + ".weight")
            bn = f"backbone.blocks.{bi}.{li * 3 + 1}"
            wf, bf = _fold_bn(
                w, np.zeros(w.shape[0]), get(bn + ".weight"), get(bn + ".bias"),
                get(bn + ".running_mean"), get(bn + ".running_var"),
            )
            params["blocks"][bi][li] = {
                "w": jnp.asarray(wf, jnp.float32),
                "b": jnp.asarray(bf, jnp.float32),
            }
    # neck deblocks (ConvTranspose2d + BN) — our resize+conv substitute
    # reuses the kernel transposed into OIHW
    for di in range(len(cfg.fpn_channels)):
        base = f"neck.deblocks.{di}.0"
        w = get(base + ".weight")
        if w.shape[0] != cfg.fpn_channels[di]:       # ConvTranspose (I, O, k, k)
            w = w.transpose(1, 0, 2, 3)
        bn = f"neck.deblocks.{di}.1"
        wf, bf = _fold_bn(
            w, np.zeros(w.shape[0]), get(bn + ".weight"), get(bn + ".bias"),
            get(bn + ".running_mean"), get(bn + ".running_var"),
        )
        params["deblocks"][di] = {
            "w": jnp.asarray(wf, jnp.float32),
            "b": jnp.asarray(bf, jnp.float32),
        }
    for name, key in (
        ("head_cls", "bbox_head.conv_cls"),
        ("head_box", "bbox_head.conv_reg"),
        ("head_dir", "bbox_head.conv_dir_cls"),
    ):
        params[name] = {
            "w": jnp.asarray(get(key + ".weight"), jnp.float32),
            "b": jnp.asarray(get(key + ".bias"), jnp.float32),
        }
    return params
