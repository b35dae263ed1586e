"""Mask R-CNN 2D instance segmentation, TPU-native inference.

Replaces the reference's mmdet wrapper (/root/reference/reconstruct/
detector2d.py + configs/config_maskrcnn.py) with a from-scratch JAX
implementation of the standard architecture:

  ResNet-50 (BN folded) -> FPN (P2..P6) -> RPN -> fixed-K proposals
  -> RoIAlign (7x7) -> box head (2 FC) -> per-class decode + NMS
  -> RoIAlign (14x14) on kept boxes -> mask head -> 28x28 masks
  -> paste to full-resolution instance masks

TPU-first choices: every stage is fixed-shape (top-k + masks instead of
dynamic filtering), RoIAlign is batched bilinear gather, NMS is greedy
suppression under `lax.fori_loop`. Inference only; `load_mmdet_checkpoint`
ingests mmdet-convention .pth weights with BatchNorm folding.

The detection validity filter matches the reference Detector2D
(detector2d.py:87-100): margin crop, min area, score >= 0.70; the class
table {"cars": [2], "chairs": [56, 57]} follows detector2d.py:29 (COCO
ids minus background handling is the caller's concern).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

OBJECT_CLASS_TABLE = {"cars": [2], "chairs": [56, 57]}


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    num_classes: int = 80
    # resnet
    stage_blocks: tuple = (3, 4, 6, 3)
    stem_channels: int = 64
    fpn_channels: int = 256
    # rpn
    anchor_scales: tuple = (8.0,)
    anchor_ratios: tuple = (0.5, 1.0, 2.0)
    rpn_pre_nms: int = 512
    rpn_post_nms: int = 128
    rpn_nms_iou: float = 0.7
    # resnet+FPN compute dtype: bf16 is the TPU inference standard
    # (~2x conv throughput on the MXU, f32 partial-sum accumulation);
    # the trainer overrides to float32 (bf16 grads stall the closed-loop
    # overfit). RPN/RoI heads and all box math stay f32 either way.
    backbone_dtype: str = "bfloat16"
    # heads
    roi_size: int = 7
    mask_roi_size: int = 14
    fc_dim: int = 1024
    score_threshold: float = 0.70
    nms_iou: float = 0.5
    max_detections: int = 16


# ---------------------------------------------------------------------------
# params


def _conv(key, cin, cout, k):
    w = jax.random.normal(key, (cout, cin, k, k)) * np.sqrt(2.0 / (cin * k * k))
    return {"w": w.astype(jnp.float32), "b": jnp.zeros((cout,), jnp.float32)}


def _fc(key, din, dout):
    w = jax.random.normal(key, (din, dout)) * np.sqrt(2.0 / din)
    return {"w": w.astype(jnp.float32), "b": jnp.zeros((dout,), jnp.float32)}


def init_params(cfg: MaskRCNNConfig, key: jax.Array) -> dict:
    ks = iter(jax.random.split(key, 256))
    p = {"stem": _conv(next(ks), 3, cfg.stem_channels, 7), "stages": []}
    cin = cfg.stem_channels
    width = cfg.stem_channels
    for si, n_blocks in enumerate(cfg.stage_blocks):
        cout = width * 4
        blocks = []
        for bi in range(n_blocks):
            blk = {
                "conv1": _conv(next(ks), cin if bi == 0 else cout, width, 1),
                "conv2": _conv(next(ks), width, width, 3),
                "conv3": _conv(next(ks), width, cout, 1),
            }
            if bi == 0:
                blk["down"] = _conv(next(ks), cin, cout, 1)
            blocks.append(blk)
        p["stages"].append(blocks)
        cin = cout
        width *= 2
    c = cfg.fpn_channels
    stage_out = [cfg.stem_channels * 4 * 2**i for i in range(4)]
    p["lateral"] = [_conv(next(ks), ch, c, 1) for ch in stage_out]
    p["fpn_out"] = [_conv(next(ks), c, c, 3) for _ in range(4)]
    n_anchor = len(cfg.anchor_scales) * len(cfg.anchor_ratios)
    p["rpn_conv"] = _conv(next(ks), c, c, 3)
    p["rpn_cls"] = _conv(next(ks), c, n_anchor, 1)
    p["rpn_reg"] = _conv(next(ks), c, n_anchor * 4, 1)
    din = c * cfg.roi_size * cfg.roi_size
    p["fc1"] = _fc(next(ks), din, cfg.fc_dim)
    p["fc2"] = _fc(next(ks), cfg.fc_dim, cfg.fc_dim)
    p["cls"] = _fc(next(ks), cfg.fc_dim, cfg.num_classes + 1)
    p["reg"] = _fc(next(ks), cfg.fc_dim, cfg.num_classes * 4)
    p["mask_convs"] = [_conv(next(ks), c, c, 3) for _ in range(4)]
    p["mask_deconv"] = _conv(next(ks), c, c, 3)
    p["mask_logits"] = _conv(next(ks), c, cfg.num_classes, 1)
    return p


# ---------------------------------------------------------------------------
# backbone


def _conv2d(x, p, stride=1, k=None):
    # weights follow the activation dtype (bf16 backbone, f32 heads);
    # partial sums are REQUESTED in f32 (preferred_element_type) so the
    # reduction over up to 2048 channels never accumulates at bf16 —
    # the MXU does this natively, and the result cast back is fused
    return (
        jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), (stride, stride), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + p["b"].astype(x.dtype)[None, :, None, None]
    )


def resnet_fpn(params, img, cfg: MaskRCNNConfig):
    """(1, 3, H, W) image (normalized) -> [P2, P3, P4, P5, P6] features
    (always f32; the backbone itself runs in cfg.backbone_dtype)."""
    x = jnp.maximum(_conv2d(img.astype(cfg.backbone_dtype), params["stem"], 2), 0.0)
    x = -jax.lax.reduce_window(
        -x, jnp.inf, jax.lax.min, (1, 1, 3, 3), (1, 1, 2, 2), "SAME"
    )   # maxpool 3x3/2
    feats = []
    for si, blocks in enumerate(params["stages"]):
        stride = 1 if si == 0 else 2
        for bi, blk in enumerate(blocks):
            s = stride if bi == 0 else 1
            identity = x
            h = jnp.maximum(_conv2d(x, blk["conv1"]), 0.0)
            h = jnp.maximum(_conv2d(h, blk["conv2"], s), 0.0)
            h = _conv2d(h, blk["conv3"])
            if "down" in blk:
                identity = _conv2d(x, blk["down"], s)
            x = jnp.maximum(h + identity, 0.0)
        feats.append(x)
    # FPN top-down
    c = cfg.fpn_channels
    laterals = [
        _conv2d(f, lp) for f, lp in zip(feats, params["lateral"])
    ]
    for i in range(len(laterals) - 1, 0, -1):
        up = jax.image.resize(
            laterals[i], laterals[i - 1].shape, "nearest"
        )
        laterals[i - 1] = laterals[i - 1] + up
    outs = [
        jnp.maximum(_conv2d(l, op), 0.0).astype(jnp.float32)
        for l, op in zip(laterals, params["fpn_out"])
    ]
    p6 = -jax.lax.reduce_window(
        -outs[-1], jnp.inf, jax.lax.min, (1, 1, 1, 1), (1, 1, 2, 2), "SAME"
    )
    return outs + [p6]          # strides 4, 8, 16, 32, 64


# ---------------------------------------------------------------------------
# boxes


def _level_anchors(hw, stride, cfg):
    h, w = hw
    ys = (np.arange(h) + 0.5) * stride
    xs = (np.arange(w) + 0.5) * stride
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    out = []
    for scale in cfg.anchor_scales:
        for ratio in cfg.anchor_ratios:
            size = scale * stride
            aw = size * np.sqrt(1.0 / ratio)
            ah = size * np.sqrt(ratio)
            a = np.stack(
                [gx - aw / 2, gy - ah / 2, gx + aw / 2, gy + ah / 2], axis=-1
            )
            out.append(a)
    return np.stack(out, axis=2).reshape(-1, 4).astype(np.float32)


def decode_deltas(deltas, boxes):
    """Standard (dx, dy, dw, dh) decoding on xyxy boxes."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + w / 2
    cy = boxes[:, 1] + h / 2
    ncx = cx + deltas[:, 0] * w
    ncy = cy + deltas[:, 1] * h
    nw = jnp.exp(jnp.clip(deltas[:, 2], -4, 4)) * w
    nh = jnp.exp(jnp.clip(deltas[:, 3], -4, 4)) * h
    return jnp.stack(
        [ncx - nw / 2, ncy - nh / 2, ncx + nw / 2, ncy + nh / 2], axis=-1
    )


def iou_matrix(a, b):
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)


def greedy_nms(boxes, scores, k, iou_thresh, score_thresh=-jnp.inf):
    """Fixed-K greedy NMS: returns (boxes (k, 4), scores (k,), valid (k,))."""
    iou = iou_matrix(boxes, boxes)

    def body(i, state):
        kb, ks, kv, alive = state
        masked = jnp.where(alive > 0, scores, -1e9)
        j = jnp.argmax(masked)
        s = masked[j]
        ok = s > score_thresh
        kb = kb.at[i].set(jnp.where(ok, boxes[j], 0.0))
        ks = ks.at[i].set(jnp.where(ok, s, 0.0))
        kv = kv.at[i].set(ok.astype(jnp.float32))
        alive = jnp.where(ok & (iou[j] > iou_thresh), 0.0, alive).at[j].set(0.0)
        return kb, ks, kv, alive

    init = (
        jnp.zeros((k, 4)), jnp.zeros((k,)), jnp.zeros((k,)),
        jnp.ones_like(scores),
    )
    kb, ks, kv, _ = jax.lax.fori_loop(0, k, body, init)
    return kb, ks, kv


def roi_align(feat, boxes, out_size):
    """(C, H, W) feature + (N, 4) xyxy boxes in feature coords ->
    (N, C, out, out) bilinear crops."""
    C, H, W = feat.shape
    n = boxes.shape[0]
    # sample at bin centers (standard RoIAlign)
    ys = (jnp.arange(out_size) + 0.5) / out_size
    xs = (jnp.arange(out_size) + 0.5) / out_size

    def one(b):
        y = b[1] + ys * jnp.maximum(b[3] - b[1], 1e-3)
        x = b[0] + xs * jnp.maximum(b[2] - b[0], 1e-3)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        fy = jnp.clip(y - y0, 0.0, 1.0)
        fx = jnp.clip(x - x0, 0.0, 1.0)
        f00 = feat[:, y0][:, :, x0]
        f01 = feat[:, y0][:, :, x0 + 1]
        f10 = feat[:, y0 + 1][:, :, x0]
        f11 = feat[:, y0 + 1][:, :, x0 + 1]
        return (
            f00 * (1 - fy)[None, :, None] * (1 - fx)[None, None, :]
            + f01 * (1 - fy)[None, :, None] * fx[None, None, :]
            + f10 * fy[None, :, None] * (1 - fx)[None, None, :]
            + f11 * fy[None, :, None] * fx[None, None, :]
        )

    return jax.vmap(one)(boxes)


def roi_align_matmul(feat, boxes, out_size):
    """RoIAlign as separable interpolation MATMULS — no data-dependent
    gather: the bilinear row/column sample weights are rank-(out, H)
    banded matrices (two nonzeros per row, built with one_hot), so the
    crop is Wy @ F @ Wx^T on the MXU. Same sample positions/weights as
    `roi_align` (float-associativity differences only). Motivated by the
    BRIEF one-hot sampler win (orb.py): XLA's TPU gather runs far below
    HBM speed of light, while the extra FLOPs are MXU change."""
    C, H, W = feat.shape
    n = boxes.shape[0]
    cs = (jnp.arange(out_size) + 0.5) / out_size

    def weights(lo, hi, size):
        # (out, size) interpolation weights for one box edge pair
        c = lo + cs * jnp.maximum(hi - lo, 1e-3)
        i0 = jnp.clip(jnp.floor(c).astype(jnp.int32), 0, size - 2)
        f = jnp.clip(c - i0, 0.0, 1.0)
        return (
            jax.nn.one_hot(i0, size) * (1 - f)[:, None]
            + jax.nn.one_hot(i0 + 1, size) * f[:, None]
        )

    wy = jax.vmap(lambda b: weights(b[1], b[3], H))(boxes)   # (N, o, H)
    wx = jax.vmap(lambda b: weights(b[0], b[2], W))(boxes)   # (N, o, W)
    rows = jnp.einsum("noh,chw->ncow", wy, feat)
    return jnp.einsum("ncow,njw->ncoj", rows, wx)


def fpn_level_of(boxes: jnp.ndarray) -> jnp.ndarray:
    """mmdet's FPN RoI level assignment: floor(4 + log2(sqrt(w*h)/224)),
    clamped to P2..P5 -> returned as index 0..3 into [P2, P3, P4, P5]."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(4.0 + jnp.log2(scale / 224.0 + 1e-8))
    return (jnp.clip(lvl, 2.0, 5.0) - 2.0).astype(jnp.int32)


def roi_align_fpn(feats, boxes, out_size, strides=(4, 8, 16, 32)):
    """Multi-level RoIAlign: each box samples the FPN level matching its
    scale (small boxes -> fine P2, large -> coarse P5). Fixed-shape TPU
    formulation: align against ALL four levels and one-hot-select —
    boxes are few (~100) so the 4x over-compute is cheaper than any
    gather/scatter shape gymnastics. On TPU the per-level align runs as
    separable matmuls (roi_align_matmul; measured vs the gather via
    tools/bench_roialign.py); the gather formulation stays the CPU
    path."""
    align = (
        roi_align_matmul
        if jax.default_backend() not in ("cpu", "gpu")
        else roi_align
    )
    lvl = fpn_level_of(boxes)                              # (N,)
    outs = jnp.stack(
        [
            align(feats[i][0], boxes / strides[i], out_size)
            for i in range(4)
        ]
    )                                                      # (4, N, C, o, o)
    onehot = jax.nn.one_hot(lvl, 4, axis=0)                # (4, N)
    return jnp.einsum("ln,lncij->ncij", onehot, outs)


# ---------------------------------------------------------------------------
# full forward


def normalize_image(img):
    """(H, W, 3) or (H, W) uint8/float -> (1, 3, H, W) f32, ImageNet
    normalization (grayscale tiles on device: 3x less upload)."""
    img = jnp.asarray(img)
    if img.ndim == 2:
        img = jnp.broadcast_to(img[..., None], (*img.shape, 3))
    x = (
        jnp.asarray(img, jnp.float32) / 255.0
        - jnp.asarray([0.485, 0.456, 0.406])
    ) / jnp.asarray([0.229, 0.224, 0.225])
    return x.transpose(2, 0, 1)[None]


RPN_STRIDES = (4, 8, 16, 32, 64)


def rpn_level_outputs(params, f):
    """One FPN level through the RPN heads -> (scores (A*h*w,),
    deltas (A*h*w, 4)) in the anchor layout of _level_anchors."""
    h = jnp.maximum(_conv2d(f, params["rpn_conv"]), 0.0)
    cls = _conv2d(h, params["rpn_cls"])[0]              # (A, h, w)
    reg = _conv2d(h, params["rpn_reg"])[0]              # (A*4, h, w)
    n_anchor = cls.shape[0]
    hw = cls.shape[-2:]
    scores = cls.transpose(1, 2, 0).reshape(-1)
    deltas = (
        reg.reshape(n_anchor, 4, *hw).transpose(2, 3, 0, 1).reshape(-1, 4)
    )
    return scores, deltas


def rpn_propose(params, feats, image_hw, cfg: MaskRCNNConfig):
    """Full RPN proposal stage (heads -> per-level top-k -> delta decode
    -> clip -> greedy NMS) -> ((rpn_post_nms, 4) boxes, validity). The
    ONE definition shared by detect(), the trainer's hard-proposal
    mining (maskrcnn_train.rpn_proposals) and tools/profile_detect —
    keeps training/inference proposal distributions in lockstep."""
    H, W = image_hw
    all_boxes, all_scores = [], []
    for f, stride in zip(feats, RPN_STRIDES):
        scores, deltas = rpn_level_outputs(params, f)
        anchors = jnp.asarray(_level_anchors(f.shape[-2:], stride, cfg))
        k = min(cfg.rpn_pre_nms, scores.shape[0])
        top, idx = jax.lax.top_k(scores, k)
        boxes = decode_deltas(deltas[idx], anchors[idx])
        boxes = jnp.clip(boxes, 0.0, jnp.asarray([W, H, W, H], jnp.float32))
        all_boxes.append(boxes)
        all_scores.append(top)
    proposals, _, prop_valid = greedy_nms(
        jnp.concatenate(all_boxes), jnp.concatenate(all_scores),
        cfg.rpn_post_nms, cfg.rpn_nms_iou,
    )
    return proposals, prop_valid


@partial(jax.jit, static_argnums=(2, 3))
def detect(params, img, image_hw: tuple, cfg: MaskRCNNConfig):
    """(H, W, 3) uint8/float image (or (H, W) grayscale, tiled on
    device — saves 3x host->device bandwidth) -> dict(boxes (K, 4),
    scores (K,), labels (K,), valid (K,), masks (K, 28, 28) logits)."""
    H, W = image_hw
    feats = resnet_fpn(params, normalize_image(img), cfg)
    proposals, prop_valid = rpn_propose(params, feats, image_hw, cfg)

    # box head with FPN level assignment (mmdet SingleRoIExtractor)
    roi_feat = roi_align_fpn(
        feats, proposals, cfg.roi_size
    )                                                     # (N, C, 7, 7)
    flat = roi_feat.reshape(roi_feat.shape[0], -1)
    h1 = jnp.maximum(flat @ params["fc1"]["w"] + params["fc1"]["b"], 0.0)
    h2 = jnp.maximum(h1 @ params["fc2"]["w"] + params["fc2"]["b"], 0.0)
    cls_logits = h2 @ params["cls"]["w"] + params["cls"]["b"]
    reg = h2 @ params["reg"]["w"] + params["reg"]["b"]

    probs = jax.nn.softmax(cls_logits, axis=-1)[:, 1:]    # drop background
    best_cls = jnp.argmax(probs, axis=-1)                 # (N,)
    best_score = jnp.max(probs, axis=-1) * prop_valid
    reg_c = jnp.take_along_axis(
        reg.reshape(-1, cfg.num_classes, 4), best_cls[:, None, None], axis=1
    )[:, 0]
    boxes = decode_deltas(reg_c, proposals)
    boxes = jnp.clip(boxes, 0.0, jnp.asarray([W, H, W, H], jnp.float32))

    kept_boxes, kept_scores, kept_valid = greedy_nms(
        boxes, best_score, cfg.max_detections, cfg.nms_iou,
        score_thresh=0.05,
    )
    # labels of kept boxes: nearest original candidate by IoU
    match = jnp.argmax(iou_matrix(kept_boxes, boxes), axis=1)
    kept_labels = best_cls[match]

    # mask head (same level assignment as the box head)
    mroi = roi_align_fpn(feats, kept_boxes, cfg.mask_roi_size)
    h = mroi
    for cp in params["mask_convs"]:
        h = jnp.maximum(_conv2d(h, cp), 0.0)
    n, c, s, _ = h.shape
    h = jax.image.resize(h, (n, c, s * 2, s * 2), "nearest")
    h = jnp.maximum(_conv2d(h, params["mask_deconv"]), 0.0)
    mask_logits = _conv2d(h, params["mask_logits"])       # (N, classes, 28, 28)
    masks = jnp.take_along_axis(
        mask_logits, kept_labels[:, None, None, None], axis=1
    )[:, 0]
    return {
        "boxes": kept_boxes, "scores": kept_scores, "labels": kept_labels,
        "valid": kept_valid, "mask_logits": masks,
    }


def _resize_bilinear_np(m: np.ndarray, h: int, w: int) -> np.ndarray:
    """Pure-numpy point-sampled bilinear resize (half-pixel centers; no
    antialiasing on downscale — boxes smaller than the 28x28 logit grid
    are excluded by the reference's min_bb_area=1600 validity filter,
    detector2d.py:87-100, so the paste path only upsamples in practice).
    Host-only on purpose — a device resize here would compile a fresh
    program per box size and pay a relay round trip per instance."""
    sh, sw = m.shape
    y = (np.arange(h) + 0.5) * sh / h - 0.5
    x = (np.arange(w) + 0.5) * sw / w - 0.5
    y0 = np.clip(np.floor(y).astype(np.int64), 0, sh - 1)
    x0 = np.clip(np.floor(x).astype(np.int64), 0, sw - 1)
    y1 = np.minimum(y0 + 1, sh - 1)
    x1 = np.minimum(x0 + 1, sw - 1)
    fy = np.clip(y - y0, 0.0, 1.0)[:, None]
    fx = np.clip(x - x0, 0.0, 1.0)[None, :]
    return (
        m[y0[:, None], x0[None, :]] * (1 - fy) * (1 - fx)
        + m[y0[:, None], x1[None, :]] * (1 - fy) * fx
        + m[y1[:, None], x0[None, :]] * fy * (1 - fx)
        + m[y1[:, None], x1[None, :]] * fy * fx
    )


def paste_masks(boxes, mask_logits, valid, image_hw):
    """28x28 logits -> full-resolution boolean instance masks (host)."""
    H, W = image_hw
    out = np.zeros((len(boxes), H, W), bool)
    for i, (b, m, v) in enumerate(zip(boxes, mask_logits, valid)):
        if v <= 0:
            continue
        x0, y0, x1, y1 = [int(round(float(t))) for t in b]
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, W), min(y1, H)
        if x1 <= x0 or y1 <= y0:
            continue
        resized = _resize_bilinear_np(np.asarray(m), y1 - y0, x1 - x0)
        out[i, y0:y1, x0:x1] = resized > 0.0
    return out


class Detector2D:
    """Drop-in online 2D detector (reference detector2d.py API)."""

    def __init__(self, params=None, cfg: MaskRCNNConfig = MaskRCNNConfig(),
                 object_class: str = "cars"):
        self.cfg = cfg
        self.params = params or init_params(cfg, jax.random.PRNGKey(0))
        self.class_ids = OBJECT_CLASS_TABLE.get(object_class, [2])
        # whole-network jit (one dispatch per frame; eager tracing costs
        # hundreds of op-by-op round trips on relay-attached devices)
        self._detect = jax.jit(detect, static_argnums=(2, 3))

    def dispatch(self, img_rgb) -> dict:
        """Async half of make_prediction: launch the jitted network and
        start streaming the outputs (see Detector3D.dispatch)."""
        hw = img_rgb.shape[:2]
        out = self._detect(self.params, jnp.asarray(img_rgb), hw, self.cfg)
        for a in out.values():
            try:
                a.copy_to_host_async()
            except Exception:
                pass
        return {"out": out, "hw": hw}

    def collect(self, handle) -> dict:
        out, hw = handle["out"], handle["hw"]
        boxes = np.asarray(out["boxes"])
        scores = np.asarray(out["scores"])
        labels = np.asarray(out["labels"])
        valid = np.asarray(out["valid"]) > 0
        keep = valid & np.isin(labels, self.class_ids) \
            & (scores >= self.cfg.score_threshold)
        masks = paste_masks(
            boxes, np.asarray(out["mask_logits"]), keep.astype(np.float32), hw
        )
        return {
            "pred_boxes": np.concatenate(
                [boxes[keep], scores[keep, None]], axis=-1
            ),
            "pred_masks": masks[keep],
        }

    def make_prediction(self, img_rgb: np.ndarray) -> dict:
        """(H, W, 3) or (H, W) -> {'pred_boxes': (M, 5), 'pred_masks': (M, H, W)}."""
        return self.collect(self.dispatch(img_rgb))


def get_valid_detections(boxes, masks, image_hw, min_bb_area=1600.0,
                         margin=(30, 10, 30, 10), min_score=0.70):
    """Reference Detector2D validity filter (detector2d.py:87-100):
    boxes within margins, area above threshold, score gate."""
    h, w = image_hw
    keep = []
    for i, b in enumerate(boxes):
        x0, y0, x1, y1 = b[:4]
        score = b[4] if len(b) > 4 else 1.0
        area = (x1 - x0) * (y1 - y0)
        inside = (
            x0 >= margin[0] and y0 >= margin[1]
            and x1 <= w - margin[2] and y1 <= h - margin[3]
        )
        if inside and area > min_bb_area and score >= min_score:
            keep.append(i)
    return boxes[keep], masks[keep]


# ---------------------------------------------------------------------------
# mmdet checkpoint ingestion


def _fold_bn(w, bn_w, bn_b, bn_mean, bn_var, eps=1e-5):
    scale = bn_w / np.sqrt(bn_var + eps)
    return w * scale[:, None, None, None], (0.0 - bn_mean) * scale + bn_b


def load_mmdet_checkpoint(path: str, cfg: MaskRCNNConfig = MaskRCNNConfig()):
    """Ingest an mmdet Mask R-CNN R50-FPN .pth by key convention."""
    import torch

    saved = torch.load(path, map_location="cpu", weights_only=False)
    sd = saved.get("state_dict", saved)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    params = init_params(cfg, jax.random.PRNGKey(0))

    def conv_bn(conv_key, bn_key):
        w, b = _fold_bn(
            sd[conv_key + ".weight"], sd[bn_key + ".weight"],
            sd[bn_key + ".bias"], sd[bn_key + ".running_mean"],
            sd[bn_key + ".running_var"],
        )
        return {"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)}

    def conv_plain(key):
        return {
            "w": jnp.asarray(sd[key + ".weight"], jnp.float32),
            "b": jnp.asarray(sd[key + ".bias"], jnp.float32),
        }

    def fc(key):
        return {
            "w": jnp.asarray(sd[key + ".weight"].T, jnp.float32),
            "b": jnp.asarray(sd[key + ".bias"], jnp.float32),
        }

    params["stem"] = conv_bn("backbone.conv1", "backbone.bn1")
    for si in range(4):
        for bi in range(cfg.stage_blocks[si]):
            base = f"backbone.layer{si + 1}.{bi}"
            blk = params["stages"][si][bi]
            blk["conv1"] = conv_bn(base + ".conv1", base + ".bn1")
            blk["conv2"] = conv_bn(base + ".conv2", base + ".bn2")
            blk["conv3"] = conv_bn(base + ".conv3", base + ".bn3")
            if bi == 0:
                blk["down"] = conv_bn(
                    base + ".downsample.0", base + ".downsample.1"
                )
    for i in range(4):
        params["lateral"][i] = conv_plain(f"neck.lateral_convs.{i}.conv")
        params["fpn_out"][i] = conv_plain(f"neck.fpn_convs.{i}.conv")
    params["rpn_conv"] = conv_plain("rpn_head.rpn_conv")
    params["rpn_cls"] = conv_plain("rpn_head.rpn_cls")
    params["rpn_reg"] = conv_plain("rpn_head.rpn_reg")
    params["fc1"] = fc("roi_head.bbox_head.shared_fcs.0")
    params["fc2"] = fc("roi_head.bbox_head.shared_fcs.1")
    params["cls"] = fc("roi_head.bbox_head.fc_cls")
    params["reg"] = fc("roi_head.bbox_head.fc_reg")
    for i in range(4):
        params["mask_convs"][i] = conv_plain(f"roi_head.mask_head.convs.{i}.conv")
    params["mask_deconv"] = {
        "w": jnp.asarray(
            sd["roi_head.mask_head.upsample.weight"].transpose(1, 0, 2, 3),
            jnp.float32,
        ),
        "b": jnp.asarray(sd["roi_head.mask_head.upsample.bias"], jnp.float32),
    }
    params["mask_logits"] = conv_plain("roi_head.mask_head.conv_logits")
    return params
