"""Synthetic closed-loop training for the Mask R-CNN stack.

No pretrained weights exist in this environment; mirroring
pointpillars_train.py, this trains the from-scratch network
(detect/maskrcnn.py) on a generated scene with planted box+mask
instances until it fits, proving the whole inference chain is wired
consistently: anchor grids match the RPN head layout, delta
encode/decode round-trips, RoIAlign samples where the boxes say,
the class/label indexing matches Detector2D's filter, and the mask
head + paste_masks reproduce the planted silhouettes. Semantics of
the reference's detector2d.py:59-86 (make_prediction contract).

The losses are the standard Mask R-CNN ones, fixed-shape:
  * RPN: balanced BCE on objectness (pos iou>0.5 / neg iou<0.3) +
    smooth-L1 on deltas at positive anchors, over all FPN levels.
  * RoI heads: trained on ground-truth boxes plus jittered copies as
    proposals (softmax CE, per-class smooth-L1 deltas, per-class mask
    BCE against the 28x28 crop of the instance mask), PLUS the live
    RPN's own post-NMS proposals refreshed every `refresh` steps
    (hard-proposal mining) — without the latter, inference-time RPN
    proposals can fall outside the jitter distribution and be
    confidently misclassified (observed: spurious >0.7-score car
    detections at ~0.1-0.2 gt IoU after a jitter-only overfit).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import maskrcnn as mr

# detect() labels come from argmax over softmax(cls_logits)[:, 1:], so
# Detector2D's "cars" filter (labels == 2, OBJECT_CLASS_TABLE) selects
# full-logit column 3.
CAR_LABEL = 2
CAR_LOGIT_COL = CAR_LABEL + 1


def small_config() -> mr.MaskRCNNConfig:
    """CI-sized architecture: same topology, ~1/60 the parameters."""
    return mr.MaskRCNNConfig(
        num_classes=4,
        stage_blocks=(1, 1, 1, 1),
        stem_channels=8,
        fpn_channels=32,
        backbone_dtype="float32",  # f32 grads for the overfit loop
        rpn_pre_nms=256,
        rpn_post_nms=32,
        fc_dim=64,
        max_detections=8,
    )


# ---------------------------------------------------------------------------
# scene generation


def make_scene(rng: np.random.Generator, h=192, w=256, n_obj=3):
    """Noise background + bright two-tone rectangles ("cars").

    Returns (img (H, W, 3) uint8, gt_boxes (N, 4) xyxy, gt_masks
    (N, H, W) float32)."""
    img = rng.normal(70, 5, (h, w, 3)).astype(np.float32)
    boxes, masks = [], []
    for i in range(n_obj):
        bw = int(rng.integers(44, 64))
        bh = int(rng.integers(28, 40))
        x0 = int(rng.integers(32, w - 32 - bw))
        y0 = int(rng.integers(16, h - 16 - bh))
        # two-tone interior so the instance has internal structure
        img[y0 : y0 + bh, x0 : x0 + bw] = 160.0 + 20.0 * i
        img[y0 : y0 + bh // 2, x0 : x0 + bw] = 120.0 + 20.0 * i
        m = np.zeros((h, w), np.float32)
        m[y0 : y0 + bh, x0 : x0 + bw] = 1.0
        boxes.append([x0, y0, x0 + bw, y0 + bh])
        masks.append(m)
    return (
        np.clip(img, 0, 255).astype(np.uint8),
        np.asarray(boxes, np.float32),
        np.stack(masks),
    )


# ---------------------------------------------------------------------------
# targets


def encode_deltas(gt: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Inverse of maskrcnn.decode_deltas."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    cx = boxes[:, 0] + w / 2
    cy = boxes[:, 1] + h / 2
    gw = jnp.maximum(gt[:, 2] - gt[:, 0], 1e-3)
    gh = jnp.maximum(gt[:, 3] - gt[:, 1], 1e-3)
    gcx = gt[:, 0] + gw / 2
    gcy = gt[:, 1] + gh / 2
    return jnp.stack(
        [
            (gcx - cx) / jnp.maximum(w, 1e-3),
            (gcy - cy) / jnp.maximum(h, 1e-3),
            jnp.log(gw / jnp.maximum(w, 1e-3)),
            jnp.log(gh / jnp.maximum(h, 1e-3)),
        ],
        axis=-1,
    )


def _feature_hw(h, w, stride):
    out_h, out_w = h, w
    s = 1
    while s < stride:
        out_h = -(-out_h // 2)
        out_w = -(-out_w // 2)
        s *= 2
    return out_h, out_w


def all_anchors(image_hw, cfg: mr.MaskRCNNConfig) -> np.ndarray:
    """Concatenated anchors over P2..P6, matching detect()'s RPN loop."""
    h, w = image_hw
    out = []
    for stride in (4, 8, 16, 32, 64):
        out.append(mr._level_anchors(_feature_hw(h, w, stride), stride, cfg))
    return np.concatenate(out)


def rpn_targets(anchors: np.ndarray, gt: np.ndarray):
    """(labels (A,) {1 pos, 0 neg, -1 ignore}, deltas (A, 4))."""
    iou = np.asarray(mr.iou_matrix(jnp.asarray(anchors), jnp.asarray(gt)))
    best_gt = iou.argmax(axis=1)
    best_iou = iou.max(axis=1)
    labels = -np.ones(len(anchors), np.int32)
    labels[best_iou < 0.3] = 0
    labels[best_iou > 0.5] = 1
    # every gt claims its best anchor (classic RPN rule)
    labels[iou.argmax(axis=0)] = 1
    best_gt[iou.argmax(axis=0)] = np.arange(len(gt))
    deltas = np.asarray(
        encode_deltas(jnp.asarray(gt[best_gt]), jnp.asarray(anchors))
    )
    return labels, deltas


def roi_proposals(rng, gt: np.ndarray, per_gt=16):
    """GT boxes + jittered copies as RoI-head training proposals.

    Jitter tiers (tight / medium / far-shift) emulate the spread of RPN
    proposals; labels follow the standard 0.5-IoU rule, so
    medium-overlap boxes train as BACKGROUND — without them the class
    head calls any partial overlap a car and NMS keeps sloppy
    duplicates."""
    props, match = [], []
    for gi, g in enumerate(gt):
        w, h = g[2] - g[0], g[3] - g[1]
        for j in range(per_gt):
            tier = j % 4
            sd = (0.06, 0.12, 0.35, 0.35)[tier]
            off = rng.normal(0, sd, 4) * np.asarray([w, h, w, h])
            if tier == 3:  # unambiguous background: far shift
                off = off + np.asarray([2.5 * w, 2.5 * h, 2.5 * w, 2.5 * h])
            p = g + off
            if p[2] - p[0] < 8:
                p[2] = p[0] + 8
            if p[3] - p[1] < 8:
                p[3] = p[1] + 8
            props.append(p)
            match.append(gi)
    props = np.asarray(props, np.float32)
    match = np.asarray(match, np.int32)
    iou = np.asarray(
        mr.iou_matrix(jnp.asarray(props), jnp.asarray(gt))
    )[np.arange(len(props)), match]
    cls_t = np.where(iou >= 0.5, CAR_LOGIT_COL, 0).astype(np.int32)
    return props, cls_t, match


# ---------------------------------------------------------------------------
# loss


def _smooth_l1(x, beta=1.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def loss_fn(params, img, targets, image_hw, cfg: mr.MaskRCNNConfig):
    feats = mr.resnet_fpn(params, mr.normalize_image(img), cfg)

    # --- RPN (the same per-level heads + anchor layout as detect())
    outs = [mr.rpn_level_outputs(params, f) for f in feats]
    scores = jnp.concatenate([s for s, _ in outs])
    deltas = jnp.concatenate([d for _, d in outs])
    labels = targets["rpn_labels"]
    pos = (labels == 1).astype(jnp.float32)
    neg = (labels == 0).astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(scores, pos)
    rpn_cls_loss = (
        jnp.sum(bce * pos) / jnp.maximum(jnp.sum(pos), 1.0)
        + jnp.sum(bce * neg) / jnp.maximum(jnp.sum(neg), 1.0)
    )
    reg_err = _smooth_l1(deltas - targets["rpn_deltas"]).sum(-1)
    rpn_reg_loss = jnp.sum(reg_err * pos) / jnp.maximum(jnp.sum(pos), 1.0)

    # --- RoI heads on gt-jittered proposals
    props = targets["proposals"]
    roi = mr.roi_align_fpn(feats, props, cfg.roi_size)
    flat = roi.reshape(roi.shape[0], -1)
    h1 = jnp.maximum(flat @ params["fc1"]["w"] + params["fc1"]["b"], 0.0)
    h2 = jnp.maximum(h1 @ params["fc2"]["w"] + params["fc2"]["b"], 0.0)
    cls_logits = h2 @ params["cls"]["w"] + params["cls"]["b"]
    reg = h2 @ params["reg"]["w"] + params["reg"]["b"]
    cls_t = targets["roi_cls"]
    roi_cls_loss = jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(cls_logits, cls_t)
    )
    fg = (cls_t > 0).astype(jnp.float32)
    reg_c = reg.reshape(-1, cfg.num_classes, 4)[:, CAR_LOGIT_COL - 1]
    roi_reg_loss = jnp.sum(
        _smooth_l1(reg_c - targets["roi_deltas"]).sum(-1) * fg
    ) / jnp.maximum(jnp.sum(fg), 1.0)

    # --- mask head on the same proposals
    mroi = mr.roi_align_fpn(feats, props, cfg.mask_roi_size)
    hm = mroi
    for cp in params["mask_convs"]:
        hm = jnp.maximum(mr._conv2d(hm, cp), 0.0)
    n, c, s, _ = hm.shape
    hm = jax.image.resize(hm, (n, c, s * 2, s * 2), "nearest")
    hm = jnp.maximum(mr._conv2d(hm, params["mask_deconv"]), 0.0)
    mask_logits = mr._conv2d(hm, params["mask_logits"])[:, CAR_LOGIT_COL - 1]
    mask_bce = optax.sigmoid_binary_cross_entropy(
        mask_logits, targets["mask_targets"]
    ).mean(axis=(1, 2))
    mask_loss = jnp.sum(mask_bce * fg) / jnp.maximum(jnp.sum(fg), 1.0)

    total = rpn_cls_loss + rpn_reg_loss + roi_cls_loss + roi_reg_loss + mask_loss
    return total, {
        "rpn_cls": rpn_cls_loss, "rpn_reg": rpn_reg_loss,
        "roi_cls": roi_cls_loss, "roi_reg": roi_reg_loss, "mask": mask_loss,
    }


@partial(jax.jit, static_argnums=(4, 5))
def train_step(params, opt_state, img, targets, image_hw, cfg, lr=1e-3):
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (loss, aux), grads = grad_fn(params, img, targets, image_hw, cfg)
    updates, opt_state = _optimizer(lr).update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, aux


def _optimizer(lr):
    return optax.adam(lr)


@partial(jax.jit, static_argnums=(2, 3))
def rpn_proposals(params, img, image_hw, cfg: mr.MaskRCNNConfig):
    """The live RPN's post-NMS proposals (the same mr.rpn_propose stage
    detect() runs): (rpn_post_nms, 4) boxes + (rpn_post_nms,) validity."""
    feats = mr.resnet_fpn(params, mr.normalize_image(img), cfg)
    return mr.rpn_propose(params, feats, image_hw, cfg)


def mine_rpn_targets(params, img, gt_boxes, gt_masks, image_hw, cfg):
    """RoI-head targets from the RPN's own current proposals
    (hard-proposal mining): labels by the 0.5-IoU rule, deltas/masks
    from each proposal's best-overlap instance. Invalid NMS slots are
    (0,0,0,0) boxes -> IoU 0 -> background."""
    props, _ = rpn_proposals(params, jnp.asarray(img), image_hw, cfg)
    props_np = np.asarray(props)
    iou = np.asarray(mr.iou_matrix(props, jnp.asarray(gt_boxes)))
    match = iou.argmax(axis=1).astype(np.int32)
    best = iou[np.arange(len(props_np)), match]
    roi_cls = np.where(best >= 0.5, CAR_LOGIT_COL, 0).astype(np.int32)
    roi_deltas = np.asarray(
        encode_deltas(jnp.asarray(gt_boxes[match]), props)
    )
    mask_t = np.asarray(
        jax.vmap(
            lambda m, b: mr.roi_align(m[None], b[None], 28)[0, 0]
        )(jnp.asarray(gt_masks)[match], props)
    )
    return props_np, roi_cls, roi_deltas, (mask_t > 0.5).astype(np.float32)


def augment_with_rpn(params, img, static_targets, gt_boxes, gt_masks,
                     image_hw, cfg):
    """Concatenate freshly mined RPN proposals onto the static jittered
    RoI set (fixed total shape: one compile of train_step)."""
    props, roi_cls, roi_deltas, mask_t = mine_rpn_targets(
        params, img, gt_boxes, gt_masks, image_hw, cfg
    )
    t = dict(static_targets)
    t["proposals"] = jnp.concatenate(
        [static_targets["proposals"], jnp.asarray(props)]
    )
    t["roi_cls"] = jnp.concatenate(
        [static_targets["roi_cls"], jnp.asarray(roi_cls)]
    )
    t["roi_deltas"] = jnp.concatenate(
        [static_targets["roi_deltas"], jnp.asarray(roi_deltas)]
    )
    t["mask_targets"] = jnp.concatenate(
        [static_targets["mask_targets"], jnp.asarray(mask_t)]
    )
    return t


def build_targets(rng, gt_boxes, gt_masks, image_hw, cfg):
    anchors = all_anchors(image_hw, cfg)
    rpn_labels, rpn_deltas = rpn_targets(anchors, gt_boxes)
    props, roi_cls, match = roi_proposals(rng, gt_boxes)
    roi_deltas = np.asarray(
        encode_deltas(jnp.asarray(gt_boxes[match]), jnp.asarray(props))
    )
    # 28x28 crops of each matched instance mask at its proposal window
    # (roi_align expects (C, H, W); run per-proposal on its own mask)
    mask_t = np.asarray(
        jax.vmap(
            lambda m, b: mr.roi_align(m[None], b[None], 28)[0, 0]
        )(jnp.asarray(gt_masks)[match], jnp.asarray(props))
    )
    return {
        "rpn_labels": jnp.asarray(rpn_labels),
        "rpn_deltas": jnp.asarray(rpn_deltas),
        "proposals": jnp.asarray(props),
        "roi_cls": jnp.asarray(roi_cls),
        "roi_deltas": jnp.asarray(roi_deltas),
        "mask_targets": jnp.asarray((mask_t > 0.5).astype(np.float32)),
    }


def overfit_scene(cfg: mr.MaskRCNNConfig, steps=400, seed=0, lr=1e-3,
                  refresh=100):
    """Train on one planted scene; returns (params, img, gt_boxes,
    gt_masks). Every `refresh` steps the RoI set is re-augmented with
    the RPN's own current proposals (hard-proposal mining) so the
    class/box/mask heads train on exactly the inference distribution."""
    rng = np.random.default_rng(seed)
    img, gt_boxes, gt_masks = make_scene(rng)
    image_hw = img.shape[:2]
    static_t = build_targets(rng, gt_boxes, gt_masks, image_hw, cfg)
    params = mr.init_params(cfg, jax.random.PRNGKey(seed))
    opt_state = _optimizer(lr).init(params)
    jimg = jnp.asarray(img)
    targets = augment_with_rpn(
        params, jimg, static_t, gt_boxes, gt_masks, image_hw, cfg
    )
    for step in range(steps):
        if refresh and step and step % refresh == 0:
            targets = augment_with_rpn(
                params, jimg, static_t, gt_boxes, gt_masks, image_hw, cfg
            )
        params, opt_state, loss, aux = train_step(
            params, opt_state, jimg, targets, image_hw, cfg, lr
        )
    return params, img, gt_boxes, gt_masks
