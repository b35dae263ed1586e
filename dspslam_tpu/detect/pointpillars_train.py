"""Synthetic closed-loop PointPillars training.

No pretrained detector weights exist in this environment, so the
architecture cannot be validated against KITTI. What CAN be proven is
that the whole stack — pillarization, PFN, BEV backbone, anchor heads,
delta decoding and rotated NMS — is wired correctly end-to-end: train
briefly on generated scans with planted car-sized boxes and assert the
detector recovers them (tests/test_detector_closed_loop.py). This closes
as much of the no-weights gap as the environment allows, mirroring the
semantics of the reference's detector3d.py:59-67 (boxes in, car
detections out).

Target assignment is the SSD-style scheme PointPillars uses, simplified
to center-distance gating (full rotated-IoU assignment adds nothing for
the wiring proof): anchors near a ground-truth center with the closer
rotation are positive, far anchors negative, the band between ignored;
each ground-truth box force-matches its nearest anchor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .pointpillars import (
    PointPillarsConfig,
    _anchors,
    build_pillars_from_points,
    crop_quantize_points,
    decode_boxes,
    forward,
    init_params,
)


def small_config() -> PointPillarsConfig:
    """Reduced-scale config for CPU-runnable closed-loop tests (~16x
    cheaper BEV backbone than the KITTI-scale default)."""
    return PointPillarsConfig(
        pc_range=(0.0, -15.36, -3.0, 30.72, 15.36, 1.0),
        voxel_size=(0.32, 0.32, 4.0),
        # generated scenes occupy ~3.5k pillars, mostly singletons: the
        # cap must hold them ALL or the densest-first selection breaks
        # count ties differently per assignment path and the training
        # signal gains pillar-dropout noise
        max_pillars=4096,
        backbone_layers=(2, 2, 2),
        backbone_channels=(32, 64, 128),
        fpn_channels=(64, 64, 64),
        nms_pre=64,
        max_detections=10,
        score_threshold=0.3,
    )


def encode_boxes(gt: np.ndarray, anchors: np.ndarray) -> np.ndarray:
    """Inverse of decode_boxes (DeltaXYZWLHR)."""
    diag = np.sqrt(anchors[:, 3] ** 2 + anchors[:, 4] ** 2)
    out = np.zeros_like(gt)
    out[:, 0] = (gt[:, 0] - anchors[:, 0]) / diag
    out[:, 1] = (gt[:, 1] - anchors[:, 1]) / diag
    out[:, 2] = (gt[:, 2] - anchors[:, 2]) / anchors[:, 5]
    out[:, 3] = np.log(gt[:, 3] / anchors[:, 3])
    out[:, 4] = np.log(gt[:, 4] / anchors[:, 4])
    out[:, 5] = np.log(gt[:, 5] / anchors[:, 5])
    out[:, 6] = gt[:, 6] - anchors[:, 6]
    return out


def assign_targets(
    anchors: np.ndarray,
    gt_boxes: np.ndarray,
    pos_dist: float = 1.2,
    neg_dist: float = 2.5,
):
    """(A, 7) anchors + (N, 7) gt -> cls (A,) in {1, 0, -1=ignore},
    reg deltas (A, 7) for positives, dir class (A,)."""
    A = len(anchors)
    cls_t = np.zeros(A, np.float32)
    reg_t = np.zeros((A, 7), np.float32)
    dir_t = np.zeros(A, np.int32)
    if len(gt_boxes) == 0:
        return cls_t, reg_t, dir_t
    d = np.linalg.norm(
        anchors[:, None, :2] - gt_boxes[None, :, :2], axis=-1
    )                                                   # (A, N)
    # rotation compatibility: the anchor rotation nearer the gt yaw
    dyaw = np.abs(
        np.remainder(
            anchors[:, None, 6] - gt_boxes[None, :, 6] + np.pi / 2, np.pi
        ) - np.pi / 2
    )
    d_eff = d + 10.0 * (dyaw > np.pi / 4)               # wrong-rot penalty
    best_gt = np.argmin(d_eff, axis=1)
    best_d = d_eff[np.arange(A), best_gt]
    cls_t[:] = -1.0
    cls_t[best_d > neg_dist] = 0.0
    pos = best_d < pos_dist
    # force-match each gt to its nearest anchor
    for g in range(len(gt_boxes)):
        a = int(np.argmin(d_eff[:, g]))
        pos[a] = True
        best_gt[a] = g
    cls_t[pos] = 1.0
    idx = np.nonzero(pos)[0]
    reg_t[idx] = encode_boxes(gt_boxes[best_gt[idx]], anchors[idx])
    dir_t[idx] = (
        np.cos(gt_boxes[best_gt[idx], 6] - anchors[idx, 6]) < 0.0
    ).astype(np.int32)
    return cls_t, reg_t, dir_t


def _focal_loss(logits, labels, mask, alpha=0.25, gamma=2.0):
    p = jax.nn.sigmoid(logits)
    pt = jnp.where(labels > 0, p, 1.0 - p)
    a = jnp.where(labels > 0, alpha, 1.0 - alpha)
    ce = -jnp.log(jnp.clip(pt, 1e-6))
    return jnp.sum(a * (1.0 - pt) ** gamma * ce * mask)


def _smooth_l1(x, beta=1.0 / 9.0):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def loss_fn(params, pillars, cls_t, reg_t, dir_t, cfg):
    cls, deltas, dirs = forward(params, pillars, cfg)
    valid = cls_t >= 0.0
    n_pos = jnp.maximum(jnp.sum(cls_t > 0), 1.0)
    l_cls = _focal_loss(cls, cls_t, valid.astype(jnp.float32)) / n_pos
    pos = (cls_t > 0).astype(jnp.float32)[:, None]
    l_reg = jnp.sum(_smooth_l1(deltas - reg_t) * pos) / n_pos
    logp = jax.nn.log_softmax(dirs, axis=-1)
    l_dir = -jnp.sum(
        jnp.take_along_axis(logp, dir_t[:, None], axis=1)[:, 0]
        * pos[:, 0]
    ) / n_pos
    return l_cls + 2.0 * l_reg + 0.2 * l_dir


@partial(jax.jit, static_argnums=(4, 5), donate_argnums=(0, 1))
def train_step(params, opt_state, pillars_sparse, targets, cfg, optimizer):
    pillars = build_pillars_from_points(pillars_sparse, cfg)
    cls_t, reg_t, dir_t = targets

    loss, grads = jax.value_and_grad(loss_fn)(
        params, pillars, cls_t, reg_t, dir_t, cfg
    )
    updates, opt_state = optimizer.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def make_box_scene(rng, cfg: PointPillarsConfig, n_boxes=3):
    """Velodyne-frame scan with planted car-sized boxes: ground plane +
    box shell surfaces + clutter. Returns (scan (V, 4), gt (N, 7))."""
    x0, y0, _, x1, y1, _ = cfg.pc_range
    gt = []
    for _ in range(n_boxes):
        for _attempt in range(20):
            x = rng.uniform(x0 + 4.0, x1 - 4.0)
            y = rng.uniform(y0 + 4.0, y1 - 4.0)
            if all(np.hypot(x - g[0], y - g[1]) > 6.0 for g in gt):
                break
        yaw = rng.choice([0.0, np.pi / 2]) + rng.normal(0, 0.12)
        w, l, h = cfg.anchor_size
        gt.append([x, y, cfg.anchor_z, w, l, h, yaw])
    gt = np.asarray(gt, np.float32)

    parts = [np.stack([
        rng.uniform(x0, x1, 4000), rng.uniform(y0, y1, 4000),
        np.full(4000, -1.6) + rng.normal(0, 0.02, 4000),
    ], -1)]
    for b in gt:
        x, y, z, w, l, h, yaw = b
        n = 400
        # shell: sample the 4 vertical faces
        u = rng.uniform(-0.5, 0.5, n)
        face = rng.integers(0, 4, n)
        fx = np.where(face == 0, u * l, np.where(face == 1, u * l, u * 0 + 0.5 * l * np.sign(rng.normal(size=n))))
        fy = np.where(face < 2, 0.5 * w * np.where(face == 0, 1, -1), u * w)
        fz = rng.uniform(0.0, h, n)
        c, s = np.cos(yaw), np.sin(yaw)
        px = x + c * fx - s * fy
        py = y + s * fx + c * fy
        pz = z + fz
        parts.append(np.stack([px, py, pz], -1))
    parts.append(np.stack([
        rng.uniform(x0, x1, 300), rng.uniform(y0, y1, 300),
        rng.uniform(-1.5, 0.5, 300),
    ], -1))
    pts = np.concatenate(parts).astype(np.float32)
    refl = rng.uniform(0, 1, (len(pts), 1)).astype(np.float32)
    return np.concatenate([pts, refl], -1), gt


def fit_synthetic(
    cfg: PointPillarsConfig,
    steps: int = 250,
    seed: int = 0,
    lr: float = 2e-3,
    n_boxes=3,
    n_scenes: int | None = None,
):
    """Train on generated scenes (fresh each step, or an `n_scenes`-sized
    fixed set iterated in epochs); returns (params, tail losses).

    Note on convergence: the inference-path network has its BatchNorm
    folded away (load_mmdet3d_checkpoint), so from-scratch training here
    is normalization-free and needs thousands of steps to GENERALIZE
    across scenes — fine for offline use, too slow for CI. The CI-grade
    wiring proof is `overfit_scene` + detect on the same scene."""
    rng = np.random.default_rng(seed)
    H = cfg.grid_size[1] // 2
    W = cfg.grid_size[0] // 2
    anchors = _anchors(cfg, (H, W))
    optimizer = optax.adam(lr)
    params = init_params(cfg, jax.random.PRNGKey(seed))
    opt_state = optimizer.init(params)
    scenes = []
    if n_scenes:
        for _ in range(n_scenes):
            scan, gt = make_box_scene(rng, cfg, n_boxes=n_boxes)
            sp = crop_quantize_points(scan, cfg, point_cap=16384)
            scenes.append((
                {k: jnp.asarray(v) for k, v in sp.items()},
                tuple(jnp.asarray(t) for t in assign_targets(anchors, gt)),
            ))
    losses = []
    for i in range(steps):
        if scenes:
            sp, targets = scenes[i % len(scenes)]
        else:
            scan, gt = make_box_scene(rng, cfg, n_boxes=n_boxes)
            sp = {
                k: jnp.asarray(v)
                for k, v in crop_quantize_points(
                    scan, cfg, point_cap=16384
                ).items()
            }
            targets = tuple(
                jnp.asarray(t) for t in assign_targets(anchors, gt)
            )
        params, opt_state, loss = train_step(
            params, opt_state, sp, targets, cfg, optimizer
        )
        losses.append(loss)
    return params, [float(np.asarray(l)) for l in losses[-5:]]


def overfit_scene(cfg: PointPillarsConfig, steps: int = 320, seed: int = 0):
    """Overfit ONE generated scene — the end-to-end wiring proof: if
    assignment, encoding, the network, decoding and NMS are consistent,
    a few hundred steps must drive the planted boxes' scores up and
    make_prediction must recover them on that scene. Returns
    (params, scan, gt_boxes)."""
    rng = np.random.default_rng(seed)
    H = cfg.grid_size[1] // 2
    W = cfg.grid_size[0] // 2
    anchors = _anchors(cfg, (H, W))
    scan, gt = make_box_scene(rng, cfg, n_boxes=3)
    sp = {
        k: jnp.asarray(v)
        for k, v in crop_quantize_points(scan, cfg, point_cap=16384).items()
    }
    targets = tuple(jnp.asarray(t) for t in assign_targets(anchors, gt))
    # cosine decay tightens the box-size regression tail: constant
    # 3e-3 Adam leaves l_err ~1.2 at 320-480 steps, decayed ~0.5
    optimizer = optax.adam(
        optax.cosine_decay_schedule(3e-3, int(steps * 1.6))
    )
    params = init_params(cfg, jax.random.PRNGKey(seed))
    opt_state = optimizer.init(params)
    for _ in range(steps):
        params, opt_state, _ = train_step(
            params, opt_state, sp, targets, cfg, optimizer
        )
    return params, scan, gt


# ---------------------------------------------------------------------------
# BatchNorm-enabled training path
#
# The inference network (pointpillars.forward) is normalization-free by
# design: mmdet3d checkpoints arrive with their BatchNorm FOLDED into
# conv weights (load_mmdet3d_checkpoint/_fold_bn), which is the fastest
# inference form on TPU. Training that folded form from scratch
# converges per-scene but needs thousands of steps to generalize across
# scenes (round-3 finding). This section restores what mmdet trains
# with — conv -> BN -> ReLU everywhere (configs/_base_/models/
# hv_pointpillars_secfpn_kitti.py norm_cfg=BN) — as a parallel
# `train_forward` that mirrors `forward` layer by layer, then
# `fold_bn_state` bakes the learned scale/shift + running stats back
# into standard inference params. Inference cost is therefore unchanged.

BN_EPS = 1e-3
BN_MOMENTUM = 0.9     # fast-converging running stats for short schedules


def init_bn_state(cfg: PointPillarsConfig) -> dict:
    def mk(c):
        return {
            "gamma": jnp.ones((c,), jnp.float32),
            "beta": jnp.zeros((c,), jnp.float32),
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32),
        }

    return {
        "pfn": mk(cfg.pfn_channels),
        "blocks": [
            [mk(cout) for _ in range(n_layers + 1)]
            for n_layers, cout in zip(
                cfg.backbone_layers, cfg.backbone_channels
            )
        ],
        "deblocks": [mk(c) for c in cfg.fpn_channels],
    }


def _bn_conv_train(x, bnp):
    """(N, C, H, W) batch-stat BatchNorm; returns (y, (mu, var))."""
    mu = jnp.mean(x, axis=(0, 2, 3))
    var = jnp.var(x, axis=(0, 2, 3))
    xh = (x - mu[None, :, None, None]) * jax.lax.rsqrt(
        var[None, :, None, None] + BN_EPS
    )
    y = xh * bnp["gamma"][None, :, None, None] \
        + bnp["beta"][None, :, None, None]
    return y, (mu, var)


def train_forward(params, bn, pillars, cfg: PointPillarsConfig):
    """Mirror of pointpillars.forward with conv->BN->ReLU (f32; the
    bf16 fast path belongs to inference). Returns
    (cls, box, dir, batch_stats) — batch_stats is a pytree shaped like
    the (mean, var) leaves of `bn`."""
    from .pointpillars import _conv, _deconv

    f = pillars["features"]
    m = pillars["mask"]
    h = jnp.dot(f, params["pfn"]["w"], preferred_element_type=jnp.float32)
    # masked point-wise BN (PFN norm over valid points, mmdet PFNLayer)
    w = (m[..., None] > 0).astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu_p = jnp.sum(h * w, axis=(0, 1)) / n
    var_p = jnp.sum(((h - mu_p) ** 2) * w, axis=(0, 1)) / n
    h = (h - mu_p) * jax.lax.rsqrt(var_p + BN_EPS)
    h = h * bn["pfn"]["gamma"] + bn["pfn"]["beta"]
    h = jnp.maximum(h, 0.0)
    h = jnp.max(jnp.where(m[..., None] > 0, h, -1e9), axis=1)
    h = h * pillars["pillar_mask"][:, None]

    nx, ny = cfg.grid_size
    canvas = jnp.zeros((cfg.pfn_channels, ny, nx))
    canvas = canvas.at[
        :, pillars["coords"][:, 1], pillars["coords"][:, 0]
    ].set(h.T * pillars["pillar_mask"][None, :])
    x = canvas[None]

    stats = {"pfn": (mu_p, var_p), "blocks": [], "deblocks": []}
    outs = []
    for block, bns, (stride, factor, dp, dbn) in zip(
        params["blocks"], bn["blocks"],
        zip(cfg.backbone_strides, cfg.fpn_upsample,
            params["deblocks"], bn["deblocks"]),
    ):
        bstats = []
        x = _conv(x, block[0], stride)
        x, s = _bn_conv_train(x, bns[0])
        bstats.append(s)
        x = jnp.maximum(x, 0.0)
        for layer, lbn in zip(block[1:], bns[1:]):
            x = _conv(x, layer)
            x, s = _bn_conv_train(x, lbn)
            bstats.append(s)
            x = jnp.maximum(x, 0.0)
        stats["blocks"].append(bstats)
        y = _deconv(x, dp, factor)
        y, s = _bn_conv_train(y, dbn)
        stats["deblocks"].append(s)
        outs.append(jnp.maximum(y, 0.0))
    feat = jnp.concatenate(outs, axis=1)

    cls = _conv(feat, params["head_cls"])[0]
    box = _conv(feat, params["head_box"])[0]
    direc = _conv(feat, params["head_dir"])[0]
    n_rot = len(cfg.anchor_rotations)
    H, W = cls.shape[-2:]
    cls = cls.reshape(n_rot, H, W).transpose(1, 2, 0).reshape(-1)
    box = box.reshape(n_rot, 7, H, W).transpose(2, 3, 0, 1).reshape(-1, 7)
    direc = direc.reshape(n_rot, 2, H, W).transpose(2, 3, 0, 1).reshape(-1, 2)
    return cls, box, direc, stats


def _fold_one(p, bnp, conv: bool):
    scale = np.asarray(bnp["gamma"]) / np.sqrt(np.asarray(bnp["var"]) + BN_EPS)
    w = np.asarray(p["w"])
    w = w * (scale[:, None, None, None] if conv else scale[None, :])
    b = (np.asarray(p["b"]) - np.asarray(bnp["mean"])) * scale \
        + np.asarray(bnp["beta"])
    return {"w": jnp.asarray(w), "b": jnp.asarray(b)}


def fold_bn_state(params, bn) -> dict:
    """Bake BN (learned gamma/beta + running stats) into standard
    inference params — the from-scratch analogue of _fold_bn on mmdet
    checkpoints; pointpillars.forward consumes the result unchanged."""
    out = {
        "pfn": _fold_one(params["pfn"], bn["pfn"], conv=False),
        "blocks": [
            [_fold_one(l, lbn, conv=True) for l, lbn in zip(block, bns)]
            for block, bns in zip(params["blocks"], bn["blocks"])
        ],
        "deblocks": [
            _fold_one(d, dbn, conv=True)
            for d, dbn in zip(params["deblocks"], bn["deblocks"])
        ],
        "head_cls": dict(params["head_cls"]),
        "head_box": dict(params["head_box"]),
        "head_dir": dict(params["head_dir"]),
    }
    return out


def loss_fn_bn(trainables, pillars, cls_t, reg_t, dir_t, cfg):
    params, bn = trainables
    cls, deltas, dirs, stats = train_forward(params, bn, pillars, cfg)
    valid = cls_t >= 0.0
    n_pos = jnp.maximum(jnp.sum(cls_t > 0), 1.0)
    l_cls = _focal_loss(cls, cls_t, valid.astype(jnp.float32)) / n_pos
    pos = (cls_t > 0).astype(jnp.float32)[:, None]
    l_reg = jnp.sum(_smooth_l1(deltas - reg_t) * pos) / n_pos
    logp = jax.nn.log_softmax(dirs, axis=-1)
    l_dir = -jnp.sum(
        jnp.take_along_axis(logp, dir_t[:, None], axis=1)[:, 0] * pos[:, 0]
    ) / n_pos
    return l_cls + 2.0 * l_reg + 0.2 * l_dir, stats


@partial(jax.jit, static_argnums=(5, 6), donate_argnums=(0, 1, 2))
def train_step_bn(params, bn, opt_state, pillars_sparse, targets, cfg,
                  optimizer):
    pillars = build_pillars_from_points(pillars_sparse, cfg)
    cls_t, reg_t, dir_t = targets
    (loss, stats), grads = jax.value_and_grad(loss_fn_bn, has_aux=True)(
        (params, bn), pillars, cls_t, reg_t, dir_t, cfg
    )
    updates, opt_state = optimizer.update(grads, opt_state)
    params, bn = optax.apply_updates((params, bn), updates)

    # running-stat update (momentum EMA of batch stats); mean/var get
    # zero gradients above (batch stats, not running stats, drive the
    # training forward), so this is the only thing that moves them
    def upd(bnp, s):
        mu, var = s
        return dict(
            bnp,
            mean=BN_MOMENTUM * bnp["mean"] + (1 - BN_MOMENTUM) * mu,
            var=BN_MOMENTUM * bnp["var"] + (1 - BN_MOMENTUM) * var,
        )

    bn = {
        "pfn": upd(bn["pfn"], stats["pfn"]),
        "blocks": [
            [upd(lbn, s) for lbn, s in zip(bns, bstats)]
            for bns, bstats in zip(bn["blocks"], stats["blocks"])
        ],
        "deblocks": [
            upd(dbn, s) for dbn, s in zip(bn["deblocks"], stats["deblocks"])
        ],
    }
    return params, bn, opt_state, loss


def fit_synthetic_bn(
    cfg: PointPillarsConfig,
    steps: int = 400,
    seed: int = 0,
    lr: float = 2e-3,
    n_boxes=3,
):
    """Cross-scene training with BatchNorm (fresh generated scene per
    step), returning FOLDED inference params + tail losses. This is the
    generalizing counterpart of fit_synthetic: BN keeps activation
    distributions stationary while scene content varies, which the
    normalization-free path lacks (round-3: thousands of steps to
    generalize). Measured on small_config (focal prior bias + cosine
    decay): 10/12 planted boxes recovered on UNSEEN scenes at 400
    steps, 12/12 from 600 on — see tests/test_detector_closed_loop.py
    cross-scene case."""
    rng = np.random.default_rng(seed)
    H = cfg.grid_size[1] // 2
    W = cfg.grid_size[0] // 2
    anchors = _anchors(cfg, (H, W))
    # decay over ~3x the schedule: full decay-to-zero within `steps`
    # measured WORSE at short schedules (lr collapses before the trunk
    # learns); the long tail keeps lr meaningful throughout
    optimizer = optax.adam(optax.cosine_decay_schedule(lr, 3 * steps))
    params = init_params(cfg, jax.random.PRNGKey(seed))
    bn = init_bn_state(cfg)
    opt_state = optimizer.init((params, bn))
    losses = []
    for _ in range(steps):
        scan, gt = make_box_scene(rng, cfg, n_boxes=n_boxes)
        sp = {
            k: jnp.asarray(v)
            for k, v in crop_quantize_points(
                scan, cfg, point_cap=16384
            ).items()
        }
        targets = tuple(jnp.asarray(t) for t in assign_targets(anchors, gt))
        params, bn, opt_state, loss = train_step_bn(
            params, bn, opt_state, sp, targets, cfg, optimizer
        )
        losses.append(loss)
    return fold_bn_state(params, bn), [
        float(np.asarray(l)) for l in losses[-5:]
    ]
