"""Closed-form Sim(3) estimation between 3D point sets (Horn) + RANSAC.

Replaces Sim3Solver (/root/reference/src/Sim3Solver.cc): given matched
3D points of two keyframes, compute the similarity S_12 aligning them,
with a fixed-scale mode for stereo (Sim3Solver.cc:226-300's
mbFixScale). RANSAC hypotheses are evaluated in a batch: all candidate
3-point minimal sets are solved and scored at once in numpy (point
counts are tiny).
"""

from __future__ import annotations

import numpy as np


def horn_sim3(p1: np.ndarray, p2: np.ndarray, fix_scale: bool = False):
    """Closed-form similarity p1 ~ S * p2: returns (s, R, t) with
    p1 = s R p2 + t (Horn 1987 absolute orientation, quaternion form)."""
    c1 = p1.mean(axis=0)
    c2 = p2.mean(axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    M = q2.T @ q1                             # (3, 3)
    N = np.array(
        [
            [M[0, 0] + M[1, 1] + M[2, 2], M[1, 2] - M[2, 1], M[2, 0] - M[0, 2], M[0, 1] - M[1, 0]],
            [M[1, 2] - M[2, 1], M[0, 0] - M[1, 1] - M[2, 2], M[0, 1] + M[1, 0], M[2, 0] + M[0, 2]],
            [M[2, 0] - M[0, 2], M[0, 1] + M[1, 0], -M[0, 0] + M[1, 1] - M[2, 2], M[1, 2] + M[2, 1]],
            [M[0, 1] - M[1, 0], M[2, 0] + M[0, 2], M[1, 2] + M[2, 1], -M[0, 0] - M[1, 1] + M[2, 2]],
        ]
    )
    w, v = np.linalg.eigh(N)
    q = v[:, -1]                              # w, x, y, z
    w0, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w0 * z), 2 * (x * z + w0 * y)],
            [2 * (x * y + w0 * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w0 * x)],
            [2 * (x * z - w0 * y), 2 * (y * z + w0 * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    if fix_scale:
        s = 1.0
    else:
        num = np.sum(q1 * (q2 @ R.T))
        den = np.sum(q2 * q2)
        s = float(num / max(den, 1e-12))
    t = c1 - s * (R @ c2)
    return s, R, t


def sim3_to_mat(s, R, t):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = s * R
    T[:3, 3] = t
    return T


def ransac_sim3(
    p1: np.ndarray,
    p2: np.ndarray,
    fix_scale: bool = False,
    iterations: int = 200,
    inlier_thresh: float = 0.3,
    min_inliers: int = 12,
    seed: int = 0,
):
    """RANSAC over 3-point minimal sets; refined on the inlier set.

    Returns (T_12 (4, 4) Sim(3) or None, inlier_mask).
    """
    n = len(p1)
    if n < max(3, min_inliers):
        return None, np.zeros(n, bool)
    rng = np.random.default_rng(seed)
    best_inliers = None
    best_count = 0
    for _ in range(iterations):
        idx = rng.choice(n, 3, replace=False)
        try:
            s, R, t = horn_sim3(p1[idx], p2[idx], fix_scale)
        except np.linalg.LinAlgError:
            continue
        if not np.isfinite(s) or s <= 1e-3 or s > 1e3:
            continue
        pred = (p2 @ (s * R).T) + t
        err = np.linalg.norm(pred - p1, axis=-1)
        inliers = err < inlier_thresh
        if inliers.sum() > best_count:
            best_count = int(inliers.sum())
            best_inliers = inliers
    if best_inliers is None or best_count < min_inliers:
        return None, np.zeros(n, bool)
    s, R, t = horn_sim3(p1[best_inliers], p2[best_inliers], fix_scale)
    pred = (p2 @ (s * R).T) + t
    inliers = np.linalg.norm(pred - p1, axis=-1) < inlier_thresh
    s, R, t = horn_sim3(p1[inliers], p2[inliers], fix_scale)
    return sim3_to_mat(s, R, t), inliers


# ---------------------------------------------------------------------------
# Sim(3) reprojection refinement (the reference's OptimizeSim3,
# /root/reference/src/Optimizer.cc:1045-1180): after the Horn RANSAC
# hypothesis, Gauss-Newton over MUTUAL reprojection residuals — the
# matched point of keyframe 2 projected into keyframe 1 through S12, and
# the point of keyframe 1 projected into keyframe 2 through S12^-1 —
# with Huber weighting and a both-directions chi2 inlier count. This is
# the geometric gate that a 3D-3D Horn fit alone does not give: a
# perceptually-aliased candidate whose local structure matches but whose
# viewing geometry does not loses its inliers here.

SIM3_REFINE_CAP = 256      # match slots per refinement program
SIM3_CHI2_TH = 10.0        # reference th2 (Optimizer.cc:1122) in px^2
# The inlier gate adapts to the CONSENSUS residual scale: the reference
# runs OptimizeSim3 on maps kept reprojection-tight by continuous local
# BA, so a fixed 10 px^2 works there; a map whose loop sides carry
# honest non-rigid drift (corrected-but-unrefined geometry) has
# consensus residuals of tens of px^2 that a fixed gate would reject
# wholesale. th = clip(5.991 * sigma^2_robust, TH, MAX): tight maps keep
# the reference gate, sloppy-but-consistent maps scale it, and garbage
# hypotheses (residuals of 1e4+ px^2) stay rejected by the hard cap.
SIM3_CHI2_MAX = 900.0      # 30 px — beyond this nothing is a match


def _make_refine_sim3():
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ..ops import lie

    @partial(jax.jit, static_argnames=("fix_scale", "iters"))
    def refine(S12, x1, x2, uv1, uv2, valid, intrinsics,
               fix_scale: bool = True, iters: int = 10):
        """S12: (4,4) Sim(3) cam1<-cam2. x1/x2: (C,3) matched points in
        each camera frame; uv1/uv2: (C,2) observed pixels; valid: (C,).
        Returns (S12_refined, inlier_mask (C,), n_inliers)."""
        fx, fy, cx, cy = [intrinsics[i] for i in range(4)]

        def proj(p):
            z = jnp.maximum(p[..., 2], 1e-6)
            return jnp.stack(
                [fx * p[..., 0] / z + cx, fy * p[..., 1] / z + cy], -1
            )

        def residuals(delta, S):
            Sd = lie.exp_sim3(delta) @ S
            r1 = proj(lie.transform_points(Sd, x2)) - uv1
            r2 = proj(lie.transform_points(lie.inverse_sim3(Sd), x1)) - uv2
            return r1, r2

        def chi2_of(r1, r2):
            return jnp.sum(r1 * r1, -1), jnp.sum(r2 * r2, -1)

        zero = jnp.zeros(7)

        def step(_, S):
            r1, r2 = residuals(zero, S)
            c1, c2 = chi2_of(r1, r2)
            # Huber IRLS weight per edge (delta^2 = chi2 threshold)
            w1 = valid * jnp.minimum(1.0, SIM3_CHI2_TH / jnp.maximum(c1, 1e-9))
            w2 = valid * jnp.minimum(1.0, SIM3_CHI2_TH / jnp.maximum(c2, 1e-9))
            J1, J2 = jax.jacfwd(
                lambda d: residuals(d, S)
            )(zero)                                   # (C, 2, 7) each
            H = (
                jnp.einsum("cid,c,cie->de", J1, w1, J1)
                + jnp.einsum("cid,c,cie->de", J2, w2, J2)
            )
            g = (
                jnp.einsum("cid,c,ci->d", J1, w1, r1)
                + jnp.einsum("cid,c,ci->d", J2, w2, r2)
            )
            if fix_scale:
                H = H.at[6, :].set(0.0).at[:, 6].set(0.0).at[6, 6].set(1.0)
                g = g.at[6].set(0.0)
            H = H + 1e-6 * jnp.eye(7)
            dx = -jnp.linalg.solve(H, g)
            return lie.exp_sim3(dx) @ S

        S_ref = jax.lax.fori_loop(0, iters, step, jnp.asarray(S12))
        r1, r2 = residuals(zero, S_ref)
        c1, c2 = chi2_of(r1, r2)

        def masked_median(c):
            s = jnp.sort(jnp.where(valid > 0.5, c, jnp.inf))
            k = jnp.maximum(jnp.sum(valid).astype(jnp.int32) // 2, 0)
            return jnp.minimum(s[k], 1e9)

        # robust sigma^2 from the median of a chi2(2 dof) sample
        # (median = 1.386 sigma^2); gate at the 95% quantile 5.991
        sigma2 = 0.5 * (masked_median(c1) + masked_median(c2)) / 1.386
        th = jnp.clip(5.991 * sigma2, SIM3_CHI2_TH, SIM3_CHI2_MAX)
        inlier = (valid > 0.5) & (c1 < th) & (c2 < th)
        return S_ref, inlier, jnp.sum(inlier), th

    return refine


_refine_sim3 = None


def refine_sim3_reproj(S12, x1, x2, uv1, uv2, fix_scale=True, iters=10,
                       intrinsics=(718.856, 718.856, 607.1928, 185.2157)):
    """Host wrapper: pads the match set to SIM3_REFINE_CAP, runs the
    jitted mutual-reprojection GN, returns (S12 (4,4) np, inliers (N,)
    bool, n_inliers int, chi2_th float — the adaptive gate actually
    applied, which callers reuse to size consistency-tolerant search
    radii)."""
    global _refine_sim3
    import jax.numpy as jnp

    if _refine_sim3 is None:
        _refine_sim3 = _make_refine_sim3()
    n = len(x1)
    C = SIM3_REFINE_CAP
    if n > C:
        x1, x2, uv1, uv2 = x1[:C], x2[:C], uv1[:C], uv2[:C]
        n = C
    pad = lambda a, w: np.pad(
        np.asarray(a, np.float32), ((0, C - n),) + ((0, 0),) * (a.ndim - 1)
    )
    valid = np.zeros(C, np.float32)
    valid[:n] = 1.0
    S_ref, inlier, n_in, th = _refine_sim3(
        jnp.asarray(np.asarray(S12, np.float32)),
        jnp.asarray(pad(x1, 3)), jnp.asarray(pad(x2, 3)),
        jnp.asarray(pad(uv1, 2)), jnp.asarray(pad(uv2, 2)),
        jnp.asarray(valid), jnp.asarray(np.asarray(intrinsics, np.float32)),
        fix_scale=bool(fix_scale), iters=int(iters),
    )
    return (
        np.asarray(S_ref, np.float32),
        np.asarray(inlier)[: len(x1)],
        int(n_in),
        float(th),
    )
