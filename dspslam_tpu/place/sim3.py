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
