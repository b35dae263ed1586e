"""Bundle adjustment: Schur-complement Gauss-Newton on SE(3), with
camera-object relative-pose edges — the g2o replacement.

Re-design of the reference's Optimizer::{Local,Global}JointBundleAdjustment
(/root/reference/src/Optimizer_util.cc:36-771 over g2o sparse LM):

* Landmarks are marginalized exactly as in g2o's block solver, but with
  dense *padded* tensors: per-point 3x3 Hessians invert in a batch, the
  camera-camera coupling W assembles by scatter-add into a (K, P, 6, 3)
  block tensor, and the reduced camera system S = Hcc - W Hpp^-1 W^T is
  one einsum — local windows are small (K <= ~20 keyframes), so S is a
  tiny dense solve that XLA fuses end-to-end.
* Object landmarks join the reduced system directly (they have no point
  coupling): each detection contributes a 6-dof relative-pose edge
  e = log(T_co_meas^-1 . T_cw . T_wo) between its keyframe and object
  (EdgeSE3LieAlgebra, ObjectPoseGraph.h:57-89), with information
  1e3*I and Huber delta sqrt(0.1*1e3) (Optimizer_util.cc:80-84).
  Jacobians come from autodiff at the tangent level (exact, vs the
  reference's first-order BCH approximation).
* The reference's two-stage schedule (5 iters -> drop chi2 outliers ->
  10 iters, Optimizer_util.cc:588-663) is a fixed-shape outlier-mask
  update between rounds.

All observation slots are padded; masks make padded slots contribute
zero. Keyframe slot 0 convention: callers put fixed anchors wherever
`kf_fixed` is 1 (at minimum the window's oldest keyframe).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie

def _es(*args, **kw):
    """einsum pinned to full f32: the normal-equation assembly and Schur
    complement are precision-critical — TPU default matmul precision
    (bf16 passes) corrupts ill-conditioned windows (observed as 0.5-1 m
    pose jumps after the first local BA on v5e)."""
    return jnp.einsum(*args, precision=jax.lax.Precision.HIGHEST, **kw)


CHI2_MONO = 5.991
CHI2_STEREO = 7.815
# hard cap: edges beyond ~35 px error are unrecoverable junk (points at or
# behind the camera plane have |J| ~ fx/z unbounded, so even Huber-weighted
# they drag the normal equations arbitrarily far — g2o avoids this via LM
# step rejection; with fixed damping we excise instead, mirroring the
# reference's edge removal `chi2() > th || !isDepthPositive()`
# (Optimizer_util.cc:641-663))
CHI2_HARD_CAP = 1e4
MIN_DEPTH = 0.05
OBJ_INFO = 1e3                      # invSigmaObject (Optimizer_util.cc:80)
OBJ_HUBER_DELTA2 = 0.1 * OBJ_INFO   # thHuberObject^2
OBJ_CHI2_OUTLIER = 1e3              # edge removal threshold


def _point_residuals(T_cw_all, pts, obs_kf, obs_pt, obs_uvr, obs_stereo,
                     intrinsics):
    """Residual (O, 3), J_pose (O, 3, 6), J_point (O, 3, 3) for all
    observation slots."""
    fx, fy, cx, cy, bf = [intrinsics[i] for i in range(5)]
    T = T_cw_all[obs_kf]                                    # (O, 4, 4)
    X = pts[obs_pt]                                         # (O, 3)
    pc = _es("oij,oj->oi", T[:, :3, :3], X) + T[:, :3, 3]
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    zs = jnp.maximum(z, 1e-6)
    inv_z = 1.0 / zs
    inv_z2 = inv_z * inv_z
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    ur = u - bf * inv_z
    res = jnp.stack([u, v, ur], axis=-1) - obs_uvr
    res = res.at[:, 2].multiply(obs_stereo)

    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zero, zero, bf * inv_z2], axis=-1)
    dpix_dpc = jnp.stack([du, dv, dur], axis=-2)            # (O, 3, 3)
    dpix_dpc = dpix_dpc.at[:, 2, :].multiply(obs_stereo[:, None])

    J_pose = dpix_dpc @ lie.points_to_pose_jacobian_se3(pc)  # (O, 3, 6)
    J_pt = dpix_dpc @ T[:, :3, :3]                           # (O, 3, 3)
    return res, J_pose, J_pt, z


def _object_residual_single(T_cw, T_wo, T_co_meas):
    """e = log_se3(T_co_meas^-1 @ T_cw @ T_wo) -> (6,)."""
    return lie.log_se3(lie.inverse_se3(T_co_meas) @ T_cw @ T_wo)


def _object_residuals_and_jac(T_cw_all, T_wo_all, obj_kf, obj_id, obj_Tco):
    """Residual (Q, 6) and tangent Jacobians (Q, 6, 6) x2 via autodiff."""
    T_c = T_cw_all[obj_kf]
    T_o = T_wo_all[obj_id]

    def res_fn(xi_c, xi_o, Tc, To, Z):
        return _object_residual_single(
            lie.exp_se3(xi_c) @ Tc, lie.exp_se3(xi_o) @ To, Z
        )

    zero = jnp.zeros(6)

    def one(Tc, To, Z):
        r = res_fn(zero, zero, Tc, To, Z)
        Jc = jax.jacfwd(res_fn, argnums=0)(zero, zero, Tc, To, Z)
        Jo = jax.jacfwd(res_fn, argnums=1)(zero, zero, Tc, To, Z)
        return r, Jc, Jo

    return jax.vmap(one)(T_c, T_o, obj_Tco)


@partial(jax.jit, static_argnums=(13,))
def bundle_adjust(
    kf_poses: jnp.ndarray,    # (K, 4, 4) T_cw
    kf_fixed: jnp.ndarray,    # (K,) 1.0 = pose held fixed
    points: jnp.ndarray,      # (P, 3)
    pt_valid: jnp.ndarray,    # (P,)
    obs_kf: jnp.ndarray,      # (O,) int32 keyframe slot per observation
    obs_pt: jnp.ndarray,      # (O,) int32 point slot
    obs_uvr: jnp.ndarray,     # (O, 3) [u, v, u_right]
    obs_stereo: jnp.ndarray,  # (O,) 1.0 where u_right observed
    obs_inv_sigma2: jnp.ndarray,  # (O,)
    obs_valid: jnp.ndarray,   # (O,)
    intrinsics: jnp.ndarray,  # (5,) [fx, fy, cx, cy, bf]
    damping: jnp.ndarray | float = 1e-3,
    obj_state: dict | None = None,
    schedule: tuple = (5, 10),
):
    """Windowed (joint) bundle adjustment; returns updated state + masks.

    obj_state (optional) enables the joint camera-object problem:
      {poses (M, 4, 4) T_wo, fixed (M,), edge_kf (Q,), edge_obj (Q,),
       edge_Tco (Q, 4, 4), edge_valid (Q,)}.
    Returns dict(kf_poses, points, obs_inlier, obj_poses, obj_edge_inlier).
    """
    K = kf_poses.shape[0]
    P = points.shape[0]
    has_obj = obj_state is not None
    if has_obj:
        M = obj_state["poses"].shape[0]
        obj_poses0 = obj_state["poses"]
        obj_fixed = obj_state["fixed"]
        edge_kf = obj_state["edge_kf"]
        edge_obj = obj_state["edge_obj"]
        edge_Tco = obj_state["edge_Tco"]
        edge_valid0 = obj_state["edge_valid"]
    else:
        M = 0

    chi2_th = jnp.where(obs_stereo > 0, CHI2_STEREO, CHI2_MONO)

    def robust_cost(kf_T, pts, obj_T, inlier, edge_inlier):
        """Total Huber cost — the LM acceptance criterion. Depth is
        clamped (not excised) so steps that push points behind the
        camera raise the cost instead of hiding it."""
        res, _, _, _ = _point_residuals(
            kf_T, pts, obs_kf, obs_pt, obs_uvr, obs_stereo, intrinsics
        )
        chi2 = jnp.sum(res * res, axis=-1) * obs_inv_sigma2
        hcost = jnp.where(
            chi2 <= chi2_th,
            chi2,
            2.0 * jnp.sqrt(jnp.maximum(chi2, 0.0) * chi2_th) - chi2_th,
        )
        c = jnp.sum(hcost * inlier * obs_valid)
        if has_obj:
            r_o = jax.vmap(_object_residual_single)(
                kf_T[edge_kf], obj_T[edge_obj], edge_Tco
            )
            chi2_o = jnp.sum(r_o * r_o, axis=-1) * OBJ_INFO
            hcost_o = jnp.where(
                chi2_o <= OBJ_HUBER_DELTA2,
                chi2_o,
                2.0 * jnp.sqrt(jnp.maximum(chi2_o, 0.0) * OBJ_HUBER_DELTA2)
                - OBJ_HUBER_DELTA2,
            )
            c = c + jnp.sum(hcost_o * edge_inlier)
        return c

    def gn_step(carry):
        kf_T, pts, inlier, obj_T, edge_inlier, lam, cost_prev = carry
        damping = lam
        res, J_c, J_p, z = _point_residuals(
            kf_T, pts, obs_kf, obs_pt, obs_uvr, obs_stereo, intrinsics
        )
        w = inlier * obs_valid * obs_inv_sigma2
        chi2 = jnp.sum(res * res, axis=-1) * obs_inv_sigma2
        hub = jnp.where(
            chi2 <= chi2_th, 1.0, jnp.sqrt(chi2_th / jnp.maximum(chi2, 1e-12))
        )
        # excise unrecoverable edges for this linearization (not a
        # permanent flag — they are re-tested every iteration)
        live = ((chi2 <= CHI2_HARD_CAP) & (z > MIN_DEPTH)).astype(jnp.float32)
        w = w * hub * live                                     # (O,)

        JcW = J_c * w[:, None, None]
        JpW = J_p * w[:, None, None]
        # block assembly by scatter-add
        Hcc = jnp.zeros((K, 6, 6)).at[obs_kf].add(
            _es("oij,oik->ojk", JcW, J_c)
        )
        bc = jnp.zeros((K, 6)).at[obs_kf].add(
            -_es("oij,oi->oj", JcW, res)
        )
        Hpp = jnp.zeros((P, 3, 3)).at[obs_pt].add(
            _es("oij,oik->ojk", JpW, J_p)
        )
        bp = jnp.zeros((P, 3)).at[obs_pt].add(
            -_es("oij,oi->oj", JpW, res)
        )
        W = jnp.zeros((K, P, 6, 3)).at[obs_kf, obs_pt].add(
            _es("oij,oik->ojk", JcW, J_p)
        )

        # Marquardt scaling: lam * diag(H) is scale-invariant, so one
        # lambda works across the mixed px^2/m^2 magnitudes of the
        # Hessian blocks; the absolute floor keeps unobserved (padded)
        # blocks invertible
        d_pp = jnp.diagonal(Hpp, axis1=1, axis2=2)             # (P, 3)
        Hpp = Hpp + jax.vmap(jnp.diag)(damping * d_pp) + 1e-6 * jnp.eye(3)
        Hpp_inv = jnp.linalg.inv(Hpp) * pt_valid[:, None, None]

        # reduced camera system
        d_cc = jnp.diagonal(Hcc, axis1=1, axis2=2)             # (K, 6)
        S = jnp.zeros((K, K, 6, 6))
        S = S.at[jnp.arange(K), jnp.arange(K)].set(
            Hcc + jax.vmap(jnp.diag)(damping * d_cc) + 1e-6 * jnp.eye(6)
        )
        S = S - _es("kpab,pbc,lpdc->klad", W, Hpp_inv, W)
        rhs = bc - _es("kpab,pbc,pc->ka", W, Hpp_inv, bp)

        D = 6 * (K + M) if has_obj else 6 * K
        H_full = jnp.zeros((D, D))
        H_full = H_full.at[: 6 * K, : 6 * K].set(
            S.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        )
        rhs_full = jnp.zeros((D,)).at[: 6 * K].set(rhs.reshape(-1))

        new_edge_inlier = edge_inlier
        if has_obj:
            r_o, Jc_o, Jo_o = _object_residuals_and_jac(
                kf_T, obj_T, edge_kf, edge_obj, edge_Tco
            )
            chi2_o = jnp.sum(r_o * r_o, axis=-1) * OBJ_INFO
            hub_o = jnp.where(
                chi2_o <= OBJ_HUBER_DELTA2,
                1.0,
                jnp.sqrt(OBJ_HUBER_DELTA2 / jnp.maximum(chi2_o, 1e-12)),
            )
            w_o = edge_inlier * hub_o * OBJ_INFO               # (Q,)
            JcW_o = Jc_o * w_o[:, None, None]
            JoW_o = Jo_o * w_o[:, None, None]
            # scatter into the full system
            H_full = H_full.at[: 6 * K, : 6 * K].add(
                jnp.zeros((K, K, 6, 6))
                .at[edge_kf, edge_kf]
                .add(_es("qij,qik->qjk", JcW_o, Jc_o))
                .transpose(0, 2, 1, 3)
                .reshape(6 * K, 6 * K)
            )
            H_oo = jnp.zeros((M, M, 6, 6)).at[edge_obj, edge_obj].add(
                _es("qij,qik->qjk", JoW_o, Jo_o)
            )
            d_oo = jnp.diagonal(
                H_oo[jnp.arange(M), jnp.arange(M)], axis1=1, axis2=2
            )
            H_oo = H_oo.at[jnp.arange(M), jnp.arange(M)].add(
                jax.vmap(jnp.diag)(damping * d_oo) + 1e-6 * jnp.eye(6)
            )
            H_full = H_full.at[6 * K :, 6 * K :].set(
                H_oo.transpose(0, 2, 1, 3).reshape(6 * M, 6 * M)
            )
            H_co = jnp.zeros((K, M, 6, 6)).at[edge_kf, edge_obj].add(
                _es("qij,qik->qjk", JcW_o, Jo_o)
            )
            H_full = H_full.at[: 6 * K, 6 * K :].add(
                H_co.transpose(0, 2, 1, 3).reshape(6 * K, 6 * M)
            )
            H_full = H_full.at[6 * K :, : 6 * K].add(
                H_co.transpose(1, 3, 0, 2).reshape(6 * M, 6 * K)
            )
            rhs_full = rhs_full.at[: 6 * K].add(
                jnp.zeros((K, 6))
                .at[edge_kf]
                .add(-_es("qij,qi->qj", JcW_o, r_o))
                .reshape(-1)
            )
            rhs_full = rhs_full.at[6 * K :].add(
                jnp.zeros((M, 6))
                .at[edge_obj]
                .add(-_es("qij,qi->qj", JoW_o, r_o))
                .reshape(-1)
            )

        # clamp fixed variables: identity rows/cols, zero rhs
        free = 1.0 - kf_fixed
        free_diag = jnp.repeat(free, 6)
        if has_obj:
            free_diag = jnp.concatenate(
                [free_diag, jnp.repeat(1.0 - obj_fixed, 6)]
            )
        mask2d = free_diag[:, None] * free_diag[None, :]
        H_full = H_full * mask2d + jnp.diag(1.0 - free_diag)
        rhs_full = rhs_full * free_diag

        dx = jnp.linalg.solve(H_full, rhs_full)
        # trust region: bounded, finite increments (g2o's LM damping keeps
        # steps small; with fixed damping we clamp instead)
        dx = jnp.clip(jnp.where(jnp.isfinite(dx), dx, 0.0), -0.5, 0.5)
        dx_c = dx[: 6 * K].reshape(K, 6)
        kf_T_new = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dx_c, kf_T)

        if has_obj:
            dx_o = dx[6 * K :].reshape(M, 6)
            obj_T_new = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dx_o, obj_T)
        else:
            obj_T_new = obj_T

        # back-substitute landmark updates
        dx_p = _es(
            "pab,pb->pa",
            Hpp_inv,
            bp - _es("kpab,ka->pb", W, dx_c),
        )
        dx_p = jnp.clip(jnp.where(jnp.isfinite(dx_p), dx_p, 0.0), -0.5, 0.5)
        pts_new = pts + dx_p * pt_valid[:, None]

        # Levenberg-Marquardt acceptance: keep the step only if the total
        # robust cost decreased (g2o rejects cost-increasing steps and
        # raises lambda; fixed-damping GN oscillates then diverges on
        # ill-conditioned windows — observed as 0.5-1 m point scatter on
        # short-baseline far-point windows)
        cost_new = robust_cost(
            kf_T_new, pts_new, obj_T_new, inlier, new_edge_inlier
        )
        accept = jnp.isfinite(cost_new) & (cost_new < cost_prev)
        sel = lambda a, b: jnp.where(accept, a, b)
        kf_T_new = sel(kf_T_new, kf_T)
        pts_new = sel(pts_new, pts)
        obj_T_new = sel(obj_T_new, obj_T)
        lam_new = jnp.clip(
            jnp.where(accept, lam / 3.0, lam * 3.0), 1e-7, 1e8
        )
        cost_keep = jnp.where(accept, cost_new, cost_prev)
        return (kf_T_new, pts_new, inlier, obj_T_new, new_edge_inlier,
                lam_new, cost_keep)

    def reclassify(carry):
        kf_T, pts, inlier, obj_T, edge_inlier, lam, _ = carry
        res, _, _, z = _point_residuals(
            kf_T, pts, obs_kf, obs_pt, obs_uvr, obs_stereo, intrinsics
        )
        chi2 = jnp.sum(res * res, axis=-1) * obs_inv_sigma2
        # chi2 > th OR !isDepthPositive (Optimizer_util.cc:641-663)
        inlier = (
            (chi2 <= chi2_th) & (z > MIN_DEPTH)
        ).astype(jnp.float32) * obs_valid
        if has_obj:
            r_o = jax.vmap(_object_residual_single)(
                kf_T[edge_kf], obj_T[edge_obj], edge_Tco
            )
            chi2_o = jnp.sum(r_o * r_o, axis=-1) * OBJ_INFO
            edge_inlier = (chi2_o <= OBJ_CHI2_OUTLIER).astype(
                jnp.float32
            ) * edge_valid0
        # the acceptance baseline must be re-evaluated under the new
        # inlier set, or the next round compares against a stale cost
        cost = robust_cost(kf_T, pts, obj_T, inlier, edge_inlier)
        return kf_T, pts, inlier, obj_T, edge_inlier, lam, cost

    obj_T0 = obj_poses0 if has_obj else jnp.zeros((0, 4, 4))
    edge_i0 = edge_valid0 if has_obj else jnp.zeros((0,))
    carry = (
        kf_poses,
        points,
        obs_valid,
        obj_T0,
        edge_i0,
        jnp.float32(damping),
        robust_cost(kf_poses, points, obj_T0, obs_valid, edge_i0),
    )
    for round_idx, n_iters in enumerate(schedule):
        carry = jax.lax.fori_loop(0, n_iters, lambda _, c: gn_step(c), carry)
        if round_idx < len(schedule) - 1:
            carry = reclassify(carry)

    kf_T, pts, inlier, obj_T, edge_inlier = carry[:5]
    return {
        "kf_poses": kf_T,
        "points": pts,
        "obs_inlier": inlier,
        "obj_poses": obj_T,
        "obj_edge_inlier": edge_inlier,
    }
