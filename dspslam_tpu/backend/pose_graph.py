"""Sim(3) pose-graph optimization (essential graph).

Replaces Optimizer::OptimizeEssentialGraph (/root/reference/src/
Optimizer.cc:780-1044, g2o VertexSim3Expmap + EdgeSim3): after a loop
closure, keyframe poses are re-optimized as Sim(3) elements S_cw over
the essential graph (spanning tree + strong-covisibility + loop edges)
with relative-pose residuals

    e_ij = log_sim3( S_ij_meas . S_jw . S_iw^-1 )

zero when the current relative pose matches the measured one. Loop-edge
measurements come from the Sim3 solver; graph-edge measurements from the
pre-correction poses. Solved as dense Gauss-Newton over all (K, 7)
tangents — a few hundred keyframes is a ~2000-dim dense system, trivial
for the MXU. Loop/corrected keyframes can be held fixed via a mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import lie


def _es(*args, **kw):
    # full-f32 einsum: GN normal equations are precision-critical on TPU
    return jnp.einsum(*args, precision=jax.lax.Precision.HIGHEST, **kw)


def _edge_residual(S_iw, S_jw, S_ij_meas):
    """(7,) residual of one relative-pose edge."""
    return lie.log_sim3(S_ij_meas @ S_jw @ lie.inverse_sim3(S_iw))


@partial(jax.jit, static_argnums=(6, 8))
def optimize_pose_graph(
    poses: jnp.ndarray,       # (K, 4, 4) Sim(3) S_cw per keyframe
    fixed: jnp.ndarray,       # (K,) 1.0 = held fixed
    edge_i: jnp.ndarray,      # (E,) int32
    edge_j: jnp.ndarray,      # (E,) int32
    edge_meas: jnp.ndarray,   # (E, 4, 4) measured S_ij = S_iw . S_jw^-1
    edge_valid: jnp.ndarray,  # (E,)
    iterations: int = 20,
    damping: float = 1e-4,
    fix_scale: bool = False,  # stereo: clamp the log-scale tangent dim
):
    """Dense GN over Sim(3) tangents; returns optimized (K, 4, 4)."""
    K = poses.shape[0]

    def res_and_jac(S_all):
        S_i = S_all[edge_i]
        S_j = S_all[edge_j]

        def one(Si, Sj, Z):
            def f(xi, xj):
                return _edge_residual(
                    lie.exp_sim3(xi) @ Si, lie.exp_sim3(xj) @ Sj, Z
                )

            zero = jnp.zeros(7)
            r = f(zero, zero)
            Ji = jax.jacfwd(f, argnums=0)(zero, zero)
            Jj = jax.jacfwd(f, argnums=1)(zero, zero)
            return r, Ji, Jj

        return jax.vmap(one)(S_i, S_j, edge_meas)

    def gn_step(_, S_all):
        r, Ji, Jj = res_and_jac(S_all)                      # (E,7),(E,7,7)x2
        w = edge_valid
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        H = jnp.zeros((K, K, 7, 7))
        H = H.at[edge_i, edge_i].add(_es("eab,eac->ebc", JiW, Ji))
        H = H.at[edge_j, edge_j].add(_es("eab,eac->ebc", JjW, Jj))
        H = H.at[edge_i, edge_j].add(_es("eab,eac->ebc", JiW, Jj))
        H = H.at[edge_j, edge_i].add(_es("eab,eac->ebc", JjW, Ji))
        b = jnp.zeros((K, 7))
        b = b.at[edge_i].add(-_es("eab,ea->eb", JiW, r))
        b = b.at[edge_j].add(-_es("eab,ea->eb", JjW, r))

        Hd = H.transpose(0, 2, 1, 3).reshape(7 * K, 7 * K)
        free = jnp.repeat(1.0 - fixed, 7)
        if fix_scale:
            # tangent order [t(3), r(3), log-s]: clamp every 7th dim
            # (reference bFixScale, Optimizer.cc:810 VertexSim3 _fix_scale)
            dim_mask = jnp.tile(
                jnp.array([1, 1, 1, 1, 1, 1, 0], jnp.float32), K
            )
            free = free * dim_mask
        Hd = Hd * (free[:, None] * free[None, :]) + jnp.diag(1.0 - free)
        Hd = Hd + damping * jnp.eye(7 * K)
        rhs = b.reshape(-1) * free
        dx = jnp.linalg.solve(Hd, rhs).reshape(K, 7)
        return jax.vmap(lambda d, S: lie.exp_sim3(d) @ S)(dx, S_all)

    return jax.lax.fori_loop(0, iterations, gn_step, poses)
