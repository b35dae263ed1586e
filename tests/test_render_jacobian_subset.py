"""Render-Jacobian static-subset parity (verdict r04 weak #7).

The render loss computes expensive SDF input-Jacobians only for a
static-K subset of the (rays x samples) grid selected by top_k on the
"has gradient" criterion (shape/losses.py max_grad_points), where the
reference backprops through every contributing sample (loss.py:117-130).
These tests pin, at the REFERENCE caps (512 rays x 50 depth samples,
config_kitti.json:23 + kitti_sequence.py ray budget), that:

1. the in-band gradient set is geometrically thin (|sdf| < cutoff spans
   ~1 sample per surface-crossing ray), so K=1024 covers it with ~4x
   headroom and the selection is *lossless* — identical rows, identical
   normal equations up to f32 summation order;
2. the GN optimum under the K=1024 subset matches the full-Jacobian
   (K = R*S = 25600) optimum;
3. the documented breaking threshold: K below the in-band count (~250
   here) truncates real gradient rows and the trajectory departs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dspslam_tpu.models import deepsdf
from dspslam_tpu.ops import lie
from dspslam_tpu.shape import gn, losses

from test_shape import (
    CODE_LEN,
    make_rays,
    make_surface_points,
    sphere_params,
    true_pose,
)

R_REF, S_REF = 512, 50          # reference caps
K_FULL = R_REF * S_REF


def _problem():
    pts, pts_mask = make_surface_points(n=256)
    rays, ray_mask, depth, fg_mask = make_rays(n_fg=312, n_bg=200)
    assert rays.shape[0] == R_REF
    return pts, pts_mask, rays, ray_mask, depth, fg_mask


def _cfg(K, iters):
    return gn.GNConfig(
        code_len=CODE_LEN, k1=1.0, k2=100.0, k3=0.25, k4=0.0,
        num_iterations=iters, max_grad_points=K, scale_damping=1.0,
        num_depth_samples=S_REF,
    )


def _run(K, iters, t_init, prob):
    pts, pts_mask, rays, ray_mask, depth, fg_mask = prob
    out = gn.reconstruct_object(
        deepsdf.sphere_decoder_fn, _cfg(K, iters), sphere_params(),
        t_init, pts, pts_mask, rays, ray_mask, depth, fg_mask,
    )
    return (
        np.asarray(out["t_cam_obj"]),
        np.asarray(out["code"]),
        float(out["loss"]),
    )


BENIGN_DX = jnp.array([0.15, -0.1, 0.15, 0.05, -0.05, 0.03, 0.1])


def test_inband_gradient_set_fits_under_k1024():
    """At reference caps the |sdf|<cutoff band holds ~250 samples —
    the production K=1024 subset captures ALL of them (lossless)."""
    pts, pts_mask, rays, ray_mask, depth, fg_mask = _problem()
    for dx in (jnp.zeros(7), BENIGN_DX,
               jnp.zeros(7).at[6].set(0.3)):        # +35% scale error
        t = lie.exp_sim3(dx) @ true_pose()
        _, _, _, aux = losses.render_loss(
            deepsdf.sphere_decoder_fn, sphere_params(), rays, ray_mask,
            depth, fg_mask, lie.inverse_sim3(t), jnp.zeros(CODE_LEN),
            num_samples=S_REF, max_grad_points=K_FULL,
        )
        n_grad = int(aux["n_grad"])
        assert 0 < n_grad < 1024, n_grad


def test_subset_matches_full_jacobian_optimum():
    """GN under the K=1024 subset lands at the full-Jacobian optimum,
    both mid-optimization (reference's 10 iters) and converged (40)."""
    prob = _problem()
    t_init = lie.exp_sim3(BENIGN_DX) @ true_pose()
    for iters, atol_T, atol_c in ((10, 0.02, 0.02), (40, 0.01, 0.01)):
        T_sub, c_sub, loss_sub = _run(1024, iters, t_init, prob)
        T_full, c_full, loss_full = _run(K_FULL, iters, t_init, prob)
        # lossless selection -> differences are f32 summation order only
        np.testing.assert_allclose(T_sub, T_full, atol=atol_T)
        np.testing.assert_allclose(c_sub, c_full, atol=atol_c)
        assert abs(loss_sub - loss_full) <= 0.02 * max(loss_full, 1e-3)


def test_breaking_threshold_below_inband_count():
    """K below the ~250-sample in-band set truncates real gradient rows:
    the 10-iteration trajectory departs from the full Jacobian's. This
    pins the documented threshold — max_grad_points must exceed the
    in-band count (1024 gives ~4x headroom at reference caps)."""
    prob = _problem()
    t_init = lie.exp_sim3(BENIGN_DX) @ true_pose()
    T_full, _, _ = _run(K_FULL, 10, t_init, prob)
    T_64, _, _ = _run(64, 10, t_init, prob)
    assert np.abs(T_64 - T_full).max() > 0.05
