"""Shape stack tests: residual blocks on an analytic sphere SDF, GN
convergence (pose + code), pose-only ICP, mesh extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.models import deepsdf
from dspslam_tpu.ops import lie
from dspslam_tpu.shape import gn, losses, mesh

CODE_LEN = 8
R_TRUE = 0.56       # = r0 + w0 * c0 with r0=0.5, w0=0.3, c0=0.2
C0_TRUE = 0.2
SCALE = 2.0
CENTER = np.array([0.0, 0.0, 4.0], np.float32)


def sphere_params():
    return deepsdf.make_sphere_params(code_len=CODE_LEN, r0=0.5)


def true_pose():
    """Sim(3) t_cam_obj: scale 2, centered at (0, 0, 4)."""
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] *= SCALE
    T[:3, 3] = CENTER
    return jnp.asarray(T)


def make_surface_points(n=128, seed=0):
    """Points on the true sphere surface, camera frame."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    pts = CENTER + SCALE * R_TRUE * d
    return jnp.asarray(pts, jnp.float32), jnp.ones((n,), jnp.float32)


def make_rays(n_fg=64, n_bg=32, seed=1):
    """Foreground rays hit the sphere (with first-intersection depth);
    background rays pass near but miss."""
    rng = np.random.default_rng(seed)
    rad = SCALE * R_TRUE
    fg_dirs, fg_depth = [], []
    while len(fg_dirs) < n_fg:
        # aim at a point inside 80% of the sphere radius
        target = CENTER + rng.uniform(-0.8, 0.8, 3) * rad
        d = target / np.linalg.norm(target)
        # ray-sphere intersection |t d - c| = rad
        b = -2 * d @ CENTER
        c = CENTER @ CENTER - rad**2
        disc = b * b - 4 * c
        if disc <= 0:
            continue
        t0 = (-b - np.sqrt(disc)) / 2
        fg_dirs.append(d)
        fg_depth.append(t0)
    bg_dirs = []
    while len(bg_dirs) < n_bg:
        target = CENTER + np.concatenate(
            [rng.uniform(1.3, 2.0, 2) * rad * rng.choice([-1, 1], 2), [0.0]]
        )
        d = target / np.linalg.norm(target)
        if np.linalg.norm(np.cross(d, CENTER)) > rad:  # miss check
            bg_dirs.append(d)
    rays = np.stack(fg_dirs + bg_dirs).astype(np.float32)
    n = n_fg + n_bg
    ray_mask = np.ones(n, np.float32)
    fg_mask = np.concatenate([np.ones(n_fg), np.zeros(n_bg)]).astype(np.float32)
    depth = np.concatenate([np.asarray(fg_depth), np.zeros(n_bg)]).astype(np.float32)
    return (jnp.asarray(rays), jnp.asarray(ray_mask), jnp.asarray(depth),
            jnp.asarray(fg_mask))


def true_code():
    return jnp.zeros((CODE_LEN,)).at[0].set(C0_TRUE)


class TestSurfaceLoss:
    def test_zero_residual_at_truth(self):
        pts, mask = make_surface_points()
        t_obj_cam = lie.inverse_sim3(true_pose())
        J, res, m = losses.sdf_surface_loss(
            deepsdf.sphere_decoder_fn, sphere_params(), pts, mask, t_obj_cam,
            true_code()
        )
        np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-5)
        assert J.shape == (128, 7 + CODE_LEN)

    def test_translation_shifts_residual(self):
        pts, mask = make_surface_points()
        t_obj_cam = lie.inverse_sim3(true_pose())
        # camera points moved 0.1 outward along +z -> in obj frame z grows
        J, res, m = losses.sdf_surface_loss(
            deepsdf.sphere_decoder_fn, sphere_params(), pts + jnp.array([0, 0, 0.2]),
            mask, t_obj_cam, true_code()
        )
        assert float(jnp.mean(jnp.abs(res))) > 0.01

    def test_code_jacobian_is_minus_w(self):
        pts, mask = make_surface_points()
        t_obj_cam = lie.inverse_sim3(true_pose())
        J, _, _ = losses.sdf_surface_loss(
            deepsdf.sphere_decoder_fn, sphere_params(), pts, mask, t_obj_cam,
            true_code()
        )
        np.testing.assert_allclose(np.asarray(J)[:, 7], -0.3, atol=1e-5)


class TestRenderLoss:
    def test_rendered_depth_near_truth_at_optimum(self):
        rays, ray_mask, depth, fg_mask = make_rays()
        t_obj_cam = lie.inverse_sim3(true_pose())
        J, res, m, aux = losses.render_loss(
            deepsdf.sphere_decoder_fn, sphere_params(), rays, ray_mask, depth,
            fg_mask, t_obj_cam, true_code(), num_samples=50,
            max_grad_points=256,
        )
        assert int(aux["n_valid_query"]) > 100
        # foreground rendered depths within a sample spacing of observed
        d_u = np.asarray(aux["d_u"])[:64]
        obs = np.asarray(depth)[:64]
        spacing = 2 * SCALE / 49
        assert np.median(np.abs(d_u - obs)) < 2 * spacing
        # residuals at the optimum are small for most selected points
        live = np.asarray(m) > 0
        assert live.sum() > 10
        assert np.median(np.abs(np.asarray(res)[live])) < 0.25

    def test_fixed_output_shapes(self):
        rays, ray_mask, depth, fg_mask = make_rays()
        t_obj_cam = lie.inverse_sim3(true_pose())
        J, res, m, aux = losses.render_loss(
            deepsdf.sphere_decoder_fn, sphere_params(), rays, ray_mask, depth,
            fg_mask, t_obj_cam, true_code(), max_grad_points=128,
        )
        assert J.shape == (128, 7 + CODE_LEN)
        assert res.shape == (128,)


class TestRotationPrior:
    def test_zero_at_upright(self):
        t_obj_cam = lie.inverse_sim3(true_pose())  # R = I: +y maps to +y
        # E = 1 - <R e_y, -e_y> = 2 at identity (y up) — the KITTI camera
        # has y pointing *down*, so upright objects have R_co e_y ~ -e_y.
        J, res = losses.rotation_prior_loss(t_obj_cam)
        assert float(res) == pytest.approx(2.0, abs=1e-5)

        # flipped object: R_co rotates y -> -y (180deg about x)
        flip = np.eye(4, dtype=np.float32)
        flip[1, 1] = flip[2, 2] = -1
        T = np.asarray(true_pose()) @ flip
        J, res = losses.rotation_prior_loss(lie.inverse_sim3(jnp.asarray(T)))
        assert float(res) == pytest.approx(0.0, abs=1e-5)
        assert float(jnp.linalg.norm(J)) == pytest.approx(0.0, abs=1e-6)

    def test_gradient_descends(self):
        # small tilt away from the aligned pose: GN step should reduce E
        flip = np.eye(4, dtype=np.float32)
        flip[1, 1] = flip[2, 2] = -1
        tilt = np.asarray(lie.exp_se3(jnp.array([0, 0, 0, 0.2, 0, 0])))
        T_co = jnp.asarray(np.asarray(true_pose()) @ flip @ tilt)
        t_obj_cam = lie.inverse_sim3(T_co)
        J, res = losses.rotation_prior_loss(t_obj_cam)
        assert float(res) > 1e-4
        # one damped GN step on the prior alone
        H = jnp.outer(J, J) + 1e-3 * jnp.eye(7)
        dx = jnp.linalg.solve(H, -J * res)
        t_new = lie.exp_sim3(dx) @ t_obj_cam
        _, res_new = losses.rotation_prior_loss(t_new)
        assert float(res_new) < float(res)


class TestJointGN:
    def make_problem(self, seed=3):
        pts, pts_mask = make_surface_points(seed=seed)
        rays, ray_mask, depth, fg_mask = make_rays(seed=seed + 1)
        return pts, pts_mask, rays, ray_mask, depth, fg_mask

    def config(self, **kw):
        base = dict(
            code_len=CODE_LEN, k1=1.0, k2=100.0, k3=0.25, k4=0.0,
            num_iterations=10, max_grad_points=256, scale_damping=1.0,
        )
        base.update(kw)
        return gn.GNConfig(**base)

    def test_recovers_pose_and_code(self):
        pts, pts_mask, rays, ray_mask, depth, fg_mask = self.make_problem()
        # perturb: 0.25m translation, 5deg rotation, 10% scale, zero code
        dx = jnp.array([0.15, -0.1, 0.15, 0.05, -0.05, 0.03, 0.1])
        t_init = lie.exp_sim3(dx) @ true_pose()
        out = gn.reconstruct_object(
            deepsdf.sphere_decoder_fn, self.config(), sphere_params(),
            t_init, pts, pts_mask, rays, ray_mask, depth, fg_mask,
        )
        assert bool(out["is_good"])
        T = np.asarray(out["t_cam_obj"])
        s, R, t = lie.split_sim3(jnp.asarray(T))
        # center and scale recovered
        np.testing.assert_allclose(t, CENTER, atol=0.08)
        # scale * radius is the observable product; code is pulled toward 0
        # by the k3 prior, so check the reconstructed *surface* radius
        code = np.asarray(out["code"])
        world_r = float(s) * (0.5 + 0.3 * code[0])
        np.testing.assert_allclose(world_r, SCALE * R_TRUE, rtol=0.05)

    def test_flags_bad_on_empty_rays(self):
        pts, pts_mask, rays, ray_mask, depth, fg_mask = self.make_problem()
        # object far off to the side: every sampled point lands outside the
        # unit ball, so there are no valid render samples
        t_bad = jnp.asarray(np.diag([1.0, 1, 1, 1]).astype(np.float32)).at[:3, 3].set(
            jnp.array([200.0, 0.0, 4.0])
        )
        out = gn.reconstruct_object(
            deepsdf.sphere_decoder_fn, self.config(), sphere_params(),
            t_bad, pts, pts_mask, rays, ray_mask, depth, fg_mask,
        )
        assert not bool(out["is_good"])

    def test_batched_matches_single(self):
        pts, pts_mask, rays, ray_mask, depth, fg_mask = self.make_problem()
        cfg = self.config(num_iterations=3)
        dx = jnp.array([0.1, 0.0, -0.1, 0.02, 0.0, 0.0, 0.05])
        t_init = lie.exp_sim3(dx) @ true_pose()
        single = gn.reconstruct_object(
            deepsdf.sphere_decoder_fn, cfg, sphere_params(),
            t_init, pts, pts_mask, rays, ray_mask, depth, fg_mask,
        )
        B = 3
        batch = gn.batched_reconstruct(deepsdf.sphere_decoder_fn, cfg)(
            sphere_params(),
            jnp.stack([t_init] * B),
            jnp.stack([pts] * B),
            jnp.stack([pts_mask] * B),
            jnp.stack([rays] * B),
            jnp.stack([ray_mask] * B),
            jnp.stack([depth] * B),
            jnp.stack([fg_mask] * B),
            jnp.zeros((B, CODE_LEN)),
        )
        np.testing.assert_allclose(
            np.asarray(batch["t_cam_obj"][1]), np.asarray(single["t_cam_obj"]),
            atol=1e-4,
        )


class TestPoseOnlyGN:
    def test_recovers_translation(self):
        pts, pts_mask = make_surface_points(seed=7)
        cfg = gn.GNConfig(code_len=CODE_LEN)
        T_se3 = np.eye(4, dtype=np.float32)
        T_se3[:3, 3] = CENTER + np.array([0.3, -0.2, 0.25], np.float32)
        out = gn.estimate_pose_cam_obj(
            deepsdf.sphere_decoder_fn, cfg, sphere_params(),
            jnp.asarray(T_se3), jnp.float32(SCALE), pts, pts_mask, true_code(),
        )
        T = np.asarray(out["t_cam_obj"])
        np.testing.assert_allclose(T[:3, 3], CENTER, atol=0.05)
        # rotation block stays orthonormal with unit determinant
        np.testing.assert_allclose(T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-4)


class TestMesh:
    def test_sphere_mesh(self):
        D = 33
        pts = mesh.create_voxel_grid(D)
        sdf = (np.linalg.norm(pts, axis=-1) - 0.5).reshape(D, D, D)
        v, f = mesh.marching_tetrahedra(sdf)
        assert len(v) > 100 and len(f) > 100
        r = np.linalg.norm(v, axis=-1)
        np.testing.assert_allclose(r, 0.5, atol=2.0 / (D - 1))
        assert f.min() >= 0 and f.max() < len(v)
        # outward normals: cross product aligns with radial direction
        n = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
        centroid = v[f].mean(axis=1)
        align = (n * centroid).sum(-1)
        assert (align > 0).mean() > 0.99

    def test_decode_sdf_grid_matches_direct(self):
        params = sphere_params()
        code = true_code()
        D = 17
        grid = mesh.decode_sdf_grid(
            deepsdf.sphere_decoder_fn, params, code, D
        )
        pts = mesh.create_voxel_grid(D)
        direct = deepsdf.sphere_decoder_fn(
            params, jnp.concatenate(
                [jnp.broadcast_to(code, (D**3, CODE_LEN)), jnp.asarray(pts)], axis=-1
            )
        )
        np.testing.assert_allclose(
            np.asarray(grid).reshape(-1), np.asarray(direct), atol=1e-5
        )

    def test_extractor_end_to_end(self):
        ext = mesh.MeshExtractor(
            deepsdf.sphere_decoder_fn, sphere_params(), code_len=CODE_LEN,
            voxels_dim=33,
        )
        out = ext.extract_mesh_from_code(np.asarray(true_code()))
        r = np.linalg.norm(out["vertices"], axis=-1)
        np.testing.assert_allclose(r, R_TRUE, atol=0.07)
