"""Golden tests for SE(3)/Sim(3) ops against closed-form / numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dspslam_tpu.ops import lie


def _np_exp_so3(w):
    theta = np.linalg.norm(w)
    W = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if theta < 1e-12:
        return np.eye(3)
    return (
        np.eye(3)
        + np.sin(theta) / theta * W
        + (1 - np.cos(theta)) / theta**2 * (W @ W)
    )


RNG = np.random.default_rng(0)


def rand_se3_tangent():
    return RNG.normal(size=6) * np.array([1.0, 1.0, 1.0, 0.5, 0.5, 0.5])


def rand_sim3_tangent():
    return RNG.normal(size=7) * np.array([1, 1, 1, 0.5, 0.5, 0.5, 0.3])


class TestExpSO3:
    def test_matches_rodrigues(self):
        for _ in range(10):
            w = RNG.normal(size=3)
            np.testing.assert_allclose(
                lie.exp_so3(jnp.asarray(w, jnp.float32)), _np_exp_so3(w), atol=1e-5
            )

    def test_zero(self):
        np.testing.assert_allclose(lie.exp_so3(jnp.zeros(3)), np.eye(3), atol=1e-7)

    def test_tiny_angle_continuity(self):
        w = jnp.array([1e-6, -2e-6, 1e-6])
        np.testing.assert_allclose(lie.exp_so3(w), _np_exp_so3(np.asarray(w)), atol=1e-7)

    def test_orthonormal(self):
        w = jnp.asarray(RNG.normal(size=(5, 3)), jnp.float32)
        R = lie.exp_so3(w)
        eye = jnp.broadcast_to(jnp.eye(3), R.shape)
        np.testing.assert_allclose(R @ jnp.swapaxes(R, -1, -2), eye, atol=1e-5)

    def test_grad_finite_at_zero(self):
        g = jax.grad(lambda w: jnp.sum(lie.exp_so3(w)))(jnp.zeros(3))
        assert np.all(np.isfinite(g))


class TestSE3:
    def test_exp_log_roundtrip(self):
        for _ in range(10):
            x = jnp.asarray(rand_se3_tangent(), jnp.float32)
            T = lie.exp_se3(x)
            np.testing.assert_allclose(lie.log_se3(T), x, atol=1e-4)

    def test_exp_se3_is_rigid(self):
        T = lie.exp_se3(jnp.asarray(rand_se3_tangent(), jnp.float32))
        np.testing.assert_allclose(np.asarray(T)[3], [0, 0, 0, 1], atol=1e-7)
        R = np.asarray(T)[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_inverse(self):
        T = lie.exp_se3(jnp.asarray(rand_se3_tangent(), jnp.float32))
        np.testing.assert_allclose(lie.inverse_se3(T) @ T, np.eye(4), atol=1e-5)

    def test_pure_translation(self):
        x = jnp.array([1.0, 2.0, 3.0, 0, 0, 0])
        T = lie.exp_se3(x)
        np.testing.assert_allclose(np.asarray(T)[:3, 3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(np.asarray(T)[:3, :3], np.eye(3), atol=1e-6)


class TestSim3:
    def test_reduces_to_se3_at_zero_scale(self):
        x6 = rand_se3_tangent()
        x7 = jnp.asarray(np.concatenate([x6, [0.0]]), jnp.float32)
        np.testing.assert_allclose(
            lie.exp_sim3(x7), lie.exp_se3(jnp.asarray(x6, jnp.float32)), atol=1e-5
        )

    def test_scale_factoring(self):
        x = jnp.asarray(rand_sim3_tangent(), jnp.float32)
        T = lie.exp_sim3(x)
        s, R, t = lie.split_sim3(T)
        np.testing.assert_allclose(s, np.exp(x[6]), rtol=1e-5)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_exp_log_roundtrip(self):
        for _ in range(10):
            x = jnp.asarray(rand_sim3_tangent(), jnp.float32)
            np.testing.assert_allclose(lie.log_sim3(lie.exp_sim3(x)), x, atol=1e-3)

    def test_pure_scale(self):
        x = jnp.array([0.0, 0, 0, 0, 0, 0, 0.5])
        T = lie.exp_sim3(x)
        np.testing.assert_allclose(
            np.asarray(T)[:3, :3], np.exp(0.5) * np.eye(3), rtol=1e-5
        )

    def test_scale_translation_coupling(self):
        # with w=0, translation = (e^s - 1)/s * v
        x = jnp.array([2.0, 0, 0, 0, 0, 0, 0.7])
        T = lie.exp_sim3(x)
        np.testing.assert_allclose(
            np.asarray(T)[0, 3], (np.exp(0.7) - 1) / 0.7 * 2.0, rtol=1e-5
        )

    def test_inverse_sim3(self):
        T = lie.exp_sim3(jnp.asarray(rand_sim3_tangent(), jnp.float32))
        np.testing.assert_allclose(lie.inverse_sim3(T) @ T, np.eye(4), atol=1e-4)

    def test_small_theta_branch_continuity(self):
        # cross the theta branch with non-trivial scale
        x_lo = jnp.array([1.0, -1.0, 0.5, 1e-5, -1e-5, 1e-5, 0.4])
        x_hi = jnp.array([1.0, -1.0, 0.5, 1e-3, -1e-3, 1e-3, 0.4])
        T_lo, T_hi = lie.exp_sim3(x_lo), lie.exp_sim3(x_hi)
        np.testing.assert_allclose(T_lo, T_hi, atol=1e-2)
        # against numerically-integrated reference: exp via scipy expm
        from scipy.linalg import expm

        for x in [x_lo, x_hi, jnp.asarray(rand_sim3_tangent(), jnp.float32)]:
            xi = np.zeros((4, 4))
            v, w, s = np.asarray(x[:3], np.float64), np.asarray(x[3:6], np.float64), float(x[6])
            xi[:3, :3] = np.array(
                [[s, -w[2], w[1]], [w[2], s, -w[0]], [-w[1], w[0], s]]
            )
            xi[:3, 3] = v
            np.testing.assert_allclose(lie.exp_sim3(x), expm(xi), atol=1e-4)


class TestPointJacobians:
    def test_se3_jacobian_matches_finite_difference(self):
        pts = jnp.asarray(RNG.normal(size=(4, 3)), jnp.float32)
        J = lie.points_to_pose_jacobian_se3(pts)  # (4, 3, 6)
        eps = 1e-4
        for k in range(6):
            dx = np.zeros(6, np.float32)
            dx[k] = eps
            T = lie.exp_se3(jnp.asarray(dx))
            moved = lie.transform_points(T, pts)
            fd = (np.asarray(moved) - np.asarray(pts)) / eps
            np.testing.assert_allclose(np.asarray(J)[:, :, k], fd, atol=1e-2)

    def test_sim3_jacobian_matches_finite_difference(self):
        pts = jnp.asarray(RNG.normal(size=(4, 3)), jnp.float32)
        J = lie.points_to_pose_jacobian_sim3(pts)  # (4, 3, 7)
        eps = 1e-4
        for k in range(7):
            dx = np.zeros(7, np.float32)
            dx[k] = eps
            T = lie.exp_sim3(jnp.asarray(dx))
            moved = lie.transform_points(T, pts)
            fd = (np.asarray(moved) - np.asarray(pts)) / eps
            np.testing.assert_allclose(np.asarray(J)[:, :, k], fd, atol=1e-2)


class TestAdjoint:
    def test_adjoint_property(self):
        # exp(Adj_T x) = T exp(x) T^-1
        T = lie.exp_se3(jnp.asarray(rand_se3_tangent(), jnp.float32))
        x = jnp.asarray(rand_se3_tangent() * 0.1, jnp.float32)
        lhs = lie.exp_se3(lie.adjoint_se3(T) @ x)
        rhs = T @ lie.exp_se3(x) @ lie.inverse_se3(T)
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)


class TestRobust:
    def test_weights_match_reference_formula(self):
        from dspslam_tpu.ops.robust import robust_residuals

        r = jnp.array([0.0, 0.01, 0.05, 0.2, -0.3])
        b = 0.05
        robust, loss, w = robust_residuals(r, b)
        # inside quadratic zone weight == 1
        np.testing.assert_allclose(np.asarray(w)[:3], 1.0, atol=1e-6)
        # outside: w = sqrt(2b|r| - b^2)/|r|
        for i in [3, 4]:
            ri = abs(float(r[i]))
            np.testing.assert_allclose(
                float(w[i]), np.sqrt(2 * b * ri - b * b) / ri, rtol=1e-5
            )
        np.testing.assert_allclose(float(loss), np.mean(np.asarray(robust) ** 2), rtol=1e-6)

    def test_masked_loss_ignores_padding(self):
        from dspslam_tpu.ops.robust import robust_residuals

        r = jnp.array([0.1, 0.2, 99.0, 99.0])
        mask = jnp.array([1.0, 1.0, 0.0, 0.0])
        _, loss_masked, w = robust_residuals(r, 0.05, mask)
        _, loss_live, _ = robust_residuals(r[:2], 0.05)
        np.testing.assert_allclose(loss_masked, loss_live, rtol=1e-6)
        assert float(w[2]) == 0.0
