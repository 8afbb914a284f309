"""Unit tests for SO3/SE3/Sim3 against numpy/scipy-free oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eao_fusion_tpu.ops import lie


def rng(seed=0):
    return np.random.default_rng(seed)


def random_quat(r, shape=()):
    q = r.normal(size=shape + (4,)).astype(np.float32)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternion:
    def test_mul_identity(self):
        r = rng()
        q = random_quat(r, (5,))
        e = np.array([1, 0, 0, 0], np.float32)
        np.testing.assert_allclose(lie.quat_mul(q, np.broadcast_to(e, (5, 4))), q, atol=1e-6)

    def test_rotate_matches_matrix(self):
        r = rng(1)
        q = random_quat(r, (8,))
        v = r.normal(size=(8, 3)).astype(np.float32)
        R = np.asarray(lie.quat_to_rotmat(q))
        out = np.asarray(lie.quat_rotate(q, v))
        np.testing.assert_allclose(out, np.einsum("bij,bj->bi", R, v), atol=1e-5)

    def test_rotmat_roundtrip(self):
        r = rng(2)
        q = random_quat(r, (64,))
        q = q * np.where(q[..., :1] < 0, -1, 1)  # canonical sign
        q2 = np.asarray(lie.rotmat_to_quat(lie.quat_to_rotmat(q)))
        np.testing.assert_allclose(q2, q, atol=1e-5)

    def test_rotmat_orthonormal(self):
        r = rng(3)
        R = np.asarray(lie.quat_to_rotmat(random_quat(r, (16,))))
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2),
                                   np.broadcast_to(np.eye(3, dtype=np.float32), (16, 3, 3)),
                                   atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(16), atol=1e-5)


class TestSO3:
    def test_exp_log_roundtrip(self):
        r = rng(4)
        w = r.normal(size=(32, 3)).astype(np.float32)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * r.uniform(0, 3.0, (32, 1)).astype(np.float32)
        w2 = np.asarray(lie.so3_log(lie.so3_exp_quat(w)))
        np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_exp_small_angle(self):
        w = np.array([[1e-9, 0, 0], [0, 0, 0]], np.float32)
        q = np.asarray(lie.so3_exp_quat(w))
        np.testing.assert_allclose(q[:, 0], 1.0, atol=1e-6)

    def test_exp_matches_rodrigues(self):
        r = rng(5)
        w = r.normal(size=(8, 3)).astype(np.float32)
        R = np.asarray(lie.quat_to_rotmat(lie.so3_exp_quat(w)))
        # Rodrigues oracle
        th = np.linalg.norm(w, axis=-1, keepdims=True)[..., None]
        K = np.asarray(lie.so3_hat(w / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1e-9)))
        R_o = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)
        np.testing.assert_allclose(R, R_o, atol=1e-5)


class TestSE3:
    def test_compose_apply(self):
        r = rng(6)
        a = np.asarray(lie.se3_exp(r.normal(size=(4, 6)).astype(np.float32)))
        b = np.asarray(lie.se3_exp(r.normal(size=(4, 6)).astype(np.float32)))
        x = r.normal(size=(4, 3)).astype(np.float32)
        lhs = np.asarray(lie.se3_apply(lie.se3_compose(a, b), x))
        rhs = np.asarray(lie.se3_apply(a, lie.se3_apply(b, x)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_inverse(self):
        r = rng(7)
        p = np.asarray(lie.se3_exp(r.normal(size=(4, 6)).astype(np.float32)))
        e = np.asarray(lie.se3_compose(p, lie.se3_inverse(p)))
        np.testing.assert_allclose(e[:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(e[:, 1:], 0.0, atol=1e-5)

    def test_exp_log_roundtrip(self):
        r = rng(8)
        tau = r.normal(size=(16, 6)).astype(np.float32)
        # keep |omega| < pi: log returns the principal branch
        tau[:, :3] *= 0.8
        tau2 = np.asarray(lie.se3_log(lie.se3_exp(tau)))
        np.testing.assert_allclose(tau2, tau, atol=1e-4)

    def test_matrix_consistency(self):
        r = rng(9)
        p = np.asarray(lie.se3_exp(r.normal(size=(4, 6)).astype(np.float32)))
        x = r.normal(size=(4, 3)).astype(np.float32)
        M = np.asarray(lie.se3_matrix(p))
        xh = np.concatenate([x, np.ones((4, 1), np.float32)], axis=-1)
        np.testing.assert_allclose(np.einsum("bij,bj->bi", M, xh)[:, :3],
                                   np.asarray(lie.se3_apply(p, x)), atol=1e-5)

    def test_retract_at_zero(self):
        r = rng(10)
        p = np.asarray(lie.se3_exp(r.normal(size=(7, 6)).astype(np.float32)))
        p2 = np.asarray(lie.se3_retract(p, np.zeros((7, 6), np.float32)))
        np.testing.assert_allclose(p2, p, atol=1e-6)


class TestSim3:
    def test_apply_scale(self):
        g = np.asarray(lie.sim3_identity()).copy()
        g[7] = 2.0
        x = np.array([1.0, 2.0, 3.0], np.float32)
        np.testing.assert_allclose(np.asarray(lie.sim3_apply(g, x)), 2 * x, atol=1e-6)

    def test_compose_inverse(self):
        r = rng(11)
        tau = r.normal(size=(4, 7)).astype(np.float32) * 0.5
        g = np.asarray(lie.sim3_exp(tau))
        e = np.asarray(lie.sim3_compose(g, lie.sim3_inverse(g)))
        np.testing.assert_allclose(e[:, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(e[:, 7], 1.0, atol=1e-5)
        np.testing.assert_allclose(e[:, 1:7], 0.0, atol=1e-5)

    def test_compose_matches_pointwise(self):
        r = rng(12)
        a = np.asarray(lie.sim3_exp(r.normal(size=(4, 7)).astype(np.float32) * 0.5))
        b = np.asarray(lie.sim3_exp(r.normal(size=(4, 7)).astype(np.float32) * 0.5))
        x = r.normal(size=(4, 3)).astype(np.float32)
        lhs = np.asarray(lie.sim3_apply(lie.sim3_compose(a, b), x))
        rhs = np.asarray(lie.sim3_apply(a, lie.sim3_apply(b, x)))
        np.testing.assert_allclose(lhs, rhs, atol=1e-4)


class TestCamera:
    def test_project_backproject(self):
        cam = (535.4, 539.2, 320.1, 247.6)
        r = rng(13)
        uv = r.uniform([0, 0], [640, 480], size=(32, 2)).astype(np.float32)
        d = r.uniform(0.5, 5.0, size=(32,)).astype(np.float32)
        x = lie.backproject(cam, uv, d)
        uv2 = np.asarray(lie.project(cam, x))
        np.testing.assert_allclose(uv2, uv, atol=1e-3)


def test_jit_and_vmap():
    """All ops must be jittable and vmappable (trace once, static shapes)."""
    f = jax.jit(lambda t, x: lie.se3_apply(lie.se3_exp(t), x))
    out = f(jnp.zeros((6,)), jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(out), np.ones(3), atol=1e-6)
    g = jax.vmap(lambda t: lie.sim3_log(lie.sim3_exp(t)))
    t = jnp.linspace(-0.5, 0.5, 7 * 5).reshape(5, 7)
    np.testing.assert_allclose(np.asarray(g(t)), np.asarray(t), atol=1e-4)
