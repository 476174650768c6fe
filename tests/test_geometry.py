"""Unit + property tests for vo_tpu.geometry (the reference ships no tests; SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.geometry import (
    so3_exp,
    so3_log,
    hat,
    vee,
    se3_exp,
    se3_log,
    pose_from_rt,
    pose_inverse,
    pose_compose,
    transform_points,
    chain_relative_poses,
    project,
    unproject,
    normalize_kp,
    depth_to_3d_at,
    depth_to_3d,
    triangulate,
    umeyama_alignment,
)


def random_rotations(rng, n):
    # Uniform-ish rotations via QR of gaussians.
    A = rng.normal(size=(n, 3, 3))
    Q, R = np.linalg.qr(A)
    det = np.linalg.det(Q)
    Q[:, :, 0] *= np.sign(det)[:, None]
    return Q.astype(np.float32)


class TestSO3:
    def test_hat_vee_roundtrip(self, rng):
        w = rng.normal(size=(10, 3)).astype(np.float32)
        assert np.allclose(vee(hat(jnp.asarray(w))), w, atol=1e-6)

    def test_exp_is_rotation(self, rng):
        w = rng.normal(size=(32, 3)).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        eye = np.eye(3)
        for Ri in R:
            assert np.allclose(Ri @ Ri.T, eye, atol=1e-5)
            assert np.isclose(np.linalg.det(Ri), 1.0, atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        w = rng.normal(size=(64, 3)).astype(np.float32)
        # Keep |w| < pi so log is unique.
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * rng.uniform(0.01, 3.0, size=(64, 1))
        w = w.astype(np.float32)
        w2 = np.asarray(so3_log(so3_exp(jnp.asarray(w))))
        assert np.allclose(w2, w, atol=1e-4)

    def test_log_exp_roundtrip_on_rotations(self, rng):
        R = random_rotations(rng, 32)
        R2 = np.asarray(so3_exp(so3_log(jnp.asarray(R))))
        assert np.allclose(R2, R, atol=1e-4)

    def test_small_angle(self):
        w = jnp.array([[1e-10, 0.0, 0.0], [0.0, 0.0, 0.0]])
        R = so3_exp(w)
        assert np.allclose(R, np.eye(3)[None].repeat(2, 0), atol=1e-7)
        assert np.allclose(so3_log(R), w, atol=1e-7)

    def test_near_pi(self):
        axis = np.array([0.0, 0.0, 1.0], dtype=np.float32)
        w = axis * (np.pi - 1e-5)
        R = so3_exp(jnp.asarray(w[None]))
        w2 = np.asarray(so3_log(R))[0]
        assert np.allclose(np.abs(w2), np.abs(w), atol=1e-3)


class TestSE3:
    def test_inverse(self, rng):
        R = random_rotations(rng, 16)
        t = rng.normal(size=(16, 3)).astype(np.float32)
        T = pose_from_rt(jnp.asarray(R), jnp.asarray(t))
        TT = np.asarray(pose_compose(T, pose_inverse(T)))
        assert np.allclose(TT, np.eye(4)[None].repeat(16, 0), atol=1e-5)

    def test_exp_log_roundtrip(self, rng):
        xi = rng.normal(size=(32, 6)).astype(np.float32) * 0.5
        xi2 = np.asarray(se3_log(se3_exp(jnp.asarray(xi))))
        assert np.allclose(xi2, xi, atol=1e-4)

    def test_transform_points_matches_homogeneous(self, rng):
        R = random_rotations(rng, 1)[0]
        t = rng.normal(size=(3,)).astype(np.float32)
        T = np.asarray(pose_from_rt(jnp.asarray(R), jnp.asarray(t)))
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        got = np.asarray(transform_points(jnp.asarray(pts), jnp.asarray(T)))
        want = (T @ np.c_[pts, np.ones(50)].T)[:3].T  # reference formula geom_utils.py:128
        assert np.allclose(got, want, atol=1e-5)

    def test_chain_relative_poses(self, rng):
        n = 17
        R = random_rotations(rng, n)
        t = rng.normal(size=(n, 3)).astype(np.float32)
        rel = np.asarray(pose_from_rt(jnp.asarray(R), jnp.asarray(t)))
        got = np.asarray(chain_relative_poses(jnp.asarray(rel)))
        want = np.empty_like(rel)
        acc = np.eye(4, dtype=np.float64)
        for i in range(n):
            acc = acc @ rel[i].astype(np.float64)
            want[i] = acc
        assert np.allclose(got, want, atol=1e-3)

    def test_chain_with_initial(self, rng):
        rel = np.asarray(pose_from_rt(jnp.asarray(random_rotations(rng, 4)),
                                      jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))))
        init = np.asarray(pose_from_rt(jnp.asarray(random_rotations(rng, 1)),
                                       jnp.asarray(rng.normal(size=(1, 3)).astype(np.float32))))[0]
        got = np.asarray(chain_relative_poses(jnp.asarray(rel), jnp.asarray(init)))
        assert np.allclose(got[0], init @ rel[0], atol=1e-5)


KITTI_K = np.array([[721.53, 0.0, 609.55], [0.0, 721.53, 172.85], [0.0, 0.0, 1.0]],
                   dtype=np.float32)  # config/vo_params.yaml:9-19


class TestCamera:
    def test_project_unproject_roundtrip(self, rng):
        K = jnp.asarray(KITTI_K)
        kp = rng.uniform([0, 0], [1200, 370], size=(100, 2)).astype(np.float32)
        depth = rng.uniform(1.0, 50.0, size=(100,)).astype(np.float32)
        X = unproject(jnp.asarray(kp), jnp.asarray(depth), K)
        uv, z = project(X, K)
        assert np.allclose(np.asarray(uv), kp, atol=1e-2)
        assert np.allclose(np.asarray(z), depth, atol=1e-4)

    def test_unproject_matches_reference_formula(self, rng):
        # reference unprojection_kp: X = (K^-1 [u v 1]) * depth (geom_utils.py:55-77)
        K = KITTI_K
        kp = rng.uniform([0, 0], [1200, 370], size=(20, 2)).astype(np.float32)
        depth = rng.uniform(1.0, 50.0, size=(20,)).astype(np.float32)
        got = np.asarray(unproject(jnp.asarray(kp), jnp.asarray(depth), jnp.asarray(K)))
        ones = np.ones((20, 3, 1))
        ones[:, :2, 0] = kp
        want = (np.linalg.inv(K)[None] @ ones)[:, :, 0] * depth[:, None]
        assert np.allclose(got, want, atol=1e-3)

    def test_normalize_kp(self, rng):
        K = jnp.asarray(KITTI_K)
        kp = rng.uniform([0, 0], [1200, 370], size=(20, 2)).astype(np.float32)
        n = np.asarray(normalize_kp(jnp.asarray(kp), K))
        assert np.allclose(n[:, 0], (kp[:, 0] - KITTI_K[0, 2]) / KITTI_K[0, 0], atol=1e-6)

    def test_depth_to_3d_at_consistency(self, rng):
        K = jnp.asarray(KITTI_K)
        depth_img = rng.uniform(1.0, 30.0, size=(37, 120)).astype(np.float32)
        kp = np.stack([rng.integers(0, 120, 25), rng.integers(0, 37, 25)], -1).astype(np.float32)
        sparse = np.asarray(depth_to_3d_at(jnp.asarray(depth_img), jnp.asarray(kp), K))
        dense = np.asarray(depth_to_3d(jnp.asarray(depth_img), K))
        want = dense[kp[:, 1].astype(int), kp[:, 0].astype(int)]
        assert np.allclose(sparse, want, atol=1e-4)


class TestTriangulation:
    def test_recovers_synthetic_points(self, rng):
        K = jnp.asarray(KITTI_K)
        X_w = rng.uniform([-10, -2, 5], [10, 2, 40], size=(64, 3)).astype(np.float32)
        T_1w = np.eye(4, dtype=np.float32)
        R2 = random_rotations(rng, 1)[0] * 0.0 + np.asarray(
            so3_exp(jnp.asarray([[0.0, 0.05, 0.0]]))
        )[0]
        T_2w = np.asarray(pose_from_rt(jnp.asarray(R2), jnp.asarray([-0.54, 0.0, 0.1])))
        uv1, _ = project(transform_points(jnp.asarray(X_w), jnp.asarray(T_1w)), K)
        uv2, _ = project(transform_points(jnp.asarray(X_w), jnp.asarray(T_2w)), K)
        X_est, X1, X2 = triangulate(uv1, uv2, jnp.asarray(T_1w), jnp.asarray(T_2w), K)
        assert np.allclose(np.asarray(X_est), X_w, atol=1e-1)


class TestUmeyama:
    def test_recovers_similarity(self, rng):
        R_true = random_rotations(rng, 1)[0]
        t_true = rng.normal(size=(3,)).astype(np.float32)
        c_true = 2.5
        x = rng.normal(size=(3, 40)).astype(np.float32)
        y = c_true * R_true @ x + t_true[:, None]
        R, t, c = umeyama_alignment(jnp.asarray(x), jnp.asarray(y), with_scale=True)
        assert np.allclose(np.asarray(R), R_true, atol=1e-4)
        assert np.allclose(np.asarray(t), t_true, atol=1e-3)
        assert np.isclose(float(c), c_true, atol=1e-4)

    def test_no_scale(self, rng):
        R_true = random_rotations(rng, 1)[0]
        x = rng.normal(size=(3, 40)).astype(np.float32)
        y = R_true @ x
        R, t, c = umeyama_alignment(jnp.asarray(x), jnp.asarray(y), with_scale=False)
        assert np.isclose(float(c), 1.0)
        assert np.allclose(np.asarray(R), R_true, atol=1e-4)


class TestJitAndVmap:
    def test_geometry_jits(self, rng):
        f = jax.jit(lambda w, t: se3_log(pose_inverse(se3_exp(jnp.concatenate([t, w], -1)))))
        out = f(jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32) * 0.3),
                jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32)))
        assert out.shape == (8, 6)
        assert np.all(np.isfinite(np.asarray(out)))


class TestOrthonormalizePose:
    def test_projects_back_to_so3(self, rng):
        from vo_tpu.geometry.se3 import orthonormalize_pose

        R = np.asarray(so3_exp(jnp.asarray(rng.normal(0, 1, (5, 3)).astype(np.float32))))
        drift = 1.0 + rng.normal(0, 1e-3, (5, 1, 1))  # multiplicative scale creep
        T = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
        T[:, :3, :3] = R * drift
        T[:, :3, 3] = rng.normal(0, 1, (5, 3))
        out = np.asarray(orthonormalize_pose(jnp.asarray(T)))
        for i in range(5):
            Ro = out[i, :3, :3]
            np.testing.assert_allclose(Ro @ Ro.T, np.eye(3), atol=1e-5)
            # nearest-rotation projection: still close to the uncorrupted R
            np.testing.assert_allclose(Ro, R[i], atol=5e-3)
        np.testing.assert_allclose(out[:, :3, 3], T[:, :3, 3], atol=0)  # t untouched

    def test_chain_stays_on_manifold(self, rng):
        """160 chained composes with per-step 1e-5 scale creep stay orthonormal when
        each step re-projects (the VO engine's chain semantics)."""
        from vo_tpu.geometry.se3 import orthonormalize_pose

        rels = np.asarray(so3_exp(jnp.asarray(
            rng.normal(0, 0.02, (160, 3)).astype(np.float32)))) * (1.0 + 1e-5)
        T = np.eye(4, dtype=np.float32)
        for R in rels:
            step = np.eye(4, dtype=np.float32)
            step[:3, :3] = R
            T = np.asarray(orthonormalize_pose(jnp.asarray(T @ step)))
        Rf = T[:3, :3]
        assert abs(np.trace(Rf @ Rf.T) - 3.0) < 1e-5
