"""Essential-matrix RANSAC + relative-scale tests on synthetic two-view geometry."""

import numpy as np
import jax
import jax.numpy as jnp

from vo_tpu.estimation import EssentialConfig, essential_ransac, relative_scale
from vo_tpu.geometry import so3_exp, pose_from_rt, transform_points, project
import pytest

K = np.array([[700.0, 0.0, 320.0], [0.0, 700.0, 240.0], [0.0, 0.0, 1.0]], np.float32)


def two_view_scene(rng, n=400, rot=(0.01, 0.05, 0.0), trans=(0.6, 0.05, 0.3),
                   outlier_frac=0.3, noise_px=0.3):
    X = np.stack([rng.uniform(-10, 10, n), rng.uniform(-3, 3, n),
                  rng.uniform(5, 40, n)], -1).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray([rot])))[0]
    T = np.asarray(pose_from_rt(jnp.asarray(R), jnp.asarray(np.array(trans, np.float32))))
    uv1, z1 = project(jnp.asarray(X), jnp.asarray(K))
    uv2, z2 = project(transform_points(jnp.asarray(X), jnp.asarray(T)), jnp.asarray(K))
    uv1 = np.asarray(uv1) + rng.normal(0, noise_px, (n, 2))
    uv2 = np.asarray(uv2) + rng.normal(0, noise_px, (n, 2))
    n_out = int(outlier_frac * n)
    out = rng.choice(n, n_out, replace=False)
    uv2[out] += rng.uniform(20, 120, (n_out, 2))
    valid = np.ones(n, bool)
    return X, uv1.astype(np.float32), uv2.astype(np.float32), valid, T, out


class TestEssential:
    @pytest.mark.slow
    def test_recovers_rotation_and_translation_direction(self, rng):
        # Representative driving geometry: decent parallax, 20% gross outliers.
        X, uv1, uv2, valid, T_true, out = two_view_scene(
            rng, rot=(0.01, 0.05, 0.0), trans=(1.2, 0.1, 0.6), outlier_frac=0.2)
        res = essential_ransac(jax.random.key(0), jnp.asarray(uv1), jnp.asarray(uv2),
                               jnp.asarray(valid), jnp.asarray(K))
        assert bool(res.ok)
        T = np.asarray(res.pose)
        R_err = np.linalg.inv(T_true[:3, :3]) @ T[:3, :3]
        ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
        assert ang < 0.01, ang
        t_dir = T[:3, 3] / np.linalg.norm(T[:3, 3])
        t_true = T_true[:3, 3] / np.linalg.norm(T_true[:3, 3])
        assert np.dot(t_dir, t_true) > 0.99
        inl = np.asarray(res.inliers)
        assert inl[out].mean() < 0.2
        assert inl.mean() > 0.5

    def test_low_parallax_heavy_outliers_rotation_only(self, rng):
        # Known-hard regime (2-10% parallax + 30% gross outliers): the translation
        # direction is weakly observable and 8-point-based RANSAC can settle in a
        # consensus-degenerate basin (a 5-point+MAGSAC-class solver would be needed).
        # Rotation must still come out right; translation direction is best-effort.
        X, uv1, uv2, valid, T_true, out = two_view_scene(rng)
        res = essential_ransac(jax.random.key(0), jnp.asarray(uv1), jnp.asarray(uv2),
                               jnp.asarray(valid), jnp.asarray(K))
        T = np.asarray(res.pose)
        R_err = np.linalg.inv(T_true[:3, :3]) @ T[:3, :3]
        ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
        assert ang < 0.05, ang
        inl = np.asarray(res.inliers)
        assert inl[out].mean() < 0.2  # gross outliers still rejected

    def test_pure_rotation_handled(self, rng):
        # Degenerate for E (t=0): should not produce a confidently wrong pose.
        X, uv1, uv2, valid, T_true, _ = two_view_scene(
            rng, trans=(0.0, 0.0, 1e-6), outlier_frac=0.0, noise_px=0.2)
        res = essential_ransac(jax.random.key(1), jnp.asarray(uv1), jnp.asarray(uv2),
                               jnp.asarray(valid), jnp.asarray(K))
        T = np.asarray(res.pose)
        R_err = np.linalg.inv(T_true[:3, :3]) @ T[:3, :3]
        ang = np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1))
        assert ang < 0.02  # rotation still recovered; translation direction is noise

    def test_deterministic(self, rng):
        X, uv1, uv2, valid, _, _ = two_view_scene(rng)
        a = essential_ransac(jax.random.key(3), jnp.asarray(uv1), jnp.asarray(uv2),
                             jnp.asarray(valid), jnp.asarray(K))
        b = essential_ransac(jax.random.key(3), jnp.asarray(uv1), jnp.asarray(uv2),
                             jnp.asarray(valid), jnp.asarray(K))
        assert np.allclose(np.asarray(a.pose), np.asarray(b.pose))


class TestRelativeScale:
    def test_recovers_scale(self, rng):
        n = 300
        pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        s_true = 3.7
        noisy = pts * s_true + rng.normal(0, 0.01, (n, 3)).astype(np.float32)
        valid = np.ones(n, bool)
        s = float(relative_scale(jax.random.key(0), jnp.asarray(pts),
                                 jnp.asarray(noisy), jnp.asarray(valid)))
        assert abs(s - s_true) < 0.05

    def test_robust_to_outliers(self, rng):
        n = 300
        pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
        s_true = 2.0
        noisy = pts * s_true
        noisy[::5] *= 10.0  # 20% gross outliers
        valid = np.ones(n, bool)
        s = float(relative_scale(jax.random.key(1), jnp.asarray(pts),
                                 jnp.asarray(noisy), jnp.asarray(valid)))
        assert abs(s - s_true) < 0.15
