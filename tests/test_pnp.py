"""PnP-RANSAC tests on synthetic 3D-2D correspondences with known poses + outliers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.estimation import PnPConfig, pnp_ransac
from vo_tpu.geometry import so3_exp, pose_from_rt, pose_inverse, transform_points, project

KITTI_K = np.array([[721.53, 0.0, 609.55], [0.0, 721.53, 172.85], [0.0, 0.0, 1.0]],
                   dtype=np.float32)


def make_scene(rng, n=512, rot=(0.01, 0.03, 0.005), trans=(0.3, 0.05, 1.0),
               outlier_frac=0.3, noise_px=0.3, n_pad_invalid=64):
    """Keyframe-camera 3D points + their pixels in a moved camera, with outliers."""
    X = np.stack([
        rng.uniform(-15, 15, n), rng.uniform(-3, 3, n), rng.uniform(4, 50, n)
    ], axis=-1).astype(np.float32)
    R = np.asarray(so3_exp(jnp.asarray([rot])))[0]
    T = np.asarray(pose_from_rt(jnp.asarray(R), jnp.asarray(np.array(trans, np.float32))))
    uv, z = project(transform_points(jnp.asarray(X), jnp.asarray(T)), jnp.asarray(KITTI_K))
    uv = np.asarray(uv) + rng.normal(0, noise_px, (n, 2))
    # corrupt a fraction with gross outliers
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(-80, 80, (n_out, 2)) + 20
    valid = np.ones(n, bool)
    # pad with invalid junk rows (the fixed-budget mask regime)
    Xp = np.concatenate([X, np.zeros((n_pad_invalid, 3), np.float32)])
    uvp = np.concatenate([uv, np.zeros((n_pad_invalid, 2))]).astype(np.float32)
    vp = np.concatenate([valid, np.zeros(n_pad_invalid, bool)])
    return Xp, uvp, vp, T, out_idx


class TestPnP:
    @pytest.mark.slow
    def test_recovers_pose_with_outliers(self, rng):
        X, uv, valid, T_true, out_idx = make_scene(rng)
        res = pnp_ransac(jax.random.key(0), jnp.asarray(X), jnp.asarray(uv),
                         jnp.asarray(valid), jnp.asarray(KITTI_K))
        assert bool(res.ok)
        T_est = np.asarray(res.pose)
        err = np.linalg.inv(T_true) @ T_est
        t_err = np.linalg.norm(err[:3, 3])
        r_err = np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2, -1, 1))
        assert t_err < 0.05, t_err
        assert r_err < 0.002, r_err
        # inliers exclude most outliers
        inl = np.asarray(res.inliers)
        assert inl[out_idx].mean() < 0.15
        assert int(res.n_inliers) > 300

    def test_clean_data_high_accuracy(self, rng):
        X, uv, valid, T_true, _ = make_scene(rng, outlier_frac=0.0, noise_px=0.0)
        res = pnp_ransac(jax.random.key(1), jnp.asarray(X), jnp.asarray(uv),
                         jnp.asarray(valid), jnp.asarray(KITTI_K))
        T_est = np.asarray(res.pose)
        err = np.linalg.inv(T_true) @ T_est
        assert np.linalg.norm(err[:3, 3]) < 5e-3
        assert int(res.n_inliers) >= 500

    def test_insufficient_points_not_ok(self, rng):
        # Below the ratio-acceptance floor (PnPConfig.min_inliers_floor = 8) a
        # pose can never be ok, no matter how well it fits.
        X, uv, valid, _, _ = make_scene(rng, n=512)
        valid = valid & (np.arange(len(valid)) < 6)   # only 6 valid
        res = pnp_ransac(jax.random.key(2), jnp.asarray(X), jnp.asarray(uv),
                         jnp.asarray(valid), jnp.asarray(KITTI_K))
        assert int(res.n_inliers) <= 6
        assert not bool(res.ok)

    def test_ratio_acceptance_when_depth_starved(self, rng):
        """r05 semantics: a pose explaining >= 60% of the few available
        correspondences (>= 8 absolute) is accepted even below the reference's
        >20 absolute gate — the depth-dropout regime where rejecting a correct
        pose (and holding) bakes real motion error into the trajectory."""
        X, uv, valid, _, _ = make_scene(rng, n=512)
        valid = valid & (np.arange(len(valid)) < 12)  # 12 valid, clean geometry
        res = pnp_ransac(jax.random.key(2), jnp.asarray(X), jnp.asarray(uv),
                         jnp.asarray(valid), jnp.asarray(KITTI_K))
        assert int(res.n_inliers) >= 8
        assert bool(res.ok)

    def test_deterministic_given_key(self, rng):
        X, uv, valid, _, _ = make_scene(rng)
        a = pnp_ransac(jax.random.key(3), jnp.asarray(X), jnp.asarray(uv),
                       jnp.asarray(valid), jnp.asarray(KITTI_K))
        b = pnp_ransac(jax.random.key(3), jnp.asarray(X), jnp.asarray(uv),
                       jnp.asarray(valid), jnp.asarray(KITTI_K))
        assert np.allclose(np.asarray(a.pose), np.asarray(b.pose))
        assert int(a.n_inliers) == int(b.n_inliers)

    def test_large_motion(self, rng):
        X, uv, valid, T_true, _ = make_scene(
            rng, rot=(0.02, 0.3, 0.01), trans=(1.0, 0.1, 2.5), outlier_frac=0.2)
        res = pnp_ransac(jax.random.key(4), jnp.asarray(X), jnp.asarray(uv),
                         jnp.asarray(valid), jnp.asarray(KITTI_K))
        err = np.linalg.inv(T_true) @ np.asarray(res.pose)
        assert np.linalg.norm(err[:3, 3]) < 0.1
