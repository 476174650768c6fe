"""BA trajectory refinement: must improve a perturbed VO trajectory."""

import numpy as np
import jax.numpy as jnp
import pytest

from vo_tpu.engine.pipeline import extract_and_backproject
from vo_tpu.engine.refine import RefineConfig, refine_trajectory
from vo_tpu.features import OrbLikeExtractor
from vo_tpu.geometry import so3_exp, pose_from_rt
from vo_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0.0, 160.0], [0.0, 260.0, 120.0], [0.0, 0.0, 1.0]], np.float32)


def test_loop_rotation_discrepancy_probe(rng):
    """The adaptive-branch probe must read ~0 on a drift-free trajectory and the
    injected heading error on a drifted one."""
    from vo_tpu.engine.refine import loop_rotation_discrepancy_deg
    from vo_tpu.geometry import so3_exp

    # chain of 20 poses moving forward
    poses = np.stack([np.eye(4)] * 20)
    for i in range(1, 20):
        poses[i] = poses[i - 1].copy()
        poses[i][2, 3] += 1.0
    kfs = np.arange(20)
    # exact loop edge between 0 and 19 -> zero discrepancy
    Z = np.linalg.inv(poses[0]) @ poses[19]
    assert loop_rotation_discrepancy_deg(poses, kfs, [(0, 19, Z, 50)]) < 1e-6
    assert loop_rotation_discrepancy_deg(poses, kfs, []) == 0.0
    # inject 3 deg of heading drift at the tail -> probe reads ~3 deg
    drift = np.eye(4)
    drift[:3, :3] = np.asarray(so3_exp(jnp.asarray([[0.0, np.radians(3.0), 0.0]])))[0]
    poses_d = poses.copy()
    poses_d[19] = poses_d[19] @ drift
    disc = loop_rotation_discrepancy_deg(poses_d, kfs, [(0, 19, Z, 50)])
    assert 2.5 < disc < 3.5, disc


@pytest.mark.slow
def test_global_refinement_reduces_pose_error(rng):
    """One global BA over the whole keyframe chain (refine_trajectory_global) must
    also fix an accumulated-drift trajectory — same setup as the windowed test."""
    from vo_tpu.engine.refine import refine_trajectory_global

    imgs, deps, gt = render_sequence(12, K, H=240, W=320, step=0.8, yaw_rate=0.01)
    ex = OrbLikeExtractor(max_kp=512)
    feats, kp3d = extract_and_backproject(ex, jnp.asarray(imgs), jnp.asarray(deps),
                                          jnp.asarray(K))
    noisy = gt.copy()
    for i in range(1, len(gt)):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        dw = rng.normal(0, 0.003, 3).astype(np.float32)
        dt = rng.normal(0, 0.02, 3).astype(np.float32)
        dT = np.asarray(pose_from_rt(so3_exp(jnp.asarray(dw[None]))[0],
                                     jnp.asarray(dt)))
        noisy[i] = noisy[i - 1] @ (rel @ dT)

    refined, info = refine_trajectory_global(
        noisy, feats.kp, feats.desc, feats.valid, kp3d, K,
        cfg=RefineConfig(obs_per_pose=192))
    assert not info.get("skipped"), info
    assert info["n_obs"] > 100

    eb = np.linalg.norm(noisy[:, :3, 3] - gt[:, :3, 3], axis=1)
    ea = np.linalg.norm(refined[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert ea.mean() < 0.7 * eb.mean(), (eb.mean(), ea.mean())


@pytest.mark.slow
def test_refinement_reduces_pose_error(rng):
    imgs, deps, gt = render_sequence(12, K, H=240, W=320, step=0.8, yaw_rate=0.01)
    ex = OrbLikeExtractor(max_kp=512)
    feats, kp3d = extract_and_backproject(ex, jnp.asarray(imgs), jnp.asarray(deps),
                                          jnp.asarray(K))
    # Accumulated drift: each relative step slightly wrong (the VO error model —
    # per-frame *independent* noise on non-keyframes is not correctable by keyframe BA).
    noisy = gt.copy()
    for i in range(1, len(gt)):
        rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        dw = rng.normal(0, 0.003, 3).astype(np.float32)
        dt = rng.normal(0, 0.02, 3).astype(np.float32)
        dT = np.asarray(pose_from_rt(so3_exp(jnp.asarray(dw[None]))[0],
                                     jnp.asarray(dt)))
        noisy[i] = noisy[i - 1] @ (rel @ dT)

    refined, info = refine_trajectory(
        noisy, feats.kp, feats.desc, feats.valid, kp3d, K,
        cfg=RefineConfig(window=6, obs_per_pose=192))

    eb = np.linalg.norm(noisy[:, :3, 3] - gt[:, :3, 3], axis=1)
    ea = np.linalg.norm(refined[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert ea.mean() < 0.7 * eb.mean(), (eb.mean(), ea.mean())
    assert ea[-1] < 0.5 * eb[-1], (eb[-1], ea[-1])  # endpoint drift strongly reduced
    assert len(info["windows"]) >= 1
    assert info["windows"][0]["mean_reproj"] < 2.0
