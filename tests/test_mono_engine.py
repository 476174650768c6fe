"""Monocular VO engine end-to-end on synthetic RGB-D (depth used only for scale)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.engine.mono import MonoVOConfig, MonoVOEngine
from vo_tpu.engine.pipeline import extract_and_backproject
from vo_tpu.estimation.essential import EssentialConfig
from vo_tpu.features import OrbLikeExtractor
from vo_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0.0, 160.0], [0.0, 260.0, 120.0], [0.0, 0.0, 1.0]], np.float32)


@pytest.mark.slow
def test_mono_vo_tracks_with_metric_scale():
    imgs, deps, gt = render_sequence(10, K, H=240, W=320, step=0.8, yaw_rate=0.01)
    ex = OrbLikeExtractor(max_kp=512)
    feats, kp3d = extract_and_backproject(
        ex, jnp.asarray(imgs), jnp.asarray(deps), jnp.asarray(K))
    cfg = MonoVOConfig(matcher="ratio_binary", kf_min_matches=60, kf_min_inliers=30,
                       essential=EssentialConfig(min_inliers=15, n_hypotheses=64,
                                                 polish_starts=4))
    eng = MonoVOEngine(cfg)
    poses, diag = eng.run_sequence(feats.kp, feats.desc, feats.valid, kp3d,
                                   jnp.asarray(K))
    poses = np.asarray(poses)
    err = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    accept = np.asarray(diag.accepted)
    assert accept.mean() > 0.7, accept
    # scale resolved to metric: steps should be ~0.8 m on accepted frames
    steps = np.asarray(diag.step_norm)[accept]
    assert np.abs(np.median(steps) - 0.8) < 0.2, np.median(steps)
    assert err[-1] < 1.0, err
