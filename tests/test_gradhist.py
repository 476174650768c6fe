"""SIFT-style gradhist descriptor path: matching quality + VO e2e."""

import numpy as np
import jax.numpy as jnp

from vo_tpu.engine import VOConfig
from vo_tpu.engine.pipeline import run_offline_vo
from vo_tpu.estimation import PnPConfig
from vo_tpu.features import OrbLikeExtractor
from vo_tpu.matching import ratio_match, matches_to_pairs
from vo_tpu.utils.synthetic import render_sequence
from tests.test_features_matching import make_textured_image
import pytest

K = np.array([[260.0, 0.0, 160.0], [0.0, 260.0, 120.0], [0.0, 0.0, 1.0]], np.float32)


def test_gradhist_matches_shifted_pair(rng):
    img1 = make_textured_image(rng, H=160, W=220)
    dx, dy = 6, 2
    img2 = np.roll(np.roll(img1, dy, axis=0), dx, axis=1)
    ex = OrbLikeExtractor(max_kp=256, descriptor="gradhist")
    f = ex(jnp.asarray(np.stack([img1, img2])))
    res = ratio_match(f.desc[0], f.desc[1], f.valid[0], f.valid[1], ratio=0.85)
    pairs = matches_to_pairs(res)
    assert pairs.shape[0] >= 30
    flow = np.asarray(f.kp[1])[pairs[:, 1]] - np.asarray(f.kp[0])[pairs[:, 0]]
    assert np.allclose(np.median(flow, axis=0), [dx, dy], atol=1.0)


@pytest.mark.slow
def test_gradhist_vo_e2e():
    imgs, deps, gt = render_sequence(12, K, H=240, W=320, step=0.8, yaw_rate=0.01)
    cfg = VOConfig(matcher="ratio_float", ratio=0.85, kf_min_matches=60,
                   kf_min_inliers=30, pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
    poses, diag = run_offline_vo(imgs, deps, K, vo_config=cfg,
                                 extractor=OrbLikeExtractor(max_kp=512,
                                                            descriptor="gradhist"))
    err = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert diag.accepted.mean() > 0.85
    assert err[-1] < 0.5
