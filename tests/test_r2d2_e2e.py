"""VO end-to-end with the R2D2 learned extractor (ported reference weights)."""

import os

import numpy as np
import pytest

from vo_tpu.engine import VOConfig
from vo_tpu.engine.pipeline import run_offline_vo
from vo_tpu.estimation import PnPConfig
from vo_tpu.utils.synthetic import render_sequence

_HAVE_REF_MODELS = os.path.exists(
    "/root/reference/feature_extractors/r2d2/models/faster2d2_WASF_N16.pt")

pytestmark = pytest.mark.skipif(not _HAVE_REF_MODELS,
                                reason="reference checkpoints not mounted")

K = np.array([[200.0, 0.0, 120.0], [0.0, 200.0, 90.0], [0.0, 0.0, 1.0]], np.float32)


@pytest.mark.slow
def test_r2d2_vo_tracks_synthetic_drive():
    from vo_tpu.models.r2d2_extractor import R2D2Extractor

    imgs, deps, gt = render_sequence(10, K, H=180, W=240, step=0.8, yaw_rate=0.01)
    cfg = VOConfig(matcher="ratio_mutual_nn", ratio=0.90,
                   kf_min_matches=60, kf_min_inliers=30,
                   pnp=PnPConfig(min_inliers=12, n_hypotheses=256))
    ex = R2D2Extractor.from_pretrained(max_kp=512, score_thr=0.8)
    poses, diag = run_offline_vo(imgs, deps, K, vo_config=cfg, extractor=ex)
    err = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert diag.accepted.mean() > 0.8
    assert err[-1] < 0.6, f"drift {err[-1]:.3f} m over {0.8 * 10:.1f} m"
