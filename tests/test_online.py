"""Online streaming VO vs the offline scan engine: same frames, same trajectory."""

import numpy as np
import jax.numpy as jnp

from vo_tpu.engine import VOConfig
from vo_tpu.engine.online import OnlineVO
from vo_tpu.engine.pipeline import run_offline_vo
from vo_tpu.estimation import PnPConfig
from vo_tpu.features import OrbLikeExtractor
from vo_tpu.utils.synthetic import render_sequence
import pytest

K = np.array([[260.0, 0.0, 160.0], [0.0, 260.0, 120.0], [0.0, 0.0, 1.0]], np.float32)


@pytest.mark.slow
def test_online_matches_offline():
    imgs, deps, gt = render_sequence(8, K, H=240, W=320, step=0.8, yaw_rate=0.01)
    cfg = VOConfig(matcher="ratio_binary", kf_min_matches=60, kf_min_inliers=30,
                   pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
    ex = OrbLikeExtractor(max_kp=512)

    offline_poses, _ = run_offline_vo(imgs, deps, K, vo_config=cfg, extractor=ex)

    vo = OnlineVO(K, config=cfg, extractor=ex)
    online_poses = np.stack([vo.process_frame(imgs[i], deps[i], i)
                             for i in range(len(imgs))])

    assert np.allclose(online_poses, offline_poses, atol=1e-4), (
        np.abs(online_poses - offline_poses).max())
    err = np.linalg.norm(online_poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert err[-1] < 0.3
