"""Stereo block-matching depth vs rendered ground-truth depth."""

import numpy as np
import jax.numpy as jnp

from vo_tpu.features import OrbLikeExtractor
from vo_tpu.features.stereo import stereo_depth_at
from vo_tpu.utils.synthetic import render_rgbd, drive_trajectory

K = np.array([[300.0, 0.0, 160.0], [0.0, 300.0, 120.0], [0.0, 0.0, 1.0]], np.float32)
BASELINE = 0.54


def make_stereo_pair():
    T_wl = drive_trajectory(3, step=0.8)[2]
    T_wr = T_wl.copy()
    T_wr[:3, 3] += T_wl[:3, :3] @ np.array([BASELINE, 0.0, 0.0])
    left, dep_l = render_rgbd(T_wl, K, H=240, W=320)
    right, _ = render_rgbd(T_wr, K, H=240, W=320)
    return left, right, dep_l


def test_stereo_depth_matches_gt():
    left, right, dep_gt = make_stereo_pair()
    ex = OrbLikeExtractor(max_kp=256)
    feats = ex(jnp.asarray(left[None]))
    kp = feats.kp[0]
    valid = feats.valid[0]
    depth, ok = stereo_depth_at(jnp.asarray(left), jnp.asarray(right), kp, valid,
                                jnp.asarray(K), BASELINE, max_disp=96)
    depth, ok = np.asarray(depth), np.asarray(ok)
    kpn = np.asarray(kp)
    assert ok.sum() > 40, ok.sum()
    gt = dep_gt[kpn[ok, 1].astype(int), kpn[ok, 0].astype(int)]
    rel_err = np.abs(depth[ok] - gt) / gt
    # block matching with subpixel: most points within a few percent
    assert np.median(rel_err) < 0.05, np.median(rel_err)
    assert (rel_err < 0.15).mean() > 0.8


def test_invalid_on_textureless():
    flat = np.full((240, 320), 128.0, np.float32)
    kp = jnp.asarray(np.array([[200.0, 100.0], [250.0, 150.0]], np.float32))
    valid = jnp.asarray(np.ones(2, bool))
    depth, ok = stereo_depth_at(jnp.asarray(flat), jnp.asarray(flat), kp, valid,
                                jnp.asarray(K), BASELINE, max_disp=96)
    assert not np.asarray(ok).any()
