"""Stereo block-matching depth vs rendered ground-truth depth."""

import numpy as np
import jax.numpy as jnp

from vo_tpu.features import OrbLikeExtractor
from vo_tpu.features.stereo import stereo_depth_at
from vo_tpu.utils.synthetic import render_rgbd, drive_trajectory
import pytest

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


@pytest.mark.slow
def test_stereo_vo_trajectory_end_to_end():
    """Full STEREO VO: render left+right eyes of the synthetic world (baseline
    0.54 m, KITTI-like), measure depth by ZNCC block matching at the detected
    keypoints, run the complete engine on the stereo-derived 3D points, and score
    against ground truth — the configuration the reference names but never
    implements (vo_stereo_runner.py:39-50 consumes precomputed depth maps)."""
    import numpy as np

    from vo_tpu.engine.pipeline import stereo_extract_and_backproject
    from vo_tpu.engine.vo import VOConfig, VOEngine
    from vo_tpu.estimation.pnp import PnPConfig
    from vo_tpu.features.extractor import OrbLikeExtractor
    from vo_tpu.utils.synthetic import render_rgbd, slalom_trajectory

    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1]], np.float32)
    BASE = 0.54
    F = 10
    traj = slalom_trajectory(F, step=0.8)
    lefts, rights = [], []
    shift = np.eye(4)
    shift[0, 3] = BASE                       # right eye: +x in the camera frame
    for T in traj:
        li, _ = render_rgbd(T, K, H=240, W=320)
        ri, _ = render_rgbd(T @ shift, K, H=240, W=320)
        lefts.append(li)
        rights.append(ri)
    lefts, rights = np.stack(lefts), np.stack(rights)

    ex = OrbLikeExtractor(max_kp=512)
    feats, kp3d = stereo_extract_and_backproject(
        ex, jnp.asarray(lefts), jnp.asarray(rights), jnp.asarray(K), BASE,
        max_disp=96)
    z = np.asarray(kp3d[..., 2])
    n_depth = int(((z > 0.1) & (z < 50.0)).sum(axis=1).min())
    assert n_depth >= 100, f"stereo depth too sparse: {n_depth}"

    cfg = VOConfig(matcher="ratio_binary", kf_min_matches=60, kf_min_inliers=30,
                   pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
    engine = VOEngine(cfg)
    poses, diag = engine.run_sequence(feats.kp, feats.desc, feats.valid, kp3d,
                                      jnp.asarray(K))
    poses = np.asarray(poses)
    assert np.asarray(diag.accepted).all()
    err = np.linalg.norm(poses[:, :3, 3] - traj[:, :3, 3], axis=1)
    # stereo depth quantizes at fx*b/d^2 per px of disparity (~0.4 m at 10 m) —
    # a looser bar than the exact-depth paths, but a real trajectory nonetheless
    assert err[-1] < 0.5, err
