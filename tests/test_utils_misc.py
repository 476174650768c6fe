"""Tracking, plotting, profiling utilities."""

import os

import numpy as np
import jax.numpy as jnp

from vo_tpu.evalkit.plotting import (
    draw_keypoints,
    draw_matches,
    plot_segment_errors,
    plot_trajectories,
)
from vo_tpu.geometry import se3_exp, chain_relative_poses
from vo_tpu.utils.profiling import StageTimer
from vo_tpu.utils.tracking import distance_to_point, lift_point, track_point

K = jnp.asarray([[260.0, 0.0, 160.0], [0.0, 260.0, 120.0], [0.0, 0.0, 1.0]])


class TestTracking:
    def test_lift_and_track_roundtrip(self):
        depth = jnp.full((240, 320), 10.0)
        p = lift_point(depth, (200, 100), K)
        assert np.isclose(float(p[2]), 10.0)
        # frame 0 at identity: reprojection gives the original pixel back
        poses = jnp.eye(4)[None]
        uv, z, vis = track_point(p, poses, K)
        assert np.allclose(np.asarray(uv[0]), [200, 100], atol=1e-3)
        assert bool(vis[0])

    def test_point_moves_with_camera(self):
        depth = jnp.full((240, 320), 10.0)
        p = lift_point(depth, (160, 120), K)  # on the optical axis
        # camera advances 2 m: the point gets closer, stays centered
        rel = se3_exp(jnp.asarray([[0.0, 0.0, 2.0, 0.0, 0.0, 0.0]]))
        poses = jnp.concatenate([jnp.eye(4)[None], chain_relative_poses(rel)])
        uv, z, vis = track_point(p, poses, K)
        assert np.isclose(float(z[1]), 8.0, atol=1e-4)
        assert np.allclose(np.asarray(uv[1]), [160, 120], atol=1e-3)
        d = distance_to_point(p, poses)
        assert np.allclose(np.asarray(d), [10.0, 8.0], atol=1e-4)


class TestPlotting:
    def test_plot_files_created(self, tmp_path, rng):
        poses = np.stack([np.eye(4)] * 20)
        poses[:, 2, 3] = np.arange(20)
        p1 = plot_trajectories(str(tmp_path / "traj.png"), poses, poses)
        p2 = plot_segment_errors(str(tmp_path / "seg.png"), {100: (0.03, 0.001)})
        img = rng.uniform(0, 255, (60, 80)).astype(np.float32)
        kp = rng.uniform(5, 55, (30, 2)).astype(np.float32)
        p3 = draw_matches(str(tmp_path / "m.png"), img, img, kp, kp, stride=3)
        p4 = draw_keypoints(str(tmp_path / "k.png"), img, kp)
        for p in (p1, p2, p3, p4):
            assert os.path.getsize(p) > 500


class TestProfiler:
    def test_stage_timer(self):
        t = StageTimer()
        with t.stage("a"):
            _ = sum(range(1000))
        out = t.timed("b", lambda: jnp.arange(8) * 2)
        assert np.allclose(np.asarray(out), np.arange(8) * 2)
        rep = t.report()
        assert "a" in rep and "b" in rep
