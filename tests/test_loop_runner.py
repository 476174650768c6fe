"""Loop closure, streaming pipeline, and the full vo_run CLI (--refine, viz)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vo_tpu.engine import VOConfig
from vo_tpu.engine.loop_closure import (LoopClosureConfig, detect_loop_closures,
                                        optimize_with_loops)
from vo_tpu.engine.pipeline import (extract_and_backproject, run_offline_vo,
                                    run_offline_vo_streaming)
from vo_tpu.estimation import PnPConfig
from vo_tpu.features import OrbLikeExtractor
from vo_tpu.geometry import so3_exp, pose_from_rt
from vo_tpu.utils.synthetic import render_sequence

K = np.array([[260.0, 0.0, 160.0], [0.0, 260.0, 120.0], [0.0, 0.0, 1.0]], np.float32)


@pytest.mark.slow
class TestLoopClosure:
    def test_closes_a_drifted_loop(self, rng):
        # Full circle: end of the trajectory revisits the start.
        F = 40
        imgs, deps, gt = render_sequence(F, K, H=240, W=320, step=0.8,
                                         yaw_rate=2 * np.pi / (F * 0.8))
        ex = OrbLikeExtractor(max_kp=512)
        feats, kp3d = extract_and_backproject(ex, jnp.asarray(imgs),
                                              jnp.asarray(deps), jnp.asarray(K))
        # Accumulated odometry drift.
        noisy = gt.copy()
        for i in range(1, F):
            rel = np.linalg.inv(gt[i - 1]) @ gt[i]
            dw = rng.normal(0, 0.004, 3).astype(np.float32)
            dt = rng.normal(0, 0.02, 3).astype(np.float32)
            dT = np.asarray(pose_from_rt(so3_exp(jnp.asarray(dw[None]))[0],
                                         jnp.asarray(dt)))
            noisy[i] = noisy[i - 1] @ (rel @ dT)

        kfs = np.arange(0, F, 3)
        cfg = LoopClosureConfig(min_gap=6, radius=8.0)
        edges = detect_loop_closures(kfs, noisy, feats.kp, feats.desc, feats.valid,
                                     kp3d, K, cfg)
        assert len(edges) >= 1, "revisit not detected"
        # every verified edge joins far-apart keyframes
        assert all(b - a >= cfg.min_gap for a, b, _, _ in edges)

        closed, info = optimize_with_loops(noisy, kfs, edges, cfg)
        e_before = np.linalg.norm(noisy[:, :3, 3] - gt[:, :3, 3], axis=1)
        e_after = np.linalg.norm(closed[:, :3, 3] - gt[:, :3, 3], axis=1)
        assert e_after[-1] < 0.5 * e_before[-1], (e_before[-1], e_after[-1])
        assert e_after.mean() < e_before.mean()

    def test_closed_loop_drive_end_to_end(self):
        """The bench's --refine workload at test scale: a closed-loop drive (out,
        U-turn, return lane, U-turn back — same-direction revisit), REAL VO, then
        loop closure. The revisit must be detected from the VO estimate and the
        pose graph must collapse the accumulated end drift."""
        from vo_tpu.engine.pipeline import run_offline_vo
        from vo_tpu.utils.synthetic import (default_world, depth_valid_fraction,
                                            loop_trajectory)

        traj = loop_trajectory(out_frames=40, turn_frames=56, step=0.8,
                               turn_step=0.22)
        F = len(traj)
        # The loop must actually close (same place, same heading).
        assert np.linalg.norm(traj[-1, :3, 3] - traj[0, :3, 3]) < 1.0
        assert np.allclose(traj[-1, :3, :3], traj[0, :3, :3], atol=0.1)
        imgs, deps, gt = render_sequence(
            F, K, H=240, W=320, traj=traj,
            world=default_world(half_width=14.0, fine_amp=1.0))
        # Close wall passes need the fine texture octaves to stay feature-rich.
        assert float(depth_valid_fraction(deps).min()) > 0.5

        cfg = VOConfig(matcher="ratio_binary", kf_min_matches=60,
                       kf_min_inliers=30,
                       pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
        poses, diag, (feats, kp3d) = run_offline_vo(
            imgs, deps, K, vo_config=cfg, extractor=OrbLikeExtractor(max_kp=512),
            return_features=True)
        assert np.mean(np.asarray(diag.accepted)) > 0.9

        from vo_tpu.engine.refine import _select_keyframes

        kfs = _select_keyframes(np.asarray(diag.promoted_keyframe), F)
        edges = detect_loop_closures(
            kfs, poses, feats.kp, feats.desc, feats.valid, kp3d, K,
            LoopClosureConfig(min_gap=8, radius=10.0))
        assert len(edges) >= 1, "same-direction revisit not detected"
        closed, _ = optimize_with_loops(poses, kfs, edges)
        drift_before = np.linalg.norm(poses[-1, :3, 3] - gt[-1, :3, 3])
        drift_after = np.linalg.norm(closed[-1, :3, 3] - gt[-1, :3, 3])
        assert drift_after < drift_before

        # The product pipeline (adaptive branch selection) must also close the
        # loop end-to-end and expose the two-trajectory contract.
        from vo_tpu.engine.refine import refine_full

        closed2, info = refine_full(poses, feats.kp, feats.desc, feats.valid,
                                    kp3d, K,
                                    diag_promoted=np.asarray(
                                        diag.promoted_keyframe))
        assert info["loop_edges"] >= 1
        assert "ran_ba" in info and "refined_odometry" in info
        drift_full = np.linalg.norm(closed2[-1, :3, 3] - gt[-1, :3, 3])
        assert drift_full < drift_before

    def test_non_revisiting_trajectory_proposes_no_candidates(self):
        """An oscillating forward drive never revisits: near-in-space pairs are also
        near-along-path, so the path-gap gate must yield ZERO candidates (short-range
        pseudo-loops at 20x weight measurably corrupt the pose graph)."""
        from vo_tpu.utils.synthetic import slalom_trajectory

        F = 200
        poses = slalom_trajectory(F, step=0.5)
        kfs = np.arange(0, F, 4)
        dummy = np.zeros((F, 4, 2), np.float32)   # untouched when no candidates
        edges = detect_loop_closures(
            kfs, poses, dummy, dummy, np.zeros((F, 4), bool),
            np.zeros((F, 4, 3), np.float32), K, LoopClosureConfig())
        assert edges == []

    def test_no_loops_is_identity(self, rng):
        F = 12
        _, _, gt = render_sequence(F, K, H=120, W=160, step=0.8)
        kfs = np.arange(0, F, 3)
        out, info = optimize_with_loops(gt.astype(np.float32), kfs, [],
                                        LoopClosureConfig())
        assert info["n_loop_edges"] == 0
        assert np.allclose(out, gt, atol=1e-3)


class TestStreamingPipeline:
    @pytest.mark.slow
    def test_matches_in_memory_path(self):
        F = 10
        imgs, deps, gt = render_sequence(F, K, H=240, W=320, step=0.8)
        cfg = VOConfig(matcher="ratio_binary", kf_min_matches=60, kf_min_inliers=30,
                       pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
        ex = OrbLikeExtractor(max_kp=512)
        poses_mem, diag_mem = run_offline_vo(imgs, deps, K, vo_config=cfg,
                                             extractor=ex)

        def batches(B=4):
            for s in range(0, F, B):
                idx = np.arange(s, min(s + B, F))
                idx = np.concatenate([idx, np.full(B - len(idx), F - 1)])
                yield s, imgs[idx], deps[idx]

        poses_st, diag_st, (feats, kp3d, rows) = run_offline_vo_streaming(
            batches(), F, K, vo_config=cfg, extractor=ex)
        assert np.allclose(poses_mem, poses_st, atol=1e-4)
        assert feats.kp.shape[0] == F and kp3d.shape[0] == F
        assert np.array_equal(rows, np.arange(F))

    @pytest.mark.slow
    def test_sparse_retention_keeps_keyframes(self):
        """retain='sparse' keeps promoted keyframes + every 4th frame + endpoints,
        and the kept rows carry the same features as the full run."""
        F = 10
        imgs, deps, _ = render_sequence(F, K, H=240, W=320, step=0.8)
        cfg = VOConfig(matcher="ratio_binary", kf_min_matches=60, kf_min_inliers=30,
                       pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
        ex = OrbLikeExtractor(max_kp=512)

        def batches(B=4):
            for s in range(0, F, B):
                idx = np.arange(s, min(s + B, F))
                idx = np.concatenate([idx, np.full(B - len(idx), F - 1)])
                yield s, imgs[idx], deps[idx]

        poses_full, diag, (feats_f, kp3d_f, _) = run_offline_vo_streaming(
            batches(), F, K, vo_config=cfg, extractor=ex)
        poses_sp, diag_sp, (feats_s, kp3d_s, rows) = run_offline_vo_streaming(
            batches(), F, K, vo_config=cfg, extractor=ex, retain="sparse")
        np.testing.assert_allclose(poses_full, poses_sp, atol=1e-5)

        promoted = np.nonzero(np.asarray(diag.promoted_keyframe))[0] + 1
        expected = np.unique(np.concatenate(
            [np.arange(0, F, 4), promoted, [F - 1]]))
        assert np.array_equal(rows, expected)
        assert feats_s.kp.shape[0] == len(rows) < F
        np.testing.assert_array_equal(np.asarray(feats_s.kp),
                                      np.asarray(feats_f.kp)[rows])
        np.testing.assert_array_equal(np.asarray(kp3d_s), np.asarray(kp3d_f)[rows])

        # The product refinement must run on the sparse retention (feat_rows
        # path through the batched pair matchers + loop detection) and return a
        # finite trajectory of the right shape.
        from vo_tpu.engine.refine import refine_full

        closed, info = refine_full(poses_sp, feats_s.kp, feats_s.desc,
                                   feats_s.valid, kp3d_s, K,
                                   diag_promoted=np.asarray(
                                       diag_sp.promoted_keyframe),
                                   feat_rows=rows)
        assert closed.shape == (F, 4, 4) and np.isfinite(closed).all()
        assert "refined_odometry" in info

    def test_uint16mm_depth_transfer_matches_f32(self):
        """The reduced-bandwidth mm-quantized depth transfer must reproduce the f32
        trajectory to quantization tolerance (<= 0.5 mm per depth sample)."""
        F = 10
        imgs, deps, _ = render_sequence(F, K, H=240, W=320, step=0.8)
        cfg = VOConfig(matcher="ratio_binary", kf_min_matches=60, kf_min_inliers=30,
                       pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
        ex = OrbLikeExtractor(max_kp=512)

        def batches(B=4):
            for s in range(0, F, B):
                idx = np.arange(s, min(s + B, F))
                idx = np.concatenate([idx, np.full(B - len(idx), F - 1)])
                yield s, imgs[idx], deps[idx]

        poses_f32, _, _ = run_offline_vo_streaming(
            batches(), F, K, vo_config=cfg, extractor=ex)
        poses_mm, _, _ = run_offline_vo_streaming(
            batches(), F, K, vo_config=cfg, extractor=ex,
            transfer_depth="uint16mm")
        np.testing.assert_allclose(poses_mm[:, :3, 3], poses_f32[:, :3, 3],
                                   atol=5e-2)
        np.testing.assert_allclose(poses_mm[:, :3, :3], poses_f32[:, :3, :3],
                                   atol=5e-3)

    def test_sparse_depth_transfer_matches_uint16mm(self):
        """transfer_depth="sparse" (host-side keypoint depth gather, ~230x fewer
        depth bytes over the link) must reproduce the uint16mm trajectory: the
        gather is the same truncate-clip-int lookup as depth_to_3d_at and the mm
        quantization is identical."""
        F = 10
        imgs, deps, _ = render_sequence(F, K, H=240, W=320, step=0.8)
        cfg = VOConfig(matcher="ratio_binary", kf_min_matches=60, kf_min_inliers=30,
                       pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
        ex = OrbLikeExtractor(max_kp=512)

        def batches(depth_u16=False, B=4):
            for s in range(0, F, B):
                idx = np.arange(s, min(s + B, F))
                idx = np.concatenate([idx, np.full(B - len(idx), F - 1)])
                d = deps[idx]
                if depth_u16:  # loaders may hand sparse mode raw u16-mm maps
                    d = np.round(np.clip(d, 0, 65.535) * 1000).astype(np.uint16)
                yield s, imgs[idx], d

        poses_mm, _, _ = run_offline_vo_streaming(
            batches(), F, K, vo_config=cfg, extractor=ex,
            transfer_depth="uint16mm")
        for depth_u16 in (False, True):
            poses_sp, _, _ = run_offline_vo_streaming(
                batches(depth_u16), F, K, vo_config=cfg, extractor=ex,
                transfer_depth="sparse")
            np.testing.assert_allclose(poses_sp, poses_mm, atol=1e-5)

    def test_decode_error_propagates(self):
        def bad_batches():
            raise RuntimeError("decode exploded")
            yield  # pragma: no cover

        with pytest.raises(RuntimeError, match="decode exploded"):
            run_offline_vo_streaming(bad_batches(), 4, K)

    def test_checkpoint_resume_matches_uninterrupted(self, tmp_path):
        """Mid-run VO checkpoint/resume: resuming from frame ~F/2 must reproduce the
        uninterrupted trajectory exactly (the scan carry IS the full state)."""
        F, B = 12, 4
        imgs, deps, _ = render_sequence(F, K, H=240, W=320, step=0.8)
        cfg = VOConfig(matcher="ratio_binary", kf_min_matches=60, kf_min_inliers=30,
                       pnp=PnPConfig(min_inliers=15, n_hypotheses=256))
        ex = OrbLikeExtractor(max_kp=512)

        def batches(upto=F):
            for s in range(0, upto, B):
                idx = np.arange(s, min(s + B, F))
                idx = np.concatenate([idx, np.full(B - len(idx), F - 1)])
                yield s, imgs[idx], deps[idx]

        ckpt = str(tmp_path / "vo.ckpt.npz")
        full, diag_full, _ = run_offline_vo_streaming(
            batches(), F, K, vo_config=cfg, extractor=ex)

        # Interrupted run: only the first 2 batches (8 frames), checkpoint every 4.
        run_offline_vo_streaming(batches(upto=8), 8, K, vo_config=cfg, extractor=ex,
                                 checkpoint_path=ckpt, checkpoint_every=4)
        from vo_tpu.engine.pipeline import load_vo_checkpoint

        nf, poses_done, state = load_vo_checkpoint(ckpt)
        assert nf == 8 and poses_done.shape == (8, 4, 4)

        resumed, diag_res, _ = run_offline_vo_streaming(
            batches(), F, K, vo_config=cfg, extractor=ex, resume_from=ckpt)
        assert resumed.shape == full.shape
        np.testing.assert_allclose(resumed, full, atol=1e-5)
        assert diag_res.accepted.shape == diag_full.accepted.shape


class TestTrainCheckpoint:
    def test_npz_roundtrip_and_mismatch_guard(self, tmp_path):
        from vo_tpu.models.patchnet import FAST_QUAD_L2NET_CONFCFS
        from vo_tpu.train import (TrainConfig, create_train_state,
                                  load_checkpoint, save_checkpoint)

        cfg = TrainConfig(batch=2, height=64, width=64)
        spec = FAST_QUAD_L2NET_CONFCFS
        state = create_train_state(spec, cfg)
        p = str(tmp_path / "t.ckpt")
        save_checkpoint(p, state, spec.name)
        back = load_checkpoint(p, create_train_state(spec, cfg))
        flat_a, _ = __import__("jax").tree.flatten(state)
        flat_b, _ = __import__("jax").tree.flatten(back)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # template/tree mismatch must raise, not silently mis-assign
        bad_template = create_train_state(spec, cfg)._replace(step=None)
        with pytest.raises(ValueError, match="tree mismatch"):
            load_checkpoint(p, bad_template)


def _write_sequence_dir(tmp_path, imgs, deps):
    from PIL import Image

    for i, (im, dp) in enumerate(zip(imgs, deps)):
        rgb = np.stack([np.clip(im, 0, 255).astype(np.uint8)] * 3, -1)
        Image.fromarray(rgb).save(tmp_path / f"{i:06d}.png")
        np.save(tmp_path / f"{i:06d}_depth.npy", dp)


class TestRunnerCLI:
    @pytest.mark.slow
    def test_vo_run_with_refine_and_viz(self, tmp_path):
        from vo_tpu.runners import vo_run

        F = 14
        imgs, deps, gt = render_sequence(F, K, H=240, W=320, step=0.8)
        seq_dir = tmp_path / "seq"
        seq_dir.mkdir()
        _write_sequence_dir(seq_dir, imgs, deps)

        out = tmp_path / "poses"
        cfg_yaml = tmp_path / "cfg.yaml"
        cfg_yaml.write_text(
            f"""
feature_extractor: orb
image_path: {seq_dir}
camera_intrinsic_matrix: [260.0, 0.0, 160.0, 0.0, 260.0, 120.0, 0.0, 0.0, 1.0]
output_filename: {out}
visualize_results: true
max_keypoints: 512
extraction_batch: 8
kf_min_matches: 60
kf_min_inliers: 30
pnp_min_inliers: 15
pnp_n_hypotheses: 256
""")
        rc = vo_run.main(["--config", str(cfg_yaml), "--refine"])
        assert rc == 0
        poses = np.load(str(out) + ".npy")
        assert poses.shape == (F, 4, 4)
        # sparse retention must produce an equally sane refined trajectory
        rc = vo_run.main(["--config", str(cfg_yaml), "--refine",
                          "--retain", "sparse"])
        assert rc == 0
        poses_sp = np.load(str(out) + ".npy")
        err_sp = np.linalg.norm(poses_sp[:, :3, 3] - gt[:, :3, 3], axis=1)
        total_d = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
        assert err_sp[-1] < 0.1 * total_d
        # trajectory still sane after refinement
        err = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
        total = np.linalg.norm(np.diff(gt[:, :3, 3], axis=0), axis=1).sum()
        assert err[-1] < 0.1 * total
        # visualize_results wrote the reference-style overlays
        viz = tmp_path / "poses_viz"
        names = {p.name for p in viz.iterdir()}
        assert "trajectory.png" in names
        assert any(n.startswith("kps_") for n in names)
        assert any(n.startswith("matches_") for n in names)
