"""Offline RGB-D VO runner — the counterpart of the reference's ``vo_runner.py``.

Usage:
    python -m vo_tpu.runners.vo_run --config config/vo_params.yaml
    python -m vo_tpu.runners.vo_run --config cfg.yaml --eval      # also score vs GT
    python -m vo_tpu.runners.vo_run --config cfg.yaml --refine    # BA + pose graph

Reads *.png + *_depth.npy pairs from ``image_path`` (vo_stereo_runner.py:38-39 contract)
streaming in fixed-size batches — decode (native C++ prefetcher when built, PIL
otherwise) overlaps device compute and peak RAM is O(batch), not O(sequence). Writes
``<output_filename>.npy`` (stacked 4x4 poses, vo_stereo_runner.py:60), optionally
BA+PGO-refines the trajectory (--refine; capability the reference lacks), renders the
reference's ``visualize_results`` overlays (VisualOdometry_Stereo.py:162-178), and
optionally evaluates against ``gt_txt_file_path``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

from vo_tpu.config import RunConfig
from vo_tpu.engine.pipeline import run_offline_vo_streaming
from vo_tpu.evalkit import KittiOdomEvaluator
from vo_tpu.evalkit.kitti import load_poses_txt
from vo_tpu.features.extractor import OrbLikeExtractor
from vo_tpu.io.dataset import RGBDSequence
from vo_tpu.io.poses import kitti_gt_to_modified_txt, save_poses_npy


def build_extractor(cfg: RunConfig):
    classic = {"orb": dict(response="harris", descriptor="brief"),
               "sift": dict(response="dog", descriptor="gradhist"),
               "surf": dict(response="hessian", descriptor="surf")}
    if cfg.feature_extractor in classic:
        kw = classic[cfg.feature_extractor]
        if cfg.octaves > 1:
            from vo_tpu.features.pyramid import MultiScaleClassicExtractor

            return MultiScaleClassicExtractor(
                max_kp=cfg.max_keypoints, n_scales=cfg.octaves,
                oriented=cfg.oriented, **kw)
        if cfg.feature_extractor == "orb":
            return OrbLikeExtractor(max_kp=cfg.max_keypoints)
        return OrbLikeExtractor(max_kp=cfg.max_keypoints, **kw)
    if cfg.feature_extractor == "r2d2":
        from vo_tpu.models.r2d2_extractor import R2D2Extractor

        return R2D2Extractor.from_pretrained(max_kp=cfg.max_keypoints)
    raise ValueError(f"unknown feature_extractor {cfg.feature_extractor!r}")


def refine_poses(poses, feats, kp3d, K, diag, feat_rows=None,
                 save_odometry=None):
    """BA-refine keyframe windows, then close loops with a pose graph.

    The north-star layer the reference lacks (it chains poses open-loop,
    VisualOdometry_Stereo.py:283,292). ``feat_rows`` maps feature rows to frame ids
    when the streaming run retained features sparsely."""
    from vo_tpu.engine.refine import refine_full

    closed, info = refine_full(
        poses, feats.kp, feats.desc, feats.valid, kp3d, K,
        diag_promoted=np.asarray(diag.promoted_keyframe), feat_rows=feat_rows)
    lc = info["pgo"]
    if info["ran_ba"]:
        print(f"[refine] heading drift {info['loop_rot_disc_deg']:.2f} deg -> "
              f"rotation-only BA over {len(info['ba']['windows'])} windows, "
              f"{len(info['keyframes'])} keyframes")
    else:
        print(f"[refine] heading drift {info['loop_rot_disc_deg']:.2f} deg "
              f"(healthy) -> BA skipped, isotropic closure")
    print(f"[refine] pose graph: {lc['n_loop_edges']} loop edges, "
          f"cost {lc['pgo_cost'][0]:.4f} -> {lc['pgo_cost'][-1]:.4f}")
    if save_odometry:
        save_poses_npy(save_odometry, info["refined_odometry"])
        print(f"[refine] odometry-stage trajectory -> {save_odometry}")
    return closed


def write_visualizations(out_dir, image_path, feats, vo_cfg, poses, gt=None,
                         stride: int = 1, max_frames: int = 400, feat_rows=None):
    """The reference's visualize_results overlays (VisualOdometry_Stereo.py:162-178):
    per-frame keypoint draws + consecutive-frame match overlays + trajectory plot.
    Frames are re-read lazily (the streaming run keeps no pixels in memory). With
    sparse feature retention, ``feat_rows`` names the frames that still have features;
    overlays cover those."""
    from vo_tpu.evalkit.plotting import (draw_keypoints, draw_matches,
                                         plot_trajectories)
    from vo_tpu.matching.matchers import ratio_match, ratio_mutual_nn_match

    os.makedirs(out_dir, exist_ok=True)
    plot_trajectories(os.path.join(out_dir, "trajectory.png"), poses, gt=gt)

    seq = RGBDSequence.from_dir(image_path)
    if feat_rows is None:
        frames = np.arange(min(len(seq), feats.kp.shape[0], max_frames))[::stride]
        rows = frames
    else:
        keep = np.asarray(feat_rows) < min(len(seq), max_frames)
        rows = np.nonzero(keep)[0][::stride]
        frames = np.asarray(feat_rows)[rows]
    binary = vo_cfg.matcher == "ratio_binary"
    prev = None
    for r, i in zip(rows, frames):
        r, i = int(r), int(i)
        img, _ = seq[i]
        draw_keypoints(os.path.join(out_dir, f"kps_{i:06d}.png"),
                       img, np.asarray(feats.kp[r]), np.asarray(feats.valid[r]))
        if prev is not None:
            rj, j, pimg = prev
            if binary:
                m = ratio_match(feats.desc[rj], feats.desc[r], feats.valid[rj],
                                feats.valid[r], ratio=vo_cfg.ratio,
                                binary_dim=feats.desc.shape[-1])
            else:
                m = ratio_mutual_nn_match(feats.desc[rj], feats.desc[r],
                                          feats.valid[rj], feats.valid[r],
                                          ratio=vo_cfg.ratio)
            mask = np.asarray(m.mask)
            kp1 = np.asarray(feats.kp[rj])[mask]
            kp2 = np.asarray(feats.kp[r])[np.asarray(m.idx)[mask]]
            draw_matches(os.path.join(out_dir, f"matches_{j:06d}_{i:06d}.png"),
                         pimg, img, kp1, kp2, stride=max(len(kp1) // 80, 1))
        prev = (r, i, img)
    print(f"[viz] wrote overlays for {len(frames)} frames to {out_dir}/")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--eval", action="store_true", help="score against gt_txt_file_path")
    ap.add_argument("--refine", action="store_true",
                    help="windowed BA + loop-closure pose graph on the trajectory")
    ap.add_argument("--save-odometry", default=None, metavar="PATH",
                    help="with --refine: also write the odometry-accurate stage "
                         "(rotation-only BA, before loop closure) as PATH.npy — "
                         "the closed output trades some 100 m segment accuracy "
                         "for global consistency (docs/PERF.md)")
    ap.add_argument("--limit", type=int, default=0, help="process only the first N frames")
    ap.add_argument("--checkpoint", default=None,
                    help="mid-run checkpoint path (poses-so-far + engine state)")
    ap.add_argument("--checkpoint-every", type=int, default=256,
                    help="frames between mid-run checkpoints")
    ap.add_argument("--resume", default=None,
                    help="resume a long run from a --checkpoint file")
    ap.add_argument("--retain", choices=("all", "sparse"), default="all",
                    help="feature retention: 'sparse' keeps only keyframes + every "
                         "4th frame so --refine runs in bounded memory on long runs")
    ap.add_argument("--depth-transfer",
                    choices=("float32", "uint16mm", "sparse"),
                    default="float32",
                    help="host->device depth format: 'uint16mm' halves link bytes "
                         "(1 mm quantization, clamps beyond 65.5 m — fine for any "
                         "depth gate <= 65 m); 'sparse' never ships the depth map "
                         "at all — keypoint pixels come back and only their depths "
                         "go up (~230x fewer depth bytes, same mm quantization)")
    args = ap.parse_args(argv)

    cfg = RunConfig.from_yaml(args.config)
    K = cfg.camera_intrinsic_matrix

    # Prefer the native C++ decode+prefetch loader when built (native/vo_loader.cpp);
    # fall back to the PIL-based reader. Both stream fixed-size padded batches.
    from vo_tpu.io.native import NativeRGBDSequence

    nat = NativeRGBDSequence.try_open(cfg.image_path) if cfg.image_path else None
    if nat is not None:
        n = min(len(nat), args.limit) if args.limit else len(nat)
        batches = nat.iter_batches(
            cfg.extraction_batch, limit=n,
            gray=args.depth_transfer == "sparse",
            depth="u16mm" if args.depth_transfer == "sparse" else "f32")
        loader = "native"
    else:
        seq = RGBDSequence.from_dir(cfg.image_path)
        n = min(len(seq), args.limit) if args.limit else len(seq)
        batches = seq.iter_batches(cfg.extraction_batch, limit=n)
        loader = "pil"
    if n == 0:
        print(f"no (*.png, *_depth.npy) pairs under {cfg.image_path!r}",
              file=sys.stderr)
        return 2
    print(f"[vo_tpu] {n} frames from {cfg.image_path} "
          f"({loader} loader, streaming batches of {cfg.extraction_batch})")

    extractor = build_extractor(cfg)
    t0 = time.time()
    poses, diag, (feats, kp3d, feat_rows) = run_offline_vo_streaming(
        batches, n, K, vo_config=cfg.vo, extractor=extractor,
        checkpoint_path=args.checkpoint, checkpoint_every=args.checkpoint_every,
        resume_from=args.resume, retain=args.retain,
        transfer_depth=args.depth_transfer)
    dt = time.time() - t0
    if nat is not None:
        nat.close()
    print(f"[vo_tpu] {n} frames in {dt:.2f}s = {n / dt:.1f} fps io-included "
          f"(accept rate {np.mean(diag.accepted):.2f}, "
          f"mean inliers {np.mean(diag.n_inliers):.0f})")

    if args.refine:
        t1 = time.time()
        poses = refine_poses(poses, feats, kp3d, K, diag,
                             feat_rows=None if args.retain == "all" else feat_rows,
                             save_odometry=args.save_odometry)
        print(f"[refine] done in {time.time() - t1:.2f}s")

    out = cfg.output_filename
    save_poses_npy(out, poses)
    print(f"[vo_tpu] wrote {out}.npy" if not out.endswith(".npy") else f"[vo_tpu] wrote {out}")

    gt = None
    if cfg.gt_txt_file_path:
        mod = kitti_gt_to_modified_txt(cfg.gt_txt_file_path)
        gt = load_poses_txt(mod)

    if cfg.visualize_results:
        viz_dir = (out[:-4] if out.endswith(".npy") else out) + "_viz"
        write_visualizations(viz_dir, cfg.image_path, feats, cfg.vo, poses, gt=gt,
                             feat_rows=None if args.retain == "all" else feat_rows)

    if args.eval and gt is not None:
        res = KittiOdomEvaluator().evaluate(gt, poses)
        print(f"[eval] seg trans {res.seg_trans_err_pct:.2f}%  "
              f"seg rot {res.seg_rot_err_deg_per_100m:.3f} deg/100m  "
              f"ATE/dist {res.ate_over_dist:.2f}  RPE {res.rpe_trans:.4f}  "
              f"rot/dist {res.rpe_rot_over_dist:.4f}  dist {res.total_distance:.1f} m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
