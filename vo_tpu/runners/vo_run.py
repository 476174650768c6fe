"""Offline RGB-D VO runner — the counterpart of the reference's ``vo_runner.py``.

Usage:
    python -m vo_tpu.runners.vo_run --config config/vo_params.yaml
    python -m vo_tpu.runners.vo_run --config cfg.yaml --eval   # also score vs GT

Reads *.png + *_depth.npy pairs from ``image_path`` (vo_stereo_runner.py:38-39 contract),
runs the batched TPU pipeline, writes ``<output_filename>.npy`` (stacked 4x4 poses, same
as vo_stereo_runner.py:60), and optionally evaluates against ``gt_txt_file_path``.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from vo_tpu.config import RunConfig
from vo_tpu.engine.pipeline import run_offline_vo
from vo_tpu.evalkit import KittiOdomEvaluator
from vo_tpu.evalkit.kitti import load_poses_txt
from vo_tpu.features.extractor import OrbLikeExtractor
from vo_tpu.io.dataset import RGBDSequence
from vo_tpu.io.poses import kitti_gt_to_modified_txt, save_poses_npy


def build_extractor(cfg: RunConfig):
    if cfg.feature_extractor == "orb":
        return OrbLikeExtractor(max_kp=cfg.max_keypoints)
    if cfg.feature_extractor == "sift":
        return OrbLikeExtractor(max_kp=cfg.max_keypoints, descriptor="gradhist")
    if cfg.feature_extractor == "surf":
        return OrbLikeExtractor(max_kp=cfg.max_keypoints, response="hessian",
                                descriptor="surf")
    if cfg.feature_extractor == "r2d2":
        from vo_tpu.models.r2d2_extractor import R2D2Extractor

        return R2D2Extractor.from_pretrained(max_kp=cfg.max_keypoints)
    raise ValueError(f"unknown feature_extractor {cfg.feature_extractor!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--eval", action="store_true", help="score against gt_txt_file_path")
    ap.add_argument("--limit", type=int, default=0, help="process only the first N frames")
    args = ap.parse_args(argv)

    cfg = RunConfig.from_yaml(args.config)

    # Prefer the native C++ decode+prefetch loader when built (native/vo_loader.cpp);
    # fall back to the PIL-based reader.
    from vo_tpu.io.native import NativeRGBDSequence

    nat = NativeRGBDSequence.try_open(cfg.image_path) if cfg.image_path else None
    if nat is not None:
        n = len(nat)
        if args.limit:
            n = min(n, args.limit)
        if n == 0:
            print(f"no (*.png, *_depth.npy) pairs under {cfg.image_path!r}",
                  file=sys.stderr)
            return 2
        print(f"[vo_tpu] {n} frames from {cfg.image_path} (native loader)")
        pairs = []
        for _ in range(n):
            pairs.append(nat.next_frame())
        nat.close()
        imgs = np.stack([p[0] for p in pairs])
        deps = np.stack([p[1] for p in pairs])
    else:
        seq = RGBDSequence.from_dir(cfg.image_path)
        n = len(seq)
        if args.limit:
            n = min(n, args.limit)
        if n == 0:
            print(f"no (*.png, *_depth.npy) pairs under {cfg.image_path!r}",
                  file=sys.stderr)
            return 2
        print(f"[vo_tpu] {n} frames from {cfg.image_path}")
        imgs, deps = zip(*(seq[i] for i in range(n)))
        imgs = np.stack(imgs)
        deps = np.stack(deps)

    extractor = build_extractor(cfg)
    t0 = time.time()
    poses, diag = run_offline_vo(
        imgs, deps, cfg.camera_intrinsic_matrix,
        vo_config=cfg.vo, extractor=extractor,
        extraction_batch=cfg.extraction_batch,
    )
    dt = time.time() - t0
    print(f"[vo_tpu] {n} frames in {dt:.2f}s = {n / dt:.1f} fps "
          f"(accept rate {np.mean(diag.accepted):.2f}, "
          f"mean inliers {np.mean(diag.n_inliers):.0f})")

    out = cfg.output_filename
    save_poses_npy(out, poses)
    print(f"[vo_tpu] wrote {out}.npy" if not out.endswith(".npy") else f"[vo_tpu] wrote {out}")

    if args.eval and cfg.gt_txt_file_path:
        mod = kitti_gt_to_modified_txt(cfg.gt_txt_file_path)
        gt = load_poses_txt(mod)
        res = KittiOdomEvaluator().evaluate(gt, poses)
        print(f"[eval] seg trans {res.seg_trans_err_pct:.2f}%  "
              f"seg rot {res.seg_rot_err_deg_per_100m:.3f} deg/100m  "
              f"ATE/dist {res.ate_over_dist:.2f}  RPE {res.rpe_trans:.4f}  "
              f"rot/dist {res.rpe_rot_over_dist:.4f}  dist {res.total_distance:.1f} m")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
