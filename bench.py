"""Benchmark: full RGB-D VO pipeline throughput on one chip, KITTI-sized frames.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}.

Workload: 160 synthetic KITTI-resolution (376 x 1232) RGB-D frames (128 m path) through
the complete pipeline — batched Harris+BRIEF extraction (2048-kp budget), keypoint
back-projection, and the scan engine (fused Pallas match kernel + 512-hypothesis
PnP-RANSAC + keyframe state machine).

Three timings are reported:
  - value / fps_compute: device pipeline fps, frames pre-staged in HBM (one warm-up
    compile excluded);
  - per-stage extract/engine ms per frame;
  - fps_io_included: the streaming runner reading png+npy pairs from disk through the
    double-buffered loader (decode overlaps compute) — the honest end-to-end number;
  - r2d2_extract_fps: the learned-extractor (Fast_Quad ConfCFS CNN) extraction rate.

Accuracy gate: the trajectory is scored with the reference's own KITTI evaluator
(segment translation % over 100 m segments) — not a loose drift bool. The reference's
own committed KITTI-03 run scores 3.37 % (BASELINE.md); the gate here is < 1.5 % on the
easier synthetic world plus accept-rate > 0.8.

Baseline: the reference publishes no frames/s (BASELINE.md); its per-frame wall-clock
prints put the R2D2 pipeline around ~10 fps on the authors' GPU. vs_baseline is
fps / 10.0 against that estimate; the build target is >10x (BASELINE.json).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

F, H, W = 160, 376, 1232
EXTRACT_BATCH = 16
STEP = 0.8
K = np.array([[721.53, 0.0, 609.55], [0.0, 721.53, 172.85], [0.0, 0.0, 1.0]],
             np.float32)


def _sequence():
    from vo_tpu.utils.synthetic import render_sequence

    cache = f"/tmp/vo_tpu_bench_seq_{F}x{H}x{W}.npz"
    try:
        blob = np.load(cache)
        return blob["imgs"], blob["deps"], blob["gt"]
    except Exception:
        imgs, deps, gt = render_sequence(F, K, H=H, W=W, step=STEP, yaw_rate=0.004)
        np.savez_compressed(cache, imgs=imgs, deps=deps, gt=gt)
        return imgs, deps, gt


def _sequence_dir(imgs, deps) -> str:
    """Materialize the sequence as (*.png, *_depth.npy) pairs for the IO-included run."""
    d = f"/tmp/vo_tpu_bench_dir_{F}x{H}x{W}"
    marker = os.path.join(d, ".complete")
    if not os.path.exists(marker):
        from PIL import Image

        os.makedirs(d, exist_ok=True)
        for i in range(F):
            rgb = np.stack([np.clip(imgs[i], 0, 255).astype(np.uint8)] * 3, -1)
            Image.fromarray(rgb).save(os.path.join(d, f"{i:06d}.png"))
            np.save(os.path.join(d, f"{i:06d}_depth.npy"), deps[i])
        open(marker, "w").close()
    return d


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vo_tpu.engine.pipeline import extract_and_backproject, run_offline_vo_streaming
    from vo_tpu.engine.vo import VOConfig, VOEngine
    from vo_tpu.estimation.pnp import PnPConfig
    from vo_tpu.evalkit import KittiOdomEvaluator
    from vo_tpu.features.extractor import OrbLikeExtractor

    imgs, deps, gt = _sequence()

    extractor = OrbLikeExtractor(max_kp=2048)
    vo_cfg = VOConfig(matcher="ratio_binary", pnp=PnPConfig(n_hypotheses=512))
    engine = VOEngine(vo_cfg)
    Kj = jnp.asarray(K)

    # Pre-stage frames on device for the compute-only figure (the dev-tunnel's
    # ~0.2 GB/s host link is not representative of a real host's DMA path; the honest
    # IO-included number below streams from disk through the real loader instead).
    imgs_d = jnp.asarray(imgs)
    deps_d = jnp.asarray(deps)

    def extract_all():
        feats_chunks, kp3d_chunks = [], []
        for s in range(0, F, EXTRACT_BATCH):
            f, k3 = extract_and_backproject(
                extractor, imgs_d[s:s + EXTRACT_BATCH], deps_d[s:s + EXTRACT_BATCH], Kj)
            feats_chunks.append(f)
            kp3d_chunks.append(k3)
        kp = jnp.concatenate([f.kp for f in feats_chunks])
        desc = jnp.concatenate([f.desc for f in feats_chunks])
        valid = jnp.concatenate([f.valid for f in feats_chunks])
        kp3d = jnp.concatenate(kp3d_chunks)
        return kp, desc, valid, kp3d

    def force(*arrays):
        # np.asarray of a scalar reduction forces full materialization
        # (block_until_ready can return early on the tunnel backend).
        return [np.asarray(jnp.sum(a[..., -1])) for a in arrays]

    # Warm-up (compile both stages) + correctness artifacts.
    kp, desc, valid, kp3d = extract_all()
    poses_j, diag = engine.run_sequence(kp, desc, valid, kp3d, Kj)
    poses = np.asarray(poses_j)

    # Timed, per stage.
    t_ex, t_en, t_full = [], [], []
    for _ in range(3):
        t0 = time.perf_counter()
        kp, desc, valid, kp3d = extract_all()
        force(kp, desc, kp3d)
        t1 = time.perf_counter()
        poses_j, diag = engine.run_sequence(kp, desc, valid, kp3d, Kj)
        np.asarray(poses_j)
        t2 = time.perf_counter()
        t_ex.append(t1 - t0)
        t_en.append(t2 - t1)
        t_full.append(t2 - t0)
    dt = min(t_full)
    fps = F / dt

    # Accuracy gate: reference's own evaluator, segment translation % (100 m segments
    # exist on this 128 m path) — not a drift bool.
    res = KittiOdomEvaluator().evaluate(gt, poses)
    accept = float(np.mean(np.asarray(diag.accepted)))
    err_final = float(np.linalg.norm(poses[-1, :3, 3] - gt[-1, :3, 3]))
    sane = bool(res.seg_trans_err_pct < 1.5 and accept > 0.8)

    # IO-included: stream the on-disk sequence through the real loader stack.
    seq_dir = _sequence_dir(imgs, deps)
    from vo_tpu.io.dataset import RGBDSequence
    from vo_tpu.io.native import NativeRGBDSequence

    def io_run():
        nat = NativeRGBDSequence.try_open(seq_dir)
        if nat is not None:
            batches = nat.iter_batches(EXTRACT_BATCH)
            loader = "native"
        else:
            batches = RGBDSequence.from_dir(seq_dir).iter_batches(EXTRACT_BATCH)
            loader = "pil"
        t0 = time.perf_counter()
        p, _, _ = run_offline_vo_streaming(batches, F, K, vo_config=vo_cfg,
                                           extractor=extractor)
        dt = time.perf_counter() - t0
        if nat is not None:
            nat.close()
        return F / dt, loader

    io_run()                      # warm-up (rgb-input extraction compiles here)
    fps_io, loader = io_run()

    # Learned-extractor rate (R2D2-style CNN, ported weights).
    try:
        from vo_tpu.models.r2d2_extractor import R2D2Extractor

        r2d2 = R2D2Extractor.from_pretrained(max_kp=2048)
        x = imgs_d[:8]
        np.asarray(r2d2(x).valid.sum())          # compile
        t0 = time.perf_counter()
        for s in range(0, 32, 8):
            np.asarray(r2d2(imgs_d[s:s + 8]).valid.sum())
        r2d2_fps = 32 / (time.perf_counter() - t0)
    except Exception:
        r2d2_fps = None

    print(json.dumps({
        "metric": "vo_frames_per_sec_1chip",
        "value": round(fps, 2),
        "unit": "frames/s (376x1232 rgbd, 2048 kp, full pipeline)",
        "vs_baseline": round(fps / 10.0, 2),
        "trajectory_sane": sane,
        "seg_trans_err_pct": round(float(res.seg_trans_err_pct), 3),
        "seg_rot_err_deg_100m": round(float(res.seg_rot_err_deg_per_100m), 3),
        "final_drift_m": round(err_final, 3),
        "accept_rate": round(accept, 3),
        "extract_ms_per_frame": round(min(t_ex) / F * 1000, 3),
        "engine_ms_per_frame": round(min(t_en) / F * 1000, 3),
        "fps_io_included": round(fps_io, 2),
        "io_loader": loader,
        "r2d2_extract_fps": round(r2d2_fps, 2) if r2d2_fps else None,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
