"""Retrain-parity harness: does OUR training stack actually improve a from-scratch net?

The reference's training stack demonstrably reaches HPatches MMA@3 = 0.71 when
retrained (feature_extractors/r2d2/README.md:186-187, "a recent GPU", ~12 h). This
runner produces the same *kind* of evidence at session scale: train
Fast_Quad_L2Net_ConfCFS from a random init on a handful of real images through the
full real-image pipeline (random-window crop search loader + photometric transforms),
and score MMA@3 on the warp harness (evalkit/mma.py — the HPatches protocol on
homography-warped pairs) at init, during, and after training, alongside the ported
published weights on the identical harness.

    python -m vo_tpu.runners.retrain_parity --steps 3000 --out RETRAIN_PARITY.json

Three numbers come out (the round-2 verdict's bar): mma3_init (random net),
mma3_trained, mma3_ported (faster2d2_WASF_N16 through the same evaluator). All three
use the same threshold-free extractor settings (local maxima + top-k budget, no
rel/rep/score floors) so a half-trained net is scored by descriptor+detector quality,
not by whether its confidence heads cleared the deploy-time 0.7/0.85 bars.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import time

import jax
import numpy as np

_REFERENCE_IMGS = "/root/reference/feature_extractors/r2d2/imgs"


def load_eval_images(data_dir: str | None, H: int = 240, W: int = 320,
                     min_images: int = 16) -> np.ndarray:
    """(B, H, W) grayscale eval batch: every image in ``data_dir`` (center-cropped /
    resized), topped up with procedural textures to at least ``min_images`` — a
    4-image eval moves 2.5 points of MMA@3 per flipped match (r03 verdict), so the
    statistical floor is part of the harness contract."""
    paths = sorted(glob.glob(os.path.join(data_dir, "*.png")) +
                   glob.glob(os.path.join(data_dir, "*.jpg"))) if data_dir else []
    out = []
    if paths:
        from PIL import Image

        for p in paths:
            img = Image.open(p).convert("L")
            # Scale the short side to cover, then center-crop to (H, W).
            s = max(H / img.height, W / img.width)
            img = img.resize((int(round(img.width * s)), int(round(img.height * s))),
                             Image.BILINEAR)
            x0, y0 = (img.width - W) // 2, (img.height - H) // 2
            out.append(np.asarray(img.crop((x0, y0, x0 + W, y0 + H)), np.float32))
    if len(out) < min_images:
        from vo_tpu.train.pairs import procedural_texture

        extra = np.asarray(procedural_texture(jax.random.key(7),
                                              min_images - len(out), H, W))
        out.extend(np.asarray(e) for e in extra)
    return np.stack(out)


def mma3_of_params(spec, params, eval_images, max_kp: int = 1024,
                   seed: int = 3) -> dict:
    """MMA curve of a params pytree on the warp harness, threshold-free settings.

    Detections are ranked by the repeatability head alone (score_mode='rep'): the
    deploy-time rel*rep score collapses mid-training when the reliability head is
    still (correctly) near zero where descriptor AP is below the loss base — the
    r03 harness lost 116 -> 10 matches to exactly that, making its MMA ride on ~40
    total matches. Applied identically to init / trained / ported nets."""
    from vo_tpu.evalkit.mma import mma_on_warps
    from vo_tpu.models.r2d2_extractor import R2D2Extractor

    ex = R2D2Extractor.from_params(spec, params, max_kp=max_kp, rel_thr=0.0,
                                   rep_thr=0.0, score_thr=0.0, score_mode="rep")
    return mma_on_warps(ex, eval_images, jax.random.key(seed))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=160)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--data-dir", default=None,
                    help=f"image folder (default: {_REFERENCE_IMGS} if present)")
    ap.add_argument("--out", default="RETRAIN_PARITY.json")
    ap.add_argument("--skip-ported", action="store_true")
    ap.add_argument("--sampler", choices=("grid", "ngh"), default="ngh",
                    help="AP-loss sampler; ngh = NghSampler2-style ring "
                         "positives/negatives + distractors (sampler.py:252-382)")
    ap.add_argument("--lr-schedule", choices=("const", "cosine"), default="cosine")
    args = ap.parse_args(argv)

    data_dir = args.data_dir
    if data_dir is None and os.path.isdir(_REFERENCE_IMGS):
        data_dir = _REFERENCE_IMGS

    import jax.numpy as jnp

    from vo_tpu.models.patchnet import FAST_QUAD_L2NET_CONFCFS
    from vo_tpu.train import TrainConfig, create_train_state, train_step_batch
    from vo_tpu.train.datasets import (CatPairs, ImageFolder, RandomWindowPairLoader,
                                       StillPairs, SyntheticHomographyPairs,
                                       WindowLoaderConfig)
    from vo_tpu.train.pairs import photometric_augment_batch

    spec = FAST_QUAD_L2NET_CONFCFS
    cfg = TrainConfig(batch=args.batch, height=args.crop, width=args.crop, lr=args.lr,
                      sampler=args.sampler, lr_schedule=args.lr_schedule,
                      total_steps=args.steps, warmup_steps=min(200, args.steps // 10))
    eval_images = load_eval_images(data_dir)
    print(f"[parity] eval batch {eval_images.shape}, data_dir={data_dir}")

    report: dict = {"steps": args.steps, "batch": args.batch, "crop": args.crop,
                    "lr": args.lr, "arch": spec.name, "data_dir": data_dir,
                    "sampler": args.sampler, "lr_schedule": args.lr_schedule,
                    "eval_images": int(eval_images.shape[0]), "curve": []}

    # Ported published weights through the identical harness (the 0.6+ yardstick).
    if not args.skip_ported:
        try:
            from vo_tpu.models.port_weights import load_pretrained

            pspec, pparams = load_pretrained("faster2d2_WASF_N16")
            ported = mma3_of_params(pspec, pparams, eval_images)
            report["mma3_ported"] = ported["mma@3"]
            report["mma3_ported_std"] = ported.get("mma@3_std")
            report["ported_mean_matches"] = ported["mean_matches"]
            print(f"[parity] ported faster2d2_WASF_N16: mma@3 {ported['mma@3']:.3f} "
                  f"({ported['mean_matches']:.0f} matches)")
        except Exception as e:  # pragma: no cover - missing reference checkout
            print(f"[parity] ported weights unavailable: {e!r}")
            report["mma3_ported"] = None

    state = create_train_state(spec, cfg)
    init = mma3_of_params(spec, state.params, eval_images)
    report["mma3_init"] = init["mma@3"]
    report["init_mean_matches"] = init["mean_matches"]
    print(f"[parity] random init: mma@3 {init['mma@3']:.3f} "
          f"({init['mean_matches']:.0f} matches)")

    if data_dir:
        import queue
        import threading

        folder = ImageFolder(data_dir)
        loader = RandomWindowPairLoader(
            CatPairs(StillPairs(folder, 480), SyntheticHomographyPairs(folder, 480)),
            WindowLoaderConfig(crop=args.crop, seed=cfg.seed))

        bq: "queue.Queue" = queue.Queue(maxsize=4)
        perr: list = []

        def producer():
            """Same catch-and-reraise contract as the streaming runner
            (engine/pipeline.py producer): a loader crash surfaces in the train
            loop instead of deadlocking the main thread at bq.get forever."""
            try:
                for _ in range(args.steps):
                    bq.put(loader.batch(cfg.batch))
            except BaseException as e:
                perr.append(e)
                bq.put(None)  # sentinel wakes a blocked consumer

        threading.Thread(target=producer, daemon=True).start()

        def get_batch():
            item = bq.get()
            if item is None:
                raise RuntimeError("training pair loader died") from (
                    perr[0] if perr else None)
            return item
    else:
        from vo_tpu.train.pairs import synthetic_pair_batch

        def get_batch(_k=[jax.random.key(11)]):
            _k[0], sub = jax.random.split(_k[0])
            return synthetic_pair_batch(sub, cfg.batch, cfg.height, cfg.width)

    key = jax.random.key(cfg.seed)
    t0 = time.time()
    for i in range(1, args.steps + 1):
        key, sub = jax.random.split(key)
        img1, img2, aflow, mask = get_batch()
        img2 = photometric_augment_batch(sub, jnp.asarray(img2))
        batch = (jnp.asarray(img1), img2, jnp.asarray(aflow), jnp.asarray(mask))
        state, metrics = train_step_batch(state, batch, spec, cfg)
        if i % args.eval_every == 0 or i == args.steps:
            m = mma3_of_params(spec, state.params, eval_images)
            rate = i * cfg.batch / (time.time() - t0)
            report["curve"].append({"step": i, "mma3": m["mma@3"],
                                    "mma3_std": m.get("mma@3_std"),
                                    "mma3_per_pair": m.get("mma@3_per_pair"),
                                    "mean_matches": m["mean_matches"],
                                    "matches_per_pair": m.get("matches_per_pair"),
                                    "loss": float(metrics["total"])})
            print(f"[parity] step {i}: loss {float(metrics['total']):.4f} "
                  f"mma@3 {m['mma@3']:.3f} ({m['mean_matches']:.0f} matches) "
                  f"| {rate:.1f} img/s")
            _write(report, args.out, t0)   # incremental: a killed run still reports

    _write(report, args.out, t0)   # unconditional: --steps 0 still writes a report
    trained = report.get("mma3_trained")
    print(f"[parity] wrote {args.out}: init {report['mma3_init']:.3f} -> "
          f"trained {trained if trained is None else f'{trained:.3f}'} "
          f"(ported {report.get('mma3_ported')})")
    return 0


def _write(report: dict, out: str, t0: float) -> None:
    last = report["curve"][-1] if report["curve"] else None
    report["mma3_trained"] = last["mma3"] if last else None
    report["mma3_trained_std"] = last.get("mma3_std") if last else None
    report["trained_mean_matches"] = last["mean_matches"] if last else None
    report["mma3_trained_best"] = (max(c["mma3"] for c in report["curve"])
                                   if report["curve"] else None)
    # Match-support gate (r03 verdict: MMA on ~10 matches/pair is not parity).
    report["match_support_ok"] = (bool(last["mean_matches"] >= 25.0)
                                  if last else None)
    report["score_mode"] = "rep"
    report["notes"] = (
        "detections ranked by the repeatability head (score_mode=rep) for ALL nets: "
        "deploy-time rel*rep collapses mid-training because the reliability head is "
        "driven to ~0 wherever descriptor AP < the loss base (the r03 116->10 match "
        "collapse); reliability is a matching confidence, not a detector")
    report["train_seconds"] = round(time.time() - t0, 1)
    report["device"] = str(jax.devices()[0])
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp, out)


if __name__ == "__main__":
    raise SystemExit(main())
