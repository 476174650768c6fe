"""Retrain-parity demonstration: MMA@3 must improve materially from a random init.

The reference's training stack demonstrably reaches MMA@3 = 0.71 when retrained
(feature_extractors/r2d2/README.md:186-187). This runner is the equivalent evidence
for the vo_tpu stack: train Fast_Quad ConfCFS FROM SCRATCH on real images through the
full product pipeline (ImageFolder -> Still+SyntheticHomography pairs ->
RandomWindowPairLoader crop search -> photometric transforms -> train_step_batch) and
score MMA@3 on the homography-warp harness (evalkit/mma.py, the HPatches protocol)
three ways: random init, after training, and the ported reference weights.

Usage:
    python -m vo_tpu.runners.retrain_parity --steps 800 --out RETRAIN_PARITY.json

Images: any folder of photos (--data-dir). Defaults to the reference's bundled
r2d2 demo images when present (read as *data*, nothing is copied), else falls back
to procedurally textured synthetic renders so the demo is self-contained.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _load_images(data_dir: str | None, max_side: int = 480) -> list[np.ndarray]:
    """Grayscale photos for training + eval. Reference demo images by default."""
    candidates = [data_dir] if data_dir else [
        "/root/reference/feature_extractors/r2d2/imgs",
    ]
    for d in candidates:
        if d and os.path.isdir(d):
            from vo_tpu.train.datasets import ImageFolder

            folder = ImageFolder(d)
            if len(folder):
                return [folder.load_gray(i, max_side=max_side)
                        for i in range(len(folder))]
    # Self-contained fallback: textured synthetic walls.
    from vo_tpu.utils.synthetic import default_world, render_rgbd

    K = np.array([[260.0, 0, 160.0], [0, 260.0, 120.0], [0, 0, 1.0]], np.float32)
    out = []
    for i in range(4):
        T = np.eye(4)
        T[:3, 3] = [0.0, 0.0, 3.0 * i]
        g, _ = render_rgbd(T, K, H=240, W=320, world=default_world(seed=91 + i))
        out.append(g.astype(np.float32))
    return out


def _eval_crops(images: list[np.ndarray], H: int = 240, W: int = 320) -> np.ndarray:
    """(B, H, W) center crops (padded if needed) for the MMA warp harness."""
    crops = []
    for g in images:
        gh, gw = g.shape
        if gh < H or gw < W:
            g = np.pad(g, ((0, max(H - gh, 0)), (0, max(W - gw, 0))), mode="reflect")
            gh, gw = g.shape
        y, x = (gh - H) // 2, (gw - W) // 2
        crops.append(g[y:y + H, x:x + W])
    return np.stack(crops).astype(np.float32)


def _mma_of_params(spec, params, eval_imgs, max_kp: int = 1024) -> dict:
    """MMA on warps with thresholds off (fixed top-k by score) — comparable across a
    random init (whose maps fail the product 0.7/0.7/0.85 gates) and trained nets."""
    import jax

    from vo_tpu.evalkit.mma import mma_on_warps
    from vo_tpu.models.r2d2_extractor import R2D2Extractor

    ex = R2D2Extractor.from_params(
        spec, params, max_kp=max_kp, rel_thr=-1.0, rep_thr=-1.0, score_thr=-1.0)
    return mma_on_warps(ex, eval_imgs, jax.random.key(12), photometric=True)


def run(steps: int = 800, batch: int = 8, crop: int = 192, lr: float = 3e-4,
        data_dir: str | None = None, seed: int = 8214, log_every: int = 50) -> dict:
    import jax
    import jax.numpy as jnp

    from vo_tpu.models.patchnet import FAST_QUAD_L2NET_CONFCFS
    from vo_tpu.train import TrainConfig, create_train_state, train_step_batch
    from vo_tpu.train.datasets import (CatPairs, ImageFolder, StillPairs,
                                       SyntheticHomographyPairs,
                                       RandomWindowPairLoader, WindowLoaderConfig)

    images = _load_images(data_dir)
    eval_imgs = _eval_crops(images)
    print(f"[retrain] {len(images)} source images, eval crops {eval_imgs.shape}")

    spec = FAST_QUAD_L2NET_CONFCFS
    cfg = TrainConfig(batch=batch, height=crop, width=crop, lr=lr, seed=seed,
                      photometric=True, sampler="ngh")

    state = create_train_state(spec, cfg)
    init_mma = _mma_of_params(spec, state.params, eval_imgs)
    print(f"[retrain] random-init MMA@3 = {init_mma['mma@3']:.4f} "
          f"(matches/pair {init_mma['mean_matches']:.0f})")

    # Host-side pair source: the reference's web_images+aachen recipe shape —
    # still pairs + synthetic homographies, crop-searched windows, tilt transform.
    class _ArraySource:
        """ImageFolder-shaped view over in-memory grayscale arrays."""

        def __init__(self, arrays):
            self.arrays = arrays

        def __len__(self):
            return len(self.arrays)

        def load_gray(self, i, max_side=0):
            return self.arrays[i]

    folder = _ArraySource(images)
    loader = RandomWindowPairLoader(
        CatPairs(StillPairs(folder, 0), SyntheticHomographyPairs(folder, 0)),
        WindowLoaderConfig(crop=crop))

    key = jax.random.key(seed)
    from vo_tpu.train.pairs import photometric_augment

    t0 = time.time()
    losses = []
    for step in range(steps):
        key, sub = jax.random.split(key)
        img1, img2, aflow, mask = loader.batch(cfg.batch)
        img2 = jax.vmap(photometric_augment)(
            jax.random.split(sub, cfg.batch), jnp.asarray(img2))
        state, metrics = train_step_batch(
            state, (jnp.asarray(img1), img2, jnp.asarray(aflow),
                    jnp.asarray(mask)), spec, cfg)
        losses.append(float(metrics["total"]))
        if step % log_every == 0 or step == steps - 1:
            print(f"[retrain] step {step:5d} loss {losses[-1]:.4f} "
                  f"({(time.time() - t0):.1f}s)")

    final_mma = _mma_of_params(spec, state.params, eval_imgs)
    print(f"[retrain] trained MMA@3 = {final_mma['mma@3']:.4f} "
          f"(matches/pair {final_mma['mean_matches']:.0f})")

    ported_mma = None
    try:
        from vo_tpu.models.port_weights import load_pretrained

        pspec, pparams = load_pretrained("faster2d2_WASF_N16")
        ported_mma = _mma_of_params(pspec, pparams, eval_imgs)
        print(f"[retrain] ported-weights MMA@3 = {ported_mma['mma@3']:.4f}")
    except Exception as e:
        print(f"[retrain] ported weights unavailable: {e!r}")

    return {
        "steps": steps, "batch": batch, "crop": crop,
        "n_images": len(images),
        "loss_first10": float(np.mean(losses[:10])),
        "loss_last10": float(np.mean(losses[-10:])),
        "init_mma@3": init_mma["mma@3"],
        "trained_mma@3": final_mma["mma@3"],
        "ported_mma@3": ported_mma["mma@3"] if ported_mma else None,
        "init_curve": init_mma["mma"],
        "trained_curve": final_mma["mma"],
        "train_seconds": round(time.time() - t0, 1),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--crop", type=int, default=192)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out", default=None, help="write the result JSON here")
    args = ap.parse_args(argv)
    res = run(steps=args.steps, batch=args.batch, crop=args.crop, lr=args.lr,
              data_dir=args.data_dir)
    line = json.dumps(res)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
