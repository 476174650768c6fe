"""Mean Matching Accuracy (MMA) harness for feature extractors.

The reference's descriptor-quality numbers are HPatches MMA@3 curves produced by the
external d2-net notebook (feature_extractors/r2d2/README.md:106-140, cached
``results/*.npy``). This is the same protocol as a first-class, self-contained
evaluator: image pairs related by a *known* homography, mutual-NN descriptor matching,
and MMA@t = mean fraction of matches whose ground-truth reprojection error is <= t px.

With no dataset shipped, ``mma_on_warps`` builds evaluation pairs from any image batch
via random homographies + photometric jitter (viewpoint + illumination, mirroring
HPatches' two regimes); pass real pre-warped pairs + H to ``mma_pair`` when data exists.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.matching.matchers import mutual_nn_match
from vo_tpu.train.pairs import warp_eval_batch


def _project(Hm: np.ndarray, xy: np.ndarray) -> np.ndarray:
    p = np.concatenate([xy, np.ones_like(xy[:, :1])], axis=1) @ Hm.T
    return p[:, :2] / np.clip(p[:, 2:], 1e-9, None)


def mma_pair(feats1, feats2, Hm, thresholds) -> np.ndarray:
    """MMA@t for one pair: feats are Features-like (kp, desc, valid) for image 1/2;
    ``Hm`` maps image-1 pixels to image-2 pixels. Returns (len(thresholds),)."""
    m = mutual_nn_match(feats1.desc, feats2.desc, feats1.valid, feats2.valid)
    mask = np.asarray(m.mask)
    if mask.sum() == 0:
        return np.zeros(len(thresholds))
    kp1 = np.asarray(feats1.kp)[mask][:, :2]
    kp2 = np.asarray(feats2.kp)[np.asarray(m.idx)[mask]][:, :2]
    err = np.linalg.norm(_project(np.asarray(Hm), kp1) - kp2, axis=1)
    return np.asarray([(err <= t).mean() for t in thresholds])


def mma_on_warps(extract_fn, images, key, thresholds=tuple(range(1, 11)),
                 photometric: bool = True, max_kp_note: str | None = None) -> dict:
    """MMA curve for an extractor over homography-warped versions of ``images``.

    Args:
      extract_fn: batched (B, H, W) [0,255] -> Features (kp/desc/valid).
      images: (B, H, W) grayscale batch (one warp per image).
      key: jax PRNG key (drives the warps; fixed key = reproducible benchmark).
    Returns dict with ``thresholds``, per-threshold ``mma``, ``mma@3``, ``n_pairs``,
    and mean mutual-NN ``n_matches``.
    """
    images = jnp.asarray(images, jnp.float32)
    B = images.shape[0]
    Hmats, img2 = warp_eval_batch(key, images, photometric)

    f1 = extract_fn(images)
    f2 = extract_fn(img2)

    curves, n_matches = [], []
    for b in range(B):
        fb1 = jax.tree.map(lambda a, b_=b: a[b_], f1)
        fb2 = jax.tree.map(lambda a, b_=b: a[b_], f2)
        curves.append(mma_pair(fb1, fb2, Hmats[b], thresholds))
        m = mutual_nn_match(fb1.desc, fb2.desc, fb1.valid, fb2.valid)
        n_matches.append(int(np.asarray(m.mask).sum()))

    mma = np.stack(curves).mean(0)
    out = {"thresholds": list(thresholds), "mma": mma.tolist(),
           "n_pairs": B, "mean_matches": float(np.mean(n_matches)),
           "matches_per_pair": [int(m) for m in n_matches]}
    if 3 in thresholds:
        ti = list(thresholds).index(3)
        per_pair = [float(c[ti]) for c in curves]
        out["mma@3"] = float(mma[ti])
        out["mma@3_per_pair"] = per_pair
        out["mma@3_std"] = float(np.std(per_pair))
    return out
