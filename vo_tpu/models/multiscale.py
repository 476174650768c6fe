"""True multiscale R2D2 extraction: fixed image pyramid, per-scale NMS, global top-k.

TPU-shaped counterpart of the reference's full pyramid extractor
(feature_extractors/r2d2/extract.py:50-108): scales walk down from 1.0 by a factor
``scale_f`` (default 2^0.25) while ``max(min_scale, min_size/max(H,W)) <= s <=
min(max_scale, max_size/max(H,W))``; keypoint coordinates are mapped back to
full-resolution pixels and the third keypoint column stores the reference's patch-size
convention ``32/s`` (extract.py:88). Selection is a single score top-k across all
scales (extract.py:148).

Differences by design (TPU-first, not a translation):
  * batched over frames — every scale processes the whole (B, Hs, Ws) batch in one
    jitted call; the scale list itself is static Python, so the pyramid compiles once
    per image geometry;
  * each level resizes from the original image (one fused ``jax.image.resize``) rather
    than chaining downscales of downscales — fewer resampling passes, no generation
    loss accumulation;
  * fixed candidate budgets with validity masks instead of dynamic ``nonzero``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.models.patchnet import PatchNetSpec, apply_patchnet
from vo_tpu.models.r2d2_extractor import _IMAGENET_MEAN, _IMAGENET_STD
from vo_tpu.ops.image import maxpool2d_same, resize_bilinear


@dataclass(frozen=True)
class MultiscaleConfig:
    """Pyramid geometry + NMS thresholds (reference extract.py:160-180 defaults)."""

    scale_f: float = 2 ** 0.25
    min_scale: float = 0.0
    max_scale: float = 1.0
    min_size: int = 256
    max_size: int = 1024
    top_k: int = 2048           # global budget across scales (extract.py:148,174)
    per_scale_k: int = 2048     # candidate budget at each level
    rel_thr: float = 0.7        # NonMaxSuppression defaults (extract.py:17-20,169-170)
    rep_thr: float = 0.7
    nms_size: int = 3
    border: int = 4

    def __hash__(self):
        return hash((self.scale_f, self.min_scale, self.max_scale, self.min_size,
                     self.max_size, self.top_k, self.per_scale_k, self.rel_thr,
                     self.rep_thr, self.nms_size, self.border))


class MultiscaleFeatures(NamedTuple):
    kp: jnp.ndarray      # (B, K, 3) [x, y, 32/s] in full-res pixels
    desc: jnp.ndarray    # (B, K, D) L2-normalized float32
    score: jnp.ndarray   # (B, K) reliability * repeatability
    valid: jnp.ndarray   # (B, K) bool


def pyramid_scales(H: int, W: int, cfg: MultiscaleConfig) -> list[float]:
    """The static list of scale factors the reference's while-loop would visit
    (extract.py:64-95): s from 1.0 stepping /= scale_f, kept while within the
    [min, max] scale/size window."""
    scales = []
    s = 1.0
    lo = max(cfg.min_scale, cfg.min_size / max(H, W))
    hi = min(cfg.max_scale, cfg.max_size / max(H, W))
    while s + 0.001 >= lo:
        if s - 0.001 <= hi:
            scales.append(s)
        s /= cfg.scale_f
    return scales


def _level_hw(H: int, W: int, s: float) -> tuple[int, int]:
    # even-rounded so the Fast variant's pool2+upsample2 path needs no padding
    nh, nw = max(round(H * s), 2), max(round(W * s), 2)
    return nh + nh % 2, nw + nw % 2


@partial(jax.jit, static_argnames=("spec", "cfg", "H", "W"))
def _extract_pyramid(params, images, spec: PatchNetSpec, cfg: MultiscaleConfig,
                     H: int, W: int):
    """images: (B, H, W, 3) ImageNet-normalized. Returns stacked per-scale candidates
    merged by one global top-k."""
    B = images.shape[0]
    all_kp, all_desc, all_score, all_valid = [], [], [], []

    for s in pyramid_scales(H, W, cfg):
        nh, nw = _level_hw(H, W, s)
        x = resize_bilinear(images, (nh, nw)) if (nh, nw) != (H, W) else images
        out = apply_patchnet(params, spec, x)
        rel, rep, desc = out["reliability"], out["repeatability"], out["descriptors"]

        is_max = rep >= maxpool2d_same(rep, cfg.nms_size)
        keep = is_max & (rep >= cfg.rep_thr) & (rel >= cfg.rel_thr)
        col = jax.lax.broadcasted_iota(jnp.int32, (B, nh, nw), 2)
        row = jax.lax.broadcasted_iota(jnp.int32, (B, nh, nw), 1)
        b = cfg.border
        keep &= (col >= b) & (col < nw - b) & (row >= b) & (row < nh - b)

        score = jnp.where(keep, rel * rep, -jnp.inf)
        k = min(cfg.per_scale_k, nh * nw)
        top, idx = jax.lax.top_k(score.reshape(B, nh * nw), k)
        y = (idx // nw).astype(jnp.float32)
        xx = (idx % nw).astype(jnp.float32)
        valid = jnp.isfinite(top)

        # back to full-res pixels (extract.py:86-87) + patch-size column 32/s (:88)
        kp = jnp.stack([xx * (W / nw), y * (H / nh),
                        jnp.full_like(xx, 32.0 / s)], axis=-1)
        bidx = jnp.arange(B)[:, None]
        d = desc[bidx, idx // nw, idx % nw]

        all_kp.append(kp)
        all_desc.append(jnp.where(valid[..., None], d, 0.0))
        all_score.append(jnp.where(valid, top, -jnp.inf))
        all_valid.append(valid)

    kp = jnp.concatenate(all_kp, axis=1)
    desc = jnp.concatenate(all_desc, axis=1)
    score = jnp.concatenate(all_score, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)

    k = min(cfg.top_k, score.shape[1])
    top, idx = jax.lax.top_k(score, k)
    bidx = jnp.arange(B)[:, None]
    return MultiscaleFeatures(
        kp=kp[bidx, idx],
        desc=desc[bidx, idx],
        score=jnp.where(jnp.isfinite(top), top, 0.0),
        valid=valid[bidx, idx] & jnp.isfinite(top),
    )


def extract_multiscale(params, spec: PatchNetSpec, images,
                       cfg: MultiscaleConfig = MultiscaleConfig()) -> MultiscaleFeatures:
    """Multiscale R2D2 features for a batch of frames.

    Args:
      params: patchnet params (from ``load_pretrained`` or training).
      images: (B, H, W, 3) or (B, H, W) uint8/float RGB in [0, 255].
    """
    images = jnp.asarray(images)
    if images.ndim == 3:
        images = images[..., None].repeat(3, axis=-1)
    x = images.astype(jnp.float32) / 255.0
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
    B, H, W, _ = x.shape
    if H % 2 or W % 2:
        x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)), mode="edge")
    return _extract_pyramid(params, x, spec, cfg, H, W)


def save_r2d2_npz(path: str, feats: MultiscaleFeatures, imsize: tuple[int, int],
                  frame: int = 0) -> str:
    """Write one frame's features in the reference's ``.r2d2`` npz layout
    (extract.py:150-156): imsize (W, H), keypoints (N, 3), descriptors, scores —
    ascending score order, invalid slots dropped."""
    v = np.asarray(feats.valid[frame])
    sc = np.asarray(feats.score[frame])[v]
    order = np.argsort(sc)
    with open(path, "wb") as f:
        np.savez(f, imsize=np.asarray(imsize),
                 keypoints=np.asarray(feats.kp[frame])[v][order],
                 descriptors=np.asarray(feats.desc[frame], np.float32)[v][order],
                 scores=sc[order])
    return path
