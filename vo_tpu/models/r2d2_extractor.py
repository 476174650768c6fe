"""R2D2 learned-feature extractor: batched CNN forward + NMS + fixed-budget top-k.

The TPU-shaped counterpart of the reference's extract_keypoints/extract_multiscale path
(R2D2.py:102-190): ImageNet normalization (tools/dataloader.py:16-19), single-scale
forward (the reference breaks its multiscale loop at R2D2.py:157), 3x3 max-pool NMS with
reliability/repeatability thresholds 0.7/0.7 (R2D2.py:81-99,194), score =
reliability * repeatability with a 0.85 floor (R2D2.py:188) folded into the validity
mask — but batched over frames and with a fixed keypoint budget.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.features.extractor import Features
from vo_tpu.models.patchnet import PatchNetSpec, apply_patchnet
from vo_tpu.ops.image import maxpool2d_same

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclass(frozen=True)
class R2D2Extractor:
    """Callable extractor: (B, H, W, 3) RGB uint8/float -> Features with 128-d float
    descriptors (L2-normalized, bf16 storage for MXU matching)."""

    spec: PatchNetSpec
    params_id: int                      # identity handle for jit caching
    max_kp: int = 2048
    rel_thr: float = 0.7                # R2D2.py:194 (args.reliability_thr)
    rep_thr: float = 0.7                # R2D2.py:194 (args.repeatability_thr)
    score_thr: float = 0.85             # R2D2.py:188
    nms_size: int = 3                   # R2D2.py:84 (MaxPool2d kernel 3)
    border: int = 8
    desc_dtype: str = "bfloat16"
    compute_dtype: str = "bfloat16"     # conv-stack dtype. bf16 measured 4x faster
                                        # extraction on v5e (20.9 -> 5.1 ms/frame,
                                        # R2D2 pipeline 45 -> 156 fps) at equal
                                        # accuracy (seg 0.289 vs 0.295 %, MMA@3
                                        # 0.933 vs 0.941); strict weight-porting
                                        # parity tests pin float32.
    score_mode: str = "rel*rep"         # 'rel*rep' (deploy, R2D2.py:188) | 'rep'
    # 'rep' ranks detections by the repeatability head alone. Mid-training the
    # reliability head legitimately collapses toward 0 wherever descriptor AP is
    # still below the loss's base value (train/losses.py ap_reliability_loss), which
    # zeroes rel*rep almost everywhere and starves detection even with all
    # thresholds off — the r03 retrain-parity harness measured 116 -> 10 matches
    # from exactly this. Detector-quality evaluation should rank by the detector
    # head; reliability is a matching confidence.

    _params_store: dict = field(default_factory=dict, hash=False, compare=False)

    @classmethod
    def from_pretrained(cls, name: str = "faster2d2_WASF_N16", max_kp: int = 2048,
                        **kw) -> "R2D2Extractor":
        from vo_tpu.models.port_weights import load_pretrained

        spec, params = load_pretrained(name)
        ex = cls(spec=spec, params_id=id(params), max_kp=max_kp, **kw)
        ex._params_store["params"] = params
        return ex

    @classmethod
    def from_params(cls, spec: PatchNetSpec, params, max_kp: int = 2048, **kw):
        ex = cls(spec=spec, params_id=id(params), max_kp=max_kp, **kw)
        ex._params_store["params"] = params
        return ex

    @property
    def params(self):
        return self._params_store["params"]

    def __call__(self, images: jnp.ndarray) -> Features:
        return _r2d2_extract(
            self.params, images, self.spec, self.max_kp, self.rel_thr, self.rep_thr,
            self.score_thr, self.nms_size, self.border, self.desc_dtype,
            self.score_mode, self.compute_dtype)

    def __hash__(self):
        return hash((self.spec, self.params_id, self.max_kp, self.rel_thr,
                     self.rep_thr, self.score_thr, self.nms_size, self.border,
                     self.desc_dtype, self.score_mode, self.compute_dtype))


@partial(jax.jit, static_argnames=("spec", "max_kp", "nms_size", "border",
                                   "desc_dtype", "score_mode", "compute_dtype"))
def _r2d2_extract(params, images, spec, max_kp, rel_thr, rep_thr, score_thr,
                  nms_size, border, desc_dtype, score_mode="rel*rep",
                  compute_dtype="float32"):
    if images.ndim == 3:
        images = images[..., None].repeat(3, axis=-1)
    x = images.astype(jnp.float32) / 255.0
    x = (x - _IMAGENET_MEAN) / _IMAGENET_STD

    # Fast variant needs even H/W (pool2 + upsample2); pad and crop back.
    B, H, W, _ = x.shape
    pad_h, pad_w = H % 2, W % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="edge")

    out = apply_patchnet(params, spec, x, compute_dtype=jnp.dtype(compute_dtype))
    desc = out["descriptors"][:, :H, :W]
    rel = out["reliability"][:, :H, :W]
    rep = out["repeatability"][:, :H, :W]

    # NMS on repeatability (R2D2.py:93-99), thresholds on both maps.
    is_max = rep >= maxpool2d_same(rep, nms_size)
    keep = is_max & (rep >= rep_thr) & (rel >= rel_thr)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1)
    keep &= ((col >= border) & (col < W - border) &
             (row >= border) & (row < H - border))

    raw_score = rep if score_mode == "rep" else rel * rep
    score = jnp.where(keep, raw_score, -jnp.inf)
    flat = score.reshape(B, H * W)
    top_score, idx = jax.lax.top_k(flat, max_kp)
    y = (idx // W).astype(jnp.float32)
    xx = (idx % W).astype(jnp.float32)
    valid = jnp.isfinite(top_score) & (top_score > score_thr)

    kp = jnp.stack([jnp.where(valid, xx, 0.0), jnp.where(valid, y, 0.0)], axis=-1)
    batch_idx = jnp.arange(B)[:, None]
    d = desc[batch_idx, (idx // W), (idx % W)]
    d = jnp.where(valid[..., None], d, 0.0).astype(desc_dtype)
    return Features(kp=kp, desc=d, score=jnp.where(valid, top_score, 0.0), valid=valid)
