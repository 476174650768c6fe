"""Octave-pyramid front-end for the classic extractors (ORB/SIFT/SURF-style paths).

cv2's ORB detects over an image pyramid (scaleFactor 1.2, 8 levels) and cv2 SIFT over a
DoG scale space (feature_extractors/ORB.py:7-17, SIFT.py:8-12); the round-1 classic
paths were single-scale. This wrapper reuses the R2D2 pyramid pattern
(vo_tpu/models/multiscale.py): a static list of scales, per-level detect + NMS with a
full candidate budget, per-level descriptors (so descriptor support is scale-covariant),
coordinates mapped to full resolution, and one global score top-k across levels.

Each level resizes from the original image in one fused ``jax.image``-style pass; the
whole pyramid is a single jitted call per image geometry (batch-first, fixed budgets).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from vo_tpu.features.detect import detect_keypoints, harris_response, shi_tomasi_response
from vo_tpu.features.dense_brief import upright_brief_descriptors, BRIEF_BITS
from vo_tpu.features.extractor import Features
from vo_tpu.ops.image import resize_bilinear, rgb_to_gray


@dataclass(frozen=True)
class MultiScaleClassicExtractor:
    """Scale-covariant Harris/Hessian + BRIEF/gradhist/SURF extraction.

    Same Features contract as OrbLikeExtractor, so it drops into the pipeline/runner
    (config key ``octaves`` > 1 selects it, vo_tpu/config.py)."""

    max_kp: int = 2048
    n_scales: int = 4
    scale_f: float = 2 ** 0.5     # between cv2 ORB's 1.2x8 and SIFT's octave doubling
    response: str = "harris"      # 'harris' | 'shi_tomasi' | 'hessian'
    descriptor: str = "brief"     # 'brief' | 'gradhist' | 'surf'
    oriented: bool = False        # gradhist only: dominant-orientation normalization
    nms_size: int = 5
    rel_threshold: float = 1e-4
    border: int = 21
    bits: int = BRIEF_BITS
    subpixel: bool = False  # see OrbLikeExtractor.subpixel
    # Per-level candidate budget = max_kp * level_budget_decay**level (floor 128).
    # Coarser octaves cover 2-4x less area, so a full-budget top-k + descriptor
    # pass per level is mostly padding work; 0.5 matches the area ratio. 1.0 is
    # the legacy full-budget-per-level behavior.
    level_budget_decay: float = 1.0

    @partial(jax.jit, static_argnames=("self",))
    def __call__(self, images: jnp.ndarray) -> Features:
        gray = rgb_to_gray(images) if images.ndim == 4 else images.astype(jnp.float32)
        B, H, W = gray.shape

        kps, descs, scores, valids = [], [], [], []
        for lvl in range(self.n_scales):
            s = self.scale_f ** (-lvl)
            Hs, Ws = max(int(round(H * s)), 32), max(int(round(W * s)), 32)
            if max(Hs, Ws) <= 2 * self.border + 4:
                break
            g = gray if lvl == 0 else resize_bilinear(gray, (Hs, Ws))
            if self.response == "hessian":
                from vo_tpu.features.surf import hessian_response

                resp = hessian_response(g)
            elif self.response == "dog":
                from vo_tpu.features.detect import dog_response

                resp = dog_response(g)
            else:
                fn = (harris_response if self.response == "harris"
                      else shi_tomasi_response)
                resp = fn(g)
            lvl_kp = max(int(self.max_kp * self.level_budget_decay ** lvl), 128)
            kp, score, valid = detect_keypoints(
                resp, max_kp=lvl_kp, nms_size=self.nms_size,
                rel_threshold=self.rel_threshold, border=self.border,
                subpixel=self.subpixel)
            desc = self._describe(g, kp, valid)
            # map level coordinates to full resolution
            kps.append(kp * jnp.asarray([(W - 1) / max(Ws - 1, 1),
                                         (H - 1) / max(Hs - 1, 1)], kp.dtype))
            descs.append(desc)
            scores.append(jnp.where(valid, score, -jnp.inf))
            valids.append(valid)

        kp = jnp.concatenate(kps, axis=1)
        desc = jnp.concatenate(descs, axis=1)
        score = jnp.concatenate(scores, axis=1)
        valid = jnp.concatenate(valids, axis=1)

        # Global budget: best max_kp across all levels by detector response.
        top, idx = jax.lax.top_k(score, min(self.max_kp, score.shape[1]))
        if top.shape[1] < self.max_kp:   # tiny budgets/level counts: pad back up
            pad = self.max_kp - top.shape[1]
            top = jnp.pad(top, ((0, 0), (0, pad)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad)))
        bt = jnp.arange(B)[:, None]
        return Features(
            kp=kp[bt, idx],
            desc=desc[bt, idx],
            score=jnp.where(jnp.isfinite(top), top, 0.0),
            valid=valid[bt, idx] & jnp.isfinite(top),
        )

    def _describe(self, g, kp, valid):
        if self.descriptor == "gradhist":
            from vo_tpu.features.gradhist import (gradhist_descriptors,
                                                  oriented_gradhist_descriptors)

            fn = oriented_gradhist_descriptors if self.oriented else gradhist_descriptors
            return fn(g, kp, valid)
        if self.descriptor == "surf":
            from vo_tpu.features.surf import surf_descriptors

            return surf_descriptors(g, kp, valid)
        return upright_brief_descriptors(g, kp, valid, bits=self.bits)

    def __hash__(self):
        return hash((self.max_kp, self.n_scales, self.scale_f, self.response,
                     self.descriptor, self.oriented, self.nms_size,
                     self.rel_threshold, self.border, self.bits, self.subpixel,
                     self.level_budget_decay))
