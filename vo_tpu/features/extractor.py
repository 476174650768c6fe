"""Batched feature extraction front-end: images in, fixed-budget (kp, desc, mask) out.

Plays the role of the reference's pluggable ``extract_features_and_desc``
(feature_extractors/ORB.py:10, SIFT.py:8, R2D2.py:202) but TPU-first: one jitted call
processes a whole batch of frames, keypoint counts are a fixed budget with validity
masks, and descriptors are MXU-ready (±1 bf16 for the binary path, L2-normed float for
learned descriptors).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.features.brief import oriented_brief_descriptors, BRIEF_BITS
from vo_tpu.features.dense_brief import upright_brief_descriptors
from vo_tpu.features.detect import detect_keypoints, harris_response, shi_tomasi_response
from vo_tpu.ops.image import rgb_to_gray


class Features(NamedTuple):
    """Fixed-budget per-frame features. Leading axis = batch of frames."""

    kp: jnp.ndarray     # (..., K, 2) float32 [x, y]
    desc: jnp.ndarray   # (..., K, D)
    score: jnp.ndarray  # (..., K)
    valid: jnp.ndarray  # (..., K) bool


@dataclass(frozen=True)
class OrbLikeExtractor:
    """Harris + oriented-BRIEF extractor (the 'orb' option of the reference's YAML switch,
    VisualOdometry_Stereo.py:19-24). All hyperparameters are static so the call jits once.
    """

    max_kp: int = 2048
    nms_size: int = 5
    rel_threshold: float = 1e-4
    border: int = 21  # >= brief patch radius + 1
    subpixel: bool = False  # parabola peak refinement. Default OFF: measured on
                            # the bench workload it WORSENS the RGB-D path (seg
                            # 0.030 -> 0.091 %) — the refined uv no longer sits on
                            # the pixel whose depth backs its 3D point, and that
                            # uv/depth inconsistency outweighs the integer-grid
                            # match-residual gain. Useful for pure-2D pipelines
                            # (homography/essential estimation).
    bits: int = BRIEF_BITS
    response: str = "harris"  # 'harris' | 'shi_tomasi' | 'hessian' (SURF-style box DoH)
    oriented: bool = False    # True: rotation-steered patch BRIEF (slower, gather-heavy)
                              # False: upright dense-packed BRIEF (TPU fast path)
    descriptor: str = "brief"  # 'brief' (binary ±1) | 'gradhist' (SIFT-style float)
                               # | 'surf' (upright Haar SURF-64 float)
    # Note on the dense-BRIEF backend: a fused Pallas kernel for the shift-compare-pack
    # chain was built, made bit-exact on v5e, measured, and REMOVED: XLA's own fusion
    # runs 0.76 ms/frame at 376x1232 (within ~2x of the VPU compare floor) vs 0.95 ms
    # for the best Pallas variant — the unaligned lane slices need per-compare vector
    # realignment and Mosaic miscompiles the cheaper bf16-compare form. Matching stays
    # Pallas (ops/pallas_match.py), where the fusion win is real.

    @partial(jax.jit, static_argnames=("self",))
    def __call__(self, images: jnp.ndarray) -> Features:
        """Extract features for a batch of images.

        Args:
          images: (B, H, W, 3) RGB (uint8/float) or (B, H, W) grayscale.
        Returns:
          Features with shapes (B, max_kp, ...).
        """
        gray = rgb_to_gray(images) if images.ndim == 4 else images.astype(jnp.float32)
        if self.response == "hessian":
            from vo_tpu.features.surf import hessian_response

            resp = hessian_response(gray)
        elif self.response == "dog":
            from vo_tpu.features.detect import dog_response

            resp = dog_response(gray)
        else:
            resp_fn = harris_response if self.response == "harris" else shi_tomasi_response
            resp = resp_fn(gray)
        kp, score, valid = detect_keypoints(
            resp, max_kp=self.max_kp, nms_size=self.nms_size,
            rel_threshold=self.rel_threshold, border=self.border,
            subpixel=self.subpixel,
        )
        if self.descriptor == "gradhist":
            from vo_tpu.features.gradhist import gradhist_descriptors

            desc = gradhist_descriptors(gray, kp, valid)
        elif self.descriptor == "surf":
            from vo_tpu.features.surf import surf_descriptors

            desc = surf_descriptors(gray, kp, valid)
        elif self.oriented:
            desc = jax.vmap(
                lambda g, k, v: oriented_brief_descriptors(g, k, v, bits=self.bits)
            )(gray, kp, valid)
        else:
            desc = upright_brief_descriptors(gray, kp, valid, bits=self.bits)
        return Features(kp=kp, desc=desc, score=score, valid=valid)

    def __hash__(self):
        return hash((self.max_kp, self.nms_size, self.rel_threshold, self.border,
                     self.bits, self.response, self.oriented, self.descriptor,
                     self.subpixel))
