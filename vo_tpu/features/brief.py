"""Oriented BRIEF-style binary descriptors, batched on device.

The TPU-native counterpart of ORB's rBRIEF (cv2.ORB_create().compute,
feature_extractors/ORB.py:17): per-keypoint orientation from the intensity centroid,
then 256 smoothed-intensity pair comparisons at orientation-rotated offsets.

Descriptors are emitted as **±1 vectors** (bf16 by default) instead of packed bits:
for a, b in {-1, +1}^D, hamming(a, b) = (D - a·b) / 2, so Hamming matching becomes a
plain descriptor GEMM on the MXU — the same kernel that serves float descriptors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.ops.image import gaussian_blur

BRIEF_BITS = 256
_PATTERN_RADIUS = 13.0
_PATCH_RADIUS = 20  # sampling patch half-side; covers rotated offsets up to r*sqrt(2)


def brief_offsets(bits: int = BRIEF_BITS, seed: int = 8214) -> np.ndarray:
    """Fixed gaussian sampling pattern: (bits, 2, 2) [pair, point, (dx, dy)].

    Drawn once from a seeded RNG (the reference pins RNG seed 8214,
    vo_stereo_runner.py:20-24) and baked as a compile-time constant.
    """
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATTERN_RADIUS / 2.0, size=(bits, 2, 2))
    return np.clip(pts, -_PATTERN_RADIUS, _PATTERN_RADIUS).astype(np.float32)


def _orientation(patches: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Intensity-centroid orientation per (K, P, P) patch -> (cos, sin).

    Same moment definition as ORB: theta = atan2(m01, m10) over a centered disk.
    """
    K, P, _ = patches.shape
    r = (P - 1) / 2.0
    xs = jnp.arange(P, dtype=jnp.float32) - r
    dist2 = xs[None, :] ** 2 + xs[:, None] ** 2
    disk = (dist2 <= r * r).astype(jnp.float32)
    w = patches * disk[None]
    m10 = jnp.sum(w * xs[None, None, :], axis=(1, 2))
    m01 = jnp.sum(w * xs[None, :, None], axis=(1, 2))
    norm = jnp.sqrt(m10 * m10 + m01 * m01) + 1e-9
    return m10 / norm, m01 / norm


def _extract_patches(img: jnp.ndarray, kp: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather (2r+1)x(2r+1) patches centered at integer keypoint coords.

    Uses one advanced-indexing gather for all K patches (XLA turns this into a single
    gather op) — no per-keypoint dynamic_slice loop.
    """
    H, W = img.shape
    P = 2 * radius + 1
    cx = jnp.clip(kp[:, 0].astype(jnp.int32), radius, W - 1 - radius)
    cy = jnp.clip(kp[:, 1].astype(jnp.int32), radius, H - 1 - radius)
    dy = jnp.arange(-radius, radius + 1)
    dx = jnp.arange(-radius, radius + 1)
    yy = cy[:, None, None] + dy[None, :, None]  # (K, P, 1)
    xx = cx[:, None, None] + dx[None, None, :]  # (K, 1, P)
    return img[yy, xx]  # (K, P, P)


@partial(jax.jit, static_argnames=("bits",))
def oriented_brief_descriptors(
    gray: jnp.ndarray,
    kp: jnp.ndarray,
    valid: jnp.ndarray,
    bits: int = BRIEF_BITS,
    blur_sigma: float = 2.0,
) -> jnp.ndarray:
    """Compute ±1 descriptors for fixed-budget keypoints of a single image.

    Args:
      gray: (H, W) float grayscale.
      kp: (K, 2) [x, y] keypoints (integer-ish coords from the detector).
      valid: (K,) mask; invalid rows get zero descriptors (zero similarity to anything).
      bits: descriptor length.
    Returns:
      (K, bits) bfloat16 in {-1, +1} (0 rows for invalid keypoints).

    vmap over a leading batch axis for multi-frame extraction.
    """
    offsets = jnp.asarray(brief_offsets(bits))  # (bits, 2, 2)
    smoothed = gaussian_blur(gray[None], blur_sigma)[0]
    patches = _extract_patches(smoothed, kp, _PATCH_RADIUS)  # (K, P, P)
    cos_t, sin_t = _orientation(patches)

    # Rotate the sampling pattern per keypoint: (K, bits, 2 points, 2 coords).
    ox = offsets[None, :, :, 0]  # (1, bits, 2)
    oy = offsets[None, :, :, 1]
    rx = cos_t[:, None, None] * ox - sin_t[:, None, None] * oy + _PATCH_RADIUS
    ry = sin_t[:, None, None] * ox + cos_t[:, None, None] * oy + _PATCH_RADIUS

    # Bilinear sample inside each patch (coords are patch-local).
    x0 = jnp.floor(rx).astype(jnp.int32)
    y0 = jnp.floor(ry).astype(jnp.int32)
    P = 2 * _PATCH_RADIUS + 1
    x0c = jnp.clip(x0, 0, P - 2)
    y0c = jnp.clip(y0, 0, P - 2)
    fx = jnp.clip(rx - x0c, 0.0, 1.0)
    fy = jnp.clip(ry - y0c, 0.0, 1.0)

    k_idx = jnp.arange(kp.shape[0])[:, None, None]
    v00 = patches[k_idx, y0c, x0c]
    v01 = patches[k_idx, y0c, x0c + 1]
    v10 = patches[k_idx, y0c + 1, x0c]
    v11 = patches[k_idx, y0c + 1, x0c + 1]
    samples = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
               + fy * ((1 - fx) * v10 + fx * v11))  # (K, bits, 2)

    desc = jnp.where(samples[:, :, 0] < samples[:, :, 1], 1.0, -1.0)
    desc = jnp.where(valid[:, None], desc, 0.0)
    return desc.astype(jnp.bfloat16)
