"""Upright dense-packed BRIEF — the fast TPU descriptor path.

Random-access patch sampling (the classic rBRIEF formulation) costs tens of millions of
scattered gathers per batch, which TPUs execute on the slow scalar path (measured
3.7 s / 16 frames). This variant restructures the computation to be dense-first:

1. For each of the 256 sampling pairs (fixed integer offsets), the comparison
   ``I(x + o_a) > I(x + o_b)`` is evaluated **densely** for every pixel as two shifted
   copies of the blurred image — pure VPU compare on contiguous data.
2. The 256 bit-planes are packed on the fly into 8 uint32 words per pixel
   (B, H, W, 8) — bounded HBM traffic, no 256-channel float map.
3. One small regular gather picks the 8 words at each keypoint; bits unpack to the
   same ±1 bf16 vectors the matcher GEMM consumes.

Trade-off vs ``oriented_brief_descriptors``: no per-keypoint rotation steering (fine
for automotive/forward-motion sequences where inter-frame roll is <~2°; the reference's
own primary path, R2D2, is not rotation-normalized either — R2D2.py:202-236).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.ops.image import gaussian_blur

BRIEF_BITS = 256
_PATTERN_RADIUS = 13


def dense_brief_offsets(bits: int = BRIEF_BITS, seed: int = 8214) -> np.ndarray:
    """(bits, 2, 2) integer [pair, point, (dx, dy)] offsets, seeded like the reference's
    global RNG pin (vo_stereo_runner.py:20-24)."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, _PATTERN_RADIUS / 2.0, size=(bits, 2, 2))
    return np.clip(np.round(pts), -_PATTERN_RADIUS, _PATTERN_RADIUS).astype(np.int32)


@partial(jax.jit, static_argnames=("bits", "blur_sigma"))
def dense_packed_brief(gray: jnp.ndarray, bits: int = BRIEF_BITS,
                       blur_sigma: float = 2.0) -> jnp.ndarray:
    """Dense packed descriptor planes: (B, H, W) gray -> (B, H, W, bits//32) uint32."""
    offsets = dense_brief_offsets(bits)
    smoothed = gaussian_blur(gray, blur_sigma)
    pad = _PATTERN_RADIUS
    B, H, W = gray.shape
    # bf16 halves the HBM traffic of the 256 shifted compares. This is a deliberate
    # re-quantization of the blurred intensities to ~uint8 resolution (bf16 has ~8
    # significant bits, so non-integer values in [128, 255] round to ulp 1.0) — the
    # same resolution classic BRIEF's uint8 compares see, but NOT bit-parity with an
    # f32 compare path.
    xp = jnp.pad(smoothed.astype(jnp.bfloat16), ((0, 0), (pad, pad), (pad, pad)))

    words = []
    acc = jnp.zeros((B, H, W), jnp.uint32)
    for b in range(bits):
        (ax, ay), (bx, by) = offsets[b]
        va = xp[:, int(ay) + pad: int(ay) + pad + H, int(ax) + pad: int(ax) + pad + W]
        vb = xp[:, int(by) + pad: int(by) + pad + H, int(bx) + pad: int(bx) + pad + W]
        bit = (va < vb).astype(jnp.uint32)
        acc = acc | (bit << jnp.uint32(b % 32))
        if b % 32 == 31:
            words.append(acc)
            acc = jnp.zeros((B, H, W), jnp.uint32)
    return jnp.stack(words, axis=-1)  # (B, H, W, bits//32)


@partial(jax.jit, static_argnames=("bits",))
def gather_brief_descriptors(packed: jnp.ndarray, kp: jnp.ndarray,
                             valid: jnp.ndarray, bits: int = BRIEF_BITS) -> jnp.ndarray:
    """Gather packed words at (B, K, 2) int keypoints -> (B, K, bits) ±1 bf16."""
    B, H, W, nw = packed.shape
    xi = jnp.clip(kp[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(kp[..., 1].astype(jnp.int32), 0, H - 1)
    batch = jnp.arange(B)[:, None]
    words = packed[batch, yi, xi]                       # (B, K, nw)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bitvals = (words[..., :, None] >> shifts) & jnp.uint32(1)  # (B, K, nw, 32)
    bitsarr = bitvals.reshape(*words.shape[:-1], nw * 32).astype(jnp.bfloat16)
    desc = bitsarr * 2.0 - 1.0
    return jnp.where(valid[..., None], desc, 0.0)


def upright_brief_descriptors(gray: jnp.ndarray, kp: jnp.ndarray,
                              valid: jnp.ndarray, bits: int = BRIEF_BITS,
                              blur_sigma: float = 2.0) -> jnp.ndarray:
    """(B, H, W) gray + (B, K, 2) kp -> (B, K, bits) ±1 bf16, dense-first fast path."""
    packed = dense_packed_brief(gray, bits=bits, blur_sigma=blur_sigma)
    return gather_brief_descriptors(packed, kp, valid, bits=bits)
