"""SIFT-style 128-d gradient-orientation-histogram descriptors, dense-first.

Plays the role of the reference's SIFT descriptor path (feature_extractors/SIFT.py:8-12,
cv2.xfeatures2d.SIFT descriptors + L2 matching) with a TPU-shaped formulation:

1. Dense gradients -> magnitude + orientation, soft-assigned into 8 orientation planes
   (pure VPU elementwise).
2. Each plane is Gaussian box-pooled once (separable shift-add filter) — this realizes
   the per-cell weighted accumulation for every pixel at once.
3. A keypoint descriptor is 16 regular gathers (4x4 cell grid) from the 8 pooled
   planes -> (K, 128), then SIFT's normalize -> clamp 0.2 -> renormalize.

Upright variant (no dominant-orientation rotation), matching the fast BRIEF path's
trade-off. Descriptors are L2-normalized floats; match with ``ratio_match`` at the
reference's 0.85 ratio (SIFT.py:27).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vo_tpu.ops.image import gaussian_blur, sobel_gradients

N_ORI = 8
N_CELLS = 4          # 4x4 spatial grid
CELL_SIZE = 4        # px per cell => 16x16 px support


@partial(jax.jit, static_argnames=())
def dense_orientation_planes(gray: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, H, W, 8) Gaussian-pooled orientation-magnitude planes."""
    g = gaussian_blur(gray, 1.2)
    gx, gy = sobel_gradients(g)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    theta = jnp.arctan2(gy, gx)  # [-pi, pi]

    # Soft assignment to 8 orientation bins (linear in angle distance, SIFT-style).
    bin_centers = (jnp.arange(N_ORI) + 0.5) * (2 * jnp.pi / N_ORI) - jnp.pi
    d = theta[..., None] - bin_centers
    d = (d + jnp.pi) % (2 * jnp.pi) - jnp.pi
    bin_width = 2 * jnp.pi / N_ORI
    w = jnp.clip(1.0 - jnp.abs(d) / bin_width, 0.0, 1.0)
    planes = mag[..., None] * w                                   # (B, H, W, 8)

    # One blur realizes the in-cell weighted accumulation for every candidate center.
    pooled = jax.vmap(lambda p: gaussian_blur(p, CELL_SIZE * 0.6),
                      in_axes=-1, out_axes=-1)(planes)
    return pooled


@partial(jax.jit, static_argnames=())
def gather_gradhist_descriptors(pooled: jnp.ndarray, kp: jnp.ndarray,
                                valid: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 8) planes + (B, K, 2) kp -> (B, K, 128) L2-normed bf16."""
    B, H, W, _ = pooled.shape
    # 4x4 cell-center offsets around the keypoint.
    c = (jnp.arange(N_CELLS) - (N_CELLS - 1) / 2.0) * CELL_SIZE   # (-6, -2, 2, 6)
    oy, ox = jnp.meshgrid(c, c, indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)   # (16, 2)

    pts = kp[:, :, None, :] + offs[None, None]                    # (B, K, 16, 2)
    xi = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, H - 1)
    batch = jnp.arange(B)[:, None, None]
    cells = pooled[batch, yi, xi]                                 # (B, K, 16, 8)
    desc = cells.reshape(*kp.shape[:2], N_CELLS * N_CELLS * N_ORI)

    # SIFT normalization: unit norm, clamp 0.2, renormalize.
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-8)
    desc = jnp.clip(desc, 0.0, 0.2)
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-8)
    desc = jnp.where(valid[..., None], desc, 0.0)
    return desc.astype(jnp.bfloat16)


def gradhist_descriptors(gray: jnp.ndarray, kp: jnp.ndarray,
                         valid: jnp.ndarray) -> jnp.ndarray:
    return gather_gradhist_descriptors(dense_orientation_planes(gray), kp, valid)


@partial(jax.jit, static_argnames=())
def dominant_orientations(pooled: jnp.ndarray, kp: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 8) pooled planes + (B, K, 2) kp -> (B, K) dominant angle.

    Circular mean of the local orientation histogram (a smooth, jit-friendly stand-in
    for SIFT's 36-bin peak — adequate for the moderate-roll envelope cv2 handles,
    SIFT.py:8-12) measured from the pooled planes at the keypoint."""
    B, H, W, _ = pooled.shape
    xi = jnp.clip(jnp.round(kp[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(kp[..., 1]).astype(jnp.int32), 0, H - 1)
    hist = pooled[jnp.arange(B)[:, None], yi, xi]                  # (B, K, 8)
    centers = (jnp.arange(N_ORI) + 0.5) * (2 * jnp.pi / N_ORI) - jnp.pi
    c = jnp.sum(hist * jnp.cos(centers), axis=-1)
    s = jnp.sum(hist * jnp.sin(centers), axis=-1)
    return jnp.arctan2(s, c)                                       # (B, K)


@partial(jax.jit, static_argnames=())
def oriented_gradhist_descriptors(gray: jnp.ndarray, kp: jnp.ndarray,
                                  valid: jnp.ndarray) -> jnp.ndarray:
    """Rotation-normalized gradhist: the 4x4 cell grid rotates with the dominant
    orientation and the 8 orientation bins are circularly shifted back by it, so the
    descriptor is invariant to in-plane rotation (the capability cv2 SIFT's dominant
    orientation provides; upright ``gradhist_descriptors`` is the fast path)."""
    pooled = dense_orientation_planes(gray)
    theta = dominant_orientations(pooled, kp)                      # (B, K)
    B, H, W, _ = pooled.shape
    K = kp.shape[1]

    c = (jnp.arange(N_CELLS) - (N_CELLS - 1) / 2.0) * CELL_SIZE
    oy, ox = jnp.meshgrid(c, c, indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)    # (16, 2)

    ct, st = jnp.cos(theta), jnp.sin(theta)                        # (B, K)
    rot = jnp.stack([jnp.stack([ct, -st], -1),
                     jnp.stack([st, ct], -1)], -2)                 # (B, K, 2, 2)
    offs_r = jnp.einsum("bkij,cj->bkci", rot, offs)                # (B, K, 16, 2)

    pts = kp[:, :, None, :] + offs_r
    xi = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, H - 1)
    cells = pooled[jnp.arange(B)[:, None, None], yi, xi]           # (B, K, 16, 8)

    # Circular shift of the orientation bins by theta (linear interpolation),
    # expressed as a per-keypoint 8x8 interpolation matrix contracted against the
    # cells — data-dependent take_along_axis gathers over a (B, K, 16, 8) tensor cost
    # ~7 ms/frame on v5e; the same shift as a tiny einsum is compute the VPU/MXU eats
    # for free (measured in the r04 multiscale profile).
    bin_w = 2 * jnp.pi / N_ORI
    shift = theta / bin_w                                          # (B, K) fractional
    base = jnp.arange(N_ORI)
    lo = jnp.floor(shift).astype(jnp.int32)
    frac = (shift - lo)[..., None, None]                           # (B, K, 1, 1)
    idx0 = (base[None, None] + lo[..., None]) % N_ORI              # (B, K, 8)
    idx1 = (idx0 + 1) % N_ORI
    S = ((1.0 - frac) * jax.nn.one_hot(idx0, N_ORI)
         + frac * jax.nn.one_hot(idx1, N_ORI))                     # (B, K, 8out, 8in)
    cells = jnp.einsum("bkoi,bkci->bkco", S, cells)

    desc = cells.reshape(B, K, N_CELLS * N_CELLS * N_ORI)
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-8)
    desc = jnp.clip(desc, 0.0, 0.2)
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-8)
    desc = jnp.where(valid[..., None], desc, 0.0)
    return desc.astype(jnp.bfloat16)
