"""SURF-style features: box-filter Hessian detector + upright Haar-wavelet SURF-64.

Plays the role of the reference's SURF path (feature_extractors/SURF.py:8-12,
cv2.xfeatures2d.SURF detector/descriptors + L2 matching) with a TPU-shaped
formulation. SURF's whole point — integral-image box filters instead of Gaussian
derivatives — maps naturally onto separable shift-add convolutions:

1. Detector: determinant-of-Hessian with the classic 3-band Dxx/Dyy and
   quadrant-box Dxy approximations at a small lobe pyramid (filter sizes 9/15/21),
   max-reduced over scale. Pure VPU shift-add traffic, one pass per scale.
2. Descriptor: dense Haar responses dx, dy (difference of adjacent box means),
   box-pooled once per plane so every pixel holds its cell sum, then 16 regular
   gathers (4x4 cell grid) of (sum dx, sum |dx|, sum dy, sum |dy|) -> (K, 64),
   L2-normalized. Upright variant (no dominant-orientation rotation), matching the
   fast BRIEF/gradhist paths' trade-off.

Match with ``ratio_match`` at the reference's 0.85 ratio (SURF.py:26-29).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

N_CELLS = 4     # 4x4 spatial grid
CELL_SIZE = 5   # px per cell => 20x20 px support
HAAR_S = 2      # Haar wavelet half-size (responses over 2s x 2s support)


def _box_sum_1d(img: jnp.ndarray, size: int, axis: int) -> jnp.ndarray:
    """Unnormalized 1-D box sum along H (axis=1) or W (axis=2) of (B, H, W), SAME.

    Shift-and-add like ops.image._conv1d but supporting even sizes (pads
    (size-1)//2 left, size//2 right). Pure VPU traffic.
    """
    n = img.shape[axis]
    pad = [(0, 0)] * img.ndim
    pad[axis] = ((size - 1) // 2, size // 2)
    xp = jnp.pad(img, pad)
    out = jnp.zeros_like(img)
    for i in range(size):
        sl = [slice(None)] * img.ndim
        sl[axis] = slice(i, i + n)
        out = out + xp[tuple(sl)]
    return out


def _shift(img: jnp.ndarray, d: int, axis: int) -> jnp.ndarray:
    """Shift with zero fill: out[..., i, ...] = img[..., i + d, ...]."""
    n = img.shape[axis]
    pad = [(0, 0)] * img.ndim
    pad[axis] = (max(-d, 0), max(d, 0))
    xp = jnp.pad(img, pad)
    sl = [slice(None)] * img.ndim
    sl[axis] = slice(max(d, 0), max(d, 0) + n)
    return xp[tuple(sl)]


def hessian_response(gray: jnp.ndarray, lobes: tuple[int, ...] = (3, 5, 7)) -> jnp.ndarray:
    """(B, H, W) -> (B, H, W) determinant-of-Hessian response, max over scales.

    Per lobe L (SURF filter size 3L): Dxx is three vertical bands (width L,
    height 2L-1, weights +1 -2 +1), Dyy its transpose, Dxy four LxL quadrant
    boxes. Responses are normalized by filter area so scales are comparable,
    and det H = Dxx*Dyy - (0.9*Dxy)^2 (Bay et al.'s 0.9 weight balance).
    """
    gray = gray.astype(jnp.float32)
    out = None
    for L in lobes:
        band_h = 2 * L - 1
        # Dxx: box sum (w=L, h=2L-1), second difference along x with step L.
        s = _box_sum_1d(_box_sum_1d(gray, L, axis=2), band_h, axis=1)
        dxx = _shift(s, -L, axis=2) - 2.0 * s + _shift(s, L, axis=2)
        t = _box_sum_1d(_box_sum_1d(gray, L, axis=1), band_h, axis=2)
        dyy = _shift(t, -L, axis=1) - 2.0 * t + _shift(t, L, axis=1)
        # Dxy: LxL quadrant boxes offset diagonally by (L+1)/2 from center.
        q = _box_sum_1d(_box_sum_1d(gray, L, axis=1), L, axis=2)
        # Canonical SURF places the LxL quadrants adjacent to the center cross: their
        # centers sit at +/-(L+1)/2 from the filter center (ADVICE round-1: +/-L left
        # a gap and weakened the Dxy response).
        o = (L + 1) // 2
        pp = _shift(_shift(q, o, axis=1), o, axis=2)
        mm = _shift(_shift(q, -o, axis=1), -o, axis=2)
        pm = _shift(_shift(q, o, axis=1), -o, axis=2)
        mp = _shift(_shift(q, -o, axis=1), o, axis=2)
        dxy = pp + mm - pm - mp
        # Area normalization (filter size 3L) keeps scales comparable.
        norm = 1.0 / float((3 * L) ** 2)
        dxx, dyy, dxy = dxx * norm, dyy * norm, dxy * norm
        det = dxx * dyy - (0.9 * dxy) ** 2
        out = det if out is None else jnp.maximum(out, det)
    return out


@partial(jax.jit, static_argnames=())
def dense_haar_planes(gray: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, H, W, 4) cell-pooled (dx, |dx|, dy, |dy|) Haar planes."""
    gray = gray.astype(jnp.float32)
    s = HAAR_S
    # Haar dx at p: sum over right s x 2s half minus left half == difference of two
    # shifted (2s high, s wide) box sums.
    bx = _box_sum_1d(_box_sum_1d(gray, s, axis=2), 2 * s, axis=1)
    dx = _shift(bx, (s + 1) // 2, axis=2) - _shift(bx, -((s + 1) // 2), axis=2)
    by = _box_sum_1d(_box_sum_1d(gray, s, axis=1), 2 * s, axis=2)
    dy = _shift(by, (s + 1) // 2, axis=1) - _shift(by, -((s + 1) // 2), axis=1)
    planes = jnp.stack([dx, jnp.abs(dx), dy, jnp.abs(dy)], axis=-1)
    # One box pool realizes the per-cell accumulation for every candidate center.
    pooled = jax.vmap(
        lambda p: _box_sum_1d(_box_sum_1d(p, CELL_SIZE, axis=1), CELL_SIZE, axis=2),
        in_axes=-1, out_axes=-1)(planes)
    return pooled


@partial(jax.jit, static_argnames=())
def gather_surf_descriptors(pooled: jnp.ndarray, kp: jnp.ndarray,
                            valid: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 4) pooled planes + (B, K, 2) kp -> (B, K, 64) L2-normed bf16."""
    B, H, W, _ = pooled.shape
    c = (jnp.arange(N_CELLS) - (N_CELLS - 1) / 2.0) * CELL_SIZE
    oy, ox = jnp.meshgrid(c, c, indexing="ij")
    offs = jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)   # (16, 2)

    pts = kp[:, :, None, :] + offs[None, None]                    # (B, K, 16, 2)
    xi = jnp.clip(jnp.round(pts[..., 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(pts[..., 1]).astype(jnp.int32), 0, H - 1)
    batch = jnp.arange(B)[:, None, None]
    cells = pooled[batch, yi, xi]                                 # (B, K, 16, 4)
    desc = cells.reshape(*kp.shape[:2], N_CELLS * N_CELLS * 4)

    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True).clip(1e-8)
    desc = jnp.where(valid[..., None], desc, 0.0)
    return desc.astype(jnp.bfloat16)


def surf_descriptors(gray: jnp.ndarray, kp: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
    return gather_surf_descriptors(dense_haar_planes(gray), kp, valid)
