"""Corner detection + NMS + deterministic fixed-K selection, batched on device.

The TPU-native replacement for cv2.ORB_create().detect / SIFT DoG extrema
(feature_extractors/ORB.py:17, SIFT.py:12): a Harris/Shi-Tomasi response map from
MXU-friendly convolutions, 2-D max-pool NMS (same trick the reference's R2D2 NMS uses,
R2D2.py:84-99), then ``lax.top_k`` to a **fixed** keypoint budget with a validity mask —
no dynamic shapes anywhere, so the whole detector jits, vmaps over frames, and shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vo_tpu.ops.image import (
    gaussian_blur,
    sobel_gradients,
    maxpool2d_same,
)


def _structure_tensor(gray: jnp.ndarray, sigma_d: float, sigma_i: float):
    """Per-pixel 2x2 gradient covariance (Ixx, Iyy, Ixy), smoothed."""
    g = gaussian_blur(gray, sigma_d)
    gx, gy = sobel_gradients(g)
    ixx = gaussian_blur(gx * gx, sigma_i)
    iyy = gaussian_blur(gy * gy, sigma_i)
    ixy = gaussian_blur(gx * gy, sigma_i)
    return ixx, iyy, ixy


def harris_response(gray: jnp.ndarray, k: float = 0.04,
                    sigma_d: float = 1.0, sigma_i: float = 1.5) -> jnp.ndarray:
    """Harris corner response det(M) - k tr(M)^2 over (B, H, W) grayscale."""
    ixx, iyy, ixy = _structure_tensor(gray, sigma_d, sigma_i)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    return det - k * tr * tr


def shi_tomasi_response(gray: jnp.ndarray, sigma_d: float = 1.0,
                        sigma_i: float = 1.5) -> jnp.ndarray:
    """Min-eigenvalue (Shi-Tomasi) response over (B, H, W)."""
    ixx, iyy, ixy = _structure_tensor(gray, sigma_d, sigma_i)
    half_tr = 0.5 * (ixx + iyy)
    disc = jnp.sqrt(jnp.maximum(half_tr * half_tr - (ixx * iyy - ixy * ixy), 0.0))
    return half_tr - disc


def dog_response(gray: jnp.ndarray, sigma: float = 1.0,
                 k: float = 1.6) -> jnp.ndarray:
    """|Difference-of-Gaussians| blob response over (B, H, W) — the within-level
    detector of cv2 SIFT's scale space (feature_extractors/SIFT.py:8; the octave
    dimension comes from features/pyramid.py running this per level). Absolute value
    keeps both bright and dark blob extrema as NMS candidates."""
    from vo_tpu.ops.image import gaussian_blur

    return jnp.abs(gaussian_blur(gray, k * sigma) - gaussian_blur(gray, sigma))


def refine_subpixel(response: jnp.ndarray, kp: jnp.ndarray,
                    valid: jnp.ndarray) -> jnp.ndarray:
    """Quadratic (parabola) peak interpolation: integer peaks -> subpixel coords.

    Integer-pixel keypoints put a ~0.3 px rms quantization floor under every match
    residual, which is exactly the noise floor windowed BA bottoms out on. Fitting a
    1-D parabola through the response at the peak and its two axis neighbours (the
    standard cv2.cornerSubPix-lite) recovers the fractional offset at the cost of
    six gathers per keypoint. Offsets are clamped to (-0.5, 0.5); invalid rows pass
    through untouched."""
    B, H, W = response.shape
    bt = jnp.arange(B)[:, None]
    xi = jnp.clip(kp[..., 0].astype(jnp.int32), 1, W - 2)
    yi = jnp.clip(kp[..., 1].astype(jnp.int32), 1, H - 2)
    c = response[bt, yi, xi]
    xm = response[bt, yi, xi - 1]
    xp = response[bt, yi, xi + 1]
    ym = response[bt, yi - 1, xi]
    yp = response[bt, yi + 1, xi]

    def off(m, p):
        denom = m - 2.0 * c + p
        d = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (m - p) / denom, 0.0)
        return jnp.clip(d, -0.5, 0.5)

    dx = jnp.where(valid, off(xm, xp), 0.0)
    dy = jnp.where(valid, off(ym, yp), 0.0)
    return kp + jnp.stack([dx, dy], axis=-1)


@partial(jax.jit, static_argnames=("max_kp", "nms_size", "border", "subpixel"))
def detect_keypoints(
    response: jnp.ndarray,
    max_kp: int = 2048,
    nms_size: int = 5,
    rel_threshold: float = 1e-4,
    border: int = 16,
    subpixel: bool = False,
):
    """Select the top ``max_kp`` NMS-surviving response peaks per image.

    Args:
      response: (B, H, W) corner response map.
      max_kp: fixed keypoint budget (pad bucket; SURVEY.md §7 "variable keypoint counts").
      nms_size: odd side of the non-max suppression window.
      rel_threshold: keep peaks with response > rel_threshold * scale, where scale
        is a ROBUST per-image estimate: 10x the median of 32-px-tile response
        maxima (not the single global max — changed r04). For well-conditioned
        images the two agree, so the default keeps its calibration; externally
        tuned thresholds calibrated against the old global-max scale, or used
        with heavy-tailed non-Harris responses, may need re-tuning.
      border: suppress detections within this margin (descriptor patch must fit).
      subpixel: parabola-refine peak coordinates (see ``refine_subpixel``).
    Returns:
      kp: (B, max_kp, 2) float32 [x, y] pixel coords (0 where invalid).
      score: (B, max_kp) response values.
      valid: (B, max_kp) bool mask.
    Deterministic: ties broken by flattened pixel order via top_k's stable ordering.
    """
    B, H, W = response.shape
    is_peak = response >= maxpool2d_same(response, nms_size)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 2)
    row = jax.lax.broadcasted_iota(jnp.int32, (B, H, W), 1)
    in_border = ((col >= border) & (col < W - border) &
                 (row >= border) & (row < H - border))

    # Robust response scale: the detection floor used to be relative to the single
    # strongest |response|, so one ultra-strong corner (e.g. a close textured
    # surface entering the frame) raised the floor over the WHOLE image — measured
    # on a U-turn frame: max response 2x a healthy frame's but p99.9 78x lower, and
    # detection collapsed to ~20 keypoints. Anchor instead to 10x the median of
    # per-tile (32 px) maxima: a lone hot tile cannot move the median, and for
    # well-conditioned images 10x the median tile max ~ the global max, so the
    # default rel_threshold keeps its calibration.
    t = 32
    Hp, Wp = -(-H // t) * t, -(-W // t) * t
    rp = jnp.pad(response, ((0, 0), (0, Hp - H), (0, Wp - W)),
                 constant_values=0.0)
    tiles = rp.reshape(B, Hp // t, t, Wp // t, t).max(axis=(2, 4))
    scale = 10.0 * jnp.median(jnp.maximum(tiles.reshape(B, -1), 0.0), axis=1)
    scale = jnp.maximum(scale, 1e-20)[:, None, None]
    strong = response > rel_threshold * scale

    masked = jnp.where(is_peak & in_border & strong, response, -jnp.inf)

    # Two-stage top-k: reduce each 2x2 cell to its max first, so the expensive global
    # top_k sees 4x fewer elements (measured ~2x faster detection on v5e at
    # 376x1232/2048 kp). Lossless for NMS survivors: with nms_size >= 3 two surviving
    # peaks are > 1 px apart (Chebyshev), so no 2x2 cell holds two of them (exact-tie
    # neighbors collapse to one — the right behavior anyway). The winning sub-position
    # inside each selected cell is recovered by a tiny 4-point gather afterwards,
    # keeping the dense phase reduction-only.
    Hp, Wp = H + (H % 2), W + (W % 2)
    if max_kp > (Hp // 2) * (Wp // 2):
        # Tiny image / large budget: the cell reduction cannot supply max_kp
        # candidates (lax.top_k over fewer elements than k errors) — flat top_k.
        score, idx = jax.lax.top_k(masked.reshape(B, -1), min(max_kp, H * W))
        pad_k = max_kp - score.shape[1]
        if pad_k:
            score = jnp.pad(score, ((0, 0), (0, pad_k)), constant_values=-jnp.inf)
            idx = jnp.pad(idx, ((0, 0), (0, pad_k)))
        y = (idx // W).astype(jnp.float32)
        x = (idx % W).astype(jnp.float32)
        valid = jnp.isfinite(score)
        kp = jnp.stack([jnp.where(valid, x, 0.0), jnp.where(valid, y, 0.0)], axis=-1)
        if subpixel:
            kp = refine_subpixel(response, kp, valid)
        return kp, jnp.where(valid, score, 0.0), valid
    if (Hp, Wp) != (H, W):
        masked = jnp.pad(masked, ((0, 0), (0, Hp - H), (0, Wp - W)),
                         constant_values=-jnp.inf)
    cmax = masked.reshape(B, Hp // 2, 2, Wp // 2, 2).max(axis=(2, 4))

    score, idx = jax.lax.top_k(cmax.reshape(B, -1), max_kp)
    cy = idx // (Wp // 2)
    cx = idx % (Wp // 2)
    bt = jnp.arange(B)[:, None]
    subs = jnp.stack([masked[bt, 2 * cy, 2 * cx], masked[bt, 2 * cy, 2 * cx + 1],
                      masked[bt, 2 * cy + 1, 2 * cx],
                      masked[bt, 2 * cy + 1, 2 * cx + 1]], axis=-1)
    sel = jnp.argmax(subs, axis=-1).astype(jnp.int32)       # 2*dy + dx, first-match tie
    y = (2 * cy + sel // 2).astype(jnp.float32)
    x = (2 * cx + sel % 2).astype(jnp.float32)
    valid = jnp.isfinite(score)
    kp = jnp.stack([jnp.where(valid, x, 0.0), jnp.where(valid, y, 0.0)], axis=-1)
    if subpixel:
        kp = refine_subpixel(response, kp, valid)
    score = jnp.where(valid, score, 0.0)
    return kp, score, valid
