"""Stereo depth at keypoints — rectified-pair block matching, batched on device.

Gives the vo_tpu engine a true stereo front-end (the reference's 'Stereo' naming
actually consumes precomputed depth maps, vo_stereo_runner.py:39; its notebook stereo
variant triangulates temporal matches). Here: ZNCC block matching along the epipolar
row at each detected keypoint, parabolic sub-pixel refinement, depth = fx * baseline /
disparity. Fixed disparity budget, masked validity — jits and vmaps over frames.

TPU formulation (third iteration, each measured at bench scale, 2048 kp, 376x1232):
  1. vmap over disparities gathering (D, K, P, P) windows — the (P, P) trailing dims
     pad to full (8, 128) tiles, 25x memory expansion, 16 GB, OOM.
  2. per-keypoint (K, P, P+D) strips + im2col GEMM — correct and compact, but the
     2.5M-element two-axis gather alone costs 39 ms/frame; the ZNCC math is free
     next to it.
  3. THIS: a dense cost-volume scan with NO per-keypoint patch gathers. Box sums of
     the left/right images and their squares are computed once (separable 9-tap
     convs); each scan step rolls the right image's precomputed sums by one
     disparity, forms the dense ZNCC plane with elementwise ops, and immediately
     reduces it at the keypoint pixels (one tiny (K,) gather per step). The scan
     carries only (K,) vectors (best score / argmax / parabola neighbours), so peak
     memory is a handful of (H, W) planes — measured 3.5 ms/frame, 11x faster than
     the strip gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vo_tpu.ops.image import gaussian_blur, _conv1d


def _box_sum(img: jnp.ndarray, size: int) -> jnp.ndarray:
    """(H, W) -> (H, W) sum over a size x size window (SAME, zero-padded edges)."""
    k = jnp.ones((size,), jnp.float32)
    return _conv1d(_conv1d(img[None], k, axis=1), k, axis=2)[0]


@partial(jax.jit, static_argnames=("max_disp", "patch"))
def stereo_depth_at(
    left: jnp.ndarray,      # (H, W) grayscale
    right: jnp.ndarray,     # (H, W) grayscale, rectified
    kp: jnp.ndarray,        # (K, 2) [x, y] left-image keypoints
    valid: jnp.ndarray,     # (K,)
    K_mat: jnp.ndarray,     # (3, 3)
    baseline: float,
    max_disp: int = 128,
    patch: int = 9,
    min_zncc: float = 0.5,
):
    """Returns (depth (K,), ok (K,)): metric depth at each keypoint, validity mask."""
    H, W = left.shape
    P = patch
    N = P * P
    r = P // 2
    lg = gaussian_blur(left[None], 1.0)[0].astype(jnp.float32)
    rg = gaussian_blur(right[None], 1.0)[0].astype(jnp.float32)

    xi = jnp.clip(kp[:, 0].astype(jnp.int32), r + max_disp, W - 1 - r)
    yi = jnp.clip(kp[:, 1].astype(jnp.int32), r, H - 1 - r)

    # Dense window statistics, once. sigma^2 * N for each window center.
    bl = _box_sum(lg, P)
    blsq = _box_sum(lg * lg, P)
    br = _box_sum(rg, P)
    brsq = _box_sum(rg * rg, P)
    lvar = jnp.maximum(blsq - bl * bl / N, 0.0)
    rvar = jnp.maximum(brsq - br * br / N, 0.0)

    lnorm_kp = jnp.sqrt(lvar[yi, xi] + 1e-6)
    bl_kp = bl[yi, xi]

    neg_inf = jnp.float32(-jnp.inf)
    K_n = kp.shape[0]
    init = (jnp.full((K_n,), neg_inf),          # best score
            jnp.zeros((K_n,), jnp.int32),       # best disparity
            jnp.zeros((K_n,)),                  # s[best-1] (parabola left)
            jnp.zeros((K_n,)),                  # s[best+1] (parabola right)
            jnp.full((K_n,), neg_inf))          # previous step's score

    def step(carry, d):
        best, bestd, sm, sp, prev = carry
        # Right pixel x - d aligns under left pixel x: roll right-image sums by +d.
        # (Wrapped columns only affect x < r + max_disp, which the ok-gate excludes.)
        rd = jnp.roll(rg, d, axis=1)
        cross = _box_sum(lg * rd, P)
        brd = jnp.roll(br, d, axis=1)
        rvard = jnp.roll(rvar, d, axis=1)
        s_kp = ((cross[yi, xi] - bl_kp * brd[yi, xi] / N)
                / (lnorm_kp * jnp.sqrt(rvard[yi, xi] + 1e-6)))

        # Capture the parabola's right neighbour one step after a new best.
        sp = jnp.where(bestd == d - 1, s_kp, sp)
        new_best = s_kp > best
        sm = jnp.where(new_best, prev, sm)
        sp = jnp.where(new_best, 0.0, sp)
        bestd = jnp.where(new_best, d, bestd)
        best = jnp.maximum(best, s_kp)
        return (best, bestd, sm, sp, s_kp), None

    (best, bestd, sm, sp, _), _ = jax.lax.scan(step, init,
                                               jnp.arange(max_disp))

    # Parabolic sub-pixel around the peak; endpoints fall back to the integer peak.
    s0 = best
    denom = sm - 2.0 * s0 + sp
    interior = (bestd > 0) & (bestd < max_disp - 1)
    delta = jnp.where(interior & (jnp.abs(denom) > 1e-6),
                      0.5 * (sm - sp) / denom, 0.0)
    disp = bestd.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)

    fx = K_mat[0, 0]
    depth = fx * baseline / jnp.maximum(disp, 0.5)
    ok = (valid & (best > min_zncc) & (bestd > 0)
          & (kp[:, 0] >= r + max_disp) & (kp[:, 0] < W - r)
          & (kp[:, 1] >= r) & (kp[:, 1] < H - r))
    return depth, ok
