"""Stereo depth at keypoints — rectified-pair block matching, batched on device.

Gives the vo_tpu engine a true stereo front-end (the reference's 'Stereo' naming
actually consumes precomputed depth maps, vo_stereo_runner.py:39; its notebook stereo
variant triangulates temporal matches). Here: ZNCC block matching along the epipolar
row at each detected keypoint, parabolic sub-pixel refinement, depth = fx * baseline /
disparity. Fixed disparity budget, masked validity — jits and vmaps over frames.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vo_tpu.ops.image import gaussian_blur


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
    r = patch // 2
    lg = gaussian_blur(left[None], 1.0)[0]
    rg = gaussian_blur(right[None], 1.0)[0]

    xi = jnp.clip(kp[:, 0].astype(jnp.int32), r + max_disp, W - 1 - r)
    yi = jnp.clip(kp[:, 1].astype(jnp.int32), r, H - 1 - r)

    dy = jnp.arange(-r, r + 1)
    dx = jnp.arange(-r, r + 1)
    # Left patches: (K, P, P)
    lpatch = lg[yi[:, None, None] + dy[None, :, None],
                xi[:, None, None] + dx[None, None, :]]
    lmean = lpatch.mean(axis=(1, 2), keepdims=True)
    lzero = lpatch - lmean
    lnorm = jnp.sqrt(jnp.sum(lzero * lzero, axis=(1, 2)) + 1e-6)

    # Right strips: (K, P, P + max_disp) spanning all candidate disparities.
    sx = jnp.arange(-(r + max_disp), r + 1)
    strip = rg[yi[:, None, None] + dy[None, :, None],
               xi[:, None, None] + sx[None, None, :]]

    # ZNCC for every disparity as CONVOLUTIONS over the strip — the naive
    # vmap-over-disparities materializes a (D, K, P, P) window tensor whose (P, P)
    # trailing dims pad to full (8, 128) TPU tiles: 25x memory expansion, 16 GB at
    # bench scale, OOM. Instead: the cross term is a depthwise conv of the strip
    # with each keypoint's zero-mean left patch as its own channel kernel (the
    # l-mean term vanishes because sum(lzero) == 0), and the window mean/variance
    # come from two box convs. Nothing with a disparity axis ever exceeds
    # (K, max_disp) and the MXU does the sliding work.
    P = patch
    sf32 = strip.astype(jnp.float32)
    K_n = sf32.shape[0]

    dn = jax.lax.conv_dimension_numbers((1, K_n, P, P + max_disp),
                                        (K_n, 1, P, P), ("NCHW", "OIHW", "NCHW"))
    cross = jax.lax.conv_general_dilated(
        sf32[None], lzero[:, None].astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=K_n)[0, :, 0]   # (K, D+1)

    ones = jnp.ones((1, 1, P, P), jnp.float32)
    dn1 = jax.lax.conv_dimension_numbers((K_n, 1, P, P + max_disp),
                                         (1, 1, P, P), ("NCHW", "OIHW", "NCHW"))
    s1 = jax.lax.conv_general_dilated(sf32[:, None], ones, (1, 1), "VALID",
                                      dimension_numbers=dn1)[:, 0, 0]
    s2 = jax.lax.conv_general_dilated((sf32 * sf32)[:, None], ones, (1, 1),
                                      "VALID", dimension_numbers=dn1)[:, 0, 0]
    wvar = jnp.maximum(s2 - s1 * s1 / (P * P), 0.0)               # (K, D+1)
    zncc_all = cross / (lnorm[:, None] * jnp.sqrt(wvar + 1e-6))

    # Conv output column j is the window starting at strip column j, i.e.
    # disparity d = max_disp - j; reorder to scores[:, d] for d in [0, max_disp).
    scores = zncc_all[:, ::-1][:, :max_disp]                      # (K, max_disp)

    best = jnp.argmax(scores, axis=1)
    best_score = jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]

    # Parabolic sub-pixel around the peak.
    bm = jnp.clip(best, 1, max_disp - 2)
    s_m = jnp.take_along_axis(scores, (bm - 1)[:, None], axis=1)[:, 0]
    s_0 = jnp.take_along_axis(scores, bm[:, None], axis=1)[:, 0]
    s_p = jnp.take_along_axis(scores, (bm + 1)[:, None], axis=1)[:, 0]
    denom = (s_m - 2 * s_0 + s_p)
    delta = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (s_m - s_p) / denom, 0.0)
    disp = bm.astype(jnp.float32) + jnp.clip(delta, -1.0, 1.0)

    fx = K_mat[0, 0]
    depth = fx * baseline / jnp.maximum(disp, 0.5)
    ok = (valid & (best_score > min_zncc) & (best > 0)
          & (kp[:, 0] >= r + max_disp) & (kp[:, 0] < W - r)
          & (kp[:, 1] >= r) & (kp[:, 1] < H - r))
    return depth, ok
