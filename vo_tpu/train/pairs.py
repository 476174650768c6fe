"""Self-supervised training pairs: random-homography warps with exact ground-truth flow.

The reference trains R2D2 on image pairs whose correspondence comes from synthetic
homographies (datasets/pair_dataset.py:119-168 ``SyntheticPairDataset``) or stored
optical flow. Here pair synthesis is a pure-JAX, on-device transform: one call produces
a batch of (img1, img2, flow, mask) with no host dataloader in the loop (the CPU
PairLoader random-window search, tools/dataloader.py:62-253, disappears entirely — the
whole pipeline stays on the accelerator).

Procedural base textures (random Fourier features) let training run with zero input
data; ``warp_pair`` works the same on real image batches.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def procedural_texture(key, batch: int, H: int, W: int, n_waves: int = 48) -> jnp.ndarray:
    """(B, H, W) smooth band-limited textures in [0, 255] — corner-rich, seedable."""
    k1, k2, k3 = jax.random.split(key, 3)
    freq = jax.random.uniform(k1, (batch, n_waves, 2), minval=0.02, maxval=0.35)
    phase = jax.random.uniform(k2, (batch, n_waves), maxval=2 * jnp.pi)
    amp = jax.random.uniform(k3, (batch, n_waves), minval=0.3, maxval=1.0)
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    arg = (freq[..., 0, None, None] * ys[None, None, :, None]
           + freq[..., 1, None, None] * xs[None, None, None, :]
           + phase[..., None, None])
    waves = amp[..., None, None] * jnp.sin(arg)
    img = waves.sum(axis=1)
    img = img / (jnp.abs(img).max(axis=(1, 2), keepdims=True) + 1e-6)
    return (img * 100.0 + 128.0).clip(0, 255)


def random_homography(key, H: int, W: int, max_rot: float = 0.35,
                      max_scale: float = 0.25, max_persp: float = 3e-4,
                      max_shift: float = 0.08) -> jnp.ndarray:
    """Random 3x3 homography about the image center (rotation/scale/shear/perspective)."""
    kr, ks, kp, kt, ksh = jax.random.split(key, 5)
    ang = jax.random.uniform(kr, (), minval=-max_rot, maxval=max_rot)
    sc = jnp.exp(jax.random.uniform(ks, (2,), minval=-max_scale, maxval=max_scale))
    sh = jax.random.uniform(ksh, (), minval=-0.15, maxval=0.15)
    persp = jax.random.uniform(kp, (2,), minval=-max_persp, maxval=max_persp)
    shift = jax.random.uniform(kt, (2,), minval=-max_shift, maxval=max_shift)
    c, s = jnp.cos(ang), jnp.sin(ang)
    A = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    A = A.at[:2, :2].set(jnp.array([[c, -s], [s, c]]) * sc[None, :])
    A = A.at[0, 1].add(sh)
    A = A.at[0, 2].set(shift[0] * W)
    A = A.at[1, 2].set(shift[1] * H)
    A = A.at[2, 0].set(persp[0])
    A = A.at[2, 1].set(persp[1])
    # Conjugate by the center translation so the transform pivots on the image center.
    C = jnp.array([[1.0, 0, -W / 2], [0, 1.0, -H / 2], [0, 0, 1.0]])
    Cinv = jnp.array([[1.0, 0, W / 2], [0, 1.0, H / 2], [0, 0, 1.0]])
    return Cinv @ A @ C


def _apply_h(Hmat, xy):
    ones = jnp.ones_like(xy[..., :1])
    p = jnp.concatenate([xy, ones], axis=-1) @ Hmat.T
    return p[..., :2] / p[..., 2:].clip(1e-8)


def warp_pair(img: jnp.ndarray, Hmat: jnp.ndarray):
    """Warp one (H, W) image by a homography.

    Returns (img2, flow, mask): img2[p] = img[H^-1 p]; flow maps img coords ->
    img2 coords (flow[y, x] = H [x, y]); mask marks pixels whose correspondence lands
    inside img2.
    """
    Hh, Ww = img.shape
    ys = jnp.arange(Hh, dtype=jnp.float32)
    xs = jnp.arange(Ww, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    grid = jnp.stack([gx, gy], axis=-1)                 # (H, W, 2)

    Hinv = jnp.linalg.inv(Hmat)
    src = _apply_h(Hinv, grid)                          # where img2 samples img1
    x0 = jnp.clip(src[..., 0], 0.0, Ww - 1.0)
    y0 = jnp.clip(src[..., 1], 0.0, Hh - 1.0)
    xi = jnp.floor(x0).astype(jnp.int32).clip(0, Ww - 2)
    yi = jnp.floor(y0).astype(jnp.int32).clip(0, Hh - 2)
    fx = x0 - xi
    fy = y0 - yi
    img2 = ((1 - fy) * ((1 - fx) * img[yi, xi] + fx * img[yi, xi + 1])
            + fy * ((1 - fx) * img[yi + 1, xi] + fx * img[yi + 1, xi + 1]))
    in_src = ((src[..., 0] >= 0) & (src[..., 0] <= Ww - 1)
              & (src[..., 1] >= 0) & (src[..., 1] <= Hh - 1))
    img2 = jnp.where(in_src, img2, 0.0)

    flow = _apply_h(Hmat, grid)                         # img1 -> img2 coords
    mask = ((flow[..., 0] >= 0) & (flow[..., 0] <= Ww - 1)
            & (flow[..., 1] >= 0) & (flow[..., 1] <= Hh - 1))
    return img2, flow, mask


@partial(jax.jit, static_argnames=("batch", "H", "W", "photometric"))
def synthetic_pair_batch(key, batch: int, H: int, W: int, photometric: bool = False):
    """Full on-device batch: (img1, img2 (B, H, W), flow (B, H, W, 2), mask (B, H, W)).
    ``photometric=True`` adds gain/bias/gamma/noise jitter to the warped view."""
    k_tex, k_h, k_p = jax.random.split(key, 3)
    img1 = procedural_texture(k_tex, batch, H, W)
    hkeys = jax.random.split(k_h, batch)
    Hmats = jax.vmap(lambda k: random_homography(k, H, W))(hkeys)
    img2, flow, mask = jax.vmap(warp_pair)(img1, Hmats)
    if photometric:
        img2 = jax.vmap(photometric_augment)(jax.random.split(k_p, batch), img2)
    return img1, img2, flow, mask


def photometric_augment(key, img: jnp.ndarray, max_gain: float = 0.25,
                        max_bias: float = 20.0, max_gamma: float = 0.25,
                        noise_std: float = 5.0) -> jnp.ndarray:
    """Correspondence-preserving photometric jitter for one (H, W) image in [0, 255]:
    gain/bias (the reference's ColorJitter brightness/contrast,
    tools/transforms.py:384-430 behavior), gamma, and i.i.d. pixel noise
    (``RandomNoise``/PixelNoise, tools/transforms.py:433-452). Geometry untouched, so
    flow/mask stay exact."""
    kg, kb, kgam, kn = jax.random.split(key, 4)
    gain = jnp.exp(jax.random.uniform(kg, (), minval=-max_gain, maxval=max_gain))
    bias = jax.random.uniform(kb, (), minval=-max_bias, maxval=max_bias)
    gamma = jnp.exp(jax.random.uniform(kgam, (), minval=-max_gamma, maxval=max_gamma))
    noise = noise_std * jax.random.normal(kn, img.shape)
    x = (img / 255.0).clip(0.0, 1.0) ** gamma
    return (255.0 * gain * x + bias + noise).clip(0.0, 255.0)


def pair_batch_from_images(key, images: jnp.ndarray, photometric: bool = True):
    """Training pairs from *real* images (B, H, W): random homography warp + exact flow
    (the reference's SyntheticPairDataset applied to loaded images,
    datasets/pair_dataset.py:119-168) with photometric jitter on the warped view.

    Returns (img1, img2, flow, mask) exactly like ``synthetic_pair_batch``.
    """
    images = jnp.asarray(images, jnp.float32)
    B, H, W = images.shape
    k_h, k_p = jax.random.split(key)
    Hmats = jax.vmap(lambda k: random_homography(k, H, W))(jax.random.split(k_h, B))
    img2, flow, mask = jax.vmap(warp_pair)(images, Hmats)
    if photometric:
        img2 = jax.vmap(photometric_augment)(jax.random.split(k_p, B), img2)
    return images, img2, flow, mask


@jax.jit
def photometric_augment_batch(key, imgs: jnp.ndarray) -> jnp.ndarray:
    """Jitted per-image photometric jitter over a (B, H, W) batch.

    Callers in host loops must use this (not a bare ``jax.vmap(photometric_augment)``,
    which executes op-by-op — hundreds of tiny dispatches per step, ruinous over a
    high-latency device link)."""
    return jax.vmap(photometric_augment)(jax.random.split(key, imgs.shape[0]), imgs)


@partial(jax.jit, static_argnames=("photometric",))
def warp_eval_batch(key, images: jnp.ndarray, photometric: bool = True):
    """One fused dispatch for the MMA harness's pair synthesis: per-image random
    homographies + warp (+ photometric jitter). Returns (Hmats (B,3,3), img2)."""
    images = jnp.asarray(images, jnp.float32)
    B, H, W = images.shape
    k_h, k_p = jax.random.split(key)
    Hmats = jax.vmap(lambda k: random_homography(k, H, W))(jax.random.split(k_h, B))
    img2, _, _ = jax.vmap(warp_pair)(images, Hmats)
    if photometric:
        img2 = jax.vmap(photometric_augment)(jax.random.split(k_p, B), img2)
    return Hmats, img2
