"""Road segmentation for the parking layer — counterpart of Utils/seg_utils.py:13-79.

The reference's ``auto_park_vision`` runs a ShelfNet18 semantic-segmentation forward
pass to produce a road mask feeding the parking-spot scanner — but the network lives in
a gitignored directory and ``weights_path`` is undefined (seg_utils.py:75), so it is
non-functional upstream. Here the same role is filled by a small first-party FCN in
pure JAX (jittable, batched, NHWC, bfloat16-friendly) that can be trained or loaded
from a checkpoint, plus a zero-weight heuristic fallback so the parking pipeline always
has a mask.

The contract matches the reference: ``auto_park_vision(img) -> (H, W) bool`` road mask
(seg_utils.py:13 returns the class-argmax road channel).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SegNetSpec(NamedTuple):
    """3-level encoder-decoder FCN: stride-2 conv downs, bilinear ups, skip adds.
    ~120k params at width 32 — sized for a 2-class road/not-road task, not ImageNet."""

    width: int = 32
    n_classes: int = 2


def _conv(p, x, stride=1):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _init_conv(key, kh, kw, cin, cout):
    fan = kh * kw * cin
    return {"w": jax.random.normal(key, (kh, kw, cin, cout)) * (2.0 / fan) ** 0.5,
            "b": jnp.zeros((cout,))}


def init_segnet_params(key, spec: SegNetSpec = SegNetSpec()):
    w = spec.width
    ks = jax.random.split(key, 7)
    return {
        "stem": _init_conv(ks[0], 3, 3, 3, w),
        "down1": _init_conv(ks[1], 3, 3, w, 2 * w),
        "down2": _init_conv(ks[2], 3, 3, 2 * w, 4 * w),
        "mid": _init_conv(ks[3], 3, 3, 4 * w, 4 * w),
        "up1": _init_conv(ks[4], 3, 3, 4 * w, 2 * w),
        "up2": _init_conv(ks[5], 3, 3, 2 * w, w),
        "head": _init_conv(ks[6], 1, 1, w, spec.n_classes),
    }


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


@partial(jax.jit, static_argnames=("spec",))
def apply_segnet(params, images: jnp.ndarray,
                 spec: SegNetSpec = SegNetSpec()) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float RGB in [0, 255] -> (B, H, W, n_classes) logits.
    H and W must be multiples of 4 (two stride-2 levels)."""
    x = jnp.asarray(images, jnp.float32) / 127.5 - 1.0
    e0 = jax.nn.relu(_conv(params["stem"], x))
    e1 = jax.nn.relu(_conv(params["down1"], e0, stride=2))
    e2 = jax.nn.relu(_conv(params["down2"], e1, stride=2))
    m = jax.nn.relu(_conv(params["mid"], e2)) + e2
    u1 = jax.nn.relu(_conv(params["up1"], _upsample2(m))) + e1
    u2 = jax.nn.relu(_conv(params["up2"], _upsample2(u1))) + e0
    return _conv(params["head"], u2)


def auto_park_vision(image: jnp.ndarray, params=None,
                     spec: SegNetSpec = SegNetSpec(),
                     road_class: int = 1) -> jnp.ndarray:
    """(H, W, 3) RGB -> (H, W) bool road mask — the reference's entry point
    (seg_utils.py:13, class-argmax road channel). With ``params=None`` (the upstream
    missing-weights situation) falls back to ``heuristic_road_mask`` instead of
    crashing like the reference does."""
    if params is None:
        return heuristic_road_mask(image)
    logits = apply_segnet(params, jnp.asarray(image)[None], spec)[0]
    return jnp.argmax(logits, axis=-1) == road_class


def heuristic_road_mask(image: jnp.ndarray, luma_lo: float = 60.0,
                        luma_hi: float = 180.0, sat_max: float = 40.0) -> jnp.ndarray:
    """Zero-parameter road proposal: road surfaces are mid-luminance, low-saturation
    regions. Good enough to drive ``parking.find_spot_corners`` on lot imagery when no
    trained weights exist (the reference has no working fallback at all)."""
    img = jnp.asarray(image, jnp.float32)
    if img.ndim == 2:
        luma, sat = img, jnp.zeros_like(img)
    else:
        luma = img.mean(axis=-1)
        sat = img.max(axis=-1) - img.min(axis=-1)
    return (luma >= luma_lo) & (luma <= luma_hi) & (sat <= sat_max)


def seg_train_step(params, opt_state, images, labels, optimizer,
                   spec: SegNetSpec = SegNetSpec()):
    """One supervised step (softmax cross-entropy) — the training loop the reference
    defers to the external ShelfNet repo. ``optimizer`` is any optax transform."""
    import optax

    def loss_fn(p):
        logits = apply_segnet(p, images, spec)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss
