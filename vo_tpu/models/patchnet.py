"""R2D2-style patch descriptor CNNs in pure JAX — TPU-native reimplementation.

Architectures follow the topology of the reference's vendored patchnet models
(feature_extractors/r2d2/nets/patchnet.py):

- ``QUAD_L2NET_CONFCFS``     <- Quad_L2Net_ConfCFS (:101-138): dilated full-resolution
  trunk (stride replaced by dilation, :56-66), 128-d L2-normed descriptors, reliability
  (2-ch softmax) and repeatability (softplus ratio) heads on x^2.
- ``FAST_QUAD_L2NET_CONFCFS`` <- Fast_Quad_L2Net_ConfCFS (:141-186): one 2x max-pool
  early, dilation series 1,1,1,[pool],1,1,2,2,4,8, bilinear 2x upsample at the end.

This is a from-scratch implementation (explicit conv specs + lax.conv_general_dilated,
NHWC layout, functional params pytree) — not a torch translation; weights from the
reference checkpoints can be ported into it (vo_tpu/models/port_weights.py) since the
published .pt files are data. BatchNorm layers in the checkpoints are affine=False, so
inference BN is a pure (x - mean) * rsqrt(var + eps) with ported running stats.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

BN_EPS = 1e-5


@dataclass(frozen=True)
class ConvSpec:
    in_ch: int
    out_ch: int
    k: int
    dilation: int = 1
    bn: bool = True
    relu: bool = True
    pool_after: int = 1  # max-pool window/stride applied after this layer (1 = none)

    @property
    def pad(self) -> int:
        return ((self.k - 1) * self.dilation) // 2


@dataclass(frozen=True)
class PatchNetSpec:
    name: str
    convs: tuple
    out_dim: int = 128
    upsample: int = 1  # bilinear upsample factor applied after the trunk

    def __hash__(self):
        return hash((self.name, self.convs, self.out_dim, self.upsample))


def _quad_specs(mchan: int = 4, dim: int = 128) -> tuple:
    c = lambda i, o, k, d, bn=True, relu=True, pool=1: ConvSpec(i, o, k, d, bn, relu, pool)
    m = mchan
    return (
        c(3, 8 * m, 3, 1),
        c(8 * m, 8 * m, 3, 1),
        c(8 * m, 16 * m, 3, 1),       # stride->dilation: next layers d*=2
        c(16 * m, 16 * m, 3, 2),
        c(16 * m, 32 * m, 3, 2),      # d*=2
        c(32 * m, 32 * m, 3, 4),
        c(32 * m, 32 * m, 2, 4, relu=False),
        c(32 * m, 32 * m, 2, 8, relu=False),
        c(32 * m, dim, 2, 16, bn=False, relu=False),
    )


def _fast_quad_specs(mchan: int = 4, dim: int = 128, down: int = 2) -> tuple:
    c = lambda i, o, k, d, bn=True, relu=True, pool=1: ConvSpec(i, o, k, d, bn, relu, pool)
    m = mchan
    return (
        c(3, 8 * m, 3, 1),
        c(8 * m, 8 * m, 3, 1),
        c(8 * m, 16 * m, 3, 1, pool=down),  # max-pool downsample instead of a dilation step
        c(16 * m, 16 * m, 3, 1),
        c(16 * m, 32 * m, 3, 1),            # stride->dilation from here
        c(32 * m, 32 * m, 3, 2),
        c(32 * m, 32 * m, 2, 2, relu=False),
        c(32 * m, 32 * m, 2, 4, relu=False),
        c(32 * m, dim, 2, 8, bn=False, relu=False),
    )


QUAD_L2NET_CONFCFS = PatchNetSpec(name="Quad_L2Net_ConfCFS", convs=_quad_specs())
FAST_QUAD_L2NET_CONFCFS = PatchNetSpec(
    name="Fast_Quad_L2Net_ConfCFS", convs=_fast_quad_specs(), upsample=2)


def init_patchnet_params(key, spec: PatchNetSpec, dtype=jnp.float32) -> dict:
    """He-initialized parameter pytree (for training from scratch)."""
    params = {"convs": [], "clf": None, "sal": None}
    keys = jax.random.split(key, len(spec.convs) + 2)
    for i, cs in enumerate(spec.convs):
        fan_in = cs.k * cs.k * cs.in_ch
        w = jax.random.normal(keys[i], (cs.k, cs.k, cs.in_ch, cs.out_ch), dtype)
        w = w * jnp.sqrt(2.0 / fan_in)
        layer = {"w": w, "b": jnp.zeros((cs.out_ch,), dtype)}
        if cs.bn:
            layer["bn_mean"] = jnp.zeros((cs.out_ch,), dtype)
            layer["bn_var"] = jnp.ones((cs.out_ch,), dtype)
        params["convs"].append(layer)
    d = spec.out_dim
    params["clf"] = {"w": jax.random.normal(keys[-2], (1, 1, d, 2), dtype) * 0.05,
                     "b": jnp.zeros((2,), dtype)}
    params["sal"] = {"w": jax.random.normal(keys[-1], (1, 1, d, 1), dtype) * 0.05,
                     "b": jnp.zeros((1,), dtype)}
    return params


def _conv(x, w, b, dilation: int, pad: int):
    out = lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _softplus_ratio(x):
    """softplus(x) / (1 + softplus(x)) — the 1-channel confidence squash
    (patchnet.py:16-20 behavior)."""
    s = jax.nn.softplus(x)
    return s / (1.0 + s)


def apply_patchnet(params: dict, spec: PatchNetSpec, images: jnp.ndarray,
                   train: bool = False, compute_dtype=jnp.float32) -> dict:
    """Forward pass.

    Args:
      params: pytree from ``init_patchnet_params`` or the weight porter.
      images: (B, H, W, 3) ImageNet-normalized float32 (H, W even for the Fast variant).
      train: True normalizes with batch statistics (affine-free BN train mode, matching
        the checkpoints' BatchNorm2d(affine=False)) and adds ``bn_stats`` (per-layer
        (mean, var) batch moments) to the output for running-stat updates.
      compute_dtype: conv-stack activation/weight dtype. bf16 halves the HBM
        traffic of the full-resolution dilated stack (inference only; BN moments
        and the head normalizations stay f32).
    Returns:
      dict(descriptors (B, H', W', D) L2-normalized, reliability (B, H', W'),
           repeatability (B, H', W')[, bn_stats]).
    """
    x = images.astype(compute_dtype)
    bn_stats = []
    for cs, layer in zip(spec.convs, params["convs"]):
        x = _conv(x, layer["w"].astype(compute_dtype),
                  layer["b"].astype(compute_dtype), cs.dilation, cs.pad)
        if cs.bn:
            if train:
                xf = x.astype(jnp.float32)
                mean = jnp.mean(xf, axis=(0, 1, 2))
                var = jnp.var(xf, axis=(0, 1, 2))
                bn_stats.append((mean, var))
            else:
                mean, var = layer["bn_mean"], layer["bn_var"]
            scale = lax.rsqrt(var.astype(jnp.float32) + BN_EPS)
            x = ((x.astype(jnp.float32) - mean) * scale).astype(compute_dtype)
        if cs.relu:
            x = jax.nn.relu(x)
        if cs.pool_after > 1:
            p = cs.pool_after
            # The init value MUST stay the Python scalar -jnp.inf: passing an
            # Array defeats JAX's max-pool monoid recognition, and the generic
            # reduce_window has no reverse-mode rule (training would break).
            x = lax.reduce_window(x, -jnp.inf, lax.max,
                                  (1, p, p, 1), (1, p, p, 1), "VALID")
    if spec.upsample > 1:
        from vo_tpu.ops.image import resize_bilinear

        B, H, W, C = x.shape
        x = resize_bilinear(x, (H * spec.upsample, W * spec.upsample))

    x = x.astype(jnp.float32)
    x2 = x * x
    urel = _conv(x2, params["clf"]["w"], params["clf"]["b"], 1, 0)
    urep = _conv(x2, params["sal"]["w"], params["sal"]["b"], 1, 0)

    desc = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)
    reliability = jax.nn.softmax(urel, axis=-1)[..., 1]
    repeatability = _softplus_ratio(urep[..., 0])
    out = {"descriptors": desc, "reliability": reliability,
           "repeatability": repeatability}
    if train:
        out["bn_stats"] = bn_stats
    return out


def update_bn_running_stats(params: dict, bn_stats: list, momentum: float = 0.9) -> dict:
    """Fold batch moments into the running stats (train-mode bookkeeping)."""
    new_convs = []
    it = iter(bn_stats)
    for layer in params["convs"]:
        if "bn_mean" in layer:
            mean, var = next(it)
            layer = dict(layer)
            layer["bn_mean"] = momentum * layer["bn_mean"] + (1 - momentum) * mean
            layer["bn_var"] = momentum * layer["bn_var"] + (1 - momentum) * var
        new_convs.append(layer)
    return {**params, "convs": new_convs}
