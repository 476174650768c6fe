"""Matmul-precision policy for the geometry solvers.

On TPU, f32 matmuls default to single-pass bf16 MXU ops (f32 accumulate). That is the
right trade for the conv extractors and descriptor-similarity GEMMs (binary ±1 dot
products are exact in bf16; CNN features tolerate it), but it silently wrecks the
small-matrix linear algebra the pose solvers are built on: DLT normal equations,
Gauss-Newton JTJ/JTr, Kabsch covariances, Schur complements, and the 512-hypothesis
reprojection scoring whose pixel-scale outputs (~1e3) lose whole pixels to bf16's
2^-8 relative rounding.

The policy is ``'high'`` — the 3-pass bf16 algorithm (bf16x3), which carries
f32-equivalent effective precision through the MXU at ~half the cost of the 6-pass
``'highest'``. Measured on the bench workload (160-frame KITTI-res slalom, v5e,
2048 kp, r04 bisect):

  policy     engine ms/frame   seg translation err
  default          1.17              0.950 %
  high             1.25              0.135 %
  highest          1.42              0.139 %

i.e. bf16x3 buys the full 7x trajectory-accuracy gain of f32 pinning for a third of
its throughput cost (the r02 full-default run on a degenerate world scored 3.45 %,
whence the original "30x" note). Every numerically-sensitive public entry point wraps
itself in ``geometry_precision`` so accuracy does not depend on the caller's global
precision flag. Hot bulk GEMMs (matching, convs) intentionally stay on the default
single-pass policy.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["geometry_precision"]


def geometry_precision(fn):
    """Decorator: trace ``fn`` with bf16x3 ('high') matmul precision.

    Applies at trace time, so it composes under ``jax.jit``/``vmap``/``scan`` —
    place it *below* the jit decorator (closest to the function)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("high"):
            return fn(*args, **kwargs)

    return wrapped
