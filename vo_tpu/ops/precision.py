"""Matmul-precision policy for the geometry solvers.

On TPU, f32 matmuls default to bf16 MXU passes (f32 accumulate). That is the right
trade for the conv extractors and descriptor-similarity GEMMs (binary ±1 dot products
are exact in bf16; CNN features tolerate it), but it silently wrecks the small-matrix
linear algebra the pose solvers are built on: DLT normal equations, Gauss-Newton
JTJ/JTr, Kabsch covariances, Schur complements. Measured on the bench workload
(160-frame KITTI-res drive, v5e): default precision -> 3.65 % segment translation
error; 'highest' on the solver path -> ~0.12 % (30x), at negligible cost because the
matrices are tiny next to the extraction/matching FLOPs.

Every numerically-sensitive public entry point wraps itself in
``geometry_precision`` so accuracy does not depend on the caller's global precision
flag. Hot bulk GEMMs (matching, convs) intentionally stay on the default policy.
"""

from __future__ import annotations

import functools

import jax

__all__ = ["geometry_precision"]


def geometry_precision(fn):
    """Decorator: trace ``fn`` with float32 ('highest') matmul precision.

    Applies at trace time, so it composes under ``jax.jit``/``vmap``/``scan`` —
    place it *below* the jit decorator (closest to the function)."""

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
