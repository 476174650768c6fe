"""Batched rigid Procrustes (Kabsch) alignment — minimal-solver workhorse for RGB-D.

Solves R, t minimizing ||(R A + t) - B||^2 for corresponding 3D point sets. Used as the
RANSAC hypothesis generator for RGB-D frames: a 3-point sample is non-degenerate even on
coplanar scenes (only collinear samples fail), unlike the 6-point DLT. One batched 3x3
SVD per hypothesis — ideal shape for TPU.
"""

from __future__ import annotations

import jax.numpy as jnp

from vo_tpu.geometry.se3 import pose_from_rt
from vo_tpu.ops.smalllinalg import svd3x3

from vo_tpu.ops.precision import geometry_precision


@geometry_precision
def kabsch(A: jnp.ndarray, B: jnp.ndarray, w: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rigid transform from A to B: returns (..., 4, 4) T with B ~= R A + t.

    Args:
      A, B: (..., m, 3) corresponding points.
      w: optional (..., m) nonnegative weights.
    """
    if w is None:
        w = jnp.ones(A.shape[:-1], A.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-12
    ca = jnp.sum(A * w[..., None], axis=-2) / wsum
    cb = jnp.sum(B * w[..., None], axis=-2) / wsum
    A0 = A - ca[..., None, :]
    B0 = B - cb[..., None, :]
    H = jnp.einsum("...mi,...mj,...m->...ij", A0, B0, w)
    # Closed-form 3x3 SVD (vo_tpu.ops.smalllinalg): XLA's iterative lax.linalg.svd
    # serializes badly for tiny batched matrices on TPU.
    U, _, Vt = svd3x3(H)
    # Proper rotation (det +1): flip the smallest singular direction if needed.
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), H.shape).copy()
    D = D.at[..., 2, 2].set(det)
    R = jnp.swapaxes(Vt, -1, -2) @ D @ jnp.swapaxes(U, -1, -2)
    t = cb - jnp.einsum("...ij,...j->...i", R, ca)
    return pose_from_rt(R, t)
