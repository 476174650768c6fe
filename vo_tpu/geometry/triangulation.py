"""Batched two-view DLT triangulation.

Replaces ``cv2.triangulatePoints`` inside the reference's ``triangulation``
(Utils/geom_utils.py:91-126). One (4, 4) homogeneous system per point, solved for all
N points at once via batched SVD — no Python loop, no host round-trips.
"""

from __future__ import annotations

import jax.numpy as jnp

from vo_tpu.geometry.camera import normalize_kp

from vo_tpu.ops.precision import geometry_precision


def _dlt_solve(A: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = 0 per batch row: null vector = last right-singular vector."""
    # (N, 4, 4) -> right singular vectors; jnp.linalg.svd batches on TPU.
    _, _, vt = jnp.linalg.svd(A)
    X = vt[..., -1, :]
    w = X[..., 3:]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X[..., :3] / w_safe


@geometry_precision
def triangulate(
    kp1: jnp.ndarray,
    kp2: jnp.ndarray,
    T_1w: jnp.ndarray,
    T_2w: jnp.ndarray,
    K: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Triangulate pixel correspondences into world-frame 3D points.

    Mirrors the reference signature (Utils/geom_utils.py:91): poses map world -> view.

    Args:
      kp1, kp2: (N, 2) pixel keypoints in views 1 and 2.
      T_1w, T_2w: (4, 4) world-to-view transforms.
      K: (3, 3) shared intrinsics.
    Returns:
      (X_w, X_1, X_2): (N, 3) points in world, view-1, and view-2 frames.
    """
    n1 = normalize_kp(kp1, K)
    n2 = normalize_kp(kp2, K)
    P1 = T_1w[:3, :]  # (3, 4) normalized projection matrices
    P2 = T_2w[:3, :]

    def rows(n, P):
        # x * P[2] - P[0] = 0 ; y * P[2] - P[1] = 0
        r0 = n[..., 0:1] * P[2][None, :] - P[0][None, :]
        r1 = n[..., 1:2] * P[2][None, :] - P[1][None, :]
        return r0, r1

    a0, a1 = rows(n1, P1)
    b0, b1 = rows(n2, P2)
    A = jnp.stack([a0, a1, b0, b1], axis=-2)  # (N, 4, 4)
    X_w = _dlt_solve(A)

    Xh = jnp.concatenate([X_w, jnp.ones_like(X_w[..., :1])], axis=-1)
    X_1 = (P1 @ Xh.T).T
    X_2 = (P2 @ Xh.T).T
    return X_w, X_1, X_2
