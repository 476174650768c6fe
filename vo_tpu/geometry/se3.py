"""SE(3) rigid-transform operations as plain (..., 4, 4) jnp arrays.

The reference carries poses in a mutable ``SE3`` object whose ``inv_pose`` property
recomputes ``np.linalg.inv`` on every access (Utils/SE3_utils.py:27-30). Here poses are
immutable homogeneous matrices; inversion uses the closed form [R^T, -R^T t] and the whole
module is batched/jit/vmap-friendly. ``chain_relative_poses`` replaces the frame-serial
pose accumulation of VisualOdometry_Stereo.py:283 with an O(log N) associative scan.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vo_tpu.geometry.so3 import hat, so3_exp, so3_log

from vo_tpu.ops.precision import geometry_precision

_EPS = 1e-8


def identity_pose(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.eye(4, dtype=dtype)


def pose_from_rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation + (..., 3) translation -> (..., 4, 4) homogeneous pose."""
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t.reshape(batch + (3,)))
    T = T.at[..., 3, 3].set(1.0)
    return T


@geometry_precision
def orthonormalize_pose(T: jnp.ndarray) -> jnp.ndarray:
    """Project the rotation block back onto SO(3) (one symmetric-orthogonalization
    Newton step: R <- 1.5 R - 0.5 R R^T R), batched.

    Chained pose composition accumulates multiplicative scale in R (~1e-5/compose
    from finite-precision matmuls): after a 160-frame chain the rotation diagonal
    measured 1.0018, which pushes trace(R_err) above 3 and makes the KITTI
    evaluator's arccos(clip(...)) rotation metric (kittievalodom.py:138-150, quirk
    replicated in evalkit) silently report 0 — masking real rotation drift. One
    Newton's convergence is quadratic, so two steps take even a 1e-2 deviation to
    float precision; applying this at every chain step keeps the whole trajectory
    on the manifold."""
    R = T[..., :3, :3]
    for _ in range(2):
        R = 1.5 * R - 0.5 * jnp.einsum("...ij,...kj,...kl->...il", R, R, R)
    return T.at[..., :3, :3].set(R)


@geometry_precision
def pose_inverse(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE3 inverse: [R t]^-1 = [R^T  -R^T t]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    return pose_from_rt(Rt, t_inv)


@geometry_precision
def pose_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Compose homogeneous transforms: A @ B, batched."""
    return A @ B


@geometry_precision
def transform_points(points: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) transform to (..., N, 3) points (reference: geom_utils.py:128)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, points) + t[..., None, :]


@geometry_precision
def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: (..., 6) twist [v, w] -> (..., 4, 4) pose.

    Convention: first 3 components translation (v), last 3 rotation (w).
    """
    v, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    R = so3_exp(w)
    W = hat(w)
    W2 = W @ W
    # V = I + (1-cos t)/t^2 W + (t - sin t)/t^3 W^2
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS))
    c = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0,
                  (theta - jnp.sin(theta)) / (theta2 * theta).clip(_EPS * _EPS * _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)
    V = eye + b[..., None, None] * W + c[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return pose_from_rt(R, t)


@geometry_precision
def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: (..., 4, 4) pose -> (..., 6) twist [v, w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    small = theta2 < 1e-8
    W = hat(w)
    W2 = W @ W
    # V^-1 = I - W/2 + (1/t^2 - (1+cos t)/(2 t sin t)) W^2
    half_theta = theta * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.sin(half_theta).clip(_EPS)) / theta2.clip(_EPS * _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), R.shape)
    V_inv = eye - 0.5 * W + cot_term[..., None, None] * W2
    v = jnp.einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([v, w], axis=-1)


@geometry_precision
def chain_relative_poses(rel_poses: jnp.ndarray, initial: jnp.ndarray | None = None) -> jnp.ndarray:
    """Accumulate relative poses into global poses with an associative scan.

    global[i] = initial @ rel[0] @ rel[1] @ ... @ rel[i]

    Replaces the per-frame serial matmul chain (VisualOdometry_Stereo.py:283) with a
    parallel prefix product — O(log N) depth on device.

    Args:
      rel_poses: (N, 4, 4) relative transforms (keyframe->frame composition order).
      initial: optional (4, 4) starting pose (defaults to identity).
    Returns:
      (N, 4, 4) accumulated global poses.
    """
    chained = jax.lax.associative_scan(jnp.matmul, rel_poses, axis=0)
    if initial is not None:
        chained = jnp.einsum("ij,njk->nik", initial, chained)
    return chained
