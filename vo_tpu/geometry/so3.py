"""SO(3) Lie-group operations, pure jnp, batched over arbitrary leading axes.

``rodrigues``/``inv_rodrigues`` are the on-device equivalents of the reference's
``cv2.Rodrigues`` calls (VisualOdometry_Stereo.py:141,190): axis-angle vector <-> rotation
matrix. All ops are Taylor-guarded near theta=0 so they are safe under jit/grad.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) axis vector -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zero = jnp.zeros_like(wx)
    rows = [
        jnp.stack([zero, -wz, wy], axis=-1),
        jnp.stack([wz, zero, -wx], axis=-1),
        jnp.stack([-wy, wx, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) skew-symmetric matrix -> (..., 3) axis vector."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Exponential map: (..., 3) tangent -> (..., 3, 3) rotation.

    Rodrigues' formula with series fallback for small angles:
      R = I + sin(t)/t * W + (1-cos(t))/t^2 * W^2,  W = hat(w), t = |w|.
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    # Guarded coefficients (exact Taylor limits at theta -> 0).
    small = theta2 < 1e-8
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS))
    W = hat(w)
    W2 = W @ W
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: (..., 3, 3) rotation -> (..., 3) tangent.

    Uses the standard trace formula with a guarded small-angle branch. Angles near pi
    are resolved via the diagonal of (R + R^T)/2 to keep the axis stable.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # Antisymmetric part gives sin(theta) * axis.
    w_raw = vee((R - jnp.swapaxes(R, -1, -2)) * 0.5)

    sin_theta = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-3

    # Generic branch: w = theta / (2 sin(theta)) * vee(R - R^T).
    scale_generic = jnp.where(small, 1.0 + theta * theta / 6.0,
                              theta / jnp.where(sin_theta == 0, 1.0, sin_theta))
    w_generic = scale_generic[..., None] * w_raw

    # Near-pi branch: axis from the largest diagonal of (R + I).
    S = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(S, k[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    axis = col / jnp.linalg.norm(col, axis=-1, keepdims=True).clip(_EPS)
    # Fix the sign of the axis against the antisymmetric part.
    sign = jnp.where(jnp.sum(axis * w_raw, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    w_pi = sign * axis * theta[..., None]

    return jnp.where(near_pi[..., None], w_pi, w_generic)


# OpenCV-compatible aliases (axis-angle "rotation vector" <-> matrix), matching the role of
# cv2.Rodrigues in VisualOdometry_Stereo.py:141.
rodrigues = so3_exp
inv_rodrigues = so3_log
