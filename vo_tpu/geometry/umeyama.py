"""Umeyama Sim(m) alignment, pure jnp.

Replaces the loop-based reference implementation (Utils/geom_utils.py:5-52 and its twin
plot_utils/kittievalodom.py:29-76): the per-point outer-product loop becomes one matmul.
"""

from __future__ import annotations

import jax.numpy as jnp

from vo_tpu.ops.precision import geometry_precision


@geometry_precision
def umeyama_alignment(
    x: jnp.ndarray, y: jnp.ndarray, with_scale: bool = True
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Least-squares Sim(m) fit aligning x onto y (Umeyama, IEEE PAMI 1991).

    Args:
      x: (m, n) source points, one column per point (reference layout).
      y: (m, n) target points.
      with_scale: estimate the similarity scale c (else c = 1).
    Returns:
      (R, t, c) with y ~= c * R @ x + t.
    """
    m, n = x.shape
    mean_x = x.mean(axis=1)
    mean_y = y.mean(axis=1)
    xc = x - mean_x[:, None]
    yc = y - mean_y[:, None]

    sigma_x = jnp.sum(xc * xc) / n
    cov_xy = (yc @ xc.T) / n

    u, d, vt = jnp.linalg.svd(cov_xy)
    # Kabsch sign correction for a right-handed rotation.
    det_sign = jnp.sign(jnp.linalg.det(u) * jnp.linalg.det(vt))
    s = jnp.ones(m).at[-1].set(det_sign)
    R = (u * s[None, :]) @ vt

    c = jnp.where(with_scale, jnp.sum(d * s) / sigma_x, 1.0)
    t = mean_y - c * (R @ mean_x)
    return R, t, c
