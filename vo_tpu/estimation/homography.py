"""Plane homographies: batched DLT, RANSAC estimation, plane-induced depth.

The reference uses a *pre-calibrated* ground-plane homography for its parking
application (Utils/park_utils.py:9-21,118-142) and derives monocular scale by lifting
road keypoints through H^-1 into plane-metric 3D (Homography_img notebook:
``get_local_scale``/``get_global_scale``). It never estimates H itself (the matrix
comes from a notebook constant). This module provides the full TPU-native capability:

  * ``homography_dlt`` — normalized, weighted direct linear transform (works batched);
  * ``homography_ransac`` — fixed-hypothesis-count 4-point RANSAC with symmetric
    transfer error scoring and an IRLS polish, the same fixed-shape design as
    ``pnp_ransac``/``essential_ransac``;
  * ``plane_induced_depth`` — depth along each pixel ray for a known plane
    (n . X = d), the geometrically clean form of the notebook's
    ``abs((H^-1 p)_x / (H^-1 p)_z) / 100`` road-depth trick;
  * ``plane_depth_reference_convention`` — the notebook's exact convention, for
    behavioral parity with its scale recovery.

All functions are jittable, fixed-shape, and batched over leading axes.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.ops.precision import geometry_precision


def apply_homography(H: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Map (..., N, 2) points through (..., 3, 3) H (projective normalize)."""
    p = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    q = jnp.einsum("...ij,...nj->...ni", H, p)
    return q[..., :2] / (q[..., 2:3] + 1e-12 * jnp.sign(q[..., 2:3] + 1e-30))


def _normalize_pts(pts, w):
    """Hartley normalization: zero-mean, mean distance sqrt(2) (weighted)."""
    wsum = w.sum(-1, keepdims=True).clip(1e-9)
    mean = (pts * w[..., None]).sum(-2, keepdims=True) / wsum[..., None]
    d = jnp.linalg.norm(pts - mean, axis=-1)
    scale = jnp.sqrt(2.0) / ((d * w).sum(-1, keepdims=True) / wsum).clip(1e-9)
    T = jnp.zeros(pts.shape[:-2] + (3, 3), pts.dtype)
    s = scale[..., 0]
    T = T.at[..., 0, 0].set(s).at[..., 1, 1].set(s).at[..., 2, 2].set(1.0)
    T = T.at[..., 0, 2].set(-s * mean[..., 0, 0]).at[..., 1, 2].set(-s * mean[..., 0, 1])
    return (pts - mean) * scale[..., None], T


def homography_dlt(src: jnp.ndarray, dst: jnp.ndarray,
                   weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Weighted normalized DLT: (..., N>=4, 2) x2 -> (..., 3, 3) with H[2,2]=1.

    Solved as the smallest eigenvector of the 9x9 normal matrix A^T W A — a fixed-shape
    eigh instead of a tall SVD, so it batches and jits cleanly on TPU.
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    sn, Ts = _normalize_pts(src, weights)
    dn, Td = _normalize_pts(dst, weights)

    x, y = sn[..., 0], sn[..., 1]
    u, v = dn[..., 0], dn[..., 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)                       # (..., 2N, 9)
    w2 = jnp.concatenate([weights, weights], axis=-1)
    AtA = jnp.einsum("...ni,...n,...nj->...ij", A, w2, A)
    _, vecs = jnp.linalg.eigh(AtA)
    h = vecs[..., 0]
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.solve(Td, Hn @ Ts)
    return H / (H[..., 2:3, 2:3] + 1e-12)


@dataclass(frozen=True)
class HomographyConfig:
    n_hypotheses: int = 256
    inlier_px: float = 3.0        # symmetric transfer error threshold
    refine_iters: int = 3         # IRLS re-weighted DLT polish rounds
    min_inliers: int = 8

    def __hash__(self):
        return hash((self.n_hypotheses, self.inlier_px, self.refine_iters,
                     self.min_inliers))


class HomographyResult(NamedTuple):
    H: jnp.ndarray          # (3, 3)
    inliers: jnp.ndarray    # (N,) bool
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray         # () bool


def _sym_transfer_err(H, src, dst):
    fwd = jnp.linalg.norm(apply_homography(H, src) - dst, axis=-1)
    bwd = jnp.linalg.norm(apply_homography(jnp.linalg.inv(H), dst) - src, axis=-1)
    return fwd + bwd


@partial(jax.jit, static_argnames=("cfg",))
@geometry_precision
def homography_ransac(key, src: jnp.ndarray, dst: jnp.ndarray, valid: jnp.ndarray,
                      cfg: HomographyConfig = HomographyConfig()) -> HomographyResult:
    """Fixed-shape RANSAC homography from (N, 2) correspondences with validity mask.

    A bank of ``n_hypotheses`` 4-point DLT solves (one batched eigh), scored by the
    symmetric transfer error over all points in one einsum, then IRLS polish on the
    winner's inlier set.
    """
    N = src.shape[0]
    w = valid.astype(src.dtype)

    idx = jax.random.randint(key, (cfg.n_hypotheses, 4), 0, N)
    Hs = homography_dlt(src[idx], dst[idx])                      # (Hyp, 3, 3)

    err = _sym_transfer_err(Hs[:, None], src[None], dst[None])   # (Hyp, N)
    inl = (err < 2 * cfg.inlier_px) & valid[None]
    scores = inl.sum(-1)
    best = jnp.argmax(scores)
    H = Hs[best]

    def polish(H, _):
        e = _sym_transfer_err(H, src, dst)
        wgt = w * (e < 2 * cfg.inlier_px)
        return homography_dlt(src, dst, wgt), None
    H, _ = jax.lax.scan(polish, H, None, length=cfg.refine_iters)

    e = _sym_transfer_err(H, src, dst)
    inliers = (e < 2 * cfg.inlier_px) & valid
    n = inliers.sum()
    return HomographyResult(H=H, inliers=inliers, n_inliers=n,
                            ok=n >= cfg.min_inliers)


def plane_induced_depth(kp: jnp.ndarray, K: jnp.ndarray, normal: jnp.ndarray,
                        dist: jnp.ndarray | float) -> jnp.ndarray:
    """Depth (camera z) of pixels (..., N, 2) lying on plane n . X = d (camera frame).

    Each pixel's ray is r = K^-1 [u, v, 1]; the plane intersection is at
    lambda = d / (n . r), and depth = lambda * r_z = lambda (rays have r_z = 1).
    Returns (..., N); non-positive where the ray is (near-)parallel or behind.
    """
    ones = jnp.ones_like(kp[..., :1])
    rays = jnp.einsum("ij,...nj->...ni", jnp.linalg.inv(K),
                      jnp.concatenate([kp, ones], axis=-1))
    denom = jnp.einsum("...ni,i->...n", rays, normal)
    return jnp.where(jnp.abs(denom) > 1e-9, dist / denom, 0.0)


def plane_depth_reference_convention(H_plane: jnp.ndarray, kp: jnp.ndarray,
                                     divisor: float = 100.0) -> jnp.ndarray:
    """The reference notebook's road-depth rule (Homography_img ``get_local_scale``):
    lift pixels through H^-1, projectively normalize by |last coord|, and read depth
    as |x| / divisor (their plane axes are in centimetres along the first axis)."""
    Hinv = jnp.linalg.inv(H_plane)
    ones = jnp.ones_like(kp[..., :1])
    q = jnp.einsum("ij,...nj->...ni", Hinv, jnp.concatenate([kp, ones], axis=-1))
    qn = q / jnp.abs(q[..., 2:3]).clip(1e-12)
    return jnp.abs(qn[..., 0]) / divisor


def homography_from_plane(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                          normal: jnp.ndarray, dist: jnp.ndarray | float) -> jnp.ndarray:
    """Ground-truth homography induced by plane n . X1 = d between two views with
    X2 = R X1 + t: for plane points t = t (n . X1 / d), so
    H = K (R + t n^T / d) K^-1 maps view-1 pixels of plane points to view 2."""
    return K @ (R + jnp.outer(t, normal) / dist) @ jnp.linalg.inv(K)
