"""Parking-spot geometry: plane-homography projection, mask scanning, midpoint lifting.

TPU-native counterpart of the reference's parking application (Utils/park_utils.py):
  * ``world_to_image``   <- ``world_2d`` (:9-21): plane points through H
  * ``find_spot_corners``<- ``pot_parking_spot`` (:41-95): scan a road mask along two
    fitted lines for the first free column — vectorized first-hit search instead of a
    Python pixel loop
  * ``fit_line``         <- ``ret_line_eq`` (:107-115)
  * ``find_midpoint``    <- ``find_midpoint`` (:118-142): diagonal intersection of the
    spot quadrilateral, lifted to the world plane via H^-1 (we keep image coordinates
    [x, y] throughout instead of the reference's row/col swap dance, :130-138)

The reference's segmentation network itself (Utils/seg_utils.py) imports a gitignored
ShelfNet and is non-functional upstream; any (H, W) boolean/255 mask works here —
e.g. a plane-consensus mask from ``homography_ransac`` inliers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.estimation.homography import apply_homography


def world_to_image(H: jnp.ndarray, plane_pts: jnp.ndarray) -> jnp.ndarray:
    """Plane coordinates (..., N, 2) -> image pixels (..., N, 2) through H
    (park_utils.py:9-21, with proper projective normalization rather than the
    reference's integer floor-divide)."""
    return apply_homography(H, plane_pts)


def fit_line(pts: jnp.ndarray, weights: jnp.ndarray | None = None):
    """Weighted least-squares line y = m x + c through (N, 2) points
    (park_utils.py:107-115). Returns (m, c)."""
    w = jnp.ones(pts.shape[0]) if weights is None else weights
    x, y = pts[..., 0], pts[..., 1]
    wsum = w.sum().clip(1e-9)
    xm = (w * x).sum() / wsum
    ym = (w * y).sum() / wsum
    cov = (w * (x - xm) * (y - ym)).sum()
    var = (w * (x - xm) ** 2).sum().clip(1e-9)
    m = cov / var
    return m, ym - m * xm


class SpotCorners(NamedTuple):
    corners: jnp.ndarray  # (4, 2) [bl, br, tr, tl] image coords [x, y]
    found: jnp.ndarray    # () bool


def find_spot_corners(mask: jnp.ndarray, line_top: tuple, line_bottom: tuple,
                      spot_width_px: int = 200) -> SpotCorners:
    """First free spot along two boundary lines of a parking row.

    For each line y = m x + c, find the smallest x whose mask pixel is road
    (mask > 0); the spot spans ``spot_width_px`` columns from there
    (park_utils.py:64-95). The reference walks pixels in Python with early exit; here
    both lines are evaluated for every column at once and the first hit is an argmax
    over a boolean vector — O(W) vector work, jittable.
    """
    Hh, Ww = mask.shape
    x = jnp.arange(Ww)

    def first_hit(m, c):
        y = jnp.clip((m * x + c).astype(jnp.int32), 0, Hh - 1)
        hit = mask[y, x] > 0
        i = jnp.argmax(hit)                       # first True (0 if none)
        return i, hit.any()

    (mt, ct), (mb, cb) = line_top, line_bottom
    xt, okt = first_hit(mt, ct)
    xb, okb = first_hit(mb, cb)

    def at(m, c, xi):
        xi = xi.astype(jnp.float32)
        return jnp.stack([xi, m * xi + c])

    corners = jnp.stack([
        at(mb, cb, xb),                        # bl
        at(mb, cb, xb + spot_width_px),        # br
        at(mt, ct, xt + spot_width_px),        # tr
        at(mt, ct, xt),                        # tl
    ])
    return SpotCorners(corners=corners, found=okt & okb)


def find_midpoint(corners: jnp.ndarray, H: jnp.ndarray):
    """Midpoint of the spot quadrilateral as the intersection of its diagonals,
    plus its world-plane position via H^-1 (park_utils.py:118-142).

    corners: (4, 2) [bl, br, tr, tl]. Returns (midpoint_px (2,), midpoint_world (2,)).
    """
    m1, c1 = fit_line(corners[jnp.asarray([0, 2])])   # bl–tr diagonal
    m2, c2 = fit_line(corners[jnp.asarray([1, 3])])   # br–tl diagonal
    A = jnp.asarray([[-m1, 1.0], [-m2, 1.0]])
    b = jnp.stack([c1, c2])
    mid = jnp.linalg.solve(A, b)[::-1]                # [x, y]
    world = apply_homography(jnp.linalg.inv(H), mid[None])[0]
    return mid, world


def plane_consensus_mask(shape: tuple[int, int], kp: jnp.ndarray,
                         inliers: jnp.ndarray, radius: int = 6) -> jnp.ndarray:
    """Rasterize homography-inlier keypoints into a dense road mask — the TPU-side
    stand-in for the reference's (broken) ShelfNet segmentation (Utils/seg_utils.py):
    pixels within ``radius`` of any plane-consensus keypoint are marked road."""
    Hh, Ww = shape
    yy = jax.lax.broadcasted_iota(jnp.int32, (Hh, Ww), 0).astype(jnp.float32)
    xx = jax.lax.broadcasted_iota(jnp.int32, (Hh, Ww), 1).astype(jnp.float32)
    d2 = ((xx[None] - kp[:, 0, None, None]) ** 2 +
          (yy[None] - kp[:, 1, None, None]) ** 2)
    near = (d2 <= radius * radius) & inliers[:, None, None]
    return near.any(0)
