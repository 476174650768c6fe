"""Pinhole camera model — batched project/unproject, pure jnp.

Replaces the reference's per-call numpy/OpenCV camera math:
- ``unproject``      <- Utils/geom_utils.py:55-77 (``unprojection_kp``)
- ``normalize_kp``   <- Utils/geom_utils.py:79-89
- ``depth_to_3d``    <- cv2.rgbd.depthTo3d (VisualOdometry_Stereo.py:96)
- ``project``        <- cv2.projectPoints (VisualOdometry_Stereo.py:190)
- ``PinholeCamera``  <- Camera.py:26-130 (dead code in the reference; live here)
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PinholeCamera(NamedTuple):
    """Intrinsics container. ``K`` is the (3, 3) intrinsic matrix."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray

    @classmethod
    def from_K(cls, K) -> "PinholeCamera":
        K = jnp.asarray(K)
        return cls(fx=K[0, 0], fy=K[1, 1], cx=K[0, 2], cy=K[1, 2])

    @property
    def K(self) -> jnp.ndarray:
        fx = jnp.asarray(self.fx, dtype=jnp.float32)
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack([
            jnp.stack([self.fx, z, self.cx]),
            jnp.stack([z, self.fy, self.cy]),
            jnp.stack([z, z, o]),
        ])


def project(points_3d: jnp.ndarray, K: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project camera-frame 3D points to pixels.

    Args:
      points_3d: (..., N, 3) points in the camera frame.
      K: (3, 3) intrinsics.
    Returns:
      (uv, z): (..., N, 2) pixel coords and (..., N) depths. Points with z <= 0 project
      behind the camera; callers must mask on z themselves (no data-dependent filtering
      here, everything stays fixed-shape for XLA).
    """
    z = points_3d[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * points_3d[..., 0] / z_safe + K[0, 2]
    v = K[1, 1] * points_3d[..., 1] / z_safe + K[1, 2]
    return jnp.stack([u, v], axis=-1), z


def unproject(kp: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project pixels to camera-frame 3D: X = depth * K^-1 [u, v, 1]^T.

    Equivalent to the reference's ``unprojection_kp`` (Utils/geom_utils.py:55-77) but
    batched and without materialising N copies of K^-1.
    """
    x = (kp[..., 0] - K[0, 2]) / K[0, 0]
    y = (kp[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def normalize_kp(kp: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel -> normalized image coordinates (reference: geom_utils.py:79-89)."""
    x = (kp[..., 0] - K[0, 2]) / K[0, 0]
    y = (kp[..., 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([x, y], axis=-1)


def depth_to_3d_at(depth_img: jnp.ndarray, kp: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Back-project the depth image at integer keypoint locations.

    Fuses the reference's whole-image ``cv2.rgbd.depthTo3d`` + fancy-index gather
    (VisualOdometry_Stereo.py:96-97) into a single sparse gather + unproject: only the
    keypoint pixels are ever touched, O(N) instead of O(H*W).

    Args:
      depth_img: (H, W) metric depth.
      kp: (N, 2) [x, y] pixel keypoints (float; truncated to int like the reference's
          ``.astype(np.int32)``).
      K: (3, 3) intrinsics.
    Returns:
      (N, 3) camera-frame points. Invalid/zero depths yield z == 0 which downstream
      masks reject (0 < z < max_depth gate, VisualOdometry_Stereo.py:100).
    """
    H, W = depth_img.shape
    xi = jnp.clip(kp[..., 0].astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(kp[..., 1].astype(jnp.int32), 0, H - 1)
    d = depth_img[yi, xi]
    return unproject(kp.astype(depth_img.dtype), d, K)


class Distortion(NamedTuple):
    """Radial-tangential (Brown-Conrady) distortion coefficients, OpenCV ordering
    [k1, k2, p1, p2, k3] — the model behind the reference's ``cv2.undistortPoints``
    calls (Camera.py:92,105)."""

    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    k3: jnp.ndarray

    @classmethod
    def from_coeffs(cls, d) -> "Distortion":
        d = jnp.asarray(d, jnp.float32)
        d = jnp.concatenate([d, jnp.zeros(max(0, 5 - d.shape[0]))])
        return cls(d[0], d[1], d[2], d[3], d[4])

    @property
    def is_zero(self):
        return (self.k1 == 0) & (self.k2 == 0) & (self.p1 == 0) & (self.p2 == 0) \
            & (self.k3 == 0)


def distort_normalized(xy: jnp.ndarray, dist: Distortion) -> jnp.ndarray:
    """Apply radial-tangential distortion to normalized image coords (..., 2)."""
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (dist.k1 + r2 * (dist.k2 + r2 * dist.k3))
    xd = x * radial + 2.0 * dist.p1 * x * y + dist.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + dist.p1 * (r2 + 2.0 * y * y) + 2.0 * dist.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_normalized(xy_d: jnp.ndarray, dist: Distortion,
                         iters: int = 8) -> jnp.ndarray:
    """Invert the distortion by fixed-point iteration — the cv2.undistortPoints
    compensation loop (OpenCV uses 5 iterations; we default to 8), unrolled to a fixed
    count so it stays jittable with static shapes."""
    xd, yd = xy_d[..., 0], xy_d[..., 1]
    x, y = xd, yd
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (dist.k1 + r2 * (dist.k2 + r2 * dist.k3))
        dx = 2.0 * dist.p1 * x * y + dist.p2 * (r2 + 2.0 * x * x)
        dy = dist.p1 * (r2 + 2.0 * y * y) + 2.0 * dist.p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return jnp.stack([x, y], axis=-1)


def undistort_points(kp: jnp.ndarray, K: jnp.ndarray, dist: Distortion,
                     iters: int = 8) -> jnp.ndarray:
    """Distorted pixel coords (..., 2) -> ideal pixel coords (..., 2).

    Equivalent of the reference's ``cv2.undistortPoints(..., P=K)`` usage
    (Camera.py:100-111 ``undistort_points``): normalize, compensate, re-project
    through K.
    """
    xy = undistort_normalized(normalize_kp(kp, K), dist, iters)
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def distort_points(kp: jnp.ndarray, K: jnp.ndarray, dist: Distortion) -> jnp.ndarray:
    """Ideal pixel coords (..., 2) -> distorted pixel coords (..., 2)."""
    xy = distort_normalized(normalize_kp(kp, K), dist)
    u = K[0, 0] * xy[..., 0] + K[0, 2]
    v = K[1, 1] * xy[..., 1] + K[1, 2]
    return jnp.stack([u, v], axis=-1)


def is_in_frame(uv: jnp.ndarray, width: int, height: int,
                margin: float = 0.0) -> jnp.ndarray:
    """Pixel-bounds visibility test (Camera.py:113-118 ``is_in_image``)."""
    return ((uv[..., 0] >= margin) & (uv[..., 0] < width - margin)
            & (uv[..., 1] >= margin) & (uv[..., 1] < height - margin))


def are_visible(points_3d: jnp.ndarray, K: jnp.ndarray, width: int, height: int,
                z_near: float = 0.0, z_far: float = jnp.inf) -> jnp.ndarray:
    """Full visibility check: in front of the camera, inside the frame, within the
    depth range (Camera.py:120-130 ``are_visible``: z > 0, FOV bounds, distance cap) —
    fixed-shape boolean mask, no filtering."""
    uv, z = project(points_3d, K)
    H = jnp.asarray(height, points_3d.dtype)
    W = jnp.asarray(width, points_3d.dtype)
    in_img = ((uv[..., 0] >= 0) & (uv[..., 0] < W)
              & (uv[..., 1] >= 0) & (uv[..., 1] < H))
    return in_img & (z > z_near) & (z < z_far)


def depth_to_3d(depth_img: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Dense back-projection of a full depth image -> (H, W, 3) camera-frame points.

    Direct equivalent of ``cv2.rgbd.depthTo3d`` for callers that need the dense cloud.
    """
    H, W = depth_img.shape
    u = jnp.arange(W, dtype=depth_img.dtype)[None, :].repeat(H, axis=0)
    v = jnp.arange(H, dtype=depth_img.dtype)[:, None].repeat(W, axis=1)
    kp = jnp.stack([u, v], axis=-1)
    return unproject(kp, depth_img, K)
