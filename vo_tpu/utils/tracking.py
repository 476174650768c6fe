"""Scene-point tracking: follow a designated 3D point through the trajectory.

The working core of the reference's parking-assist layer (get_midpoint
VisualOdometry_Stereo.py:199-216, get_point_in_other_image :187-196,
Utils/park_utils.py homography helpers): lift a pixel to 3D using the first frame's
depth, then reproject it into any later frame given the estimated poses. Batched and
jittable; the OpenCV drawing is replaced by evalkit.plotting.
"""

from __future__ import annotations

import jax.numpy as jnp

from vo_tpu.geometry.camera import project, unproject
from vo_tpu.geometry.se3 import pose_inverse, transform_points


def lift_point(depth_img: jnp.ndarray, pixel_xy, K: jnp.ndarray) -> jnp.ndarray:
    """Pixel in frame 0 -> 3D point in frame-0 camera coords (== world for identity
    start). Reference: get_midpoint (VisualOdometry_Stereo.py:199-216)."""
    x, y = int(pixel_xy[0]), int(pixel_xy[1])
    d = depth_img[y, x][None]
    return unproject(jnp.asarray([[float(x), float(y)]]), d, K)[0]


def track_point(point_w: jnp.ndarray, poses: jnp.ndarray, K: jnp.ndarray):
    """Reproject a world point into every frame of a (F, 4, 4) camera-to-world
    trajectory. Returns (uv (F, 2), depth (F,), visible (F,)).

    Reference: get_point_in_other_image (VisualOdometry_Stereo.py:187-196) without the
    imshow side effects.
    """
    T_cw = pose_inverse(poses)                           # world -> camera
    pts_c = transform_points(point_w[None, None, :], T_cw)[:, 0]   # (F, 3)
    uv, z = project(pts_c, K)
    visible = z > 0.0
    return uv, z, visible


def distance_to_point(point_w: jnp.ndarray, poses: jnp.ndarray) -> jnp.ndarray:
    """Euclidean camera-to-point distance per frame (the reference prints this as
    'Distance of midpoint from vehicle', VisualOdometry_Stereo.py:194)."""
    cam_pos = poses[:, :3, 3]
    return jnp.linalg.norm(cam_pos - point_w[None, :], axis=-1)
