"""Jittable, fully-batched geometry: SO3/SE3 Lie ops, pinhole camera, triangulation,
Umeyama alignment.

Replaces the reference's numpy/OpenCV geometry layer (Utils/SE3_utils.py:5-51,
Utils/geom_utils.py:5-177, Camera.py:26-130) with pure-jnp code that vmaps/jits/shards.
"""

from vo_tpu.geometry.so3 import (
    hat,
    vee,
    so3_exp,
    so3_log,
    rodrigues,
    inv_rodrigues,
)
from vo_tpu.geometry.se3 import (
    se3_exp,
    se3_log,
    pose_from_rt,
    pose_inverse,
    pose_compose,
    transform_points,
    chain_relative_poses,
    identity_pose,
)
from vo_tpu.geometry.camera import (
    PinholeCamera,
    project,
    unproject,
    normalize_kp,
    depth_to_3d_at,
    depth_to_3d,
)
from vo_tpu.geometry.triangulation import triangulate
from vo_tpu.geometry.umeyama import umeyama_alignment
