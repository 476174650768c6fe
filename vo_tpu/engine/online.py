"""Online (streaming) VO: the reference's per-frame ``process_frame`` contract.

For live cameras / ROS-style feeds where frames arrive one at a time. Same jitted step
as the offline scan engine (vo_tpu.engine.vo) — the keyframe state lives on device
between calls; per frame one extraction dispatch + one step dispatch.

    vo = OnlineVO(K)
    for i, (img, depth) in enumerate(stream):
        pose = vo.process_frame(img, depth, i)       # (4, 4) np camera-to-world

Mirrors VisualOdometry.process_frame (VisualOdometry_Stereo.py:223-297) without the
module-level config/extractor side effects.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.engine.vo import VOConfig, VOEngine, VOState
from vo_tpu.features.extractor import OrbLikeExtractor
from vo_tpu.geometry.camera import depth_to_3d_at


class OnlineVO:
    def __init__(self, K, config: VOConfig = VOConfig(), extractor=None):
        self.K = jnp.asarray(K, jnp.float32)
        self.engine = VOEngine(config)
        self.extractor = extractor if extractor is not None else OrbLikeExtractor()
        self.state: VOState | None = None
        self._step = jax.jit(
            lambda state, frame: self.engine._step(self.K, state, frame))

    def _extract(self, img, depth):
        feats = self.extractor(jnp.asarray(img)[None])
        kp3d = depth_to_3d_at(jnp.asarray(depth, jnp.float32), feats.kp[0], self.K)
        return feats.kp[0], feats.desc[0], feats.valid[0], kp3d

    def process_frame(self, img, depth, frame_no: int):
        """Returns the (4, 4) camera-to-world pose estimate for this frame (np)."""
        kp, desc, valid, kp3d = self._extract(img, depth)
        cfg = self.engine.config
        z = kp3d[:, 2]
        kp3d_valid = valid & (z > cfg.min_point_depth) & (z < cfg.max_point_depth)

        if self.state is None or frame_no == 0:
            pose0 = jnp.eye(4)
            self.state = VOState(
                ref_kp=kp, ref_desc=desc, ref_valid=valid,
                ref_3d=kp3d, ref_3d_valid=kp3d_valid,
                ref_pose=pose0, ref_id=jnp.int32(frame_no),
                bad_pnp=jnp.int32(0), cur_pose=pose0,
            )
            return np.eye(4)

        frame = (kp, desc, valid, kp3d, kp3d_valid, jnp.int32(frame_no))
        self.state, (pose, diag) = self._step(self.state, frame)
        self.last_diagnostics = jax.tree.map(np.asarray, diag)
        return np.asarray(pose)

    def reset(self):
        self.state = None
