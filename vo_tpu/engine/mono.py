"""Monocular VO engine: essential-matrix motion + triangulated-structure scale.

The reference's 'monocular' mode is unfinished notebook code
(.ipynb_checkpoints/Homography_img-checkpoint.ipynb: computepose_2D_2D via
findEssentialMat/recoverPose, triangulate_new_ref_points, get_local_scale via
find_scale). This engine is the production version, same scan architecture as the rgbd
engine (vo_tpu.engine.vo):

per frame: match ref/cur -> essential_ransac (rotation + unit-translation) ->
triangulate inliers in the keyframe frame (unit-scale structure) -> resolve the scale
against the keyframe's depth-backed 3D points via the pairwise-distance-ratio RANSAC
(the reference's find_scale role, Utils/geom_utils.py:136) -> gates + keyframe policy.

Scale uses depth only as a reference measure (the notebook used homography-plane
depth); the epipolar geometry itself is pure 2D-2D.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.engine.vo import VOConfig, VOState, VOStepDiagnostics
from vo_tpu.estimation.essential import (
    EssentialConfig,
    essential_ransac,
    relative_scale,
)
from vo_tpu.geometry.se3 import pose_inverse
from vo_tpu.geometry.triangulation import triangulate
from vo_tpu.matching.matchers import mutual_nn_match, ratio_match, ratio_mutual_nn_match


@dataclass(frozen=True)
class MonoVOConfig:
    matcher: str = "ratio_binary"
    ratio: float = 0.85
    mnn_threshold: float = 0.9
    min_displacement_px: float = 3.0
    max_speed: float = 1.5
    kf_min_matches: int = 200
    kf_min_inliers: int = 100
    kf_max_step: float = 1.5
    bad_pnp_limit: int = 3
    essential: EssentialConfig = EssentialConfig()
    min_scale: float = 1e-3
    max_scale: float = 1e3
    seed: int = 8214

    def __hash__(self):
        return hash((self.matcher, self.ratio, self.mnn_threshold,
                     self.min_displacement_px, self.max_speed, self.kf_min_matches,
                     self.kf_min_inliers, self.kf_max_step, self.bad_pnp_limit,
                     self.essential, self.min_scale, self.max_scale, self.seed))


class MonoVOEngine:
    """Offline monocular sequence VO (scale from keyframe depth-backed structure)."""

    def __init__(self, config: MonoVOConfig = MonoVOConfig()):
        self.config = config

    def _match(self, desc_a, desc_b, valid_a, valid_b):
        cfg = self.config
        if cfg.matcher == "ratio_binary":
            return ratio_match(desc_a, desc_b, valid_a, valid_b, ratio=cfg.ratio,
                               binary_dim=desc_a.shape[-1])
        if cfg.matcher == "ratio_float":
            return ratio_match(desc_a, desc_b, valid_a, valid_b, ratio=cfg.ratio)
        if cfg.matcher == "ratio_mutual_nn":
            return ratio_mutual_nn_match(desc_a, desc_b, valid_a, valid_b,
                                         ratio=cfg.ratio)
        if cfg.matcher == "mutual_nn":
            return mutual_nn_match(desc_a, desc_b, valid_a, valid_b,
                                   threshold=cfg.mnn_threshold)
        raise ValueError(f"unknown matcher {cfg.matcher!r}")

    def _step(self, K, state: VOState, frame):
        cfg = self.config
        kp, desc, valid, kp3d, kp3d_valid, frame_id = frame
        key = jax.random.fold_in(jax.random.key(cfg.seed), frame_id)
        k_e, k_s = jax.random.split(key)

        m = self._match(state.ref_desc, desc, state.ref_valid, valid)
        cur_kp_m = kp[m.idx]
        disp = jnp.linalg.norm(state.ref_kp - cur_kp_m, axis=-1)
        corr_valid = m.mask & (disp >= cfg.min_displacement_px)
        n_matches = jnp.sum(corr_valid).astype(jnp.int32)

        ess = essential_ransac(k_e, state.ref_kp, cur_kp_m, corr_valid, K,
                               cfg.essential)
        # ess.pose: x_cur = R x_ref + t_unit (ref-cam -> cur-cam, |t| = 1).

        # Unit-scale structure in the keyframe camera frame.
        T_ref = jnp.eye(4)
        X_w, X_ref, _ = triangulate(state.ref_kp, cur_kp_m, T_ref, ess.pose, K)
        tri_valid = ess.inliers & (X_w[:, 2] > 0.1)

        # Metric scale against the keyframe's depth-backed 3D points.
        s = relative_scale(k_s, X_w, state.ref_3d,
                           tri_valid & state.ref_3d_valid)
        s = jnp.clip(s, cfg.min_scale, cfg.max_scale)

        rel = pose_inverse(ess.pose)           # cur -> ref motion, unit translation
        rel = rel.at[:3, 3].multiply(s)
        step_norm = jnp.linalg.norm(rel[:3, 3])
        frame_gap = (frame_id - state.ref_id).astype(jnp.float32)
        motion_ok = step_norm <= cfg.max_speed * jnp.maximum(frame_gap, 1.0)
        accepted = ess.ok & motion_ok & jnp.isfinite(step_norm)

        cur_pose = jnp.where(accepted, state.ref_pose @ rel, state.ref_pose)
        bad = jnp.where(accepted, 0, state.bad_pnp + 1)
        promote = accepted & ((n_matches < cfg.kf_min_matches)
                              | (ess.n_inliers < cfg.kf_min_inliers)
                              | (step_norm > cfg.kf_max_step))
        new_kf = promote | (bad > cfg.bad_pnp_limit)

        def as_kf(_):
            return VOState(ref_kp=kp, ref_desc=desc, ref_valid=valid,
                           ref_3d=kp3d, ref_3d_valid=kp3d_valid,
                           ref_pose=cur_pose, ref_id=frame_id,
                           bad_pnp=bad, cur_pose=cur_pose)

        def keep(_):
            return state._replace(bad_pnp=bad, cur_pose=cur_pose)

        new_state = jax.lax.cond(new_kf, as_kf, keep, None)
        diag = VOStepDiagnostics(n_matches=n_matches, n_inliers=ess.n_inliers,
                                 accepted=accepted, promoted_keyframe=new_kf,
                                 step_norm=step_norm)
        return new_state, (cur_pose, diag)

    @partial(jax.jit, static_argnames=("self",))
    def run_sequence(self, kp, desc, valid, kp3d, K, init_pose=None):
        cfg = self.config
        F = kp.shape[0]
        z = kp3d[..., 2]
        kp3d_valid = valid & (z > 0.0) & (z < 80.0)
        pose0 = jnp.eye(4) if init_pose is None else init_pose
        state = VOState(ref_kp=kp[0], ref_desc=desc[0], ref_valid=valid[0],
                        ref_3d=kp3d[0], ref_3d_valid=kp3d_valid[0],
                        ref_pose=pose0, ref_id=jnp.int32(0),
                        bad_pnp=jnp.int32(0), cur_pose=pose0)
        frames = (kp[1:], desc[1:], valid[1:], kp3d[1:], kp3d_valid[1:],
                  jnp.arange(1, F, dtype=jnp.int32))
        _, (poses, diag) = jax.lax.scan(partial(self._step, K), state, frames)
        return jnp.concatenate([pose0[None], poses]), diag

    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return isinstance(other, MonoVOEngine) and self.config == other.config
