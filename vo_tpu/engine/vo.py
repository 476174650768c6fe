"""The keyframe-relative VO state machine, as a single jitted lax.scan.

Behavioral port of the reference's per-frame pipeline (VisualOdometry_Stereo.py:223-297
+ computepose_3D_2D :87-149), with every gate preserved:

- >= 3 px keypoint displacement to carry motion signal        (:260-264)
- keyframe 3D depth validity 0 < z < 50 m                     (:100)
- PnP acceptance: > 20 inliers                                (:132, PnPConfig.min_inliers)
- physical-motion gate |t| <= 1.5 m x frame-gap               (:271)
- pose-hold fallback on rejected PnP                          (:290)
- keyframe promotion iff matches < 200 or inliers < 100 or
  |t| > 1.5, or bad_pnp > 3                                   (:285-286,:295)

TPU-first restructuring (SURVEY.md §7): feature extraction and keyframe-3D
back-projection are batched over ALL frames beforehand (embarrassingly parallel, shards
over devices); only the cheap match+PnP+gate state machine runs inside the sequential
scan, entirely on device — zero host syncs per frame.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.estimation.pnp import PnPConfig, pnp_ransac
from vo_tpu.geometry.se3 import orthonormalize_pose, pose_inverse
from vo_tpu.matching.matchers import (
    mutual_nn_match,
    ratio_match,
    ratio_mutual_nn_match,
)


def _on_tpu() -> bool:
    """True when the default backend can run Mosaic kernels (tpu, or the tunneled
    'axon' backend which is a real TPU chip)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@dataclass(frozen=True)
class VOConfig:
    matcher: str = "ratio_binary"      # 'ratio_binary' | 'ratio_float' | 'ratio_mutual_nn' | 'mutual_nn'
    ratio: float = 0.85                # ORB.py:28 (r2d2 path uses 0.90, R2D2.py:53)
    mnn_threshold: float = 0.9         # R2D2.py:29
    min_displacement_px: float = 3.0   # VisualOdometry_Stereo.py:263
    min_point_depth: float = 0.0       # :100
    max_point_depth: float = 50.0      # :100
    max_speed: float = 1.5             # m / frame-gap (:271)
    kf_min_matches: int = 200          # :285
    kf_min_inliers: int = 100          # :285
    kf_max_step: float = 1.5           # :285 (dist_scale > 1.5 also promotes)
    bad_pnp_limit: int = 3             # :295
    pnp: PnPConfig = PnPConfig()
    seed: int = 8214                   # vo_stereo_runner.py:20-24
    use_pallas_match: bool = True      # fused match kernel on TPU (ops/pallas_match.py)

    def __hash__(self):
        return hash((self.matcher, self.ratio, self.mnn_threshold,
                     self.min_displacement_px, self.min_point_depth,
                     self.max_point_depth, self.max_speed, self.kf_min_matches,
                     self.kf_min_inliers, self.kf_max_step, self.bad_pnp_limit,
                     self.pnp, self.seed, self.use_pallas_match))


class VOState(NamedTuple):
    """Scan carry: the active keyframe + chain bookkeeping (fixed shapes)."""

    ref_kp: jnp.ndarray      # (K, 2)
    ref_desc: jnp.ndarray    # (K, D)
    ref_valid: jnp.ndarray   # (K,)
    ref_3d: jnp.ndarray      # (K, 3) keyframe-camera-frame points at ref_kp
    ref_3d_valid: jnp.ndarray  # (K,) depth-gate mask
    ref_pose: jnp.ndarray    # (4, 4) keyframe global pose
    ref_id: jnp.ndarray      # () int32
    bad_pnp: jnp.ndarray     # () int32
    cur_pose: jnp.ndarray    # (4, 4) last emitted global pose


class VOStepDiagnostics(NamedTuple):
    """Per-frame observability (the reference's ad-hoc counters, :57-61, as arrays)."""

    n_matches: jnp.ndarray
    n_inliers: jnp.ndarray
    accepted: jnp.ndarray
    promoted_keyframe: jnp.ndarray
    step_norm: jnp.ndarray


class VOEngine:
    """Offline sequence VO. Feed batched per-frame features + back-projected keypoint
    clouds; get global poses for every frame.
    """

    def __init__(self, config: VOConfig = VOConfig()):
        self.config = config

    # -- matching dispatch (static on config) ---------------------------------

    def _match(self, desc_a, desc_b, valid_a, valid_b):
        cfg = self.config
        # On TPU, route the ratio matchers through the fused Pallas kernel
        # (ops/pallas_match.py): one pass, no HBM similarity matrix, ~3.5x the XLA
        # matcher at 4096 kp. Exact same results (parity-tested).
        use_pallas = cfg.use_pallas_match and _on_tpu()
        if cfg.matcher == "ratio_binary":
            if use_pallas:
                from vo_tpu.ops.pallas_match import ratio_match_pallas
                return ratio_match_pallas(desc_a, desc_b, valid_a, valid_b,
                                          ratio=cfg.ratio, binary_dim=desc_a.shape[-1])
            return ratio_match(desc_a, desc_b, valid_a, valid_b, ratio=cfg.ratio,
                               binary_dim=desc_a.shape[-1])
        if cfg.matcher == "ratio_float":
            if use_pallas:
                from vo_tpu.ops.pallas_match import ratio_match_pallas
                return ratio_match_pallas(desc_a, desc_b, valid_a, valid_b,
                                          ratio=cfg.ratio)
            return ratio_match(desc_a, desc_b, valid_a, valid_b, ratio=cfg.ratio)
        if cfg.matcher == "ratio_mutual_nn":
            if use_pallas:
                from vo_tpu.ops.pallas_match import ratio_mutual_nn_match_pallas
                return ratio_mutual_nn_match_pallas(desc_a, desc_b, valid_a, valid_b,
                                                    ratio=cfg.ratio)
            return ratio_mutual_nn_match(desc_a, desc_b, valid_a, valid_b, ratio=cfg.ratio)
        if cfg.matcher == "mutual_nn":
            return mutual_nn_match(desc_a, desc_b, valid_a, valid_b,
                                   threshold=cfg.mnn_threshold)
        raise ValueError(f"unknown matcher {self.config.matcher!r}")

    # -- one scan step ---------------------------------------------------------

    def _step(self, K, state: VOState, frame):
        cfg = self.config
        kp, desc, valid, kp3d, kp3d_valid, frame_id = frame
        key = jax.random.fold_in(jax.random.key(cfg.seed), frame_id)

        m = self._match(state.ref_desc, desc, state.ref_valid, valid)

        cur_kp_m = kp[m.idx]                                     # (K, 2)
        cur_3d_m = kp3d[m.idx]                                   # (K, 3) rgbd bonus
        cur_3d_valid_m = kp3d_valid[m.idx]
        disp = jnp.linalg.norm(state.ref_kp - cur_kp_m, axis=-1)
        corr_valid = (m.mask & (disp >= cfg.min_displacement_px)
                      & state.ref_3d_valid)                      # depth gate pre-folded
        n_matches = jnp.sum(corr_valid).astype(jnp.int32)

        pnp = pnp_ransac(key, state.ref_3d, cur_kp_m, corr_valid, K, cfg.pnp,
                         points_3d_cur=cur_3d_m, valid_cur=cur_3d_valid_m)

        rel = pose_inverse(pnp.pose)   # cur->ref motion, like pose.inv_pose (:143)
        step_norm = jnp.linalg.norm(rel[:3, 3])
        frame_gap = (frame_id - state.ref_id).astype(jnp.float32)
        motion_ok = step_norm <= cfg.max_speed * jnp.maximum(frame_gap, 1.0)
        accepted = pnp.ok & motion_ok

        # f32 pose chaining: a bf16 MXU pass on a 4x4 with ~100 m translations
        # rounds at the ~0.25 m level — catastrophic when accumulated per frame
        # (see ops/precision.py).
        with jax.default_matmul_precision("highest"):
            chained = orthonormalize_pose(state.ref_pose @ rel)
        cur_pose = jnp.where(accepted, chained, state.ref_pose)
        bad_pnp = jnp.where(accepted, 0, state.bad_pnp + 1)

        promote = accepted & ((n_matches < cfg.kf_min_matches)
                              | (pnp.n_inliers < cfg.kf_min_inliers)
                              | (step_norm > cfg.kf_max_step))
        # bad_pnp escalation (the reference's :295-296 refresh) promotes the
        # CURRENT frame — whose pose is a hold, i.e. wrong by the motion since
        # the last accepted frame — so a refresh while the old keyframe is still
        # perfectly matchable bakes that error into every later pose. Measured
        # (r05): a 5-frame 85% depth-dropout window left a permanent 3.4 m error
        # through exactly this path, while matching stayed healthy throughout.
        # Refresh only when tracking is actually LOST (match collapse), with a
        # long-hold refresh as the last resort so a permanently changed scene
        # still re-anchors eventually (reference behavior restored at 4x the
        # escalation limit).
        lost = n_matches < cfg.kf_min_matches
        force_refresh = (bad_pnp > cfg.bad_pnp_limit) & (
            lost | (bad_pnp > 4 * cfg.bad_pnp_limit))
        new_kf = promote | force_refresh

        def as_kf(_):
            return VOState(
                ref_kp=kp, ref_desc=desc, ref_valid=valid,
                ref_3d=kp3d, ref_3d_valid=kp3d_valid,
                ref_pose=cur_pose, ref_id=frame_id,
                bad_pnp=bad_pnp, cur_pose=cur_pose,
            )

        def keep_kf(_):
            return state._replace(bad_pnp=bad_pnp, cur_pose=cur_pose)

        new_state = jax.lax.cond(new_kf, as_kf, keep_kf, None)
        diag = VOStepDiagnostics(
            n_matches=n_matches, n_inliers=pnp.n_inliers,
            accepted=accepted, promoted_keyframe=new_kf, step_norm=step_norm,
        )
        return new_state, (cur_pose, diag)

    # -- public API ------------------------------------------------------------

    def initial_state(self, kp0, desc0, valid0, kp3d0, init_pose=None) -> VOState:
        """Frame-0 keyframe state (VisualOdometry_Stereo.py:233-239 semantics)."""
        cfg = self.config
        z = kp3d0[..., 2]
        kp3d_valid0 = valid0 & (z > cfg.min_point_depth) & (z < cfg.max_point_depth)
        pose0 = jnp.eye(4) if init_pose is None else jnp.asarray(init_pose)
        return VOState(
            ref_kp=kp0, ref_desc=desc0, ref_valid=valid0,
            ref_3d=kp3d0, ref_3d_valid=kp3d_valid0,
            ref_pose=pose0, ref_id=jnp.int32(0),
            bad_pnp=jnp.int32(0), cur_pose=pose0,
        )

    @partial(jax.jit, static_argnames=("self",))
    def run_chunk(self, state: VOState, kp, desc, valid, kp3d, frame_ids, K):
        """Scan a chunk of frames with an explicit carry — the incremental form of
        ``run_sequence`` used by the streaming runner (engine compute overlaps the
        next batch's decode) and by mid-run checkpoint/resume (the carry IS the
        resumable state). Returns (state, poses (C, 4, 4), diagnostics)."""
        cfg = self.config
        z = kp3d[..., 2]
        kp3d_valid = valid & (z > cfg.min_point_depth) & (z < cfg.max_point_depth)
        frames = (kp, desc, valid, kp3d, kp3d_valid,
                  frame_ids.astype(jnp.int32))
        state, (poses, diag) = jax.lax.scan(partial(self._step, K), state, frames)
        return state, poses, diag

    @partial(jax.jit, static_argnames=("self",))
    def run_sequence(
        self,
        kp: jnp.ndarray,          # (F, K, 2)
        desc: jnp.ndarray,        # (F, K, D)
        valid: jnp.ndarray,       # (F, K)
        kp3d: jnp.ndarray,        # (F, K, 3) per-frame back-projected keypoints
        K: jnp.ndarray,           # (3, 3)
        init_pose: jnp.ndarray | None = None,
    ):
        """Run VO over a pre-extracted sequence. Returns ((F, 4, 4) poses, diagnostics).

        Frame 0 seeds the keyframe with identity pose (VisualOdometry_Stereo.py:233-239);
        its emitted pose is ``init_pose`` (identity by default).
        """
        cfg = self.config
        F = kp.shape[0]

        z = kp3d[..., 2]
        kp3d_valid = valid & (z > cfg.min_point_depth) & (z < cfg.max_point_depth)

        pose0 = jnp.eye(4) if init_pose is None else init_pose
        state = VOState(
            ref_kp=kp[0], ref_desc=desc[0], ref_valid=valid[0],
            ref_3d=kp3d[0], ref_3d_valid=kp3d_valid[0],
            ref_pose=pose0, ref_id=jnp.int32(0),
            bad_pnp=jnp.int32(0), cur_pose=pose0,
        )

        frames = (kp[1:], desc[1:], valid[1:], kp3d[1:], kp3d_valid[1:],
                  jnp.arange(1, F, dtype=jnp.int32))
        _, (poses, diag) = jax.lax.scan(partial(self._step, K), state, frames)

        all_poses = jnp.concatenate([pose0[None], poses], axis=0)
        return all_poses, diag

    def __hash__(self):
        return hash(self.config)

    def __eq__(self, other):
        return isinstance(other, VOEngine) and self.config == other.config
