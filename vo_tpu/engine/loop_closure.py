"""Loop-closure detection + pose-graph trajectory optimization.

The reference chains poses open-loop and never corrects them
(VisualOdometry_Stereo.py:283,292) — revisiting a place leaves the accumulated drift in
place forever. This module closes that gap: candidate keyframe pairs are proposed by
estimated proximity, verified with the same descriptor-match + PnP-RANSAC machinery the
VO front-end uses, and the verified relative poses become loop-closure edges in a pose
graph (vo_tpu.ba.pose_graph) optimized over the keyframe chain; non-keyframe poses
re-anchor to their keyframe.

TPU-shaped scaling: ALL candidate pairs are verified in ONE jitted dispatch — the
match + PnP-RANSAC verifier is vmapped over a fixed candidate budget (padded, masked),
so a KITTI-length run costs one compile + one device call instead of max_candidates
sequential dispatches. Re-anchoring is a batched einsum, not a per-frame Python loop.

Wired into the product path via ``vo_tpu.runners.vo_run --refine`` (after windowed BA).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from vo_tpu.ba.pose_graph import PoseGraphConfig, optimize_pose_graph


@dataclass(frozen=True)
class LoopClosureConfig:
    min_gap: int = 8             # min keyframe-index separation for a loop candidate
    radius: float = 10.0         # candidate search radius around the current estimate (m)
    min_path_gap_factor: float = 2.5
    min_path_sep: float = 10.0
    # A loop candidate must be near in SPACE but far along the PATH:
    # path separation > max(min_path_gap_factor * pair distance, min_path_sep).
    # Without this, any slow or oscillating trajectory proposes "loops" between
    # frames a few metres apart; those short-range edges are redundant noisy
    # odometry, and at loop_weight 20x they override the smoother chained estimate
    # (measured: a 400-frame non-revisiting run went from 2.87 to 5.68 deg/100m when
    # 24 pseudo-loops were admitted). A true place revisit has position distance <<
    # path distance. The factor applies to the PAIR's actual distance (not radius,
    # ADVICE r03 #2) so widening the search radius doesn't silently raise the
    # revisit bar; min_path_sep is the absolute floor that kills micro-oscillation
    # pairs whose distance (hence scaled gate) is near zero.
    max_candidates: int = 24     # fixed verification budget (pairs padded up to this)
    min_inliers: int = 30        # PnP inlier gate for accepting a loop edge
    matcher_ratio: float = 0.9
    binary_desc: bool = True
    odo_weight: float = 1.0
    loop_weight: float = 20.0    # loop edges trusted over accumulated odometry
    # Anisotropic odometry information (1/1/0 = legacy isotropic scalars).
    # Per-component [v, w] weights on odometry edges: translation components get
    # odo_weight * odo_trans_info, rotation components odo_weight * odo_rot_info,
    # optionally softened by 1/(1 + (angle/turn_soft_rad)^2) at turning edges.
    # Measured rationale (r05 loop-workload sweep): after rotation-only windowed
    # BA the heading is good (seg-rot 1.97 -> 0.69 deg/100m) and the remaining
    # endpoint drift is DIFFUSE translation error — an isotropic pose graph then
    # closes the loop by rotating nodes (cheapest in its cost), re-injecting the
    # heading error BA just removed. Rotation-stiff / translation-soft odometry
    # information makes the closure ride the translation components instead.
    odo_trans_info: float = 1.0
    odo_rot_info: float = 1.0
    turn_soft_rad: float = 0.0   # >0: soften rotation info on turning edges
    pgo: PoseGraphConfig = PoseGraphConfig(iterations=25)


def detect_loop_closures(kf_ids, poses, kp, desc, valid, kp3d, K,
                         cfg: LoopClosureConfig = LoopClosureConfig(),
                         feat_rows=None):
    """Find verified loop-closure edges between keyframes.

    Returns a list of (a, b, Z_ab (4,4), n_inliers) with a < b indices into kf_ids.
    Candidates are non-adjacent keyframes whose *estimated* positions lie within
    ``radius`` — by construction the place-revisit signature under drift.

    ``feat_rows``: frame id of each row of kp/desc/valid/kp3d when features were
    retained sparsely (run_offline_vo_streaming(retain="sparse")); None means row i
    holds frame i's features.
    """
    kf_ids = np.asarray(kf_ids)
    poses = np.asarray(poses)
    z = np.asarray(kp3d[..., 2])
    kp3d_valid = np.asarray(valid) & (z > 0.1) & (z < 80.0)

    if feat_rows is None:
        row_of = np.arange(poses.shape[0])
    else:
        feat_rows = np.asarray(feat_rows)
        row_of = np.full(poses.shape[0], -1, np.int64)
        row_of[feat_rows] = np.arange(len(feat_rows))
    rows = row_of[kf_ids]
    if (rows < 0).any():
        missing = kf_ids[rows < 0]
        raise ValueError(f"no retained features for keyframes {missing[:8]}...")

    # Candidate proposal: near in space (radius), far along the path (revisit
    # signature), and non-adjacent in keyframe index.
    pos = poses[kf_ids][:, :3, 3]
    n = len(kf_ids)
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    steps = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=-1)
    s = np.concatenate([[0.0], np.cumsum(steps)])       # path length per frame
    path_sep = np.abs(s[kf_ids][:, None] - s[kf_ids][None, :])
    a_idx, b_idx = np.nonzero((np.triu(np.ones((n, n), bool), cfg.min_gap)) &
                              (d < cfg.radius) &
                              (path_sep > np.maximum(cfg.min_path_gap_factor * d,
                                                     cfg.min_path_sep)))
    if len(a_idx) == 0:
        return []
    order = np.argsort(d[a_idx, b_idx])[: cfg.max_candidates]
    a_idx, b_idx = a_idx[order], b_idx[order]
    C = len(a_idx)

    # Verification rides the SAME compiled kernel as BA pair matching
    # (vo_tpu.engine.refine.verify_row_pairs) — one tunnel compile serves the
    # whole refinement pipeline. The min_inliers gate applies host-side.
    from vo_tpu.engine.refine import RefineConfig, verify_row_pairs

    rcfg = RefineConfig(matcher_ratio=cfg.matcher_ratio,
                        binary_desc=cfg.binary_desc)
    _, _, pz, n_in = verify_row_pairs(rows[a_idx], rows[b_idx], kp, desc, valid,
                                      kp3d, kp3d_valid, K, rcfg)

    edges = []
    for c in range(C):
        if n_in[c] >= cfg.min_inliers:
            # pnp pose maps a-cam -> b-cam, so the c2w relative edge is its inverse.
            edges.append((int(a_idx[c]), int(b_idx[c]),
                          np.linalg.inv(pz[c]), int(n_in[c])))
    return edges


def optimize_with_loops(poses, kf_ids, loop_edges,
                        cfg: LoopClosureConfig = LoopClosureConfig()):
    """Pose-graph optimize the keyframe chain (odometry + loop edges), then re-anchor
    every non-keyframe to its keyframe. Returns the corrected (F, 4, 4) trajectory.

    With no loop edges this is a no-op up to numerics (odometry edges are consistent
    with the initialization), so it is always safe to call.
    """
    poses = np.asarray(poses)
    kf_ids = np.asarray(kf_ids)
    n = len(kf_ids)
    kf_poses = poses[kf_ids]

    inv_kf = np.linalg.inv(kf_poses)
    edges_ij = [(i, i + 1) for i in range(n - 1)]
    edges_z = list(inv_kf[:-1] @ kf_poses[1:])
    aniso = (cfg.odo_trans_info != 1.0 or cfg.odo_rot_info != 1.0
             or cfg.turn_soft_rad > 0)
    if aniso:
        # Per-component [v, w] information (see the config fields' rationale).
        rel = np.stack(edges_z)
        tr = np.clip(0.5 * (np.einsum("eii->e", rel[:, :3, :3]) - 1.0), -1.0, 1.0)
        ang = np.arccos(tr)
        w_t = cfg.odo_weight * cfg.odo_trans_info * np.ones(n - 1)
        soft = (1.0 / (1.0 + (ang / cfg.turn_soft_rad) ** 2)
                if cfg.turn_soft_rad > 0 else 1.0)
        w_r = cfg.odo_weight * cfg.odo_rot_info * soft
        edges_w = [np.array([t, t, t, r, r, r]) for t, r in zip(w_t, w_r * np.ones(n - 1))]
        loop_w = np.full(6, cfg.loop_weight)
    else:
        edges_w = [cfg.odo_weight] * (n - 1)
        loop_w = cfg.loop_weight
    for a, b, Z, n_in in loop_edges:
        edges_ij.append((a, b))
        edges_z.append(Z)
        edges_w.append(loop_w)

    opt, costs = optimize_pose_graph(
        jnp.asarray(kf_poses), jnp.asarray(np.asarray(edges_ij, np.int32)),
        jnp.asarray(np.stack(edges_z).astype(np.float32)),
        jnp.asarray(np.asarray(edges_w, np.float32)), cfg.pgo)
    opt = np.asarray(opt)

    # Re-anchor: each frame follows its most recent keyframe's correction (frames
    # before the first keyframe follow it too). One batched einsum, no Python loop.
    F = poses.shape[0]
    j_of = np.clip(np.searchsorted(kf_ids, np.arange(F), side="right") - 1, 0, n - 1)
    corr = opt @ inv_kf                     # (n, 4, 4) batched correction transforms
    out = np.einsum("fij,fjk->fik", corr[j_of], poses)
    return out, {"n_loop_edges": len(loop_edges),
                 "pgo_cost": [float(c) for c in np.asarray(costs)]}
