"""Loop-closure detection + pose-graph trajectory optimization.

The reference chains poses open-loop and never corrects them
(VisualOdometry_Stereo.py:283,292) — revisiting a place leaves the accumulated drift in
place forever. This module closes that gap: candidate keyframe pairs are proposed by
estimated proximity, verified with the same descriptor-match + PnP-RANSAC machinery the
VO front-end uses (all batched/jitted), and the verified relative poses become
loop-closure edges in a pose graph (vo_tpu.ba.pose_graph) optimized over the keyframe
chain; non-keyframe poses re-anchor to their keyframe.

Wired into the product path via ``vo_tpu.runners.vo_run --refine`` (after windowed BA).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.ba.pose_graph import PoseGraphConfig, optimize_pose_graph
from vo_tpu.estimation.pnp import PnPConfig, pnp_ransac
from vo_tpu.matching.matchers import ratio_match, ratio_mutual_nn_match


@dataclass(frozen=True)
class LoopClosureConfig:
    min_gap: int = 8             # min keyframe-index separation for a loop candidate
    radius: float = 10.0         # candidate search radius around the current estimate (m)
    max_candidates: int = 24     # cap on verified PnP attempts per trajectory
    min_inliers: int = 30        # PnP inlier gate for accepting a loop edge
    matcher_ratio: float = 0.9
    binary_desc: bool = True
    odo_weight: float = 1.0
    loop_weight: float = 20.0    # loop edges trusted over accumulated odometry
    pgo: PoseGraphConfig = PoseGraphConfig(iterations=25)


def _match_pair(ia, ib, kp, desc, valid, kp3d, kp3d_valid, K,
                cfg: LoopClosureConfig):
    """Verify keyframe pair (ia -> ib); returns (T_rel c2w edge Z = T_ia^-1 T_ib or
    None, n_inliers)."""
    if cfg.binary_desc:
        m = ratio_match(desc[ia], desc[ib], valid[ia], valid[ib],
                        ratio=cfg.matcher_ratio, binary_dim=desc.shape[-1])
    else:
        m = ratio_mutual_nn_match(desc[ia], desc[ib], valid[ia], valid[ib],
                                  ratio=cfg.matcher_ratio)
    mask = jnp.asarray(np.asarray(m.mask) & np.asarray(kp3d_valid[ia]))
    res = pnp_ransac(
        jax.random.fold_in(jax.random.key(8214), int(ia) * 131071 + int(ib)),
        kp3d[ia], kp[ib][m.idx], mask, jnp.asarray(K),
        PnPConfig(n_hypotheses=512, min_inliers=cfg.min_inliers),
        points_3d_cur=kp3d[ib][m.idx],
        valid_cur=kp3d_valid[ib][np.asarray(m.idx)],
    )
    n_in = int(res.n_inliers)
    if not bool(res.ok):
        return None, n_in
    # pnp pose maps ia-cam -> ib-cam, so the c2w relative edge is its inverse.
    return np.linalg.inv(np.asarray(res.pose)), n_in


def detect_loop_closures(kf_ids, poses, kp, desc, valid, kp3d, K,
                         cfg: LoopClosureConfig = LoopClosureConfig()):
    """Find verified loop-closure edges between keyframes.

    Returns a list of (a, b, Z_ab (4,4), n_inliers) with a < b indices into kf_ids.
    Candidates are non-adjacent keyframes whose *estimated* positions lie within
    ``radius`` — by construction the place-revisit signature under drift.
    """
    kf_ids = np.asarray(kf_ids)
    poses = np.asarray(poses)
    z = np.asarray(kp3d[..., 2])
    kp3d_valid = np.asarray(valid) & (z > 0.1) & (z < 80.0)

    pos = poses[kf_ids][:, :3, 3]
    n = len(kf_ids)
    cands = []
    for a in range(n):
        for b in range(a + cfg.min_gap, n):
            d = float(np.linalg.norm(pos[a] - pos[b]))
            if d < cfg.radius:
                cands.append((d, a, b))
    cands.sort()
    edges = []
    for d, a, b in cands[: cfg.max_candidates]:
        Z, n_in = _match_pair(int(kf_ids[a]), int(kf_ids[b]), kp, desc, valid,
                              kp3d, kp3d_valid, K, cfg)
        if Z is not None:
            edges.append((a, b, Z, n_in))
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

    edges_ij = [(i, i + 1) for i in range(n - 1)]
    edges_z = [np.linalg.inv(kf_poses[i]) @ kf_poses[i + 1] for i in range(n - 1)]
    edges_w = [cfg.odo_weight] * (n - 1)
    for a, b, Z, n_in in loop_edges:
        edges_ij.append((a, b))
        edges_z.append(Z)
        edges_w.append(cfg.loop_weight)

    opt, costs = optimize_pose_graph(
        jnp.asarray(kf_poses), jnp.asarray(np.asarray(edges_ij, np.int32)),
        jnp.asarray(np.stack(edges_z).astype(np.float32)),
        jnp.asarray(np.asarray(edges_w, np.float32)), cfg.pgo)
    opt = np.asarray(opt)

    # Re-anchor: each frame follows its most recent keyframe's correction.
    out = poses.copy()
    F = poses.shape[0]
    for j in range(n):
        corr = opt[j] @ np.linalg.inv(kf_poses[j])
        nxt = int(kf_ids[j + 1]) if j + 1 < n else F
        for g in range(int(kf_ids[j]), min(nxt, F)):
            out[g] = corr @ poses[g]
    if int(kf_ids[-1]) == F - 1:
        out[F - 1] = opt[-1] @ np.linalg.inv(kf_poses[-1]) @ poses[F - 1]
    return out, {"n_loop_edges": len(loop_edges),
                 "pgo_cost": [float(c) for c in np.asarray(costs)]}
