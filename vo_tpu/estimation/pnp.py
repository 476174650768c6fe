"""Vectorized PnP-RANSAC on device — the TPU-native replacement for
``cv2.solvePnPRansac`` (VisualOdometry_Stereo.py:129).

The OpenCV call is a serial C++ RANSAC with data-dependent control flow. Here the whole
solver is fixed-shape XLA (SURVEY.md §7 "hard parts"):

1. H hypothesis minimal sets are drawn at once from a PRNG key — a (H, m) gather.
2. Hypothesis poses come from two batched closed-form banks:
   - 6-point normalized DLT (12x12 eigh -> projection matrix -> nearest rotation) for
     the general 3D-2D case, and
   - 3-point Kabsch on 3D-3D correspondences whenever the current frame also carries
     depth (the rgbd regime of the reference). Road scenes are plane-dominated and a
     coplanar 6-point sample makes the DLT degenerate; the 3-point rigid alignment only
     fails on collinear samples, so mixing the banks keeps RANSAC robust where OpenCV's
     iterative P3P was.
3. All hypotheses score all N correspondences in one fused reprojection + masked count
   (H x N), the RANSAC hot kernel.
4. The best hypothesis (lax.top_k over counts) seeds a fixed-iteration reweighted
   Gauss-Newton refinement over SE(3) — masked weights instead of inlier gathers, so
   shapes never change.

Returns a fixed-shape ``PnPResult``; "failure" is a flag, not an exception, so the VO
engine can lax.cond on it (mirroring the reference's try/except + pose-hold fallback,
VisualOdometry_Stereo.py:268-290).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.estimation.procrustes import kabsch
from vo_tpu.geometry.se3 import pose_from_rt, se3_exp
from vo_tpu.geometry.so3 import hat
from vo_tpu.ops.smalllinalg import smallest_eigvec, solve_spd_small, svd3x3

from vo_tpu.ops.precision import geometry_precision


@dataclass(frozen=True)
class PnPConfig:
    n_hypotheses: int = 512       # reference loops 3 x 100 OpenCV iters (:120,:129); we
                                  # evaluate 512 minimal sets in one shot
    sample_size: int = 6          # DLT minimal-ish set
    reproj_threshold: float = 1.5  # px, same as the reference (:129)
    min_inliers: int = 20         # acceptance gate (:132)
    gn_iterations: int = 10       # refinement steps on the winning hypothesis
    min_depth: float = 1e-3       # points must be in front of the camera
    # Ratio acceptance for the depth-starved regime: the reference's absolute
    # >20 gate rejects a CORRECT pose whenever fewer than ~25 depth-valid
    # correspondences exist at all (measured r05: an 85% depth-dropout window
    # produced 19-of-22-inlier poses within centimetres of ground truth, all
    # rejected — and every rejected frame holds the pose, baking in ~0.8 m of
    # real motion). A pose is also accepted when it explains >= accept_ratio of
    # the available correspondences with at least min_inliers_floor of them.
    min_inliers_floor: int = 8
    accept_ratio: float = 0.6
    # Coarse-to-fine thresholds (px) for the identity-seeded GN candidate; a
    # tight tail at reproj_threshold is appended automatically. () disables the
    # candidate (the pre-r05 banks-only solver).
    anneal: tuple = (64.0, 32.0, 16.0, 8.0, 4.0, 2.0)

    def __hash__(self):
        return hash((self.n_hypotheses, self.sample_size, self.reproj_threshold,
                     self.min_inliers, self.gn_iterations, self.min_depth,
                     self.min_inliers_floor, self.accept_ratio, self.anneal))


class PnPResult(NamedTuple):
    pose: jnp.ndarray       # (4, 4) object(keyframe-cam) -> current-cam transform
    inliers: jnp.ndarray    # (N,) bool at the refined pose
    n_inliers: jnp.ndarray  # () int32
    ok: jnp.ndarray         # () bool: n_inliers > min_inliers


def _sample_indices(key, valid: jnp.ndarray, n_hyp: int, m: int) -> jnp.ndarray:
    """(n_hyp, m) indices drawn uniformly from the valid entries (with replacement).

    Valid entries are compacted to the front via argsort(~valid) (stable), then indexed
    by uniform draws in [0, n_valid) — fixed-shape and deterministic given the key.
    """
    n = valid.shape[0]
    order = jnp.argsort(~valid)  # valid indices first, stable
    n_valid = jnp.maximum(jnp.sum(valid), 1)
    u = jax.random.uniform(key, (n_hyp, m))
    slot = jnp.minimum((u * n_valid).astype(jnp.int32), n_valid - 1)
    return order[slot]


def _dlt_pose(X: jnp.ndarray, x_norm: jnp.ndarray) -> jnp.ndarray:
    """Pose from m>=6 correspondences via normalized DLT.

    Args:
      X: (m, 3) object points; x_norm: (m, 2) normalized image coords (K^-1 applied).
    Returns:
      (4, 4) pose; vmapped over hypotheses.
    """
    m = X.shape[0]
    # Condition: center/scale object points.
    c = X.mean(axis=0)
    scale = jnp.sqrt(jnp.mean(jnp.sum((X - c) ** 2, axis=-1))) + 1e-9
    Xn = (X - c) / scale
    Xh = jnp.concatenate([Xn, jnp.ones((m, 1))], axis=-1)  # (m, 4)

    zeros = jnp.zeros_like(Xh)
    u = x_norm[:, 0:1]
    v = x_norm[:, 1:2]
    rows_u = jnp.concatenate([Xh, zeros, -u * Xh], axis=-1)  # (m, 12)
    rows_v = jnp.concatenate([zeros, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2m, 12)

    # Null vector of A^T A via unrolled inverse iteration (vo_tpu.ops.smalllinalg) —
    # lax.linalg.eigh on batched 12x12s is orders of magnitude slower on TPU.
    AtA = A.T @ A
    p = smallest_eigvec(AtA, 12)
    P = p.reshape(3, 4)

    # Undo conditioning: X' = (X - c)/s  =>  P_full = P @ [[I/s, -c/s], [0, 1]]
    T = jnp.eye(4).at[:3, :3].divide(scale).at[:3, 3].set(-c / scale)
    P = P @ T

    M = P[:, :3]
    sign = jnp.sign(jnp.linalg.det(M))
    sign = jnp.where(sign == 0, 1.0, sign)
    P = P * sign
    M = P[:, :3]
    # Nearest rotation + isotropic scale (closed-form 3x3 SVD).
    U, S, Vt = svd3x3(M)
    R = U @ Vt
    s = jnp.mean(S) + 1e-12
    t = P[:, 3] / s
    return pose_from_rt(R, t)


def _reproject_residuals(pose, X, x_px, K):
    """(..., N) pixel residual norms + camera-frame depth for masking."""
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    Y = jnp.einsum("...ij,nj->...ni", R, X) + t[..., None, :]
    z = Y[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * Y[..., 0] / z_safe + K[0, 2]
    v = K[1, 1] * Y[..., 1] / z_safe + K[1, 2]
    res = jnp.sqrt((u - x_px[..., :, 0]) ** 2 + (v - x_px[..., :, 1]) ** 2)
    return res, z


def _gn_refine(pose0, X, x_px, valid, K, cfg: PnPConfig, thresholds=None):
    """Fixed-iteration reweighted Gauss-Newton over SE(3), masked — no gathers.

    ``thresholds``: optional per-iteration inlier-weight cutoffs (px). The
    default repeats cfg.reproj_threshold — a tight polisher. An ANNEALED
    schedule (wide -> tight) turns the same loop into a wide-basin solver: from
    an identity seed, early iterations fit all correspondences coarsely, late
    iterations sharpen on the emerging inlier set."""

    fx, fy = K[0, 0], K[1, 1]
    if thresholds is None:
        thresholds = jnp.full((cfg.gn_iterations,), cfg.reproj_threshold)

    def step(pose, thr):
        R = pose[:3, :3]
        t = pose[:3, 3]
        Y = X @ R.T + t  # (N, 3) camera-frame
        z = Y[:, 2]
        z_ok = z > cfg.min_depth
        z_safe = jnp.where(z_ok, z, 1.0)
        u = fx * Y[:, 0] / z_safe + K[0, 2]
        v = fy * Y[:, 1] / z_safe + K[1, 2]
        r = jnp.stack([u - x_px[:, 0], v - x_px[:, 1]], axis=-1)  # (N, 2)
        res_norm = jnp.linalg.norm(r, axis=-1)
        w = (valid & z_ok & (res_norm < thr)).astype(jnp.float32)

        # d(uv)/dY (N, 2, 3)
        zinv = 1.0 / z_safe
        zero = jnp.zeros_like(zinv)
        J_proj = jnp.stack([
            jnp.stack([fx * zinv, zero, -fx * Y[:, 0] * zinv * zinv], axis=-1),
            jnp.stack([zero, fy * zinv, -fy * Y[:, 1] * zinv * zinv], axis=-1),
        ], axis=-2)
        # dY/dxi = [I | -hat(Y)]  (N, 3, 6)
        eye = jnp.broadcast_to(jnp.eye(3), (Y.shape[0], 3, 3))
        J_pose = jnp.concatenate([eye, -hat(Y)], axis=-1)
        J = J_proj @ J_pose  # (N, 2, 6)

        JTJ = jnp.einsum("nik,nij,n->kj", J, J, w) + 1e-6 * jnp.eye(6)
        JTr = jnp.einsum("nik,ni,n->k", J, r, w)
        delta = -solve_spd_small(JTJ, JTr, 6)
        # Don't move if there is nothing to fit.
        delta = jnp.where(jnp.sum(w) >= 4, delta, jnp.zeros(6))
        return se3_exp(delta) @ pose, None

    pose, _ = jax.lax.scan(step, pose0, thresholds)
    return pose


@partial(jax.jit, static_argnames=("cfg",))
@geometry_precision
def pnp_ransac(
    key: jax.Array,
    points_3d: jnp.ndarray,
    points_2d: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    cfg: PnPConfig = PnPConfig(),
    points_3d_cur: jnp.ndarray | None = None,
    valid_cur: jnp.ndarray | None = None,
) -> PnPResult:
    """Estimate the object->camera pose from fixed-budget 3D-2D correspondences.

    Args:
      key: PRNG key for hypothesis sampling (pass a fold_in of the frame id for
           reproducible per-frame draws, cf. the reference's global seed 8214).
      points_3d: (N, 3) keyframe-camera-frame points (zero rows where invalid).
      points_2d: (N, 2) current-frame pixels.
      valid: (N,) mask (depth gate & match mask — VisualOdometry_Stereo.py:100-105).
      K: (3, 3) intrinsics.
      points_3d_cur: optional (N, 3) current-camera-frame points at the same
           correspondences (rgbd regime). Enables the 3-point Kabsch hypothesis bank.
      valid_cur: (N,) depth-validity for points_3d_cur.
    """
    N = points_3d.shape[0]
    x_norm = jnp.stack([
        (points_2d[:, 0] - K[0, 2]) / K[0, 0],
        (points_2d[:, 1] - K[1, 2]) / K[1, 1],
    ], axis=-1)

    if points_3d_cur is None:
        idx = _sample_indices(key, valid, cfg.n_hypotheses, cfg.sample_size)
        hyp_poses = jax.vmap(_dlt_pose)(points_3d[idx], x_norm[idx])  # (H, 4, 4)
    else:
        # Split the budget: Kabsch 3-point bank (plane-safe) + DLT bank (depth-noise-safe).
        n_kab = (3 * cfg.n_hypotheses) // 4
        n_dlt = cfg.n_hypotheses - n_kab
        v_cur = valid & (valid_cur if valid_cur is not None else True)
        k1, k2 = jax.random.split(key)
        idx_k = _sample_indices(k1, v_cur, n_kab, 3)
        hyp_kab = kabsch(points_3d[idx_k], points_3d_cur[idx_k])
        idx_d = _sample_indices(k2, valid, n_dlt, cfg.sample_size)
        hyp_dlt = jax.vmap(_dlt_pose)(points_3d[idx_d], x_norm[idx_d])
        hyp_poses = jnp.concatenate([hyp_kab, hyp_dlt], axis=0)

    res, z = _reproject_residuals(hyp_poses, points_3d, points_2d, K)  # (H, N)
    inl = (res < cfg.reproj_threshold) & (z > cfg.min_depth) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)

    # Identity-seeded annealed GN: a deterministic wide-basin candidate for the
    # regimes where BOTH banks degenerate at once — depth-starved frames whose
    # surviving anchors are nearly coplanar (ground points) kill the 6-point DLT,
    # while independent dropout on both frames starves the 3D-3D Kabsch bank
    # (measured r05: 30 correspondences, 87% within 1.5 px of ground truth, bank
    # answer 1 inlier). VO inter-frame motion sits comfortably inside the
    # annealed basin; large-baseline cases still come from the banks.
    if cfg.anneal:
        # Gated on bank weakness: when the winning hypothesis already explains
        # most of the correspondences (the healthy-frame common case), the
        # candidate cannot change the answer enough to matter and its ~0.9
        # ms/frame is pure cost (measured r05: engine 2.10 -> 1.24 ms with the
        # gate, seg-trans 0.026 vs 0.030%). lax.cond skips the compute in the
        # sequential engine scan; under vmap (the refinement pair kernel) it
        # lowers to a select and simply runs — still correct.
        n_avail0 = jnp.sum(valid)
        bank_weak = (counts[best] < 0.5 * n_avail0) | (n_avail0 < 64)

        def _with_candidate(_):
            anneal = jnp.asarray(list(cfg.anneal)
                                 + [float(cfg.reproj_threshold)] * 4)
            pose_id = _gn_refine(jnp.eye(4), points_3d, points_2d, valid, K,
                                 cfg, thresholds=anneal)
            res_i, z_i = _reproject_residuals(pose_id, points_3d, points_2d, K)
            inl_i = ((res_i < cfg.reproj_threshold) & (z_i > cfg.min_depth)
                     & valid)
            return pose_id, jnp.sum(inl_i).astype(counts.dtype), inl_i

        def _without(_):
            return hyp_poses[best], counts[best], inl[best]

        pose_id, count_i, inl_i = jax.lax.cond(bank_weak, _with_candidate,
                                               _without, None)
        use_id = count_i > counts[best]
        pose0 = jnp.where(use_id, pose_id, hyp_poses[best])
        best_count = jnp.maximum(counts[best], count_i)
        best_inl = jnp.where(use_id, inl_i, inl[best])
    else:
        pose0 = hyp_poses[best]
        best_count = counts[best]
        best_inl = inl[best]

    pose = _gn_refine(pose0, points_3d, points_2d, valid, K, cfg)

    res_f, z_f = _reproject_residuals(pose, points_3d, points_2d, K)
    inliers = (res_f < cfg.reproj_threshold) & (z_f > cfg.min_depth) & valid
    n_inliers = jnp.sum(inliers).astype(jnp.int32)
    # Keep whichever of {refined, best candidate} scores higher (refinement can
    # occasionally diverge on degenerate sets; the reference keeps best-of-3 similarly).
    better = n_inliers >= best_count
    pose = jnp.where(better, pose, pose0)
    inliers = jnp.where(better, inliers, best_inl)
    n_inliers = jnp.maximum(n_inliers, best_count).astype(jnp.int32)

    n_avail = jnp.sum(valid)
    ratio_ok = ((n_inliers >= cfg.min_inliers_floor)
                & (n_inliers >= cfg.accept_ratio * n_avail))
    ok = (n_inliers > cfg.min_inliers) | ratio_ok
    return PnPResult(pose=pose, inliers=inliers, n_inliers=n_inliers, ok=ok)
