"""Essential-matrix RANSAC + pose recovery — the monocular front-end, fully on device.

The reference's monocular path is work-in-progress notebook code
(.ipynb_checkpoints/Homography_img-checkpoint.ipynb: ``computepose_2D_2D`` =
cv2.findEssentialMat + cv2.recoverPose in a best-of-N loop; config/vo_params.yaml:1
declares 'monocular' an option). This module is the production version, shaped like the
PnP solver (fixed shapes, hypothesis banks, masked scoring):

- Hypotheses: batched 8-point least-squares E (null vector of the 9x9 normal matrix via
  unrolled inverse iteration), projected to the essential manifold by svd3x3 with
  singular values (1, 1, 0).
- Scoring: Sampson distance over all N correspondences per hypothesis, masked count.
- Pose recovery: the 4 (R, t) decompositions scored by cheirality (midpoint-depth
  positivity) over all inliers at once — no per-point Python loops.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.estimation.pnp import _sample_indices
from vo_tpu.geometry.se3 import pose_from_rt
from vo_tpu.geometry.so3 import hat, so3_exp
from vo_tpu.ops.smalllinalg import smallest_eigvec, solve_spd_small, svd3x3

from vo_tpu.ops.precision import geometry_precision


@dataclass(frozen=True)
class EssentialConfig:
    n_hypotheses: int = 128
    sample_size: int = 48             # "fat RANSAC": minimal 8-point fits are unstable
                                      # under pixel noise (even in f64 a clean minimal
                                      # sample gives E errors of ~0.3-0.7); a 48-point
                                      # robust fit is stable and the batched LS is
                                      # exactly what the MXU is good at
    irls_rounds: int = 4              # Cauchy IRLS rounds inside each hypothesis
    sampson_threshold: float = 2e-6   # squared, on normalized coords (~1 px at f=700)
    polish_starts: int = 8            # top-K hypotheses fed to the manifold GN polish
    polish_iters: int = 15            # GN iterations per start
    min_inliers: int = 20

    def __hash__(self):
        return hash((self.n_hypotheses, self.sample_size, self.irls_rounds,
                     self.sampson_threshold, self.polish_starts, self.polish_iters,
                     self.min_inliers))


class EssentialResult(NamedTuple):
    E: jnp.ndarray          # (3, 3)
    pose: jnp.ndarray       # (4, 4): x2 ~ R x1 + t (unit-norm t, scale-free)
    inliers: jnp.ndarray    # (N,)
    n_inliers: jnp.ndarray
    ok: jnp.ndarray


def _epipolar_design(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """(m, 9) design matrix rows of the epipolar constraint x2^T E x1 = 0."""
    u1, v1 = x1[..., 0], x1[..., 1]
    u2, v2 = x2[..., 0], x2[..., 1]
    ones = jnp.ones_like(u1)
    return jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones],
                     axis=-1)


def _project_essential(e: jnp.ndarray) -> jnp.ndarray:
    """(9,) -> (3, 3) on the essential manifold (singular values (s, s, 0))."""
    E = e.reshape(3, 3)
    U, S, Vt = svd3x3(E)
    s = (S[0] + S[1]) * 0.5
    return U @ jnp.diag(jnp.array([1.0, 1.0, 0.0])) @ Vt * s


def _eight_point(x1: jnp.ndarray, x2: jnp.ndarray,
                 w: jnp.ndarray | None = None) -> jnp.ndarray:
    """(Weighted) LS essential matrix from (m, 2)+(m, 2) normalized correspondences,
    manifold-projected. vmapped over hypotheses."""
    A = _epipolar_design(x1, x2)
    Aw = A if w is None else A * w[:, None]
    e = smallest_eigvec(Aw.T @ A if w is not None else A.T @ A, 9)
    return _project_essential(e)


def _irls_essential(x1s: jnp.ndarray, x2s: jnp.ndarray, rounds: int,
                    sigma2: float) -> jnp.ndarray:
    """Cauchy-IRLS essential fit on one (m, 2) sample; vmapped over hypotheses."""
    E = _eight_point(x1s, x2s)

    def step(E, _):
        d = _sampson_dist(E, x1s, x2s)
        w = 1.0 / (1.0 + d / sigma2)
        return _eight_point(x1s, x2s, w), None

    E, _ = jax.lax.scan(step, E, None, length=rounds)
    return E


def _sampson_dist(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Squared Sampson distance, batched over leading E axes. x: (N, 2) normalized."""
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)       # (N, 3)
    p2 = jnp.concatenate([x2, ones], axis=-1)
    Ex1 = jnp.einsum("...ij,nj->...ni", E, p1)      # (..., N, 3)
    Etx2 = jnp.einsum("...ji,nj->...ni", E, p2)
    x2tEx1 = jnp.einsum("ni,...ni->...n", p2, Ex1)
    denom = (Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2
             + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2)
    return x2tEx1 ** 2 / denom.clip(1e-12)


def _midpoint_depths(R, t, x1, x2):
    """Fast two-view depth signs for cheirality: solve for the depths along each ray.

    For x2 ~ R x1 d1 + t: [R p1, -p2] [d1, d2]^T = -t in least squares (2x2 normal eq).
    Returns (d1, d2) per correspondence.
    """
    ones = jnp.ones_like(x1[..., :1])
    f1 = jnp.concatenate([x1, ones], axis=-1)
    f2 = jnp.concatenate([x2, ones], axis=-1)
    a = jnp.einsum("ij,nj->ni", R, f1)              # (N, 3)
    b = -f2
    # Normal equations for [a b] z = -t
    aa = jnp.sum(a * a, -1)
    ab = jnp.sum(a * b, -1)
    bb = jnp.sum(b * b, -1)
    at = -jnp.einsum("ni,i->n", a, t)
    bt = -jnp.einsum("ni,i->n", b, t)
    det = (aa * bb - ab * ab).clip(1e-12)
    d1 = (at * bb - ab * bt) / det
    d2 = (aa * bt - ab * at) / det
    return d1, d2


def _refine_pose_sampson(R0, t0, x1, x2, valid_w, sigma2: float = 1e-5,
                         iters: int = 10):
    """Fixed-iteration GN on the 5-dof (R, unit-t) manifold minimizing Sampson error.

    The f32 8-point + closed-form decomposition leaves ~degrees of t-direction error;
    this polish recovers the precision OpenCV's recoverPose-level pipeline has.
    Parameterization: R <- exp(dw) R, t <- normalize(t + B db) with B an orthonormal
    basis of t's tangent plane. Jacobians via forward-mode autodiff; 5x5 unrolled solve.
    """
    ones = jnp.ones_like(x1[..., :1])
    p1 = jnp.concatenate([x1, ones], axis=-1)
    p2 = jnp.concatenate([x2, ones], axis=-1)

    def tangent_basis(t):
        a = jnp.where(jnp.abs(t[0]) < 0.9, jnp.array([1.0, 0.0, 0.0]),
                      jnp.array([0.0, 1.0, 0.0]))
        b1 = jnp.cross(t, a)
        b1 = b1 / jnp.linalg.norm(b1).clip(1e-9)
        b2 = jnp.cross(t, b1)
        return jnp.stack([b1, b2], axis=-1)  # (3, 2)

    def sampson_residual(params, R, t, B):
        dw = params[:3]
        db = params[3:]
        Rn = so3_exp(dw) @ R
        tn = t + B @ db
        tn = tn / jnp.linalg.norm(tn).clip(1e-9)
        E = hat(tn) @ Rn
        Ex1 = p1 @ E.T
        Etx2 = p2 @ E
        num = jnp.sum(p2 * Ex1, axis=-1)
        den = jnp.sqrt((Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2
                        + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2).clip(1e-12))
        return num / den

    def step(carry, _):
        R, t = carry
        B = tangent_basis(t)
        z = jnp.zeros(5)
        r = sampson_residual(z, R, t, B)
        # Cauchy IRLS: soft robust weights recomputed each iteration — immune to a
        # biased initial hard-inlier gate.
        w = valid_w / (1.0 + (r * r) / sigma2)
        J = jax.jacfwd(sampson_residual)(z, R, t, B)     # (N, 5)
        JTJ = jnp.einsum("ni,nj,n->ij", J, J, w) + 1e-9 * jnp.eye(5)
        JTr = jnp.einsum("ni,n->i", J, r * w)
        delta = -solve_spd_small(JTJ, JTr, 5)
        R_new = so3_exp(delta[:3]) @ R
        t_new = t + B @ delta[3:]
        t_new = t_new / jnp.linalg.norm(t_new).clip(1e-9)
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R0, t0), None, length=iters)
    return R, t


@partial(jax.jit, static_argnames=("cfg",))
@geometry_precision
def essential_ransac(
    key: jax.Array,
    kp1: jnp.ndarray,       # (N, 2) pixels, view 1
    kp2: jnp.ndarray,       # (N, 2) pixels, view 2
    valid: jnp.ndarray,     # (N,)
    K: jnp.ndarray,
    cfg: EssentialConfig = EssentialConfig(),
) -> EssentialResult:
    """Estimate E + the relative pose (view1 -> view2, |t| = 1) from 2D-2D matches."""
    x1 = jnp.stack([(kp1[:, 0] - K[0, 2]) / K[0, 0],
                    (kp1[:, 1] - K[1, 2]) / K[1, 1]], axis=-1)
    x2 = jnp.stack([(kp2[:, 0] - K[0, 2]) / K[0, 0],
                    (kp2[:, 1] - K[1, 2]) / K[1, 1]], axis=-1)

    idx = _sample_indices(key, valid, cfg.n_hypotheses, cfg.sample_size)
    E_hyp = jax.vmap(lambda a, b: _irls_essential(a, b, cfg.irls_rounds,
                                                  cfg.sampson_threshold))(
        x1[idx], x2[idx])                                       # (H, 3, 3)

    d = _sampson_dist(E_hyp, x1, x2)                            # (H, N)
    inl = (d < cfg.sampson_threshold) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)

    # Multi-start manifold polish: minimal/fat-sample E estimates are noise-limited
    # (err ~0.3 even from clean samples), so LO from the single best hypothesis can
    # settle in a consensus-degenerate basin. Instead, take the top-K hypotheses, GN
    # them on the 5-dof (R, unit-t) manifold with Cauchy weights over ALL points, and
    # let the re-gated consensus pick the winner — the true basin separates decisively.
    _, top = jax.lax.top_k(counts, cfg.polish_starts)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    vmask = valid.astype(jnp.float32)

    def detfix(R):
        return R * jnp.sign(jnp.linalg.det(R))

    def polish_one(E0, use_wt):
        U, _, Vt = svd3x3(E0)
        R0 = detfix(jnp.where(use_wt, U @ W.T @ Vt, U @ W @ Vt))
        R_r, t_r = _refine_pose_sampson(R0, U[:, 2], x1, x2, vmask,
                                        sigma2=cfg.sampson_threshold,
                                        iters=cfg.polish_iters)
        E_r = hat(t_r) @ R_r
        cnt = jnp.sum((_sampson_dist(E_r, x1, x2) < cfg.sampson_threshold) & valid)
        return E_r, R_r, t_r, cnt

    E_starts = jnp.concatenate([E_hyp[top], E_hyp[top]], axis=0)
    use_wt = jnp.concatenate([jnp.zeros(cfg.polish_starts, bool),
                              jnp.ones(cfg.polish_starts, bool)])
    E_pol, R_pol, t_pol, cnt_pol = jax.vmap(polish_one)(E_starts, use_wt)
    bi = jnp.argmax(cnt_pol)
    E, R_best, t_best = E_pol[bi], R_pol[bi], t_pol[bi]

    # Final rounds on the winner with HARD inlier gating: once the basin is right the
    # consensus set is ~clean, and excluding the outliers entirely (instead of Cauchy
    # tails over all points) removes their residual bias.
    for _ in range(2):
        E = hat(t_best) @ R_best
        hard = ((_sampson_dist(E, x1, x2) < cfg.sampson_threshold) & valid)
        R_best, t_best = _refine_pose_sampson(R_best, t_best, x1, x2,
                                              hard.astype(jnp.float32),
                                              sigma2=cfg.sampson_threshold,
                                              iters=cfg.polish_iters)
    E = hat(t_best) @ R_best
    inliers = (_sampson_dist(E, x1, x2) < cfg.sampson_threshold) & valid

    # Resolve the 4-fold (R, t) ambiguity of the refined E by cheirality over inliers
    # (the Sampson objective is invariant to it).
    U, _, Vt = svd3x3(E)
    R1 = detfix(U @ W @ Vt)
    R2 = detfix(U @ W.T @ Vt)
    t0 = U[:, 2]
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t0, -t0, t0, -t0])

    def cheirality(Rt):
        R, t = Rt
        d1, d2 = _midpoint_depths(R, t, x1, x2)
        return jnp.sum(((d1 > 0) & (d2 > 0)) & inliers)

    scores = jax.vmap(cheirality)((cands_R, cands_t))
    ci = jnp.argmax(scores)
    pose = pose_from_rt(cands_R[ci], cands_t[ci])

    n_inl = jnp.sum(inliers).astype(jnp.int32)
    return EssentialResult(E=E, pose=pose, inliers=inliers, n_inliers=n_inl,
                           ok=n_inl > cfg.min_inliers)


@partial(jax.jit, static_argnames=("n_pairs",))
@geometry_precision
def relative_scale(
    key: jax.Array,
    pts_a: jnp.ndarray,     # (N, 3) 3D points in frame A's scale
    pts_b: jnp.ndarray,     # (N, 3) corresponding points in frame B's scale
    valid: jnp.ndarray,
    n_pairs: int = 4096,
    inlier_ratio_band: float = 0.1,
) -> jnp.ndarray:
    """Robust scale s with |pts_b| distances ~= s * |pts_a| distances.

    Vectorized counterpart of the reference's ``find_scale`` RANSAC-regression
    (Utils/geom_utils.py:136-177): sample point pairs, form distance ratios, take the
    median, then refine with a least-squares fit over ratios within a band of the
    median (the RANSAC consensus step, without sklearn).
    """
    n = pts_a.shape[0]
    k1, k2 = jax.random.split(key)
    ia = _sample_indices(k1, valid, n_pairs, 1)[:, 0]
    ib = _sample_indices(k2, valid, n_pairs, 1)[:, 0]
    distinct = ia != ib
    da = jnp.linalg.norm(pts_a[ia] - pts_a[ib], axis=-1)
    db = jnp.linalg.norm(pts_b[ia] - pts_b[ib], axis=-1)
    good = distinct & (da > 1e-6) & (db > 1e-6) & valid[ia] & valid[ib]
    ratio = jnp.where(good, db / da.clip(1e-9), jnp.nan)
    med = jnp.nanmedian(ratio)
    w = (jnp.abs(ratio - med) < inlier_ratio_band * med) & good
    # LS fit through origin on inlier pairs: s = sum(da*db) / sum(da^2)
    wf = w.astype(jnp.float32)
    s = jnp.sum(wf * da * db) / jnp.sum(wf * da * da).clip(1e-9)
    return jnp.where(jnp.isfinite(s) & (s > 0), s, med)
