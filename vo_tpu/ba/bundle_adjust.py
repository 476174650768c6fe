"""Windowed bundle adjustment with Schur-complement reduction — fully on device.

The reference has **no BA or pose graph** (SURVEY.md §1, BASELINE.json north star); this
layer is new. Design targets TPU/XLA:

- Fixed shapes everywhere: P poses x M observation slots per pose, L landmark slots,
  validity masks instead of sparse structures.
- Levenberg-Marquardt with Huber IRLS weights, fixed iteration count (lax.fori-style
  scan), gauge fixed by freezing pose 0.
- Landmark (point) blocks are eliminated by the Schur complement: Hll is (L, 3, 3)
  block-diagonal -> inverted with the closed-form unrolled Cholesky; the reduced camera
  system S is dense (6P, 6P) with P <= ~32, solved once per iteration.
- Distributed form (vo_tpu.ba.distributed): a shard_map program that splits keyframe
  blocks (and landmark ownership) over a mesh axis — per-shard assembly, reduce_scatter
  of landmark blocks, all_to_all of the pose-landmark couplings, psum of the reduced
  camera system (SURVEY.md §2.3 checklist).

Conventions: poses are world-to-camera T_cw (4, 4); landmark X is world-frame;
residual = project(K, T_cw X) - uv.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vo_tpu.geometry.se3 import se3_exp
from vo_tpu.geometry.so3 import hat

from vo_tpu.ops.precision import geometry_precision


@dataclass(frozen=True)
class BAConfig:
    iterations: int = 12
    damping_init: float = 1e-3
    huber_delta: float = 2.0         # px
    min_depth: float = 1e-2
    fix_first_pose: bool = True
    depth_weight: float = 1.0        # weight of the rgbd depth residual (0 disables);
                                     # the residual is expressed in pixel-equivalent
                                     # units fx * (z - z_meas) / z, so 1.0 treats a
                                     # fractional depth error like a pixel error

    def __hash__(self):
        return hash((self.iterations, self.damping_init, self.huber_delta,
                     self.min_depth, self.fix_first_pose, self.depth_weight))


class BAProblem(NamedTuple):
    """Fixed-shape windowed BA problem.

    poses:    (P, 4, 4) world-to-camera initial estimates
    points:   (L, 3) world-frame landmark initial estimates
    obs_lm:   (P, M) int32 landmark index per observation slot
    obs_uv:   (P, M, 2) pixel measurements
    obs_valid:(P, M) bool
    K:        (3, 3) intrinsics
    obs_z:    optional (P, M) measured camera-frame depth (rgbd); <= 0 disables the
              depth residual for that observation. Pure-reprojection BA is gauge-soft
              in small low-parallax windows; the metric depths pin it.
    """

    poses: jnp.ndarray
    points: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_valid: jnp.ndarray
    K: jnp.ndarray
    obs_z: jnp.ndarray | None = None


def _residuals_and_jacobians(poses, points, prob: BAProblem, cfg: BAConfig):
    """Per-observation residuals + pose/landmark Jacobians, all fixed-shape.

    Returns r (P, M, 2), Jp (P, M, 2, 6), Jl (P, M, 2, 3), w (P, M).
    """
    K = prob.K
    fx, fy = K[0, 0], K[1, 1]
    X = points[prob.obs_lm]                        # (P, M, 3) world
    R = poses[:, :3, :3]
    t = poses[:, :3, 3]
    Y = jnp.einsum("pij,pmj->pmi", R, X) + t[:, None, :]   # camera frame
    z = Y[..., 2]
    z_ok = z > cfg.min_depth
    z_safe = jnp.where(z_ok, z, 1.0)
    u = fx * Y[..., 0] / z_safe + K[0, 2]
    v = fy * Y[..., 1] / z_safe + K[1, 2]

    # Optional rgbd depth residual in pixel-equivalent units: fx (z - z_m) / z_m.
    if prob.obs_z is not None:
        z_m = prob.obs_z
        z_has = z_m > cfg.min_depth
        z_m_safe = jnp.where(z_has, z_m, 1.0)
        wz = cfg.depth_weight * fx / z_m_safe * z_has.astype(Y.dtype)
        r3 = wz * (z - z_m_safe)
    else:
        wz = jnp.zeros_like(z)
        r3 = jnp.zeros_like(z)

    r = jnp.stack([u - prob.obs_uv[..., 0],
                   v - prob.obs_uv[..., 1],
                   r3], axis=-1)

    zinv = 1.0 / z_safe
    zero = jnp.zeros_like(zinv)
    Jproj = jnp.stack([
        jnp.stack([fx * zinv, zero, -fx * Y[..., 0] * zinv * zinv], axis=-1),
        jnp.stack([zero, fy * zinv, -fy * Y[..., 1] * zinv * zinv], axis=-1),
        jnp.stack([zero, zero, wz], axis=-1),
    ], axis=-2)                                    # (P, M, 3, 3)

    eye = jnp.broadcast_to(jnp.eye(3), Y.shape + (3,))
    Jpose_Y = jnp.concatenate([eye, -hat(Y)], axis=-1)     # (P, M, 3, 6)
    Jp = Jproj @ Jpose_Y                                   # (P, M, 3, 6)
    Jl = Jproj @ R[:, None]                                # dY/dX = R

    # Huber IRLS weights on the 2-D reprojection norm, masked.
    rn = jnp.linalg.norm(r[..., :2], axis=-1)
    huber = jnp.where(rn <= cfg.huber_delta, 1.0, cfg.huber_delta / rn.clip(1e-9))
    w = huber * (prob.obs_valid & z_ok).astype(r.dtype)
    return r, Jp, Jl, w


def _assemble_reduced_system(r, Jp, Jl, w, obs_lm, L, damping):
    """Schur-complement assembly. Returns (S (6P, 6P), g (6P,), lm_terms).

    Hpp: (P, 6, 6) block-diag; Hll: (L, 3, 3) block-diag; W = Hpl: per-observation
    (P, M, 6, 3) coupling. S = Hpp - W Hll^-1 W^T restricted to shared landmarks.
    """
    P, M = obs_lm.shape
    Hpp = jnp.einsum("pmik,pmil,pm->pkl", Jp, Jp, w)             # (P, 6, 6)
    bp = -jnp.einsum("pmik,pmi,pm->pk", Jp, r, w)                # (P, 6)

    flat_lm = obs_lm.reshape(-1)
    Hll_obs = jnp.einsum("pmik,pmil,pm->pmkl", Jl, Jl, w).reshape(-1, 3, 3)
    Hll = jax.ops.segment_sum(Hll_obs, flat_lm, num_segments=L)  # (L, 3, 3)
    bl_obs = -jnp.einsum("pmik,pmi,pm->pmk", Jl, r, w).reshape(-1, 3)
    bl = jax.ops.segment_sum(bl_obs, flat_lm, num_segments=L)    # (L, 3)

    Wpl = jnp.einsum("pmik,pmil,pm->pmkl", Jp, Jl, w)            # (P, M, 6, 3)

    # S = Hpp - sum_l U_l Hll^-1 U_l^T where U[l] stacks the per-pose couplings of
    # landmark l. Materialize U (L, P, 6, 3) via a 2-d segment_sum of observation blocks.
    pose_ids = jnp.broadcast_to(jnp.arange(P)[:, None], (P, M)).reshape(-1)
    Wflat = Wpl.reshape(-1, 6, 3)                                # (P*M, 6, 3)
    seg2 = flat_lm * P + pose_ids
    U = jax.ops.segment_sum(Wflat, seg2, num_segments=L * P).reshape(L, P, 6, 3)

    inv3 = damped_inv3(Hll, damping)                             # (L, 3, 3)

    U_t = jnp.swapaxes(U.reshape(L, P * 6, 3), -1, -2)           # (L, 3, 6P)
    Hll_inv_Ut = inv3 @ U_t                                      # (L, 3, 6P)
    S_corr = jnp.einsum("lak,lkb->ab",
                        U.reshape(L, P * 6, 3), Hll_inv_Ut)      # (6P, 6P)
    g_corr = jnp.einsum("lak,lk->a", U.reshape(L, P * 6, 3),
                        (inv3 @ bl[..., None])[..., 0])          # (6P,)

    S = jax.scipy.linalg.block_diag(*[Hpp[p] for p in range(P)]) - S_corr
    g = bp.reshape(P * 6) - g_corr
    return S, g, (inv3, bl, U)


def damped_inv3(Hll: jnp.ndarray, damping) -> jnp.ndarray:
    """LM-damped inverse of (L, 3, 3) landmark blocks via the closed-form adjugate
    (one inverse reused for S, g and the landmark back-substitution). The damping is
    trace-relative so unobserved (all-zero) blocks stay benignly invertible."""
    Hll_d = Hll + (damping * jnp.maximum(
        jnp.trace(Hll, axis1=-2, axis2=-1), 1e-6)[..., None, None] / 3.0 + 1e-8
    ) * jnp.eye(3)
    det = jnp.linalg.det(Hll_d)
    adj = jnp.stack([
        jnp.stack([Hll_d[..., 1, 1] * Hll_d[..., 2, 2] - Hll_d[..., 1, 2] * Hll_d[..., 2, 1],
                   Hll_d[..., 0, 2] * Hll_d[..., 2, 1] - Hll_d[..., 0, 1] * Hll_d[..., 2, 2],
                   Hll_d[..., 0, 1] * Hll_d[..., 1, 2] - Hll_d[..., 0, 2] * Hll_d[..., 1, 1]], axis=-1),
        jnp.stack([Hll_d[..., 1, 2] * Hll_d[..., 2, 0] - Hll_d[..., 1, 0] * Hll_d[..., 2, 2],
                   Hll_d[..., 0, 0] * Hll_d[..., 2, 2] - Hll_d[..., 0, 2] * Hll_d[..., 2, 0],
                   Hll_d[..., 0, 2] * Hll_d[..., 1, 0] - Hll_d[..., 0, 0] * Hll_d[..., 1, 2]], axis=-1),
        jnp.stack([Hll_d[..., 1, 0] * Hll_d[..., 2, 1] - Hll_d[..., 1, 1] * Hll_d[..., 2, 0],
                   Hll_d[..., 0, 1] * Hll_d[..., 2, 0] - Hll_d[..., 0, 0] * Hll_d[..., 2, 1],
                   Hll_d[..., 0, 0] * Hll_d[..., 1, 1] - Hll_d[..., 0, 1] * Hll_d[..., 1, 0]], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None].clip(1e-12)                # (L, 3, 3)


def _backsub_landmarks(delta_pose_flat, lm_terms):
    """delta_l = Hll^-1 (bl - U^T delta_p)."""
    inv3, bl, U = lm_terms
    L = U.shape[0]
    Ut_dp = jnp.einsum("lak,a->lk", U.reshape(L, -1, 3), delta_pose_flat)
    return (inv3 @ (bl - Ut_dp)[..., None])[..., 0]


def _total_cost(r, w):
    return jnp.sum(w * jnp.sum(r * r, axis=-1))


@partial(jax.jit, static_argnames=("cfg",))
@geometry_precision
def bundle_adjust(prob: BAProblem, cfg: BAConfig = BAConfig()):
    """LM-damped Schur BA. Returns (poses, points, info dict)."""
    P = prob.poses.shape[0]
    L = prob.points.shape[0]

    def iteration(carry, _):
        poses, points, damping = carry
        r, Jp, Jl, w = _residuals_and_jacobians(poses, points, prob, cfg)
        cost0 = _total_cost(r, w)
        S, g, lm_terms = _assemble_reduced_system(r, Jp, Jl, w, prob.obs_lm, L, damping)

        # LM damping on the reduced camera system + gauge fixing.
        S = S + damping * jnp.diag(jnp.maximum(jnp.diag(S), 1e-6))
        if cfg.fix_first_pose:
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (P - 1))])
            S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            g = g * mask
        delta_p = jnp.linalg.solve(S, g)
        delta_l = _backsub_landmarks(delta_p, lm_terms)

        new_poses = jax.vmap(lambda d, T: se3_exp(d) @ T)(delta_p.reshape(P, 6), poses)
        new_points = points + delta_l

        r2, _, _, w2 = _residuals_and_jacobians(new_poses, new_points, prob, cfg)
        cost1 = _total_cost(r2, w2)
        improved = cost1 < cost0
        poses = jnp.where(improved, new_poses, poses)
        points = jnp.where(improved, new_points, points)
        damping = jnp.where(improved, damping * 0.5, damping * 4.0)
        return (poses, points, damping), jnp.stack([cost0, cost1])

    init = (prob.poses, prob.points, jnp.asarray(cfg.damping_init))
    (poses, points, _), costs = jax.lax.scan(iteration, init, None,
                                             length=cfg.iterations)
    r, _, _, w = _residuals_and_jacobians(poses, points, prob, cfg)
    info = {"costs": costs, "final_cost": _total_cost(r, w),
            "mean_reproj": jnp.sqrt(_total_cost(r, w) / jnp.maximum(jnp.sum(w), 1.0))}
    return poses, points, info
