"""Distributed windowed Schur BA: keyframe blocks sharded over a mesh axis (shard_map).

The TPU-native scaling path promised in SURVEY.md §2.3/§5 — the structural analog of
sequence parallelism for a pose chain. Each shard owns a contiguous block of keyframes
(its observation slots) plus a block of landmarks, and the Schur reduction is assembled
with explicit XLA collectives:

  1. per-shard residual/Jacobian assembly for the local keyframe block (pure compute);
  2. ``psum_scatter`` (reduce-scatter) of the landmark Hessian blocks Hll and rhs bl —
     after it, every shard holds the fully-summed 3x3 blocks of the landmarks it OWNS;
  3. ``all_to_all`` of the pose-landmark couplings U: shard s sends the couplings its
     keyframes generate for shard t's landmarks — the boundary-landmark block exchange
     (the ring pass rides ICI; XLA lowers it to ppermute steps on a torus);
  4. local Schur correction over owned landmarks, then one ``psum`` producing the
     replicated reduced camera system S (6P x 6P, small) solved on every shard;
  5. landmark back-substitution on the owner, ``all_gather`` of the updates.

The per-iteration LM accept/reject logic matches vo_tpu.ba.bundle_adjust bit-for-bit in
math (same Jacobians, same trace-relative damping via ``damped_inv3``), so the sharded
solve agrees with the single-device one up to reduction order.

The reference has nothing in this space (single process, no BA at all) — this is the
BASELINE.json north-star component, not a port.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vo_tpu.ba.bundle_adjust import (
    BAConfig,
    BAProblem,
    _residuals_and_jacobians,
    _total_cost,
    damped_inv3,
)
from vo_tpu.geometry.se3 import se3_exp

from vo_tpu.ops.precision import geometry_precision


def _pad_problem(prob: BAProblem, n_shards: int) -> tuple[BAProblem, int, int]:
    """Pad poses to a multiple of n_shards (identity poses, no observations) and
    landmarks likewise, so every shard gets equal fixed-shape blocks."""
    P_, L = prob.poses.shape[0], prob.points.shape[0]
    P_pad = -(-P_ // n_shards) * n_shards
    L_pad = -(-L // n_shards) * n_shards
    if P_pad == P_ and L_pad == L:
        return prob, P_, L

    dP, M = P_pad - P_, prob.obs_lm.shape[1]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=prob.poses.dtype), (dP, 4, 4))
    prob = BAProblem(
        poses=jnp.concatenate([prob.poses, eye]),
        points=jnp.concatenate(
            [prob.points, jnp.zeros((L_pad - L, 3), prob.points.dtype)]),
        obs_lm=jnp.concatenate([prob.obs_lm, jnp.zeros((dP, M), prob.obs_lm.dtype)]),
        obs_uv=jnp.concatenate([prob.obs_uv, jnp.zeros((dP, M, 2), prob.obs_uv.dtype)]),
        obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros((dP, M), bool)]),
        K=prob.K,
        obs_z=None if prob.obs_z is None else jnp.concatenate(
            [prob.obs_z, jnp.zeros((dP, M), prob.obs_z.dtype)]),
    )
    return prob, P_, L


@geometry_precision
def _ba_shard_body(poses, points, obs_lm, obs_uv, obs_valid, K, obs_z,
                   *, cfg: BAConfig, axis: str, n_fixed: int, has_z: bool):
    """shard_map body. poses/points/K replicated; obs_* hold this shard's keyframe
    block. n_fixed = number of trailing padded poses to hold at identity."""
    D = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    P_tot = poses.shape[0]
    L_tot = points.shape[0]
    P_loc = obs_lm.shape[0]
    L_loc = L_tot // D
    p0 = me * P_loc

    # Gauge / padding mask over the replicated 6P-dim camera system: pose 0 (gauge) and
    # padded poses are frozen exactly like bundle_adjust's fix_first_pose mask.
    keep = jnp.ones(P_tot, poses.dtype)
    if cfg.fix_first_pose:
        keep = keep.at[0].set(0.0)
    if n_fixed:
        keep = keep.at[P_tot - n_fixed:].set(0.0)
    mask = jnp.repeat(keep, 6)

    def local_problem():
        return BAProblem(poses=None, points=None, obs_lm=obs_lm, obs_uv=obs_uv,
                         obs_valid=obs_valid, K=K, obs_z=obs_z if has_z else None)

    def reduced_system(r, Jp, Jl, w, damping):
        """Distributed Schur assembly -> replicated (S, g) + owner-local lm terms."""
        # Local pose blocks (this shard's keyframes only).
        Hpp = jnp.einsum("pmik,pmil,pm->pkl", Jp, Jp, w)             # (P_loc, 6, 6)
        bp = -jnp.einsum("pmik,pmi,pm->pk", Jp, r, w)                # (P_loc, 6)

        # Landmark blocks: partial sums over local observations, then reduce-scatter so
        # each shard owns the fully-summed blocks of its landmark range.
        flat_lm = obs_lm.reshape(-1)
        Hll_part = jax.ops.segment_sum(
            jnp.einsum("pmik,pmil,pm->pmkl", Jl, Jl, w).reshape(-1, 3, 3),
            flat_lm, num_segments=L_tot)
        bl_part = jax.ops.segment_sum(
            -jnp.einsum("pmik,pmi,pm->pmk", Jl, r, w).reshape(-1, 3),
            flat_lm, num_segments=L_tot)
        Hll_own = jax.lax.psum_scatter(Hll_part, axis, scatter_dimension=0, tiled=True)
        bl_own = jax.lax.psum_scatter(bl_part, axis, scatter_dimension=0, tiled=True)

        # Pose-landmark couplings U: local (L_tot, P_loc, 6, 3), exchanged all-to-all so
        # the owner of each landmark sees its couplings to EVERY keyframe block
        # (concat order = source-shard order = global pose order).
        Wpl = jnp.einsum("pmik,pmil,pm->pmkl", Jp, Jl, w)            # (P_loc, M, 6, 3)
        pose_ids = jnp.broadcast_to(
            jnp.arange(P_loc)[:, None], obs_lm.shape).reshape(-1)
        U_part = jax.ops.segment_sum(
            Wpl.reshape(-1, 6, 3), flat_lm * P_loc + pose_ids,
            num_segments=L_tot * P_loc).reshape(L_tot, P_loc, 6, 3)
        U_own = jax.lax.all_to_all(U_part, axis, split_axis=0, concat_axis=1,
                                   tiled=True)                       # (L_loc, P_tot, 6, 3)

        inv3_own = damped_inv3(Hll_own, damping)                     # (L_loc, 3, 3)

        # Schur correction over owned landmarks; psum replicates the reduced system.
        U_flat = U_own.reshape(L_loc, P_tot * 6, 3)
        S_corr = jnp.einsum("lak,lkb->ab", U_flat,
                            inv3_own @ jnp.swapaxes(U_flat, -1, -2))
        g_corr = jnp.einsum("lak,lk->a", U_flat,
                            (inv3_own @ bl_own[..., None])[..., 0])

        # Embed the local Hpp/bp into the global block-diagonal positions.
        Sd = jnp.zeros((P_tot, 6, P_tot, 6), Hpp.dtype)
        idx = p0 + jnp.arange(P_loc)
        Sd = Sd.at[idx, :, idx, :].set(Hpp).reshape(P_tot * 6, P_tot * 6)
        bfull = jnp.zeros((P_tot, 6), bp.dtype).at[idx].set(bp).reshape(-1)

        S = jax.lax.psum(Sd - S_corr, axis)
        g = jax.lax.psum(bfull - g_corr, axis)
        return S, g, (inv3_own, bl_own, U_flat)

    def iteration(carry, _):
        poses_c, points_c, damping = carry
        local_poses = jax.lax.dynamic_slice_in_dim(poses_c, p0, P_loc, 0)
        r, Jp, Jl, w = _residuals_and_jacobians(local_poses, points_c,
                                                local_problem(), cfg)
        cost0 = jax.lax.psum(_total_cost(r, w), axis)
        S, g, lm_terms = reduced_system(r, Jp, Jl, w, damping)

        S = S + damping * jnp.diag(jnp.maximum(jnp.diag(S), 1e-6))
        S = S * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        g = g * mask
        delta_p = jnp.linalg.solve(S, g)                             # replicated

        inv3_own, bl_own, U_flat = lm_terms
        Ut_dp = jnp.einsum("lak,a->lk", U_flat, delta_p)
        delta_l_own = (inv3_own @ (bl_own - Ut_dp)[..., None])[..., 0]
        # Gather owner-block updates back to a replicated (L_tot, 3): embed each
        # shard's block at its offset and psum (an all-gather of disjoint blocks,
        # typed invariant so the scan carry stays replicated / out_specs P()).
        delta_l = jax.lax.psum(
            jnp.zeros((L_tot, 3), delta_l_own.dtype).at[
                me * L_loc + jnp.arange(L_loc)].set(delta_l_own),
            axis)

        new_poses = jax.vmap(lambda d, T: se3_exp(d) @ T)(
            delta_p.reshape(P_tot, 6), poses_c)
        new_points = points_c + delta_l

        new_local = jax.lax.dynamic_slice_in_dim(new_poses, p0, P_loc, 0)
        r2, _, _, w2 = _residuals_and_jacobians(new_local, new_points,
                                                local_problem(), cfg)
        cost1 = jax.lax.psum(_total_cost(r2, w2), axis)
        improved = cost1 < cost0
        poses_c = jnp.where(improved, new_poses, poses_c)
        points_c = jnp.where(improved, new_points, points_c)
        damping = jnp.where(improved, damping * 0.5, damping * 4.0)
        return (poses_c, points_c, damping), jnp.stack([cost0, cost1])

    init = (poses, points, jnp.asarray(cfg.damping_init))
    (poses, points, _), costs = jax.lax.scan(iteration, init, None,
                                             length=cfg.iterations)
    r, _, _, w = _residuals_and_jacobians(
        jax.lax.dynamic_slice_in_dim(poses, p0, P_loc, 0), points,
        local_problem(), cfg)
    final_cost = jax.lax.psum(_total_cost(r, w), axis)
    wsum = jax.lax.psum(jnp.sum(w), axis)
    mean_reproj = jnp.sqrt(final_cost / jnp.maximum(wsum, 1.0))
    return poses, points, costs, final_cost, mean_reproj


def bundle_adjust_sharded(prob: BAProblem, mesh: Mesh,
                          cfg: BAConfig = BAConfig(), axis: str = "model"):
    """Keyframe-block distributed Schur BA over ``mesh[axis]``.

    Same contract as ``bundle_adjust``: returns (poses, points, info). Poses/points
    come back replicated; observation work, landmark ownership and the Schur assembly
    are partitioned with reduce_scatter / all_to_all / psum collectives (visible in the
    compiled HLO — asserted by tests/test_distributed.py).
    """
    D = mesh.shape[axis]
    padded, P_orig, L_orig = _pad_problem(prob, D)
    has_z = padded.obs_z is not None

    obs_specs = P(axis)
    in_specs = (P(), P(), obs_specs, obs_specs, obs_specs, P(),
                obs_specs if has_z else P())
    out_specs = (P(), P(), P(), P(), P())

    body = partial(_ba_shard_body, cfg=cfg, axis=axis,
                   n_fixed=padded.poses.shape[0] - P_orig, has_z=has_z)
    fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs))
    obs_z = padded.obs_z if has_z else jnp.zeros((), jnp.float32)
    poses, points, costs, final_cost, mean_reproj = fn(
        padded.poses, padded.points, padded.obs_lm, padded.obs_uv,
        padded.obs_valid, padded.K, obs_z)
    info = {"costs": costs, "final_cost": final_cost, "mean_reproj": mean_reproj}
    return poses[:P_orig], points[:L_orig], info
