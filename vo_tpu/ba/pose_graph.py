"""Pose-graph optimization (PGO) — SE(3) relative-constraint smoothing on device.

New capability vs the reference (which chains poses open-loop and never corrects them,
VisualOdometry_Stereo.py:283,292). Nodes are camera-to-world poses; edges carry measured
relative transforms Z_ij ~ T_i^-1 T_j (odometry and/or loop closures).

Gauss-Newton with right-multiplicative perturbations T_k <- T_k exp(xi_k), residual
e_ij = log(Z_ij^-1 T_i^-1 T_j), first-order Jacobians J_j = I, J_i = -Ad(T_j^-1 T_i).
Fixed iterations, LM damping, node 0 gauge-fixed, dense (6N, 6N) reduced solve
(windowed N <= ~64; a CG path can replace the dense solve for full-trajectory PGO).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from vo_tpu.geometry.se3 import pose_inverse, se3_exp, se3_log
from vo_tpu.geometry.so3 import hat

from vo_tpu.ops.precision import geometry_precision


@dataclass(frozen=True)
class PoseGraphConfig:
    iterations: int = 20
    damping: float = 1e-4        # initial LM damping, adapted per iteration
    fix_first: bool = True

    def __hash__(self):
        return hash((self.iterations, self.damping, self.fix_first))


def adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """SE(3) adjoint for twist order [v, w]: (..., 6, 6)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, hat(t) @ R], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


@partial(jax.jit, static_argnames=("cfg", "n_nodes"))
@geometry_precision
def optimize_pose_graph(
    poses: jnp.ndarray,        # (N, 4, 4) camera-to-world initial estimates
    edges_ij: jnp.ndarray,     # (E, 2) int32 node indices
    edges_z: jnp.ndarray,      # (E, 4, 4) measured relative transforms T_i^-1 T_j
    edges_w: jnp.ndarray,      # (E,) scalar or (E, 6) per-component information
                               # weights, twist order [v, w] (0 disables an edge)
    cfg: PoseGraphConfig = PoseGraphConfig(),
    n_nodes: int | None = None,
):
    """Returns (optimized poses (N, 4, 4), per-iteration cost (iters,)).

    ``edges_w`` may be per-edge scalars (isotropic) or per-edge 6-vectors — a
    diagonal information matrix in the twist frame. Anisotropic weights let
    odometry edges be stiff in translation (depth-backed VO translation is
    locally excellent) while soft in rotation where drift actually accrues
    (turns), so a loop closure distributes its correction where the error is
    instead of uniformly along the chain.
    """
    N = n_nodes if n_nodes is not None else poses.shape[0]
    E = edges_ij.shape[0]
    ii = edges_ij[:, 0]
    jj = edges_ij[:, 1]
    z_inv = pose_inverse(edges_z)
    w6 = edges_w if edges_w.ndim == 2 else edges_w[:, None] * jnp.ones((1, 6))

    def residuals(T):
        Ti_inv = pose_inverse(T[ii])
        rel = Ti_inv @ T[jj]
        return se3_log(z_inv @ rel), rel                      # (E, 6)

    def cost_of(e):
        return jnp.sum(w6 * e * e)

    def iteration(carry, _):
        T, damping = carry
        e, rel = residuals(T)
        cost = cost_of(e)

        Jj = jnp.broadcast_to(jnp.eye(6), (E, 6, 6))
        Ji = -adjoint(pose_inverse(rel))

        w = w6[:, :, None]      # scales residual rows: J^T diag(w6) J
        # Dense block assembly via segment_sum on (i*N + j) block ids.
        Hii = jnp.swapaxes(Ji, -1, -2) @ (w * Ji)
        Hjj = jnp.swapaxes(Jj, -1, -2) @ (w * Jj)
        Hij = jnp.swapaxes(Ji, -1, -2) @ (w * Jj)
        bi = -jnp.einsum("eab,ea->eb", w * Ji, e)
        bj = -jnp.einsum("eab,ea->eb", w * Jj, e)

        blocks = jnp.concatenate([Hii, Hjj, Hij, jnp.swapaxes(Hij, -1, -2)], axis=0)
        ids = jnp.concatenate([ii * N + ii, jj * N + jj, ii * N + jj, jj * N + ii])
        Hgrid = jax.ops.segment_sum(blocks, ids, num_segments=N * N)
        H = Hgrid.reshape(N, N, 6, 6).transpose(0, 2, 1, 3).reshape(6 * N, 6 * N)

        bvec = jax.ops.segment_sum(jnp.concatenate([bi, bj], axis=0),
                                   jnp.concatenate([ii, jj]), num_segments=N)
        g = bvec.reshape(6 * N)

        # LM damping scaled to H's own diagonal (an absolute epsilon is invisible
        # next to loop-weighted blocks and useless once the gradient vanishes).
        H = H + damping * jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
        if cfg.fix_first:
            mask = jnp.concatenate([jnp.zeros(6), jnp.ones(6 * (N - 1))])
            H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            g = g * mask
        delta = jnp.linalg.solve(H, g).reshape(N, 6)
        T_new = jax.vmap(lambda Tk, d: Tk @ se3_exp(d))(T, delta)

        # Step acceptance (same contract as bundle_adjust): an unconditional GN
        # step from a converged state once exploded 0.13 -> 1e32 -> NaN on a
        # 120-node graph; reject non-improving or non-finite steps and raise the
        # damping instead.
        e2, _ = residuals(T_new)
        cost1 = cost_of(e2)
        improved = jnp.isfinite(cost1) & (cost1 < cost)
        T = jax.tree.map(lambda a, b: jnp.where(improved, a, b), T_new, T)
        damping = jnp.where(improved, damping * 0.5, damping * 10.0)
        return (T, damping), cost

    (T_opt, _), costs = jax.lax.scan(iteration, (poses, jnp.asarray(cfg.damping)),
                                     None, length=cfg.iterations)
    return T_opt, costs
