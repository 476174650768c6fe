"""Distributed windowed BA: shard the observation slots over the mesh, let XLA insert
the collectives.

This is the idiomatic TPU scaling path (SURVEY.md §2.3): the same ``bundle_adjust``
program runs unchanged; observation tensors are placed with a NamedSharding that splits
the per-pose observation-slot axis across the ``model`` mesh axis, and GSPMD partitions
the Jacobian/Hessian assembly accordingly — per-shard segment_sums with an all-reduce
where the reduced camera system and landmark blocks combine. No hand-written transport.

For multi-host pods the same annotations ride ICI within a slice and DCN across slices;
CPU tests exercise the identical program on a virtual 8-device mesh.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vo_tpu.ba.bundle_adjust import BAConfig, BAProblem, bundle_adjust


def shard_problem(prob: BAProblem, mesh: Mesh, axis: str = "model") -> BAProblem:
    """Place observation tensors split over `axis` (obs-slot dim), the rest replicated."""
    obs = NamedSharding(mesh, P(None, axis))
    obs_uv = NamedSharding(mesh, P(None, axis, None))
    rep = NamedSharding(mesh, P())
    return BAProblem(
        poses=jax.device_put(prob.poses, rep),
        points=jax.device_put(prob.points, rep),
        obs_lm=jax.device_put(prob.obs_lm, obs),
        obs_uv=jax.device_put(prob.obs_uv, obs_uv),
        obs_valid=jax.device_put(prob.obs_valid, obs),
        K=jax.device_put(prob.K, rep),
    )


def bundle_adjust_sharded(prob: BAProblem, mesh: Mesh,
                          cfg: BAConfig = BAConfig(), axis: str = "model"):
    """Run the standard bundle_adjust with observations sharded over the mesh."""
    sharded = shard_problem(prob, mesh, axis)
    with mesh:
        return bundle_adjust(sharded, cfg)
