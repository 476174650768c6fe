"""Device mesh + sharding helpers for multi-chip / multi-host execution.

The reference is strictly single-process (SURVEY.md §2.3). Here, parallel execution is
expressed the TPU-native way: a ``jax.sharding.Mesh`` with named axes and
``NamedSharding`` annotations; XLA inserts the collectives over ICI/DCN.

Axis conventions used across vo_tpu:
  - ``data``  : frames / batch (extraction, training batch) — pure DP.
  - ``model`` : descriptor-matrix / Hessian block dimension (sp/tp-style sharding of the
                match GEMM and the BA landmark blocks).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n_dev = len(devices)
    if n_data is None:
        n_data = n_dev // n_model
    assert n_data * n_model == n_dev, f"{n_data}x{n_model} != {n_dev} devices"
    dev_array = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def shard_frames(mesh: Mesh, *arrays):
    """Place arrays with their leading (frame/batch) axis split over the data axis."""
    sharding = NamedSharding(mesh, P("data"))
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out
