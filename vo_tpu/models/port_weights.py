"""Port reference R2D2 checkpoints (.pt, torch state_dict) into the JAX patchnet.

The published weights are data artifacts (feature_extractors/r2d2/models/*.pt, listed in
the reference README with their HPatches scores). This maps their OIHW conv tensors into
our HWIO params pytree. No torch code is reused; torch (CPU) is only the .pt
deserializer.

Checkpoint layer indices (faster2d2_WASF_N16.pt):
  conv indices  ops.{0,3,6,10,13,16,19,21,23}
  bn  indices   ops.{1,4,7,11,14,17,20,22}      (affine=False: running stats only)
  heads         clf.{weight,bias}, sal.{weight,bias}
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from vo_tpu.models.patchnet import (
    FAST_QUAD_L2NET_CONFCFS,
    QUAD_L2NET_CONFCFS,
    PatchNetSpec,
)

_REFERENCE_MODELS_DIR = "/root/reference/feature_extractors/r2d2/models"

ARCH_TO_SPEC = {
    "Fast_Quad_L2Net_ConfCFS()": FAST_QUAD_L2NET_CONFCFS,
    "Quad_L2Net_ConfCFS()": QUAD_L2NET_CONFCFS,
}


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def load_torch_checkpoint(path: str) -> tuple[PatchNetSpec, dict]:
    """Read a reference .pt checkpoint -> (spec, params pytree)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    arch = ckpt["net"].strip()
    if arch not in ARCH_TO_SPEC:
        raise ValueError(f"unsupported architecture string {arch!r}")
    spec = ARCH_TO_SPEC[arch]
    sd = {k.replace("module.", ""): v.numpy() for k, v in ckpt["state_dict"].items()
          if hasattr(v, "numpy")}

    # Reconstruct the sequential indices the torch ModuleList would have used:
    # conv -> [bn] -> [relu] -> [pool]; pools/relus hold no params but advance the index.
    params = {"convs": [], "clf": None, "sal": None}
    idx = 0
    for cs in spec.convs:
        w = sd[f"ops.{idx}.weight"]
        b = sd[f"ops.{idx}.bias"]
        assert w.shape == (cs.out_ch, cs.in_ch, cs.k, cs.k), (w.shape, cs)
        layer = {"w": jnp.asarray(_oihw_to_hwio(w)), "b": jnp.asarray(b)}
        idx += 1
        if cs.bn:
            layer["bn_mean"] = jnp.asarray(sd[f"ops.{idx}.running_mean"])
            layer["bn_var"] = jnp.asarray(sd[f"ops.{idx}.running_var"])
            idx += 1
        if cs.relu:
            idx += 1
        if cs.pool_after > 1:
            idx += 1
        params["convs"].append(layer)

    params["clf"] = {"w": jnp.asarray(_oihw_to_hwio(sd["clf.weight"])),
                     "b": jnp.asarray(sd["clf.bias"])}
    params["sal"] = {"w": jnp.asarray(_oihw_to_hwio(sd["sal.weight"])),
                     "b": jnp.asarray(sd["sal.bias"])}
    return spec, params


def load_pretrained(name: str = "faster2d2_WASF_N16",
                    models_dir: str = _REFERENCE_MODELS_DIR):
    """Load one of the published models by short name (README.md table names)."""
    return load_torch_checkpoint(f"{models_dir}/{name}.pt")
