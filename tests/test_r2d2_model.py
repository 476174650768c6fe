"""Parity tests: our JAX patchnet with ported weights vs the reference torch outputs.

tests/data/r2d2_parity.npz holds the reference networks' outputs on a fixed random input
(generated once from the published checkpoints; regeneration script documented in the
fixture's provenance note in git history).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from vo_tpu.models.patchnet import apply_patchnet
from vo_tpu.models.port_weights import load_pretrained

DATA = os.path.join(os.path.dirname(__file__), "data")
_HAVE_REF_MODELS = os.path.exists(
    "/root/reference/feature_extractors/r2d2/models/faster2d2_WASF_N16.pt")

pytestmark = pytest.mark.skipif(not _HAVE_REF_MODELS,
                                reason="reference checkpoints not mounted")


@pytest.fixture(scope="module")
def fixture():
    return np.load(os.path.join(DATA, "r2d2_parity.npz"))


@pytest.mark.parametrize("name", ["faster2d2_WASF_N16", "r2d2_WASF_N16"])
def test_forward_parity(fixture, name):
    spec, params = load_pretrained(name)
    x = fixture["x"]  # (1, 3, H, W) torch layout
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out = apply_patchnet(params, spec, x_nhwc)

    want_desc = np.transpose(fixture[f"{name}_desc"], (0, 2, 3, 1))
    want_rel = fixture[f"{name}_rel"][:, 0]
    want_rep = fixture[f"{name}_rep"][:, 0]

    got_desc = np.asarray(out["descriptors"], np.float32)
    assert got_desc.shape == want_desc.shape
    assert np.max(np.abs(got_desc - want_desc)) < 2e-3
    assert np.max(np.abs(np.asarray(out["reliability"]) - want_rel)) < 2e-3
    assert np.max(np.abs(np.asarray(out["repeatability"]) - want_rep)) < 2e-3


def test_descriptors_unit_norm(fixture):
    spec, params = load_pretrained("faster2d2_WASF_N16")
    x_nhwc = jnp.asarray(np.transpose(fixture["x"], (0, 2, 3, 1)))
    out = apply_patchnet(params, spec, x_nhwc)
    norms = np.linalg.norm(np.asarray(out["descriptors"]), axis=-1)
    assert np.allclose(norms, 1.0, atol=1e-3)
