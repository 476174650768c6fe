"""Pallas kernels vs their XLA reference implementations (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vo_tpu.features.dense_brief import dense_packed_brief, upright_brief_descriptors
from vo_tpu.ops.pallas_brief import (
    dense_packed_brief_pallas,
    upright_brief_descriptors_pallas,
)


class TestPallasBrief:
    def test_matches_xla_reference(self, rng):
        img = rng.uniform(0, 255, (2, 96, 288)).astype(np.float32)
        ref = np.asarray(dense_packed_brief(jnp.asarray(img)))
        got = np.asarray(dense_packed_brief_pallas(jnp.asarray(img), interpret=True))
        assert got.shape == ref.shape
        mismatch = (got != ref).mean()
        # Bit-exact except where float compare ties differ at tile boundaries.
        assert mismatch < 1e-4, mismatch

    def test_non_tile_aligned_shapes(self, rng):
        img = rng.uniform(0, 255, (1, 100, 300)).astype(np.float32)
        ref = np.asarray(dense_packed_brief(jnp.asarray(img)))
        got = np.asarray(dense_packed_brief_pallas(jnp.asarray(img), interpret=True))
        assert got.shape == ref.shape
        assert (got != ref).mean() < 1e-4

    def test_descriptor_gather_path(self, rng):
        img = rng.uniform(0, 255, (1, 96, 288)).astype(np.float32)
        kp = np.stack([rng.uniform(20, 260, 64), rng.uniform(20, 80, 64)], -1)
        kp = kp.astype(np.float32)[None]
        valid = np.ones((1, 64), bool)
        ref = np.asarray(upright_brief_descriptors(
            jnp.asarray(img), jnp.asarray(kp), jnp.asarray(valid)), np.float32)
        got = np.asarray(upright_brief_descriptors_pallas(
            jnp.asarray(img), jnp.asarray(kp), jnp.asarray(valid), interpret=True),
            np.float32)
        assert np.mean(ref != got) < 1e-3
