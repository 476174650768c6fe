"""Pallas kernels vs their XLA reference implementations (interpret mode on CPU).

(A Pallas dense-BRIEF kernel used to live here too; it was measured slower than XLA's
own fusion of the shift-compare chain on v5e and removed — see
vo_tpu/features/extractor.py for the numbers.)"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


class TestPallasMatch:
    """Fused match kernel vs the XLA matchers (interpret mode on CPU)."""

    def _descs(self, rng, na=300, nb=280, d=128):
        a = rng.normal(size=(na, d)).astype(np.float32)
        b = rng.normal(size=(nb, d)).astype(np.float32)
        # Plant exact correspondences so mutual-NN matches exist.
        b[:100] = a[:100] + 0.05 * rng.normal(size=(100, d)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        va = rng.uniform(size=na) > 0.1
        vb = rng.uniform(size=nb) > 0.1
        return map(jnp.asarray, (a, b, va, vb))

    def test_top2_mutual_vs_xla(self):
        from vo_tpu.matching.matchers import _top2, similarity_matrix
        from vo_tpu.ops.pallas_match import top2_mutual_pallas

        rng = np.random.default_rng(0)
        a, b, va, vb = self._descs(rng)
        nn12, top2, nn21 = top2_mutual_pallas(a, b, va, vb, interpret=True)
        sim = similarity_matrix(a, b, va, vb)
        ref_nn12, ref_top2 = _top2(sim)
        ref_nn21 = jnp.argmax(sim, axis=0)
        np.testing.assert_array_equal(np.asarray(nn12), np.asarray(ref_nn12))
        np.testing.assert_array_equal(np.asarray(nn21), np.asarray(ref_nn21))
        np.testing.assert_allclose(np.asarray(top2), np.asarray(ref_top2),
                                   rtol=1e-5, atol=1e-5)

    def test_multi_tile_shapes(self):
        """Sizes spanning several 256-tiles in both directions."""
        from vo_tpu.matching.matchers import _top2, similarity_matrix
        from vo_tpu.ops.pallas_match import top2_mutual_pallas

        rng = np.random.default_rng(1)
        a, b, va, vb = self._descs(rng, na=600, nb=700, d=64)
        nn12, top2, nn21 = top2_mutual_pallas(a, b, va, vb, interpret=True)
        sim = similarity_matrix(a, b, va, vb)
        ref_nn12, ref_top2 = _top2(sim)
        np.testing.assert_array_equal(np.asarray(nn12), np.asarray(ref_nn12))
        np.testing.assert_array_equal(np.asarray(nn21),
                                      np.asarray(jnp.argmax(sim, axis=0)))
        np.testing.assert_allclose(np.asarray(top2), np.asarray(ref_top2),
                                   rtol=1e-5, atol=1e-5)

    def test_ratio_mutual_match_parity(self):
        from vo_tpu.matching.matchers import ratio_mutual_nn_match
        from vo_tpu.ops.pallas_match import ratio_mutual_nn_match_pallas

        rng = np.random.default_rng(2)
        a, b, va, vb = self._descs(rng)
        got = ratio_mutual_nn_match_pallas(a, b, va, vb, interpret=True)
        ref = ratio_mutual_nn_match(a, b, va, vb)
        np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
        m = np.asarray(ref.mask)
        np.testing.assert_array_equal(np.asarray(got.idx)[m], np.asarray(ref.idx)[m])
        assert m.sum() >= 50   # the planted correspondences survive

    def test_ratio_match_binary_parity(self):
        from vo_tpu.matching.matchers import ratio_match
        from vo_tpu.ops.pallas_match import ratio_match_pallas

        rng = np.random.default_rng(3)
        d = 256
        a = np.sign(rng.normal(size=(300, d))).astype(np.float32)
        b = np.roll(a, 7, axis=0).copy()
        flips = rng.uniform(size=b.shape) < 0.05
        b[flips] *= -1.0
        got = ratio_match_pallas(jnp.asarray(a), jnp.asarray(b), ratio=0.85,
                                 binary_dim=d, interpret=True)
        ref = ratio_match(jnp.asarray(a), jnp.asarray(b), ratio=0.85, binary_dim=d)
        np.testing.assert_array_equal(np.asarray(got.mask), np.asarray(ref.mask))
        m = np.asarray(ref.mask)
        np.testing.assert_array_equal(np.asarray(got.idx)[m], np.asarray(ref.idx)[m])
        assert m.sum() > 200
