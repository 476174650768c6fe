"""Matmul-precision policy (ops/precision.py).

On TPU, default-precision f32 matmuls run as bf16 MXU passes. Measured on the bench
workload that turns a 0.12 % segment-translation trajectory into a 3.65 % one — so
every geometry-solver entry point must pin bf16x3 ("high") itself — measured f32-equivalent trajectory accuracy at ~half the 6-pass cost (ops/precision.py table), and the Pallas match
kernel must pin DEFAULT (Mosaic rejects an fp32 contract on bf16 operands, which a
caller-scoped 'highest' would otherwise request). These tests lock both properties
in at the trace level; the numeric effect is TPU-only.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vo_tpu.ops.precision import geometry_precision


class TestGeometryPrecision:
    def test_decorator_sets_high_inside(self):
        captured = {}

        @geometry_precision
        def probe(x):
            captured["prec"] = jax.config.jax_default_matmul_precision
            return x @ x

        probe(jnp.eye(3))
        assert captured["prec"] == "high"  # bf16x3: f32-grade solves at ~half of 6-pass cost

    def test_solver_entries_are_wrapped(self):
        """The numerically-sensitive public entry points carry the wrapper (guards
        against the decorator being dropped in a refactor)."""
        from vo_tpu.ba.bundle_adjust import bundle_adjust
        from vo_tpu.ba.pose_graph import optimize_pose_graph
        from vo_tpu.estimation import pnp, procrustes
        from vo_tpu.geometry import se3, triangulation, umeyama

        for fn in [bundle_adjust, optimize_pose_graph, procrustes.kabsch,
                   umeyama.umeyama_alignment, triangulation.triangulate,
                   se3.pose_compose, se3.transform_points, pnp.pnp_ransac]:
            assert _wraps_precision(fn), f"{fn} lost its geometry_precision wrapper"

    def test_pallas_kernel_immune_to_highest_context(self):
        """ratio_match_pallas must produce identical results when traced under a
        caller-scoped 'highest' (interpret mode; on hardware an unpinned kernel
        fails Mosaic compilation outright)."""
        from vo_tpu.matching.matchers import ratio_match
        from vo_tpu.ops.pallas_match import ratio_match_pallas

        rng = np.random.default_rng(3)
        D = 256
        da = (rng.integers(0, 2, (128, D)) * 2 - 1).astype(np.float32)
        db = (rng.integers(0, 2, (128, D)) * 2 - 1).astype(np.float32)
        va = np.ones(128, bool)
        a, b = jnp.asarray(da, jnp.bfloat16), jnp.asarray(db, jnp.bfloat16)

        with jax.default_matmul_precision("highest"):
            mp = ratio_match_pallas(a, b, jnp.asarray(va), jnp.asarray(va),
                                    ratio=0.85, binary_dim=D, interpret=True)
        mx = ratio_match(a, b, jnp.asarray(va), jnp.asarray(va), ratio=0.85,
                         binary_dim=D)
        np.testing.assert_array_equal(np.asarray(mp.mask), np.asarray(mx.mask))
        m = np.asarray(mx.mask)
        np.testing.assert_array_equal(np.asarray(mp.idx)[m], np.asarray(mx.idx)[m])


def _wraps_precision(fn) -> bool:
    """True if some layer of ``fn``'s wrapper chain is the geometry_precision
    closure (checked via the closure's code object module)."""
    seen = set()
    while fn is not None and id(fn) not in seen:
        seen.add(id(fn))
        code = getattr(fn, "__code__", None)
        if code is not None and code.co_filename.endswith("ops/precision.py"):
            return True
        fn = getattr(fn, "__wrapped__", None)
    return False
