"""Unrolled small-linalg kernels vs numpy references."""

import numpy as np
import jax.numpy as jnp

from vo_tpu.ops.smalllinalg import (
    cholesky_small,
    cho_solve_small,
    solve_spd_small,
    eigh3x3,
    svd3x3,
    smallest_eigvec,
)


def spd(rng, b, n):
    A = rng.normal(size=(b, n, n)).astype(np.float32)
    return A @ np.swapaxes(A, -1, -2) + 0.1 * np.eye(n, dtype=np.float32)


class TestCholesky:
    def test_matches_numpy(self, rng):
        for n in (3, 6, 12):
            A = spd(rng, 32, n)
            L = np.asarray(cholesky_small(jnp.asarray(A), n))
            want = np.linalg.cholesky(A)
            assert np.allclose(L, want, atol=2e-3 * n), n

    def test_solve(self, rng):
        for n in (6, 12):
            A = spd(rng, 16, n)
            b = rng.normal(size=(16, n)).astype(np.float32)
            x = np.asarray(solve_spd_small(jnp.asarray(A), jnp.asarray(b), n))
            want = np.linalg.solve(A, b[..., None])[..., 0]
            assert np.allclose(x, want, atol=1e-2), n


class TestEigh3:
    def test_eigenvalues_and_vectors(self, rng):
        A = spd(rng, 128, 3)
        w, V = eigh3x3(jnp.asarray(A))
        w = np.asarray(w); V = np.asarray(V)
        want_w = np.linalg.eigvalsh(A)
        assert np.allclose(np.sort(w, -1), want_w, rtol=1e-3, atol=1e-3)
        # A V = V diag(w)
        res = A @ V - V * w[:, None, :]
        assert np.abs(res).max() < 5e-2
        # orthonormal
        VtV = np.swapaxes(V, -1, -2) @ V
        assert np.allclose(VtV, np.eye(3)[None], atol=1e-4)

    def test_repeated_eigenvalues(self):
        A = np.stack([np.eye(3, dtype=np.float32) * 2.0,
                      np.diag(np.array([1.0, 1.0, 5.0], np.float32))])
        w, V = eigh3x3(jnp.asarray(A))
        VtV = np.swapaxes(np.asarray(V), -1, -2) @ np.asarray(V)
        assert np.allclose(VtV, np.eye(3)[None], atol=1e-4)
        assert np.allclose(np.asarray(w)[0], [2, 2, 2], atol=1e-5)


class TestSVD3:
    def test_reconstruction(self, rng):
        H = rng.normal(size=(256, 3, 3)).astype(np.float32)
        U, S, Vt = svd3x3(jnp.asarray(H))
        U, S, Vt = map(np.asarray, (U, S, Vt))
        rec = U @ (S[..., None] * Vt)
        assert np.abs(rec - H).max() < 5e-3
        assert np.allclose(U @ np.swapaxes(U, -1, -2), np.eye(3)[None], atol=1e-3)
        assert np.allclose(Vt @ np.swapaxes(Vt, -1, -2), np.eye(3)[None], atol=1e-3)
        want_S = np.linalg.svd(H, compute_uv=False)
        assert np.allclose(S, want_S, rtol=1e-3, atol=1e-3)

    def test_rank_deficient(self, rng):
        a = rng.normal(size=(8, 3, 1)).astype(np.float32)
        b = rng.normal(size=(8, 1, 3)).astype(np.float32)
        H = a @ b  # rank 1
        U, S, Vt = svd3x3(jnp.asarray(H))
        rec = np.asarray(U) @ (np.asarray(S)[..., None] * np.asarray(Vt))
        # f32 Cardano loses ~1% absolute precision on zero singular values — acceptable
        # for RANSAC hypothesis generation (degenerate samples are outvoted by scoring).
        assert np.abs(rec - H).max() < 5e-2


class TestSmallestEig:
    def test_null_vector(self, rng):
        # Build matrices with a known (near-)null vector.
        for n in (6, 12):
            Q = np.linalg.qr(rng.normal(size=(16, n, n)))[0].astype(np.float32)
            w = rng.uniform(1.0, 10.0, size=(16, n)).astype(np.float32)
            w[:, 0] = 1e-6  # tiny smallest eigenvalue
            A = (Q * w[:, None, :]) @ np.swapaxes(Q, -1, -2)
            v = np.asarray(smallest_eigvec(jnp.asarray(A), n))
            target = Q[..., 0]
            dot = np.abs(np.sum(v * target, axis=-1))
            assert np.all(dot > 0.999), (n, dot.min())
