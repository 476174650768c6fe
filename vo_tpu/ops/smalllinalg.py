"""Small fixed-size linear algebra as unrolled pure-jnp element ops.

XLA's lax.linalg (eigh/svd/solve) uses iterative algorithms that are painfully slow for
tiny batched matrices on TPU (they serialize QR/Jacobi sweeps). The PnP-RANSAC inner
loop needs only 3x3 SVDs, 6x6 solves, and a 12x12 null vector — all small enough to
unroll into straight-line VPU code with zero lax.linalg calls:

- ``cholesky_small`` / ``cho_solve_small``: fully unrolled for a static n.
- ``eigh3x3``: closed-form symmetric 3x3 eigendecomposition (Cardano trig form).
- ``svd3x3``: 3x3 SVD via eigh3x3 of A^T A + cross-product completion.
- ``smallest_eigvec``: inverse iteration with one unrolled Cholesky (the DLT null
  vector; near-singularity *helps* inverse iteration).

Everything broadcasts over arbitrary leading batch axes and is differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-12


def cholesky_small(A: jnp.ndarray, n: int) -> jnp.ndarray:
    """Unrolled Cholesky of (..., n, n) SPD matrices (lower triangular)."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, _EPS))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s2 = A[..., i, j]
            for k in range(j):
                s2 = s2 - L[i][k] * L[j][k]
            L[i][j] = s2 * inv_d
    zero = jnp.zeros_like(A[..., 0, 0])
    rows = [jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
            for i in range(n)]
    return jnp.stack(rows, axis=-2)


def cho_solve_small(L: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """Solve A x = b given L = cholesky_small(A). b: (..., n)."""
    # Forward: L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * y[k]
        y[i] = s / L[..., i, i]
    # Backward: L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def solve_spd_small(A: jnp.ndarray, b: jnp.ndarray, n: int) -> jnp.ndarray:
    """A^{-1} b for SPD (..., n, n) via unrolled Cholesky."""
    return cho_solve_small(cholesky_small(A, n), b, n)


def eigh3x3(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Closed-form symmetric 3x3 eigendecomposition.

    Returns (w, V): eigenvalues ascending (..., 3) and eigenvectors as columns
    (..., 3, 3). Trig (Cardano) formula + cross-product eigenvectors with
    largest-pivot selection; degenerate (repeated-eigenvalue) cases fall back to
    orthogonal completion.
    """
    a00 = A[..., 0, 0]; a11 = A[..., 1, 1]; a22 = A[..., 2, 2]
    a01 = A[..., 0, 1]; a02 = A[..., 0, 2]; a12 = A[..., 1, 2]

    q = (a00 + a11 + a22) / 3.0
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 * b00 + b11 * b11 + b22 * b22 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, _EPS))
    inv_p = 1.0 / p
    # det(B)/2 where B = (A - qI)/p
    detB = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02)) * (inv_p ** 3)
    r = jnp.clip(detB * 0.5, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    w2 = q + 2.0 * p * jnp.cos(phi)                       # largest
    w0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    w1 = 3.0 * q - w2 - w0

    def eigvec(lmbda, other):
        """Eigenvector for lmbda via the best cross product of rows of (A - lmbda I)."""
        r0 = jnp.stack([a00 - lmbda, a01, a02], axis=-1)
        r1 = jnp.stack([a01, a11 - lmbda, a12], axis=-1)
        r2 = jnp.stack([a02, a12, a22 - lmbda], axis=-1)
        c01 = jnp.cross(r0, r1)
        c02 = jnp.cross(r0, r2)
        c12 = jnp.cross(r1, r2)
        n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
        n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
        n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
        best = jnp.where(n01 >= jnp.maximum(n02, n12), c01,
                         jnp.where(n02 >= n12, c02, c12))
        norm2 = jnp.sum(best * best, axis=-1, keepdims=True)
        # Degenerate (repeated eigenvalue): pick anything orthogonal to `other`.
        e0 = jnp.zeros_like(best).at[..., 0].set(1.0)
        alt = jnp.cross(other, e0)
        alt_n2 = jnp.sum(alt * alt, axis=-1, keepdims=True)
        e1 = jnp.zeros_like(best).at[..., 1].set(1.0)
        alt = jnp.where(alt_n2 > 1e-8, alt, jnp.cross(other, e1))
        use_alt = norm2 < 1e-18
        v = jnp.where(use_alt, alt, best)
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(_EPS)

    v2 = eigvec(w2, jnp.zeros(A.shape[:-2] + (3,)).at[..., 0].set(1.0))
    v0 = eigvec(w0, v2)
    # Force exact orthogonality.
    v0 = v0 - jnp.sum(v0 * v2, axis=-1, keepdims=True) * v2
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True).clip(_EPS)
    v1 = jnp.cross(v2, v0)

    w = jnp.stack([w0, w1, w2], axis=-1)
    V = jnp.stack([v0, v1, v2], axis=-1)  # columns
    return w, V


def svd3x3(H: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """SVD of (..., 3, 3): H = U diag(S) V^T with S descending, U/V orthogonal
    (det +/-1, not forced to rotations — callers handle reflection like with
    jnp.linalg.svd)."""
    AtA = jnp.swapaxes(H, -1, -2) @ H
    w, V_asc = eigh3x3(AtA)
    # Descending order.
    S = jnp.sqrt(jnp.maximum(w[..., ::-1], 0.0))
    V = V_asc[..., ::-1]
    U_raw = H @ V
    # Normalize columns; complete small-singular-value columns by cross products.
    def col(i):
        c = U_raw[..., :, i]
        n = jnp.linalg.norm(c, axis=-1, keepdims=True)
        return c, n
    c0, n0 = col(0)
    c1, n1 = col(1)
    u0 = c0 / n0.clip(1e-9)
    # Orthogonalize u1 against u0 (important when s0 ~ s1).
    c1o = c1 - jnp.sum(c1 * u0, axis=-1, keepdims=True) * u0
    n1o = jnp.linalg.norm(c1o, axis=-1, keepdims=True)
    fallback1 = jnp.cross(u0, jnp.zeros_like(u0).at[..., 2].set(1.0))
    fb1n = jnp.linalg.norm(fallback1, axis=-1, keepdims=True)
    fallback1b = jnp.cross(u0, jnp.zeros_like(u0).at[..., 1].set(1.0))
    fallback1 = jnp.where(fb1n > 1e-6, fallback1, fallback1b)
    fallback1 = fallback1 / jnp.linalg.norm(fallback1, axis=-1, keepdims=True).clip(_EPS)
    u1 = jnp.where(n1o > 1e-8, c1o / n1o.clip(_EPS), fallback1)
    u2 = jnp.cross(u0, u1)
    # Align u2 with H v2 (the true third left-singular direction, up to sign) so the
    # third dyad s2 u2 v2^T reconstructs H. When s2 ~ 0 the dyad vanishes and either
    # sign is fine (sgn falls back to +1). U may then have det -1, exactly like a
    # general SVD's U.
    c2 = U_raw[..., :, 2]
    sgn = jnp.sign(jnp.sum(c2 * u2, axis=-1, keepdims=True))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    u2 = u2 * sgn
    U = jnp.stack([u0, u1, u2], axis=-1)
    return U, S, jnp.swapaxes(V, -1, -2)


def smallest_eigvec(AtA: jnp.ndarray, n: int, iters: int = 8) -> jnp.ndarray:
    """Eigenvector of the smallest eigenvalue of SPD (..., n, n) via inverse iteration.

    One unrolled Cholesky of (AtA + ridge I), then `iters` triangular solves. Used for
    the DLT null vector; the closer AtA is to singular, the faster this converges.
    """
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    ridge = 1e-10 * tr + 1e-12
    L = cholesky_small(AtA + ridge * jnp.eye(n, dtype=AtA.dtype), n)
    x = jnp.ones(AtA.shape[:-2] + (n,), AtA.dtype)
    for _ in range(iters):
        x = cho_solve_small(L, x, n)
        # Two-stage normalization: max-abs prescale keeps norm^2 finite in f32 even
        # when a near-singular solve amplifies x by ~1e12 per iteration.
        x = x / jnp.max(jnp.abs(x), axis=-1, keepdims=True).clip(_EPS)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(_EPS)
    return x
