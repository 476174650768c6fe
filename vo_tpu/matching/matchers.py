"""Descriptor matching as one MXU GEMM + fixed-shape row/column reductions.

TPU-native replacements for the reference's matchers:
- ``ratio_match``            <- BFMatcher.knnMatch(k=2) + Lowe ratio 0.85 (ORB.py:25-32,
                                SIFT.py:24-33)
- ``mutual_nn_match``        <- mnn_matcher (R2D2.py:29-38)
- ``ratio_mutual_nn_match``  <- ratio_mutual_nn_matcher, ratio 0.90 + mutual-NN mask
                                (R2D2.py:53-66)

Everything is fixed-shape: results come back as per-row ``(idx, mask)`` arrays rather
than a dynamic match list, so matching composes with jit/vmap/scan. Binary (±1)
descriptors use the identity hamming = (D - a·b) / 2, so one similarity GEMM serves both
binary and L2-normalized float descriptors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

_NEG = -1e30


class MatchResult(NamedTuple):
    """Fixed-shape matches from set A (rows) into set B.

    idx[i]  = index into B matched to A[i]
    mask[i] = True where the match passed all tests
    sim[i]  = similarity of the accepted pair (0 where masked)
    """

    idx: jnp.ndarray
    mask: jnp.ndarray
    sim: jnp.ndarray


def similarity_matrix(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    valid_a: jnp.ndarray | None = None,
    valid_b: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """(Na, D) x (Nb, D) -> (Na, Nb) similarity GEMM in f32 accumulation.

    Invalid rows/cols are pushed to -inf-ish so reductions never select them.
    """
    sim = jnp.dot(desc_a, desc_b.T, preferred_element_type=jnp.float32)
    if valid_a is not None:
        sim = jnp.where(valid_a[:, None], sim, _NEG)
    if valid_b is not None:
        sim = jnp.where(valid_b[None, :], sim, _NEG)
    return sim


def _top2(sim: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Row-wise top-2 similarities and the argmax, without materializing a sort."""
    best = jnp.argmax(sim, axis=1)
    best_sim = jnp.take_along_axis(sim, best[:, None], axis=1)[:, 0]
    sim_wo_best = sim.at[jnp.arange(sim.shape[0]), best].set(_NEG)
    second_sim = jnp.max(sim_wo_best, axis=1)
    return best, jnp.stack([best_sim, second_sim], axis=1)


def mutual_nn_match(
    desc_a, desc_b, valid_a=None, valid_b=None, threshold: float = 0.9
) -> MatchResult:
    """Mutual nearest neighbours with a similarity floor (R2D2.py:29-38 semantics)."""
    sim = similarity_matrix(desc_a, desc_b, valid_a, valid_b)
    nn12 = jnp.argmax(sim, axis=1)
    nn21 = jnp.argmax(sim, axis=0)
    best_sim = jnp.take_along_axis(sim, nn12[:, None], axis=1)[:, 0]
    ids = jnp.arange(sim.shape[0])
    mask = (best_sim >= threshold) & (nn21[nn12] == ids)
    return MatchResult(idx=nn12, mask=mask, sim=jnp.where(mask, best_sim, 0.0))


def ratio_mutual_nn_match(
    desc_a, desc_b, valid_a=None, valid_b=None, ratio: float = 0.90
) -> MatchResult:
    """Lowe ratio on L2 distances of unit descriptors + mutual-NN (R2D2.py:53-66).

    dist = sqrt(2 - 2 sim); accept if dist1/dist2 <= ratio and the NN is mutual.
    """
    sim = similarity_matrix(desc_a, desc_b, valid_a, valid_b)
    nn12, top2_sim = _top2(sim)
    nn21 = jnp.argmax(sim, axis=0)
    dists = jnp.sqrt(jnp.clip(2.0 - 2.0 * jnp.clip(top2_sim, -1.0, 1.0), 0.0))
    ratios = dists[:, 0] / (dists[:, 1] + 1e-8)
    ids = jnp.arange(sim.shape[0])
    mask = (nn21[nn12] == ids) & (ratios <= ratio)
    if valid_a is not None:
        mask = mask & valid_a
    return MatchResult(idx=nn12, mask=mask, sim=jnp.where(mask, top2_sim[:, 0], 0.0))


def ratio_match(
    desc_a, desc_b, valid_a=None, valid_b=None, ratio: float = 0.85,
    binary_dim: int | None = None,
) -> MatchResult:
    """kNN(k=2) + Lowe ratio on distances — the ORB/SIFT matcher shape (ORB.py:25-32).

    For ±1 binary descriptors pass ``binary_dim=D``: distances are hamming,
    (D - sim) / 2. For float descriptors, distance = sqrt of squared L2 via unit-norm
    identity (callers should pass L2-normalized descriptors).
    """
    sim = similarity_matrix(desc_a, desc_b, valid_a, valid_b)
    nn12, top2_sim = _top2(sim)
    if binary_dim is not None:
        d1 = (binary_dim - top2_sim[:, 0]) * 0.5
        d2 = (binary_dim - top2_sim[:, 1]) * 0.5
    else:
        d1 = jnp.sqrt(jnp.clip(2.0 - 2.0 * jnp.clip(top2_sim[:, 0], -1.0, 1.0), 0.0))
        d2 = jnp.sqrt(jnp.clip(2.0 - 2.0 * jnp.clip(top2_sim[:, 1], -1.0, 1.0), 0.0))
    mask = d1 < ratio * d2
    if valid_a is not None:
        mask = mask & valid_a
    # Rows whose best hit was an invalid (masked) column carry sim ~ _NEG: drop them.
    mask = mask & (top2_sim[:, 0] > _NEG * 0.5)
    return MatchResult(idx=nn12, mask=mask, sim=jnp.where(mask, top2_sim[:, 0], 0.0))


def matches_to_pairs(result: MatchResult) -> np.ndarray:
    """Dynamic (M, 2) [idx_a, idx_b] int array for host-side consumers/tests.

    Mirrors the reference's match-matrix layout (ORB.py:31, R2D2.py:66).
    """
    idx = np.asarray(result.idx)
    mask = np.asarray(result.mask)
    rows = np.nonzero(mask)[0]
    return np.stack([rows, idx[rows]], axis=1) if rows.size else np.zeros((0, 2), np.int64)
