"""Pallas TPU kernel: fused descriptor matching (similarity GEMM + top-2 + mutual-NN).

The XLA matcher (vo_tpu.matching.matchers) materializes the (Na, Nb) similarity matrix
in HBM and re-reads it for three reductions (row argmax, row second-best, column
argmax): for a 4096x4096 f32 problem that is ~64 MB written + ~192 MB re-read per pair.
This kernel tiles the GEMM on the MXU and folds all three reductions into the tile
loop, so HBM sees only the descriptors (2 x ~2 MB) and three tiny output vectors —
a >50x traffic reduction on the matching hot path.

Replaces the borrowed native matchers behind the reference's matching layer
(BFMatcher.knnMatch ORB.py:25-32; ratio_mutual_nn_matcher torch GEMM R2D2.py:53-66).

Layout: descriptor sets this size (<= ~8k x 256 f32) fit in VMEM whole, so the grid
runs over row tiles of A only and the FULL B block is resident (constant block index ->
fetched from HBM exactly once). Each program does a chunked (TM, D) x (D, TC) MXU GEMM
sweep over B with the row top-2 (value, runner-up, argmax) merged in registers; the
column max/argmax accumulates in a (1, Nb) VMEM scratch across the i-span (TPU grids
are sequential on a core) and flushes at i == nI-1. HBM traffic is exactly one read of
each descriptor set plus three tiny vectors.

Falls back to interpret mode off-TPU so the same code path is unit-testable on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _match_kernel(TM, TC, nI, nJ, bf16,
                  a_ref, b_ref, va_ref, vb_ref,
                  nn12_ref, top2_ref, nn21_ref,
                  col_best, col_idx):
    """Grid is (nI,) over row tiles of A; the FULL B sits resident in VMEM (constant
    block index -> fetched once), so the whole row reduction happens inside one program
    with plain values — no cross-program row state. Column max/argmax accumulates in a
    (1, Nbp) VMEM scratch across the i-span and flushes at the last program."""
    i = pl.program_id(0)

    a = a_ref[...]                                   # (TM, Dp)
    # Masks stay 2D f32 end-to-end: Mosaic can't insert a minor dim on 1-bit vectors
    # (no bool[:, None]), but (1, TM)->(TM, 1) transposes of 32-bit types are fine.
    va_col = va_ref[...].T > 0.0                     # (TM, 1)
    if bf16:
        a = a.astype(jnp.bfloat16)

    @pl.when(i == 0)
    def _init_cols():
        col_best[...] = jnp.full_like(col_best, _NEG)
        col_idx[...] = jnp.zeros_like(col_idx)

    row_best = jnp.full((TM,), _NEG, jnp.float32)
    row_sec = jnp.full((TM,), _NEG, jnp.float32)
    row_idx = jnp.zeros((TM,), jnp.int32)

    for jc in range(nJ):                             # static unroll over B chunks
        b = b_ref[jc * TC:(jc + 1) * TC, :]          # (TC, Dp)
        if bf16:
            b = b.astype(jnp.bfloat16)
        # Pin DEFAULT precision: a caller-scoped default_matmul_precision("highest")
        # (the geometry solvers set it) would otherwise request an fp32 contract on
        # bf16 operands, which Mosaic rejects ("Bad lhs type"). bf16 inputs with f32
        # accumulation are exact for the +-1 binary descriptors anyway.
        sim = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32,
                                  precision=jax.lax.Precision.DEFAULT)  # (TM, TC) MXU
        vbc = vb_ref[0:1, jc * TC:(jc + 1) * TC]     # (1, TC) f32
        sim = jnp.where(va_col & (vbc > 0.0), sim, _NEG)

        # Row top-2 merge (pure values, stays in registers).
        t_loc = jnp.argmax(sim, axis=1).astype(jnp.int32)
        t_best = jnp.max(sim, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        t_sec = jnp.max(jnp.where(lane == t_loc[:, None], _NEG, sim), axis=1)
        t_idx = t_loc + jc * TC
        row_sec = jnp.maximum(jnp.maximum(row_sec, t_sec),
                              jnp.minimum(row_best, t_best))
        row_idx = jnp.where(t_best > row_best, t_idx, row_idx)
        row_best = jnp.maximum(row_best, t_best)

        # Column max merge into the persistent scratch slice.
        c_best = jnp.max(sim, axis=0)
        c_idx = jnp.argmax(sim, axis=0).astype(jnp.int32) + i * TM
        pb = col_best[0, jc * TC:(jc + 1) * TC]
        pi = col_idx[0, jc * TC:(jc + 1) * TC]
        col_best[0, jc * TC:(jc + 1) * TC] = jnp.maximum(pb, c_best)
        col_idx[0, jc * TC:(jc + 1) * TC] = jnp.where(c_best > pb, c_idx, pi)

    nn12_ref[0, pl.ds(i * TM, TM)] = row_idx
    top2_ref[0, pl.ds(i * TM, TM)] = row_best
    top2_ref[1, pl.ds(i * TM, TM)] = row_sec

    @pl.when(i == nI - 1)
    def _flush_cols():
        nn21_ref[...] = col_idx[...]


def _pad_to(x, n, axis, value=0.0):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, n - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value) if n > x.shape[axis] else x


@partial(jax.jit, static_argnames=("interpret", "bf16"))
def top2_mutual_pallas(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                       valid_a: jnp.ndarray | None = None,
                       valid_b: jnp.ndarray | None = None,
                       interpret: bool = False, bf16: bool = False):
    """Fused (nn12, top2_sim, nn21) — everything the ratio/mutual matchers need.

    Args:
      desc_a: (Na, D) descriptors (float, or ±1 binary as float).
      desc_b: (Nb, D).
      valid_a/valid_b: bool masks; invalid entries never win any reduction.
      bf16: run the GEMM in bfloat16 (f32 accumulation). EXACT for ±1 binary
        descriptors (products are ±1 and partial sums ≤ D stay integral), ~1e-2
        relative on float descriptors — fine for ratio tests, 2x MXU throughput.
    Returns:
      nn12 (Na,) int32, top2_sim (Na, 2) f32 [best, second], nn21 (Nb,) int32.
    """
    Na, D = desc_a.shape
    Nb = desc_b.shape[0]
    # Large tiles amortize the per-chunk reduction overhead (measured on v5e for
    # 4096x4096x128: 256/256 -> 614 us, 512/1024 -> 282 us; 1024/2048 is faster still
    # but trips the 16 MB scoped-VMEM limit when the sim tile hits 8 MB). Tiles shrink
    # to the (256-padded) problem size so small matches don't over-pad.
    TM = min(512, -(-Na // 256) * 256)
    TC = min(1024, -(-Nb // 256) * 256)
    Nap = -(-Na // TM) * TM
    Nbp = -(-Nb // TC) * TC
    Dp = -(-D // 128) * 128
    # VMEM budget: full-B residency + the (TM, TC) f32 sim tile must fit (~16 MB/core).
    if Nbp * Dp * 4 > 8 * 2 ** 20:
        raise ValueError(
            f"descriptor set B too large for VMEM residency ({Nbp}x{Dp} f32); "
            "use vo_tpu.matching.matchers for sets beyond ~16k x 128")

    va = jnp.ones(Na, bool) if valid_a is None else valid_a
    vb = jnp.ones(Nb, bool) if valid_b is None else valid_b
    a = _pad_to(_pad_to(desc_a.astype(jnp.float32), Nap, 0), Dp, 1)
    b = _pad_to(_pad_to(desc_b.astype(jnp.float32), Nbp, 0), Dp, 1)
    vaf = _pad_to(va.astype(jnp.float32)[None], Nap, 1)     # (1, Nap)
    vbf = _pad_to(vb.astype(jnp.float32)[None], Nbp, 1)

    nI, nJ = Nap // TM, Nbp // TC
    nn12, top2, nn21 = pl.pallas_call(
        partial(_match_kernel, TM, TC, nI, nJ, bf16),
        grid=(nI,),
        in_specs=[
            pl.BlockSpec((TM, Dp), lambda i: (i, 0)),
            pl.BlockSpec((Nbp, Dp), lambda i: (0, 0)),   # full B resident in VMEM
            pl.BlockSpec((1, TM), lambda i: (0, i)),
            pl.BlockSpec((1, Nbp), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Nap), jnp.int32),
            jax.ShapeDtypeStruct((2, Nap), jnp.float32),
            jax.ShapeDtypeStruct((1, Nbp), jnp.int32),
        ],
        out_specs=[
            pl.BlockSpec((1, Nap), lambda i: (0, 0)),
            pl.BlockSpec((2, Nap), lambda i: (0, 0)),
            pl.BlockSpec((1, Nbp), lambda i: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, Nbp), jnp.float32),
            pltpu.VMEM((1, Nbp), jnp.int32),
        ],
        interpret=interpret,
    )(a, b, vaf, vbf)
    return nn12[0, :Na], top2[:, :Na].T, nn21[0, :Nb]


def ratio_mutual_nn_match_pallas(desc_a, desc_b, valid_a=None, valid_b=None,
                                 ratio: float = 0.90, interpret: bool = False,
                                 bf16: bool = False):
    """Fused-kernel version of matchers.ratio_mutual_nn_match (R2D2.py:53-66
    semantics): Lowe ratio on unit-descriptor L2 distances + mutual-NN."""
    from vo_tpu.matching.matchers import MatchResult

    nn12, top2_sim, nn21 = top2_mutual_pallas(desc_a, desc_b, valid_a, valid_b,
                                              interpret=interpret, bf16=bf16)
    dists = jnp.sqrt(jnp.clip(2.0 - 2.0 * jnp.clip(top2_sim, -1.0, 1.0), 0.0))
    ratios = dists[:, 0] / (dists[:, 1] + 1e-8)
    ids = jnp.arange(nn12.shape[0], dtype=nn12.dtype)
    mask = (nn21[nn12] == ids) & (ratios <= ratio)
    if valid_a is not None:
        mask = mask & valid_a
    mask = mask & (top2_sim[:, 0] > _NEG * 0.5)
    return MatchResult(idx=nn12, mask=mask,
                       sim=jnp.where(mask, top2_sim[:, 0], 0.0))


def ratio_match_pallas(desc_a, desc_b, valid_a=None, valid_b=None,
                       ratio: float = 0.85, binary_dim: int | None = None,
                       interpret: bool = False, bf16: bool | None = None):
    """Fused-kernel version of matchers.ratio_match (BF kNN k=2 + Lowe ratio,
    ORB.py:25-32 semantics; hamming via the ±1 identity for binary descriptors).
    For binary descriptors bf16 defaults ON (it is exact there, see
    top2_mutual_pallas); for float descriptors it defaults OFF."""
    from vo_tpu.matching.matchers import MatchResult

    if bf16 is None:
        bf16 = binary_dim is not None
    nn12, top2_sim, _ = top2_mutual_pallas(desc_a, desc_b, valid_a, valid_b,
                                           interpret=interpret, bf16=bf16)
    if binary_dim is not None:
        d1 = (binary_dim - top2_sim[:, 0]) * 0.5
        d2 = (binary_dim - top2_sim[:, 1]) * 0.5
    else:
        d1 = jnp.sqrt(jnp.clip(2.0 - 2.0 * jnp.clip(top2_sim[:, 0], -1.0, 1.0), 0.0))
        d2 = jnp.sqrt(jnp.clip(2.0 - 2.0 * jnp.clip(top2_sim[:, 1], -1.0, 1.0), 0.0))
    mask = d1 < ratio * d2
    if valid_a is not None:
        mask = mask & valid_a
    mask = mask & (top2_sim[:, 0] > _NEG * 0.5)
    return MatchResult(idx=nn12, mask=mask,
                       sim=jnp.where(mask, top2_sim[:, 0], 0.0))
