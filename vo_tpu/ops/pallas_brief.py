"""Pallas TPU kernel: fused dense-packed BRIEF descriptor planes.

The XLA formulation (vo_tpu.features.dense_brief) evaluates 256 comparisons as 512
shifted full-image reads — ~15 GB of HBM traffic for a 16-frame KITTI batch. This
kernel tiles the (padded) image into VMEM once and evaluates every comparison from
on-chip memory: HBM traffic drops to one image read + one packed-plane write
(~0.27 GB), a ~50x reduction on the extraction hot path.

Grid: (B, H/TH, W/TW). Each program DMAs a (TH+2P, TW+2P) halo tile from the padded
image (kept in ANY/HBM space), runs the 256 unrolled compare-shift-or steps on the VPU,
and writes the (TH, TW, 8) uint32 output block.

Falls back to interpret mode off-TPU so the same code path is unit-testable on CPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vo_tpu.features.dense_brief import dense_brief_offsets, BRIEF_BITS
from vo_tpu.ops.image import gaussian_blur

_PAD = 16  # halo >= pattern radius (13), aligned


def _brief_kernel(offsets_np, TH, TW, img_ref, out_ref, tile, sem):
    """One (TH, TW) output tile; img_ref is the padded (B, Hp, Wp) image in ANY."""
    b = pl.program_id(0)
    ti = pl.program_id(1)
    tj = pl.program_id(2)

    # Fetch width is TW + 128 (not TW + 2*_PAD): HBM->VMEM DMA slice sizes must be
    # lane-aligned (128); the extra right-side columns are simply unused.
    copy = pltpu.make_async_copy(
        img_ref.at[b, pl.ds(ti * TH, TH + 2 * _PAD), pl.ds(tj * TW, TW + 128)],
        tile,
        sem,
    )
    copy.start()
    copy.wait()

    n_words = offsets_np.shape[0] // 32
    for w in range(n_words):
        acc = jnp.zeros((TH, TW), jnp.uint32)
        for k in range(32):
            (ax, ay), (bx, by) = offsets_np[w * 32 + k]
            # Upcast to f32 for the compare: Mosaic lacks native bf16 compares on
            # some targets, and bf16->f32 is exact so parity with the XLA path's
            # bf16 compare is preserved. The DMA stays bf16 (the traffic win).
            va = tile[_PAD + ay: _PAD + ay + TH,
                      _PAD + ax: _PAD + ax + TW].astype(jnp.float32)
            vb = tile[_PAD + by: _PAD + by + TH,
                      _PAD + bx: _PAD + bx + TW].astype(jnp.float32)
            # Multiply by the constant instead of `<< k`: Mosaic miscompiles
            # shift-by-16..22 in this sliced-compare accumulation on real TPUs
            # (bits 16-22 of every word came out ~random; bit-exact with `*`).
            acc = acc | ((va < vb).astype(jnp.uint32) * np.uint32(1 << k))
        # (TH, TW) store into a (..., TH, TW) slice — layout Mosaic supports without
        # reshapes (word-major output; transposed to (B, H, W, nw) by the wrapper).
        out_ref[0, w, :, :] = acc


@partial(jax.jit, static_argnames=("bits", "blur_sigma", "interpret"))
def dense_packed_brief_pallas(gray: jnp.ndarray, bits: int = BRIEF_BITS,
                              blur_sigma: float = 2.0,
                              interpret: bool = False) -> jnp.ndarray:
    """(B, H, W) gray -> (B, H, W, bits//32) uint32 packed BRIEF planes."""
    offsets = dense_brief_offsets(bits)
    smoothed = gaussian_blur(gray, blur_sigma)
    B, H, W = gray.shape

    TH, TW = 64, 256
    Ht = -(-H // TH) * TH
    Wt = -(-W // TW) * TW
    # Right-pad W by a full 128 lanes so every tile's (TW + 128)-wide DMA stays in
    # bounds (see _brief_kernel). bf16 halves the halo-DMA traffic and must match the
    # XLA fallback's cast exactly so both paths produce bit-identical descriptors.
    padded = jnp.pad(smoothed.astype(jnp.bfloat16),
                     ((0, 0), (_PAD, _PAD + Ht - H), (_PAD, (Wt - W) + 128)))

    n_words = bits // 32
    grid = (B, Ht // TH, Wt // TW)
    out = pl.pallas_call(
        partial(_brief_kernel, offsets, TH, TW),
        out_shape=jax.ShapeDtypeStruct((B, n_words, Ht, Wt), jnp.uint32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, n_words, TH, TW),
            lambda b, i, j: (b, 0, i, j),
        ),
        scratch_shapes=[
            pltpu.VMEM((TH + 2 * _PAD, TW + 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(padded)
    return jnp.transpose(out[:, :, :H, :W], (0, 2, 3, 1))


def upright_brief_descriptors_pallas(gray, kp, valid, bits: int = BRIEF_BITS,
                                     blur_sigma: float = 2.0,
                                     interpret: bool = False):
    """Drop-in fast path for features.dense_brief.upright_brief_descriptors."""
    from vo_tpu.features.dense_brief import gather_brief_descriptors

    packed = dense_packed_brief_pallas(gray, bits=bits, blur_sigma=blur_sigma,
                                       interpret=interpret)
    return gather_brief_descriptors(packed, kp, valid, bits=bits)
