"""Fused TAT residual block (ResBlock_SFT) as a single Pallas TPU kernel.

The reference block (/root/reference/model_blocks.py:74-105) is
  SFT0(x) -> conv3x3 (+bias) -> GELU -> SFT1 -> conv3x3 (+bias) -> + x
where SFT_i multiplies by (scale_i+1) and adds shift_i, both per-channel
functions of the frame-index embedding. In the XLA decode this is 2 conv
kernels plus several full-resolution elementwise passes; at 1080p each XLA
conv carries ~4 ms of fixed layout/overhead cost (see CLAUDE.md baselines).

This kernel runs the WHOLE block in one pass over a (C, H, W)
channels-major layout: W rides the vector lanes (must be a multiple of
128), tiles of TH=8 output rows stream through VMEM with a 2-row halo per
conv, and each 3x3 conv is 9 accumulated (C_out, C_in) @ (C_in, W) row
matmuls on the MXU with fp32 accumulation. All elementwise prologue work
(optional preceding sin, SFT affine, boundary masks, the two W-shifted
copies per row — lane rotates are 32-bit-only on this Mosaic, hence the
f32 round-trip) is computed ONCE per tile and cached as bf16 rows.

The two tiny SFT Dense stacks that *produce* scale/shift from the
t-embedding stay in XLA; the kernel consumes the resulting per-channel
vectors. Batch 1 per call (the decode-serving convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import pallas_call as _precision_safe_pallas_call

TH = 8          # output rows per grid step
HALO = 2        # two stacked 3x3 convs
DMA_ROWS = 16   # sublane-aligned VMEM tile height (TH + 2*HALO rounded to 8)


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7): Mosaic has no
    erf/erfc lowering; exp is supported."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _shifted_triplet(rows_f32, col, w, dt):
    """For each f32 row, the (left, centre, right) W-shifted bf16 copies
    with zero frame edges. Lane rotate is 32-bit only, so shifts happen on
    the f32 rows, once per row."""
    L, C_, R = [], [], []
    for v in rows_f32:
        C_.append(v.astype(dt))
        L.append(jnp.where(col == 0, 0.0,
                           pltpu.roll(v, 1, axis=1)).astype(dt))
        R.append(jnp.where(col == w - 1, 0.0,
                           pltpu.roll(v, w - 1, axis=1)).astype(dt))
    return L, C_, R


def _dot9(trip, w_ref, b_ref, o, c, w):
    """One 3x3-conv output row (fp32, bias added) from cached shifted rows:
    trip = (L, C, R) lists; input rows o, o+1, o+2."""
    L, C_, R = trip
    acc = jnp.zeros((c, w), jnp.float32)
    for dy in range(3):
        for dx, rows in ((0, L), (1, C_), (2, R)):
            acc = acc + lax.dot(w_ref[dy * 3 + dx], rows[o + dy],
                                preferred_element_type=jnp.float32)
    return acc + b_ref[:, :1]


def _kernel(h_real, input_sin, x_hbm, w0_ref, b0_ref, w1_ref, b1_ref,
            sft_ref, out_ref, xtile, sem):
    """x_hbm: (C, Hp, W) input padded with HALO top rows and enough bottom
    rows for aligned DMA; sft_ref: (4, C, 1) = scale0, shift0, scale1,
    shift1; out_ref: (C, TH, W) block."""
    c = out_ref.shape[0]
    w = out_ref.shape[2]
    dt = out_ref.dtype
    i = pl.program_id(0)
    src = pl.multiple_of(i * TH, TH)
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, DMA_ROWS), :],
                               xtile, sem)
    cp.start()
    cp.wait()

    col = lax.broadcasted_iota(jnp.int32, (c, w), 1)
    s0 = sft_ref[0] + 1.0   # (C, 1)
    h0 = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1 = sft_ref[3]

    # tile row r holds absolute input row (i*TH - HALO + r)
    def in_bounds(r):
        abs_row = i * TH - HALO + r
        return (abs_row >= 0) & (abs_row < h_real)

    # block-input rows (with the preceding sinusoidal activation fused in),
    # computed once per tile
    sx = []
    for r in range(TH + 4):
        v = xtile[:, r, :].astype(jnp.float32)
        sx.append(jnp.sin(v) if input_sin else v)

    # conv0 input rows: SFT0 + frame-boundary zeroing (conv zero-padding
    # applies AFTER the modulation)
    a_rows = [jnp.where(in_bounds(r), sx[r] * s0 + h0, 0.0)
              for r in range(TH + 4)]
    a_trip = _shifted_triplet(a_rows, col, w, dt)

    # conv0 -> GELU -> SFT1 (+ boundary zeroing), rows cached as bf16 so the
    # fp32 accumulators die row by row
    m_rows = []
    for r in range(TH + 2):
        acc = _dot9(a_trip, w0_ref, b0_ref, r, c, w)
        val = _gelu(acc) * s1 + h1
        m_rows.append(jnp.where(in_bounds(r + 1), val, 0.0))
    m_trip = _shifted_triplet(m_rows, col, w, dt)

    for h in range(TH):
        c1 = _dot9(m_trip, w1_ref, b1_ref, h, c, w)
        out_ref[:, h, :] = (sx[h + HALO] + c1).astype(dt)


@functools.partial(jax.jit, static_argnames=("interpret", "input_sin"))
def resblock_sft_chw(x, w0, b0, w1, b1, scale0, shift0, scale1, shift1,
                     interpret=False, input_sin=False):
    """Fused ResBlock_SFT on channels-major data.

    x: (C, H, W) bfloat16; w0/w1: (9, C, C) taps as (C_out, C_in) matrices
    in row-major (dy, dx) order; b0/b1: (C,); scale/shift: (C,).
    `input_sin` fuses the preceding sinusoidal activation (the NeRVBlock
    act before the TAT block) into the kernel prologue.
    Returns (C, H, W) bfloat16.
    """
    c, h, w = x.shape
    grid = pl.cdiv(h, TH)  # ragged last block is clipped by pallas
    hp = (grid - 1) * TH + DMA_ROWS
    xp = jnp.pad(x, ((0, 0), (HALO, hp - h - HALO), (0, 0)))
    sft = jnp.stack([scale0, shift0, scale1, shift1]).astype(jnp.float32)
    sft = sft[:, :, None]  # (4, C, 1)
    kernel = functools.partial(_kernel, h, input_sin)
    return _precision_safe_pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, TH, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, h, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((c, DMA_ROWS, w), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w0, b0.reshape(c, 1).astype(jnp.float32),
      w1, b1.reshape(c, 1).astype(jnp.float32), sft)


def _shift_w(row32, dx, col, w):
    """Static W-shift with zero boundary (kept for conv_chw)."""
    if dx == 1:
        return row32
    if dx == 0:
        return jnp.where(col == 0, 0.0, pltpu.roll(row32, 1, axis=1))
    return jnp.where(col == w - 1, 0.0, pltpu.roll(row32, w - 1, axis=1))
