"""Fused TAT residual block (ResBlock_SFT) as a single Pallas TPU kernel.

The reference block (/root/reference/model_blocks.py:74-105) is
  SFT0(x) -> conv3x3 (+bias) -> GELU -> SFT1 -> conv3x3 (+bias) -> + x
where SFT_i multiplies by (scale_i+1) and adds shift_i, both per-channel
functions of the frame-index embedding. In the XLA decode this is 2 conv
kernels plus several full-resolution elementwise passes; at 1080p each XLA
conv carries ~4 ms of fixed layout/overhead cost (see CLAUDE.md baselines).

This kernel runs the WHOLE block in one pass over a (C, H, W)
channels-major layout: W rides the vector lanes (1920 = 15x128, no channel
padding), tiles of TH=8 output rows stream through VMEM with a 2-row halo
per conv, and each 3x3 conv is 9 accumulated (C_out, C_in) @ (C_in, W) row
matmuls on the MXU with fp32 accumulation. The two tiny SFT Dense stacks
that *produce* scale/shift from the t-embedding stay in XLA (they are
microscopic); the kernel consumes the resulting per-channel vectors.

Constraints: batch 1 per call (the decode-serving fast path), W a multiple
of 128, dtype bfloat16 in/out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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


def _shift_w(row32, dx, col, w):
    """Static W-shift with zero boundary; lane rotate is 32-bit only."""
    if dx == 1:
        return row32
    if dx == 0:
        return jnp.where(col == 0, 0.0, pltpu.roll(row32, 1, axis=1))
    return jnp.where(col == w - 1, 0.0, pltpu.roll(row32, w - 1, axis=1))


def _conv_rows(tile_get, w_ref, bias_ref, out_rows, col, c, w, dt):
    """3x3 conv over `out_rows` output rows. tile_get(r) returns input row r
    (already masked/activated) as (C, W) float32; returns list of (C, W)
    float32 rows (bias added)."""
    outs = []
    for h in out_rows:
        acc = jnp.zeros((c, w), jnp.float32)
        for dy in range(3):
            row32 = tile_get(h + dy)
            for dx in range(3):
                shifted = _shift_w(row32, dx, col, w).astype(dt)
                acc = acc + lax.dot(w_ref[dy * 3 + dx], shifted,
                                    preferred_element_type=jnp.float32)
        outs.append(acc + bias_ref[:, :1])
    return outs


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

    def x_row(r):
        """Block-input row r as f32 (optionally with the preceding
        sinusoidal activation fused in)."""
        x32 = xtile[:, r, :].astype(jnp.float32)
        return jnp.sin(x32) if input_sin else x32

    def a_row(r):
        """SFT0 + frame-boundary zeroing, as f32 (conv0 input row r)."""
        val = x_row(r) * s0 + h0
        return jnp.where(in_bounds(r), val, 0.0)

    # conv0 produces TH+2 rows (the block plus conv1's halo). Each row is
    # immediately pushed through GELU+SFT1 and stored as bf16 so the fp32
    # accumulators die row by row (keeps the Mosaic VMEM stack small).
    m_rows = []
    for r in range(TH + 2):
        acc = _conv_rows(a_row, w0_ref, b0_ref, (r,), col, c, w, dt)[0]
        g = 0.5 * acc * (1.0 + _erf(acc * 0.7071067811865476))
        val = g * s1 + h1
        abs_ok = in_bounds(r + 1)  # conv0 row r == tile row r+1
        m_rows.append(jnp.where(abs_ok, val, 0.0).astype(dt))

    def m_row(r):
        return m_rows[r].astype(jnp.float32)

    for h in range(TH):
        c1 = _conv_rows(m_row, w1_ref, b1_ref, (h,), col, c, w, dt)[0]
        out_ref[:, h, :] = (x_row(h + HALO) + c1).astype(dt)


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
    return pl.pallas_call(
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
