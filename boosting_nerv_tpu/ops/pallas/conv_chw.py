"""Pallas 3x3 conv kernels on channels-major (C, H, W) data with fused
epilogues — the siblings of the fused ResBlock_SFT kernel (fused_sft.py)
used by the fast decode tail:

 - `conv3x3_act_chw`: conv + bias + sin (the stride-1 sinusoidal NeRVBlock
   body at full resolution, model_blocks.py:34-46 upconv with strd=1).
 - `head_conv_chw`: conv + bias + tanh*0.5+0.5 (the output head + OutImg,
   model_hnerv.py:247).

Same machinery as fused_sft: W rides the lanes, TH=8 output rows per grid
step, 2-row halo via an aligned 16-row DMA, taps as (C_out, C_in) @ (C_in, W)
MXU matmuls with fp32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import pallas_call as _precision_safe_pallas_call

from .fused_sft import _dot9, _shifted_triplet

TH = 8
DMA_ROWS = 16


def _conv_kernel(h_real, c_out, act, x_hbm, w_ref, b_ref, out_ref, xtile, sem):
    c_in = xtile.shape[0]
    w = out_ref.shape[2]
    dt = out_ref.dtype
    i = pl.program_id(0)
    src = pl.multiple_of(i * TH, TH)
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, DMA_ROWS), :],
                               xtile, sem)
    cp.start()
    cp.wait()

    col = lax.broadcasted_iota(jnp.int32, (c_in, w), 1)

    def in_bounds(r):
        abs_row = i * TH - 1 + r
        return (abs_row >= 0) & (abs_row < h_real)

    # input rows masked + W-shifted once per tile
    rows = [jnp.where(in_bounds(r), xtile[:, r, :].astype(jnp.float32), 0.0)
            for r in range(TH + 2)]
    trip = _shifted_triplet(rows, col, w, dt)

    for h in range(TH):
        acc = _dot9(trip, w_ref, b_ref, h, c_out, w)
        if act == "sin":
            acc = jnp.sin(acc)
        elif act == "out_tanh":
            acc = jnp.tanh(acc) * 0.5 + 0.5
        out_ref[:, h, :] = acc.astype(dt)


def _run(x, w9, b, c_out, act, interpret):
    c_in, h, w = x.shape
    grid = pl.cdiv(h, TH)  # ragged last block is clipped by pallas
    hp = (grid - 1) * TH + DMA_ROWS
    xp = jnp.pad(x, ((0, 0), (1, hp - h - 1), (0, 0)))
    kernel = functools.partial(_conv_kernel, h, c_out, act)
    return _precision_safe_pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((c_out, TH, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_out, h, w), x.dtype),
        scratch_shapes=[pltpu.VMEM((c_in, DMA_ROWS, w), x.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, w9, b.reshape(c_out, 1).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_act_chw(x, w9, b, interpret=False):
    """x: (C_in, H, W) bf16; w9: (9, C_out, C_in); b: (C_out,).
    Returns sin(conv(x) + b) as (C_out, H, W)."""
    return _run(x, w9, b, w9.shape[1], "sin", interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def head_conv_chw(x, w9, b, interpret=False):
    """Output head: tanh(conv(x)+b)*0.5+0.5 -> (C_out, H, W)."""
    return _run(x, w9, b, w9.shape[1], "out_tanh", interpret)
