"""Bisect the rsft_planar Mosaic compile crash: compile variants of the
kernel with pieces disabled.  Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/rsft_planar_bisect.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boosting_nerv_tpu.ops.pallas.planar import (_build_kbuf, _col_plane,
                                                 _planar_bias, _planar_dots,
                                                 planar_conv_mats)
from boosting_nerv_tpu.ops.pallas.tile_conv import _gelu

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)

C, CP, HC, WD, WC = 51, 64, 540, 1024, 960
TH = 8


def variant_kernel(use_mask, use_conv2, use_gelu, wd, cp, hc_real, wc_real,
                   x_hbm, h0_ref, f0_ref, b0_ref, h1_ref, f1_ref, b1_ref,
                   sft_ref, out_ref, xtile, kbuf, mid, kbuf2, sem):
    nout = out_ref.shape[1]
    dt = out_ref.dtype
    i = pl.program_id(0)
    th = nout // wd
    lanes = (th + 4) * wd
    nmid = (th + 2) * wd

    def cp_dma(step, slot):
        src = pl.multiple_of(step * th * wd, th * wd)
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes)],
                                     xtile.at[slot], sem.at[slot])

    slot = lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cp_dma(i, slot).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        cp_dma(i + 1, 1 - slot).start()

    cp_dma(i, slot).wait()

    s0 = sft_ref[0] + 1.0
    h0v = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1v = sft_ref[3]

    x32 = xtile[slot].astype(jnp.float32)
    if use_mask:
        ln_full = lax.broadcasted_iota(jnp.int32, (4 * cp, lanes), 1)
        col_full = ln_full & (wd - 1)
        logw = wd.bit_length() - 1
        row_full = (ln_full >> logw) + (i * th - 2)
        in_frame = ((row_full >= 0) & (row_full < hc_real)
                    & (col_full < wc_real))
        a32 = jnp.where(in_frame, x32 * s0 + h0v, 0.0)
    else:
        a32 = x32 * s0 + h0v

    colp = _col_plane(cp, lanes, wd)
    _build_kbuf(kbuf, a32, colp, wc_real, cp, dt)
    a0, a1 = _planar_dots(kbuf, h0_ref, f0_ref, cp, cp, wd, nmid)
    act = _gelu if use_gelu else (lambda v: v)
    m0 = act(a0 + b0_ref[pl.ds(0, 2 * cp)]) * \
        lax.slice_in_dim(s1, 0, 2 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 0, 2 * cp, axis=0)
    m1 = act(a1 + b0_ref[pl.ds(2 * cp, 2 * cp)]) * \
        lax.slice_in_dim(s1, 2 * cp, 4 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 2 * cp, 4 * cp, axis=0)
    if use_mask:
        in_frame_m = lax.slice_in_dim(in_frame, wd, wd + nmid, axis=1)
        okm0 = lax.slice_in_dim(in_frame_m, 0, 2 * cp, axis=0)
        okm1 = lax.slice_in_dim(in_frame_m, 2 * cp, 4 * cp, axis=0)
        mid[pl.ds(0, 2 * cp), :] = jnp.where(okm0, m0, 0.0).astype(dt)
        mid[pl.ds(2 * cp, 2 * cp), :] = jnp.where(okm1, m1, 0.0).astype(dt)
    else:
        mid[pl.ds(0, 2 * cp), :] = m0.astype(dt)
        mid[pl.ds(2 * cp, 2 * cp), :] = m1.astype(dt)

    if not use_conv2:
        out_ref[...] = mid[:, pl.ds(wd, nout)]
        return
    m32 = mid[...].astype(jnp.float32)
    colm = _col_plane(cp, nmid, wd)
    _build_kbuf(kbuf2, m32, colm, wc_real, cp, dt)
    r0, r1 = _planar_dots(kbuf2, h1_ref, f1_ref, cp, cp, wd, nout)
    resid = lax.slice_in_dim(x32, 2 * wd, 2 * wd + nout, axis=1)
    out_ref[pl.ds(0, 2 * cp), :] = (
        r0 + b1_ref[pl.ds(0, 2 * cp)]
        + lax.slice_in_dim(resid, 0, 2 * cp, axis=0)).astype(dt)
    out_ref[pl.ds(2 * cp, 2 * cp), :] = (
        r1 + b1_ref[pl.ds(2 * cp, 2 * cp)]
        + lax.slice_in_dim(resid, 2 * cp, 4 * cp, axis=0)).astype(dt)


def try_variant(use_mask, use_conv2, use_gelu, th=TH):
    cp = CP
    xp = jnp.zeros((4 * cp, HC, WD), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1)
    b = jnp.zeros((C,), jnp.float32)
    grid = pl.cdiv(HC, th)
    hp = grid * th + 4
    xf = jnp.pad(xp, ((0, 0), (2, hp - HC - 2), (0, 0)))
    xf = xf.reshape(4 * cp, hp * WD)
    h0m, f0m = planar_conv_mats(w, cp, cp)
    bp = _planar_bias(b, cp)
    sft = jnp.zeros((4, 4 * cp, 1), jnp.float32)
    fn = functools.partial(variant_kernel, use_mask, use_conv2, use_gelu,
                           WD, cp, HC, WC)
    tag = f"mask={use_mask} conv2={use_conv2} gelu={use_gelu} th={th}"
    try:
        t0 = time.perf_counter()
        out = pl.pallas_call(
            fn,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec((4 * cp, th * WD), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4 * cp, HC * WD), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((2, 4 * cp, (th + 4) * WD), jnp.bfloat16),
                pltpu.VMEM((8 * cp, (th + 4) * WD), jnp.bfloat16),
                pltpu.VMEM((4 * cp, (th + 2) * WD), jnp.bfloat16),
                pltpu.VMEM((8 * cp, (th + 2) * WD), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(xf, h0m, f0m, bp, h0m, f0m, bp, sft)
        out.block_until_ready()
        print(f"{tag:40s} OK ({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag:40s} FAIL {type(e).__name__}: {e}"[:200], flush=True)


try_variant(False, False, False)
try_variant(True, False, False)
try_variant(False, True, False)
try_variant(False, True, True)
try_variant(True, True, True)
print("DONE", flush=True)
