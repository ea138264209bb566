"""Dissect the planar conv kernel: MXU-only ceiling, +DMA, +prologue.
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/planar_diag.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def timeit(fn, x, *args, tag="", n=30):
    @jax.jit
    def run(x, *a):
        def body(c, _):
            out = fn(x + (c * 1e-8).astype(x.dtype), *a)
            return c + out.astype(jnp.float32).mean() * 1e-12, None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    try:
        t0 = time.perf_counter()
        float(run(x, *args))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{tag:52s} FAILED: {type(e).__name__} {e}"[:180], flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:52s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return best / n


WD = 1024
TH = 8
GRID = 540 // TH
LAN_IN = (TH + 2) * WD
NOUT = TH * WD

xh = jnp.asarray(rng.normal(size=(256, (GRID * TH + 2) * WD))
                 .astype(np.float32)).astype(jnp.bfloat16)
wh_ = jnp.asarray(rng.normal(size=(2, 128, 256)).astype(np.float32) * .05
                  ).astype(jnp.bfloat16)
wf_ = jnp.asarray(rng.normal(size=(2, 128, 512)).astype(np.float32) * .05
                  ).astype(jnp.bfloat16)

FLOPS_TILE = 2 * 128 * (256 + 512) * NOUT * 2  # the 4 planar dots
print(f"per-frame dot GFLOP: {FLOPS_TILE * GRID / 1e9:.1f}", flush=True)


def mk(body, scratch):
    def call(x, wh, wf):
        return pl.pallas_call(
            body,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, NOUT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 540 * WD), jnp.bfloat16),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(x, wh, wf)
    return jax.jit(call)


def dma(x_hbm, xtile, sem, i, th=TH, lanes=LAN_IN):
    def cp_dma(step, slot):
        src = pl.multiple_of(step * th * WD, th * WD)
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
    return slot


# 1: dots only, rhs = resident VMEM scratch (uninitialised), no DMA
def k_dots(x_hbm, wh, wf, out_ref, kbuf):
    for py, off in ((0, 0), (1, WD)):
        a = lax.dot(wh[py], kbuf[pl.ds((1 - py) * 256, 256),
                                 pl.ds(off, NOUT)],
                    preferred_element_type=jnp.float32)
        a = a + lax.dot(wf[py], kbuf[:, pl.ds(WD, NOUT)],
                        preferred_element_type=jnp.float32)
        out_ref[pl.ds(py * 128, 128), :] = a.astype(jnp.bfloat16)


timeit(mk(k_dots, [pltpu.VMEM((512, LAN_IN), jnp.bfloat16)]),
       xh, wh_, wf_, tag="dots only (resident rhs)")


# 2: DMA + dots straight off the tile (no kbuf build; wf only, K=256 via
#    two half dots to keep FLOPs equal)
def k_dma_dots(x_hbm, wh, wf, out_ref, xtile, sem):
    i = pl.program_id(0)
    slot = dma(x_hbm, xtile, sem, i)
    for py, off in ((0, 0), (1, WD)):
        a = lax.dot(wh[py], xtile[slot][:, pl.ds(off, NOUT)],
                    preferred_element_type=jnp.float32)
        a = a + lax.dot(wf[py], jnp.concatenate(
            [xtile[slot][:, pl.ds(WD, NOUT)],
             xtile[slot][:, pl.ds(2 * WD, NOUT)]], axis=0),
            preferred_element_type=jnp.float32)
        out_ref[pl.ds(py * 128, 128), :] = a.astype(jnp.bfloat16)


timeit(mk(k_dma_dots, [pltpu.VMEM((2, 256, LAN_IN), jnp.bfloat16),
                       pltpu.SemaphoreType.DMA((2,))]),
       xh, wh_, wf_, tag="DMA + dots (no kbuf build)")


# 3: DMA + kbuf build + dots (the real conv_planar structure)
def k_full(x_hbm, wh, wf, out_ref, xtile, kbuf, sem):
    i = pl.program_id(0)
    slot = dma(x_hbm, xtile, sem, i)
    x32 = xtile[slot].astype(jnp.float32)
    ln = lax.broadcasted_iota(jnp.int32, (64, LAN_IN), 1)
    colp = ln & (WD - 1)
    for r1 in (0, 1):
        pin = r1 * 128
        base = r1 * 256
        kbuf[pl.ds(base, 128), :] = lax.slice_in_dim(
            x32, pin, pin + 128, axis=0).astype(jnp.bfloat16)
        p0 = lax.slice_in_dim(x32, pin, pin + 64, axis=0)
        p1 = lax.slice_in_dim(x32, pin + 64, pin + 128, axis=0)
        vm = jnp.where(colp > 0, pltpu.roll(p1, 1, axis=1), 0.0)
        vp = jnp.where(colp < 960 - 1,
                       pltpu.roll(p0, LAN_IN - 1, axis=1), 0.0)
        kbuf[pl.ds(base + 128, 64), :] = vm.astype(jnp.bfloat16)
        kbuf[pl.ds(base + 192, 64), :] = vp.astype(jnp.bfloat16)
    for py, off in ((0, 0), (1, WD)):
        a = lax.dot(wh[py], kbuf[pl.ds((1 - py) * 256, 256),
                                 pl.ds(off, NOUT)],
                    preferred_element_type=jnp.float32)
        a = a + lax.dot(wf[py], kbuf[:, pl.ds(WD, NOUT)],
                        preferred_element_type=jnp.float32)
        out_ref[pl.ds(py * 128, 128), :] = a.astype(jnp.bfloat16)


timeit(mk(k_full, [pltpu.VMEM((2, 256, LAN_IN), jnp.bfloat16),
                   pltpu.VMEM((512, LAN_IN), jnp.bfloat16),
                   pltpu.SemaphoreType.DMA((2,))]),
       xh, wh_, wf_, tag="DMA + kbuf build + dots")


# 4: kbuf build in bf16 (no f32 cast; rolls on bf16 pairs via f32 bitcast
#    is wrong numerically — this probes a no-cast variant where the roll
#    source is cast per 64-row block only)
def k_full_lazy(x_hbm, wh, wf, out_ref, xtile, kbuf, sem):
    i = pl.program_id(0)
    slot = dma(x_hbm, xtile, sem, i)
    ln = lax.broadcasted_iota(jnp.int32, (64, LAN_IN), 1)
    colp = ln & (WD - 1)
    for r1 in (0, 1):
        pin = r1 * 128
        base = r1 * 256
        kbuf[pl.ds(base, 128), :] = xtile[slot][pl.ds(pin, 128), :]
        p0 = xtile[slot][pl.ds(pin, 64), :].astype(jnp.float32)
        p1 = xtile[slot][pl.ds(pin + 64, 64), :].astype(jnp.float32)
        vm = jnp.where(colp > 0, pltpu.roll(p1, 1, axis=1), 0.0)
        vp = jnp.where(colp < 960 - 1,
                       pltpu.roll(p0, LAN_IN - 1, axis=1), 0.0)
        kbuf[pl.ds(base + 128, 64), :] = vm.astype(jnp.bfloat16)
        kbuf[pl.ds(base + 192, 64), :] = vp.astype(jnp.bfloat16)
    for py, off in ((0, 0), (1, WD)):
        a = lax.dot(wh[py], kbuf[pl.ds((1 - py) * 256, 256),
                                 pl.ds(off, NOUT)],
                    preferred_element_type=jnp.float32)
        a = a + lax.dot(wf[py], kbuf[:, pl.ds(WD, NOUT)],
                        preferred_element_type=jnp.float32)
        out_ref[pl.ds(py * 128, 128), :] = a.astype(jnp.bfloat16)


timeit(mk(k_full_lazy, [pltpu.VMEM((2, 256, LAN_IN), jnp.bfloat16),
                        pltpu.VMEM((512, LAN_IN), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,))]),
       xh, wh_, wf_, tag="DMA + bf16-copy kbuf + dots")

print("DONE", flush=True)
