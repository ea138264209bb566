"""Planar dot-ceiling probes round 2: epilogue cost, acc strategies, int8.
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/planar_diag2.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boosting_nerv_tpu.ops.pallas.tile_conv import _sin_poly

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def timeit(fn, x, *args, tag="", n=30):
    @jax.jit
    def run(x, *a):
        def body(c, _):
            out = fn(x + (c * jnp.ones((), x.dtype) * 0), *a)  # carry dep
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


def mk(body, scratch, wh=wh_, wf=wf_):
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
    return lambda x: jax.jit(call)(x, wh, wf)


# a: dots + bias + SIN epilogue (vs 3.22 bare) — epilogue cost
def k_sin(x_hbm, wh, wf, out_ref, kbuf):
    for py, off in ((0, 0), (1, WD)):
        a = lax.dot(wh[py], kbuf[pl.ds((1 - py) * 256, 256),
                                 pl.ds(off, NOUT)],
                    preferred_element_type=jnp.float32)
        a = a + lax.dot(wf[py], kbuf[:, pl.ds(WD, NOUT)],
                        preferred_element_type=jnp.float32)
        out_ref[pl.ds(py * 128, 128), :] = _sin_poly(a + 0.1).astype(
            jnp.bfloat16)


timeit(mk(k_sin, [pltpu.VMEM((512, LAN_IN), jnp.bfloat16)]),
       xh, tag="dots + sin epilogue")


# b: N-chunked dots + sin (acc chunks stay small)
def mk_chunk(nc):
    def k(x_hbm, wh, wf, out_ref, kbuf):
        for py, off in ((0, 0), (1, WD)):
            for c0 in range(0, NOUT, nc):
                a = lax.dot(
                    wh[py], kbuf[pl.ds((1 - py) * 256, 256),
                                 pl.ds(off + c0, nc)],
                    preferred_element_type=jnp.float32)
                a = a + lax.dot(wf[py], kbuf[:, pl.ds(WD + c0, nc)],
                                preferred_element_type=jnp.float32)
                out_ref[pl.ds(py * 128, 128), pl.ds(c0, nc)] = _sin_poly(
                    a + 0.1).astype(jnp.bfloat16)
    return k


for nc in (2048, 4096):
    timeit(mk(mk_chunk(nc), [pltpu.VMEM((512, LAN_IN), jnp.bfloat16)]),
           xh, tag=f"chunked dots + sin  nc={nc}")


# c: single K=768 dot per py (pre-stacked rhs, stack cost excluded)
w768 = jnp.asarray(rng.normal(size=(2, 128, 768)).astype(np.float32) * .05
                   ).astype(jnp.bfloat16)


def k_one(x_hbm, wh, wf, out_ref, kbuf):
    for py in (0, 1):
        a = lax.dot(wf[py], kbuf[:, pl.ds(WD, NOUT)],
                    preferred_element_type=jnp.float32)
        out_ref[pl.ds(py * 128, 128), :] = _sin_poly(a + 0.1).astype(
            jnp.bfloat16)


timeit(mk(k_one, [pltpu.VMEM((768, LAN_IN), jnp.bfloat16)],
          wf=w768), xh, tag="single K=768 dot + sin")


# d: int8 ceiling — same shapes, int8 lhs/rhs, int32 acc
wi8 = jnp.asarray(
    rng.integers(-127, 127, size=(2, 128, 768)), jnp.int8)


def k_int8(x_hbm, wh, wf, out_ref, kbuf):
    for py in (0, 1):
        a = lax.dot(wf[py], kbuf[:, pl.ds(WD, NOUT)],
                    preferred_element_type=jnp.int32)
        out_ref[pl.ds(py * 128, 128), :] = _sin_poly(
            a.astype(jnp.float32) * 1e-4).astype(jnp.bfloat16)


def call_i8(x):
    def inner(x, wh, wf):
        return pl.pallas_call(
            k_int8,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, NOUT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 540 * WD), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((768, LAN_IN), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(x, wh, wf)
    return jax.jit(inner)(x, wi8, wi8)


timeit(call_i8, xh, tag="single K=768 int8 dot + sin")


# e: bf16 f32-acc dot at dy3 fine-grid shapes for comparison:
#    3 dots (64, 192)@(192, 16384)
wdy = jnp.asarray(rng.normal(size=(3, 64, 192)).astype(np.float32) * .05
                  ).astype(jnp.bfloat16)


def k_dy3(x_hbm, wh, wf, out_ref, kbuf):
    acc = jnp.zeros((64, 2 * NOUT), jnp.float32)
    for dy in range(3):
        acc = acc + lax.dot(wf[dy], kbuf[:, pl.ds(dy * 2 * WD, 2 * NOUT)],
                            preferred_element_type=jnp.float32)
    o = _sin_poly(acc + 0.1).astype(jnp.bfloat16)
    out_ref[pl.ds(0, 64), pl.ds(0, NOUT)] = lax.slice_in_dim(
        o, 0, NOUT, axis=1)
    out_ref[pl.ds(64, 64), pl.ds(0, NOUT)] = lax.slice_in_dim(
        o, NOUT, 2 * NOUT, axis=1)


def call_dy3(x):
    def inner(x, wh, wf):
        return pl.pallas_call(
            k_dy3,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, NOUT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 540 * WD), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((192, (TH + 2) * 2 * WD),
                                       jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(x, wh, wf)
    return jax.jit(inner)(x, wdy, wdy)


timeit(call_dy3, xh, tag="dy3-shape dots (64x192xK) + sin")

print("DONE", flush=True)
