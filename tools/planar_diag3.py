"""Dot M-scaling + merged-py planar dots.  Run from /root/repo:
  python -c "exec(open('tools/planar_diag3.py').read())"
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


def mk_msweep(m, k):
    w = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * .05
                    ).astype(jnp.bfloat16)

    def body(x_hbm, w_ref, out_ref, kbuf):
        a = lax.dot(w_ref[...], kbuf[:, pl.ds(WD, NOUT)],
                    preferred_element_type=jnp.float32)
        out_ref[...] = a.astype(jnp.bfloat16)

    def call(x):
        def inner(x, w):
            return pl.pallas_call(
                body,
                grid=(GRID,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((m, NOUT), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, 540 * WD), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((k, LAN_IN), jnp.bfloat16)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024),
            )(x, w)
        return jax.jit(inner)(x, w)

    gf = 2 * m * k * NOUT * GRID / 1e9
    t = timeit(call, xh, tag=f"pure dot M={m} K={k} ({gf:.0f} GF/frame)")
    if t:
        print(f"    -> {gf / t / 1e3:.0f} TF/s", flush=True)


for m in (64, 128, 256, 512):
    mk_msweep(m, 768)
mk_msweep(256, 512)
mk_msweep(512, 256)

# merged-py planar conv: one (256,512) full dot + two (128,256) half dots
wf2 = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32) * .05
                  ).astype(jnp.bfloat16)
wh2 = jnp.asarray(rng.normal(size=(2, 128, 256)).astype(np.float32) * .05
                  ).astype(jnp.bfloat16)


def k_merged(x_hbm, wf_ref, wh_ref, out_ref, kbuf):
    a = lax.dot(wf_ref[...], kbuf[:, pl.ds(WD, NOUT)],
                preferred_element_type=jnp.float32)
    h0 = lax.dot(wh_ref[0], kbuf[pl.ds(256, 256), pl.ds(0, NOUT)],
                 preferred_element_type=jnp.float32)
    h1 = lax.dot(wh_ref[1], kbuf[pl.ds(0, 256), pl.ds(2 * WD, NOUT)],
                 preferred_element_type=jnp.float32)
    out_ref[pl.ds(0, 128), :] = _sin_poly(
        lax.slice_in_dim(a, 0, 128, axis=0) + h0 + 0.1).astype(jnp.bfloat16)
    out_ref[pl.ds(128, 128), :] = _sin_poly(
        lax.slice_in_dim(a, 128, 256, axis=0) + h1 + 0.1).astype(
            jnp.bfloat16)


def call_merged(x):
    def inner(x, wf, wh):
        return pl.pallas_call(
            k_merged,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((256, NOUT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((256, 540 * WD), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((512, LAN_IN), jnp.bfloat16)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
        )(x, wf, wh)
    return jax.jit(inner)(x, wf2, wh2)


timeit(call_merged, xh, tag="merged-py planar dots + sin (216GF)")

print("DONE", flush=True)
