"""MXU parallelism ceiling + rsft bisect, one process.
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/planar_diag4.py').read())"
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


def timeit(fn, x, *args, tag="", n=30, flops=None):
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
    extra = f"  {flops/ (best/n) / 1e12:6.0f} TF/s" if flops else ""
    print(f"{tag:52s} {best/n*1e3:7.2f} ms{extra}  (compile {comp:.0f}s)",
          flush=True)
    return best / n


# ---- 0: XLA big-matmul ceiling --------------------------------------- #
A = jnp.asarray(rng.normal(size=(4096, 4096)).astype(np.float32)
                ).astype(jnp.bfloat16)
B = jnp.asarray(rng.normal(size=(4096, 8192)).astype(np.float32)
                ).astype(jnp.bfloat16)
timeit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.bfloat16),
       A, B, tag="XLA 4096x4096x8192 bf16", n=30,
       flops=2 * 4096 * 4096 * 8192)

WD = 1024
TH = 8
GRID = 540 // TH
LAN_IN = (TH + 2) * WD
NOUT = TH * WD

xh = jnp.asarray(rng.normal(size=(256, (GRID * TH + 2) * WD))
                 .astype(np.float32)).astype(jnp.bfloat16)


def mk_dot(m, k, nrep=1, th=TH):
    w = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32) * .05
                    ).astype(jnp.bfloat16)
    nout = th * WD
    grid = 540 // th

    def body(x_hbm, w_ref, out_ref, kbuf):
        acc = None
        for r in range(nrep):
            a = lax.dot(w_ref[...],
                        kbuf[pl.ds(0, k), pl.ds(WD + r * 8, nout)],
                        preferred_element_type=jnp.float32)
            acc = a if acc is None else acc + a
        out_ref[...] = acc.astype(jnp.bfloat16)

    def call(x):
        def inner(x, w):
            return pl.pallas_call(
                body,
                grid=(grid,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((m, nout), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((m, 540 * WD), jnp.bfloat16),
                scratch_shapes=[pltpu.VMEM((max(k, 256), (th + 2) * WD),
                                           jnp.bfloat16)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=112 * 1024 * 1024),
            )(x, w)
        return jax.jit(inner)(x, w)

    gf = 2 * m * k * nout * grid * nrep
    timeit(call, xh, tag=f"dot M={m} K={k} th={th} nrep={nrep}", flops=gf)


mk_dot(1024, 768)
mk_dot(512, 768, th=16)
mk_dot(512, 768, th=4)
mk_dot(256, 768, nrep=2)   # two sequential dots, shared acc
mk_dot(384, 768)
mk_dot(512, 512)
mk_dot(512, 1024)

# ---- rsft bisect ------------------------------------------------------ #
print("--- rsft bisect ---", flush=True)
exec(open("tools/rsft_planar_bisect.py").read())
