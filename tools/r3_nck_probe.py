"""TPU timings: chunked/software-pipelined (nck>0) stage kernels vs
production (nck=0) at the UVG-1080p 540-grid shapes (72% of the v5
decode frame).  Also tries th=12/16 for nck>0 — the chunk-sized K-bufs
shrink scoped VMEM, which is what blocked taller tiles before.

Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/r3_nck_probe.py').read())"
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import boosting_nerv_tpu.ops.pallas.planar as pk
from boosting_nerv_tpu.ops.pallas.planar import _round16

rng = np.random.default_rng(0)


def r(*shape, s=0.1):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


def timeit(fn, x, tag="", n=30):
    @jax.jit
    def run(x):
        def body(cr, _):
            out = fn(x + (cr * 1e-8).astype(x.dtype))
            return cr + out.astype(jnp.float32).mean() * 1e-12, None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    try:
        t0 = time.perf_counter()
        float(run(x))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{tag:36s} FAILED: {type(e).__name__} {e}"[:180], flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:36s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return best / n


print("devices:", jax.devices(), flush=True)

# ---- B+head@540: c=51, wc_real=960 ----
c = 51
cp = _round16(c)
xb = r(4 * cp, 540, 1024).astype(jnp.bfloat16)
prep_b = pk.prepare_conv_rsft(
    r(3, 3, c, c), r(c), r(3, 3, c, c), r(c), r(3, 3, c, c), r(c),
    c=c, head_k=r(3, 3, c, 3), head_b=r(3))
sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)

for th, ncks in ((8, (0, 2, 3, 4, 6)), (12, (0, 3, 4)), (16, (0, 4))):
    for nck in ncks:
        timeit(functools.partial(pk.fused_conv_rsft, prep=prep_b, sft=sft,
                                 c=c, wc_real=960, head=True, th=th,
                                 nck=nck),
               xb, tag=f"B+head@540 th={th} nck={nck}")
for th, ncks in ((8, (1, 3, 4)), (12, (3, 4)), (16, (4,))):
    for nck in ncks:
        timeit(functools.partial(pk.fused_conv_rsft, prep=prep_b, sft=sft,
                                 c=c, wc_real=960, head=True, th=th,
                                 nck=nck, split=True),
               xb, tag=f"B+head@540 th={th} nck={nck} split")

# ---- A@540: upconv 61 -> 204 (c=51), wc_real=960 ----
ci = 61
xa = r(ci, 540, 1024).astype(jnp.bfloat16)
prep_a = pk.prepare_upconv_rsft(
    r(3, 3, ci, 4 * c), r(4 * c), r(3, 3, c, c), r(c), r(3, 3, c, c),
    r(c), c_in=ci, c=c)

for th, ncks in ((8, (0, 2, 3, 4, 6)), (12, (0, 3, 4)), (16, (0, 4))):
    for nck in ncks:
        timeit(functools.partial(pk.fused_upconv_rsft, prep=prep_a,
                                 sft=sft, c_in=ci, c=c, wc_real=960,
                                 th=th, nck=nck),
               xa, tag=f"A@540 th={th} nck={nck}")
for th, ncks in ((8, (1, 3, 4)), (12, (3, 4)), (16, (4,))):
    for nck in ncks:
        timeit(functools.partial(pk.fused_upconv_rsft, prep=prep_a,
                                 sft=sft, c_in=ci, c=c, wc_real=960,
                                 th=th, nck=nck, split=True),
               xa, tag=f"A@540 th={th} nck={nck} split")
