"""TPU timings, part 2 of tools/r3_nck_probe.py (the first run was cut
at the A@540 section when its host session died): chunked (nck>0)
A-stage kernels at the UVG-1080p 540-grid shape.  B+head results from
the first run (/tmp/r3_nck_probe.log, 2026-08-18):
  th=8  nck=0 13.60 | nck=2 14.08 | nck=3 14.22 | nck=4 14.53 | nck=6 14.67
  th=12 nck=0 OOM   | nck=3 12.73 | nck=4 12.96
  th=16 all OOM; split: th=8 nck=1 13.03, nck=3 13.53, nck=4 14.12,
  th=12 nck=3 split OOM.
=> chunking pays only via the taller tile it unlocks (th=12 nck=3).

Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/r3_nck_probe2.py').read())"
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

c = 51
cp = _round16(c)
sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)

# ---- A@540: upconv 61 -> 204 (c=51), wc_real=960 ----
ci = 61
xa = r(ci, 540, 1024).astype(jnp.bfloat16)
prep_a = pk.prepare_upconv_rsft(
    r(3, 3, ci, 4 * c), r(4 * c), r(3, 3, c, c), r(c), r(3, 3, c, c),
    r(c), c_in=ci, c=c)

for th, ncks in ((8, (0, 3)), (12, (3, 4)), (16, (4,))):
    for nck in ncks:
        timeit(functools.partial(pk.fused_upconv_rsft, prep=prep_a,
                                 sft=sft, c_in=ci, c=c, wc_real=960,
                                 th=th, nck=nck),
               xa, tag=f"A@540 th={th} nck={nck}")
for th, ncks in ((8, (1, 3)), (12, (3,))):
    for nck in ncks:
        timeit(functools.partial(pk.fused_upconv_rsft, prep=prep_a,
                                 sft=sft, c_in=ci, c=c, wc_real=960,
                                 th=th, nck=nck, split=True),
               xa, tag=f"A@540 th={th} nck={nck} split")
