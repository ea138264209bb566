"""Iso timings of the v5 fused stage kernels at UVG-1080p shapes.
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/v5_iso_probe.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import boosting_nerv_tpu.ops.pallas.planar as pk

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
        print(f"{tag:52s} FAILED: {type(e).__name__} {e}"[:160], flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:52s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return best / n


def r(*shape, s=0.1):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


def probe_A(c_in, c, hc, wc, wd, ths=(8, 16)):
    cp = (c + 15) // 16 * 16
    x = r(c_in, hc, wd).astype(jnp.bfloat16)
    prep = pk.prepare_upconv_rsft(r(3, 3, c_in, 4 * c), r(4 * c),
                                  r(3, 3, c, c), r(c), r(3, 3, c, c), r(c),
                                  c_in=c_in, c=c)
    sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)
    for th in ths:
        timeit(functools.partial(pk.fused_upconv_rsft, prep=prep, sft=sft,
                                 c_in=c_in, c=c, wc_real=wc, th=th),
               x, tag=f"A {c_in}->{c} @{hc}x{wd} th={th}")


def probe_B(c, hc, wc, wd, head, ths=(8, 16)):
    cp = (c + 15) // 16 * 16
    x = r(4 * cp, hc, wd).astype(jnp.bfloat16)
    prep = pk.prepare_conv_rsft(
        r(3, 3, c, c), r(c), r(3, 3, c, c), r(c), r(3, 3, c, c), r(c), c=c,
        head_k=r(3, 3, c, 3) if head else None,
        head_b=r(3) if head else None)
    sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)
    for th in ths:
        timeit(functools.partial(pk.fused_conv_rsft, prep=prep, sft=sft,
                                 c=c, wc_real=wc, head=head, th=th),
               x, tag=f"B{'+head' if head else ''} {c} @{hc}x{wd} th={th}")


probe_A(61, 51, 540, 960, 1024)          # s6
probe_B(51, 540, 960, 1024, True)        # s7 + head
probe_B(51, 540, 960, 1024, False, ths=(8,))   # s7 without head (for ref)
probe_A(73, 61, 270, 480, 512)           # s4
probe_B(61, 270, 480, 512, False)        # s5
probe_A(88, 73, 135, 240, 256)           # s2
probe_B(73, 135, 240, 256, False)        # s3

# XLA interleave cost at the 270->540 boundary
xp61 = r(256, 270, 512).astype(jnp.bfloat16)


def interleave(xp):
    fine = pk.from_planar(xp, 61)[:, :, :960]
    return jnp.pad(fine, ((0, 0), (0, 0), (0, 64)))


timeit(interleave, xp61, tag="XLA interleave planar270 -> 61@540x1024")

print("DONE", flush=True)
