"""Round-3 follow-up: tile-height sweep for the 540-grid planar kernels
(72% of the v5 frame) — th=12, and th=16 with the scoped-VMEM cap raised
117 MiB (th=16 previously missed the 112 MiB cap by 852 KiB).
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/r3_probe2.py').read())"
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


def probe_A(c_in, c, hc, wc, wd, ths):
    cp = (c + 15) // 16 * 16
    x = r(c_in, hc, wd).astype(jnp.bfloat16)
    prep = pk.prepare_upconv_rsft(r(3, 3, c_in, 4 * c), r(4 * c),
                                  r(3, 3, c, c), r(c), r(3, 3, c, c), r(c),
                                  c_in=c_in, c=c)
    sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)
    for th in ths:
        timeit(functools.partial(pk.fused_upconv_rsft, prep=prep, sft=sft,
                                 c_in=c_in, c=c, wc_real=wc, th=th),
               x, tag=f"A {c_in}->{c} @{hc}x{wd} th={th} "
                      f"vmem={pk.VMEM_LIMIT >> 20}M")


def probe_B(c, hc, wc, wd, head, ths):
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
               x, tag=f"B{'+head' if head else ''} {c} @{hc}x{wd} th={th} "
                      f"vmem={pk.VMEM_LIMIT >> 20}M")


probe_A(61, 51, 540, 960, 1024, ths=(12,))
probe_B(51, 540, 960, 1024, True, ths=(12,))
pk.VMEM_LIMIT = 117 * 1024 * 1024
probe_A(61, 51, 540, 960, 1024, ths=(16,))
probe_B(51, 540, 960, 1024, True, ths=(16,))
print("DONE", flush=True)
