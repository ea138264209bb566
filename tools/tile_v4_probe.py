"""TPU probe: dy3 (contiguous pre-shift buffer, 3 dots, zero copies) vs
stack, with TH sweep (VMEM-safe values), at the real decode-tail shapes.
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/tile_v4_probe.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import boosting_nerv_tpu.ops.pallas.tile_conv as tc

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
        print(f"{tag:46s} FAILED: {type(e).__name__}", flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:46s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)", flush=True)
    return best / n


def mk(c, co, h, wreal):
    wd = -(-wreal // 128) * 128
    x = jnp.asarray(rng.normal(size=(c, h, wd)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w0 = jnp.asarray(rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
    wr = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.1)
    br = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    vecs = [jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.2)
            for _ in range(4)]
    return x, w0, b0, wr, br, vecs


x51, wup51, bup51, wr51, br51, v51 = mk(51, 51, 1080, 1920)
for mode, th in (("dy3", 8), ("dy3", 24), ("dy3", 40), ("stack", 8)):
    timeit(functools.partial(tc.conv_tile_v3, kernel=wup51, bias=bup51,
                             k=3, w_real=1920, th=th, mode=mode, act="sin"),
           x51, tag=f"conv51@1080[{mode}] th={th}")
for mode, th in (("dy3", 8), ("dy3", 24), ("stack", 8)):
    timeit(lambda v, m=mode, t=th: tc.resblock_sft_tile_v3(
        v, wr51, br51, wr51, br51, *v51, w_real=1920, th=t, mode=m),
        x51, tag=f"rsft51@1080[{mode}] th={th}")

xh, wh, bh, *_ = mk(51, 3, 1080, 1920)
for mode, th in (("dy3", 8), ("dy3", 24), ("stack", 8)):
    timeit(functools.partial(tc.conv_tile_v3, kernel=wh, bias=bh, k=3,
                             w_real=1920, th=th, mode=mode, act="outimg"),
           xh, tag=f"head51->3@1080[{mode}] th={th}")

xu, wu, bu, wr61, br61, v61 = mk(61, 204, 540, 960)
for mode, th in (("dy3", 8), ("dy3", 20), ("stack", 8)):
    timeit(functools.partial(tc.conv_tile_v3, kernel=wu, bias=bu, k=3,
                             w_real=960, th=th, mode=mode, act="sin"),
           xu, tag=f"upconv61->204@540[{mode}] th={th}")
for mode, th in (("dy3", 8), ("dy3", 20), ("stack", 8)):
    timeit(lambda v, m=mode, t=th: tc.resblock_sft_tile_v3(
        v, wr61, br61, wr61, br61, *v61, w_real=960, th=t, mode=m),
        xu, tag=f"rsft61@540[{mode}] th={th}")
