"""TPU probe: v3 pre-shifted tile kernels vs v2 vs XLA at decode-tail
shapes. Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/tile_v3_probe.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import boosting_nerv_tpu.ops.pallas.tile_conv as tc

print("devices:", jax.devices())

rng = np.random.default_rng(0)


def timeit(fn, x, *args, tag="", n=30):
    @jax.jit
    def run(x, *a):
        def body(c, _):
            out = fn(x + (c * 1e-8).astype(x.dtype), *a)
            return c + out.astype(jnp.float32).mean() * 1e-12, None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    t0 = time.perf_counter()
    float(run(x, *args))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:44s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)", flush=True)
    return best / n


def stage(c, co, h, wreal, tag):
    wd = -(-wreal // 128) * 128
    x = jnp.asarray(rng.normal(size=(c, h, wd)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w0 = jnp.asarray(rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.1)
    b0 = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
    wr = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.1)
    br = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
    vecs = [jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.2)
            for _ in range(4)]

    def xla_conv(v):
        y = lax.conv_general_dilated(
            v.transpose(1, 2, 0)[None], w0.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[0].transpose(2, 0, 1)

    timeit(xla_conv, x, tag=f"{tag} xla conv3x3 {c}->{co}")
    for mode in ("stack", "acc"):
        timeit(functools.partial(tc.conv_tile_v3, kernel=w0, bias=b0, k=3,
                                 w_real=wreal, mode=mode),
               x, tag=f"{tag} conv_v3[{mode}] {c}->{co}")
    timeit(functools.partial(tc.conv_tile, kernel=w0, bias=b0, k=3,
                             w_real=wreal), x, tag=f"{tag} conv_v2 {c}->{co}")
    for mode in ("stack", "acc"):
        timeit(lambda v, m=mode: tc.resblock_sft_tile_v3(
            v, wr, br, wr, br, *vecs, w_real=wreal, mode=m),
            x, tag=f"{tag} rsft_v3[{mode}] {c}ch")
    timeit(lambda v: tc.resblock_sft_tile(v, wr, br, wr, br, *vecs,
                                          w_real=wreal),
           x, tag=f"{tag} rsft_v2 {c}ch")


# stage-4 1080p shapes (fc_dim 127 plan: stage-4 in/out 61ch; upconv 61->244)
stage(61, 61, 1080, 1920, "s4")
# the stage-4 upconv runs at 540x960 61->244
stage(61, 244, 540, 960, "s4up")
# stage-3 resblocks at 540x960, 76ch (plan approx)
stage(76, 76, 540, 960, "s3")
# head 51->3 is separate; check 61->16 narrow-out at 1080p as a proxy
