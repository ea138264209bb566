"""Isolated timings of the v2 tile kernels at stage-4 shapes (61ch 1080p),
with ablations to locate the cost: full kernel / no-roll / no-dot.
Run: JAX_PLATFORMS= python -c "exec(open('tools/tile_iso_probe.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import boosting_nerv_tpu.ops.pallas.tile_conv as tc

print("devices:", jax.devices())

C, H, W = 61, 1080, 1920
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32)).astype(jnp.bfloat16)
w0 = jnp.asarray(rng.normal(size=(3, 3, C, C)).astype(np.float32) * 0.1)
b0 = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)
vecs = [jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.2)
        for _ in range(4)]


def timeit(fn, *args, tag="", n=30):
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
    best = min(
        (lambda: (lambda t: time.perf_counter() - t)(time.perf_counter()))()
        for _ in range(1))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:34s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)")
    return best / n


# 1. XLA conv3x3 NHWC reference at this shape (bf16)
def xla_conv(x):
    v = x.transpose(1, 2, 0)[None]
    y = lax.conv_general_dilated(v, w0.astype(jnp.bfloat16), (1, 1),
                                 [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[0].transpose(2, 0, 1)


timeit(xla_conv, tag="xla conv3x3 nhwc bf16")

# 2. conv_tile as-is
timeit(functools.partial(tc.conv_tile, kernel=w0, bias=b0, k=3),
       tag="conv_tile (stacked, rolls)")

# 3. resblock as-is
timeit(lambda v: tc.resblock_sft_tile(v, w0, b0, w0, b0, *vecs),
       tag="resblock_sft_tile")

# 4. ablation: no rolls (monkeypatch _slab to skip roll)
orig_slab = tc._slab


def slab_noroll(x32, rowp, colp, row_base, h_real, w_real, dy, dx, k, w, n,
                dt):
    off = dy * w
    v = lax.slice_in_dim(x32, off, off + n, axis=1)
    src_row = rowp + (row_base + dy)
    ok = (src_row >= 0) & (src_row < h_real) & (colp < w_real)
    return jnp.where(ok, v, 0.0).astype(dt)


tc._slab = slab_noroll
timeit(functools.partial(tc.conv_tile, kernel=w0, bias=b0, k=3),
       tag="conv_tile NO-ROLL (wrong)")
timeit(lambda v: tc.resblock_sft_tile(v, w0, b0, w0, b0, *vecs),
       tag="resblock NO-ROLL (wrong)")


def slab_nomask(x32, rowp, colp, row_base, h_real, w_real, dy, dx, k, w, n,
                dt):
    off = dy * w
    return lax.slice_in_dim(x32, off, off + n, axis=1).astype(dt)


tc._slab = slab_nomask
timeit(functools.partial(tc.conv_tile, kernel=w0, bias=b0, k=3),
       tag="conv_tile NO-ROLL-NO-MASK")
tc._slab = orig_slab

# 5. d2s + sin XLA interlude at stage-4 size (244ch coarse -> 61ch fine)
xc = jnp.asarray(rng.normal(size=(244, 540, 960)).astype(np.float32)
                 ).astype(jnp.bfloat16)
from boosting_nerv_tpu.runtime.fast_decode import _d2s_chw


def interlude(v):
    return jnp.sin(_d2s_chw(v, 2))


timeit(interlude, tag="xla d2s+sin 244x540x960->fine", n=30)
# pad/crop cost
timeit(lambda v: jnp.pad(v, ((0, 0), (0, 0), (0, 64)))[:, :, :1024].astype(
    jnp.bfloat16), tag="xla pad 960->1024 @244ch", n=30)
