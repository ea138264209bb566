"""TPU probe: subpixel-planar kernels vs dy3 at the real decode-tail
shapes.  Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/planar_probe.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

import boosting_nerv_tpu.ops.pallas.tile_conv as tc
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


def mk_planar(c, hc, wc, wd):
    cp = (c + 15) // 16 * 16
    x = jnp.asarray(rng.normal(size=(4 * cp, hc, wd))
                    .astype(np.float32)).astype(jnp.bfloat16)
    # zero the pad lanes + pad channels like real tensors
    col = jnp.arange(wd)[None, None, :] < wc
    ch = (jnp.arange(4 * cp) % cp)[:, None, None] < c
    return jnp.where(col & ch, x, 0)


def vecs(c, k=4):
    return [jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.2)
            for _ in range(k)]


# ---- 1080 zone on the 540x1024 coarse grid (c=51, cp=64, G=256) ---- #
c = 51
xp = mk_planar(c, 540, 960, 1024)
wc_ = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.1)
bc = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
wh = jnp.asarray(rng.normal(size=(3, 3, c, 3)).astype(np.float32) * 0.1)
bh = jnp.asarray(rng.normal(size=(3,)).astype(np.float32) * 0.1)
v51 = vecs(c)

for th in (8, 16, 4):
    timeit(functools.partial(pk.conv_planar, kernel=wc_, bias=bc, c_in=c,
                             c_out=c, wc_real=960, act="sin", th=th),
           xp, tag=f"planar conv51@540grid sin th={th}")
for th in (8, 16, 4):
    timeit(lambda v, t=th: pk.rsft_planar(
        v, wc_, bc, wc_, bc, *v51, c=c, hc_real=540, wc_real=960, th=t),
        xp, tag=f"planar rsft51@540grid th={th}")
for th in (8, 16):
    timeit(functools.partial(pk.conv_planar, kernel=wh, bias=bh, c_in=c,
                             c_out=3, wc_real=960, act="outimg", th=th),
           xp, tag=f"planar head51->3@540grid th={th}")

# upconv 61 -> 256-planar @540 (dy3 kernel, reordered weights)
x61 = jnp.asarray(rng.normal(size=(61, 540, 1024))
                  .astype(np.float32)).astype(jnp.bfloat16)
wu = jnp.asarray(rng.normal(size=(3, 3, 61, 204)).astype(np.float32) * 0.1)
bu = jnp.asarray(rng.normal(size=(204,)).astype(np.float32) * 0.1)
wup = pk.upconv_kernel_to_planar(wu)
bup = pk._planar_bias(bu, 64)[:, 0]
for th in (8, 16):
    timeit(functools.partial(tc.conv_tile_v3, kernel=wup, bias=bup, k=3,
                             w_real=960, th=th, mode="dy3", act="sin"),
           x61, tag=f"upconv61->256planar@540 dy3 th={th}")

# ---- 540 zone on the 270x512 coarse grid (c=61, cp=64, G=256) ---- #
c2 = 61
xq = mk_planar(c2, 270, 480, 512)
w2 = jnp.asarray(rng.normal(size=(3, 3, c2, c2)).astype(np.float32) * 0.1)
b2 = jnp.asarray(rng.normal(size=(c2,)).astype(np.float32) * 0.1)
v61 = vecs(c2)
for th in (8, 16):
    timeit(functools.partial(pk.conv_planar, kernel=w2, bias=b2, c_in=c2,
                             c_out=c2, wc_real=480, act="sin", th=th),
           xq, tag=f"planar conv61@270grid sin th={th}")
    timeit(lambda v, t=th: pk.rsft_planar(
        v, w2, b2, w2, b2, *v61, c=c2, hc_real=270, wc_real=480, th=t),
        xq, tag=f"planar rsft61@270grid th={th}")

print("DONE", flush=True)
