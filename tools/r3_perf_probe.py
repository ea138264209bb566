"""Round-3 decode experiments at UVG-1080p shapes, in priority order:
  1. iso: dy3x2 (dual-stream) vs dy3 for rsft51@1080, conv61->204@540,
     head51->3@1080
  2. end-to-end: v5 with per-stage th policy {270:16}
  3. end-to-end: hybrid v5+v3 tail (fine_from_h=1000), dy3 vs dy3x2
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/r3_perf_probe.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)


def timeit(fn, *args, tag="", n=30):
    @jax.jit
    def run(x, *a):
        def body(c, _):
            out = fn(x + (c * 1e-8).astype(x.dtype), *a)
            return c + out.astype(jnp.float32).mean() * 1e-12, None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    try:
        t0 = time.perf_counter()
        float(run(*args))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{tag:48s} FAILED: {type(e).__name__} {e}"[:150], flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:48s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return best / n


def r(*shape, s=0.1):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


from boosting_nerv_tpu.ops.pallas.tile_conv import (conv_tile_v3,
                                                    resblock_sft_tile_v3)

# ---- 1. iso dual-stream vs single ---------------------------------- #
c = 51
x1080 = r(c, 1080, 2048).astype(jnp.bfloat16)
w0, w1 = r(3, 3, c, c), r(3, 3, c, c)
b0, b1 = r(c), r(c)
s0, h0, s1, h1 = r(c), r(c), r(c), r(c)
for mode in ("dy3", "dy3x2"):
    timeit(functools.partial(
        resblock_sft_tile_v3, w0=w0, b0=b0, w1=w1, b1=b1, scale0=s0,
        shift0=h0, scale1=s1, shift1=h1, w_real=1920, mode=mode),
        x1080, tag=f"rsft51@1080 {mode}")

x540 = r(61, 540, 1024).astype(jnp.bfloat16)
k_up = r(3, 3, 61, 204)
b_up = r(204)
for mode in ("dy3", "dy3x2"):
    timeit(functools.partial(
        conv_tile_v3, kernel=k_up, bias=b_up, k=3, w_real=960, act="sin",
        mode=mode), x540, tag=f"upconv61->204@540 {mode}")

k_head = r(3, 3, c, 3)
b_head = r(3)
for mode, th in (("dy3", 24), ("dy3x2", 24), ("dy3x2", 12)):
    timeit(functools.partial(
        conv_tile_v3, kernel=k_head, bias=b_head, k=3, w_real=1920,
        act="outimg", mode=mode, th=th),
        x1080, tag=f"head51->3@1080 {mode} th={th}")

# ---- 2+3. end-to-end decode variants ------------------------------- #
from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v5

cfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_80", enc_strds=[5, 3, 2, 2, 2],
    enc_dim="64_16", dec_strds=[5, 3, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    ks="0_1_5", reduce=1.2, lower_width=12, modelsize=2.8,
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=32, crop_list="1080_1920")
cfg = resolve_sizes(cfg, final_size=1920 * 1080, full_data_length=120)
print("fc_dim", cfg.fc_dim, flush=True)
model = build_model(cfg)
img = jnp.zeros((1, 1080, 1920, 3), jnp.float32)
t = jnp.asarray([0.5], jnp.float32)
params = model.init(jax.random.key(0), img, t)
embed = jax.jit(lambda i: model.apply(params, i, method="encode"))(img)
ref = jax.jit(
    lambda e, t: model.apply(params, e, t, method="decode"))(embed, t)


def bench_decode(tag, **kw):
    try:
        dec = build_fast_decode_v5(cfg, params, **kw)
    except ValueError as e:
        print(f"{tag:48s} builder raised: {e}", flush=True)
        return
    out = jax.jit(dec)(embed, t)
    err = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max())
    print(f"{tag:48s} maxerr {err:.4f}", flush=True)

    @jax.jit
    def run(embed, ts):
        def body(c, tt):
            out = dec(embed, tt[None])
            return c + out.astype(jnp.float32).mean() * 1e-6, None
        acc, _ = lax.scan(body, jnp.float32(0.0), ts)
        return acc

    n = 30
    ts = jnp.linspace(0.01, 1.0, n)
    t0 = time.perf_counter()
    float(run(embed, ts))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(embed, ts))
        best = min(best, time.perf_counter() - t0)
    ms = best / n * 1e3
    print(f"{tag:48s} {ms:7.2f} ms/frame ({1e3/ms:.2f} fps)", flush=True)


bench_decode("v5 th=8 (baseline)", planar_from_h=200, th=8)
bench_decode("v5 th={270:16}", planar_from_h=200, th={270: 16})
bench_decode("hybrid fine1000 th={270:16}", planar_from_h=200,
             th={270: 16}, fine_from_h=1000)
print("DONE", flush=True)
