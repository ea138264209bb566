"""TPU probe: ody (output-shift) vs dy3 kernels + full decode comparison.
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/tile_ody_probe.py').read())"
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


x51, wc51, bc51, wr51, br51, v51 = mk(51, 51, 1080, 1920)
for mode in ("ody", "dy3"):
    timeit(functools.partial(tc.conv_tile_v3, kernel=wc51, bias=bc51,
                             k=3, w_real=1920, mode=mode, act="sin"),
           x51, tag=f"conv51@1080[{mode}]")
    timeit(lambda v, m=mode: tc.resblock_sft_tile_v3(
        v, wr51, br51, wr51, br51, *v51, w_real=1920, mode=m),
        x51, tag=f"rsft51@1080[{mode}]")
xh, wh, bh, *_ = mk(51, 3, 1080, 1920)
for mode in ("ody", "dy3"):
    timeit(functools.partial(tc.conv_tile_v3, kernel=wh, bias=bh, k=3,
                             w_real=1920, th=24, mode=mode, act="outimg"),
           xh, tag=f"head51->3@1080[{mode}] th=24")
xu, _, _, wr61, br61, v61 = mk(61, 61, 540, 960)
for mode in ("ody", "dy3"):
    timeit(lambda v, m=mode: tc.resblock_sft_tile_v3(
        v, wr61, br61, wr61, br61, *v61, w_real=960, mode=m),
        xu, tag=f"rsft61@540[{mode}]")

# full decode with ody (upconvs auto-fall back to dy3)
from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v3

cfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_80", enc_strds=[5, 3, 2, 2, 2],
    enc_dim="64_16", dec_strds=[5, 3, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    ks="0_1_5", reduce=1.2, lower_width=12, modelsize=2.8,
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=32, crop_list="1080_1920")
cfg = resolve_sizes(cfg, final_size=1920 * 1080, full_data_length=120)
model = build_model(cfg)
img = jnp.zeros((1, 1080, 1920, 3), jnp.float32)
t = jnp.asarray([0.5], jnp.float32)
params = model.init(jax.random.key(0), img, t)
embed = jax.jit(lambda p, i: model.apply(p, i, method="encode"))(params, img)


def timed_decode(decode_fn, n=20, tag=""):
    @jax.jit
    def decode_n(embed, ts):
        def body(c, tt):
            out = decode_fn(embed + c * 1e-12, tt[None])
            return c + out.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, 0.0, ts)
        return acc

    ts = jnp.linspace(0.01, 1.0, n)
    t0 = time.perf_counter()
    float(decode_n(embed, ts))
    print(f"  [{tag}] compile+first: {time.perf_counter()-t0:.1f}s",
          flush=True)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(decode_n(embed, ts))
        best = min(best, time.perf_counter() - t0)
    print(f"  [{tag}] {best/n*1e3:.2f} ms/frame ({n/best:.2f} fps)",
          flush=True)


d = build_fast_decode_v3(cfg, params, tile_from_h=45, mode="ody")
o = jax.jit(d)(embed, t)
print("decode ody out mean", float(o.astype(jnp.float32).mean()), flush=True)
timed_decode(d, tag="v3 ody tile_from_h=45")
