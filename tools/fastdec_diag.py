"""Segment timing for the fast-decode path: where did the 124 ms go?"""

import time

import jax
import jax.numpy as jnp
from jax import lax

print("devices:", jax.devices(), flush=True)
from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode

cfg = BoostConfig(model="HNeRV_Boost", embed="pe_1.25_80",
                  enc_strds=[5, 3, 2, 2, 2], enc_dim="64_16",
                  dec_strds=[5, 3, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
                  ks="0_1_5", reduce=1.2, lower_width=12, modelsize=2.8,
                  conv_type=["convnext", "pshuffel_3x3"], act="sin",
                  norm="none", sft_block="res_sft", ch_t=32,
                  crop_list="1080_1920")
cfg = resolve_sizes(cfg, 1920 * 1080, 120)
model = build_model(cfg)
img = jnp.zeros((1, 1080, 1920, 3), jnp.float32)
t = jnp.asarray([0.5], jnp.float32)
params = model.init(jax.random.key(0), img, t)
embed = jax.jit(lambda p, i: model.apply(p, i, method="encode"))(params, img)

REPS = 10


def bench(name, fn):
    @jax.jit
    def run(embed, ts):
        def body(c, tt):
            o = fn(embed, tt[None])
            return c + o.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, 0.0, ts)
        return acc

    ts = jnp.linspace(0.01, 1.0, REPS)
    float(run(embed, ts))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(embed, ts))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best / REPS * 1e3:8.2f} ms/frame", flush=True)


# pure-XLA manual rebuild (no pallas tail)
xla_rebuild = build_fast_decode(cfg, params, pallas_from_h=10 ** 9)
bench("manual XLA rebuild (bf16)", xla_rebuild)

# transpose cost at 1080p x51
x51 = jnp.zeros((1, 1080, 1920, 51), jnp.bfloat16)


def tp_only(embed, tt):
    y = (x51 + tt[0].astype(jnp.bfloat16))[0].transpose(2, 0, 1)
    return y.transpose(1, 2, 0)


bench("NHWC<->CHW roundtrip @1080p x51", tp_only)
print("DONE", flush=True)
