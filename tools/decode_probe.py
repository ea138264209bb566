"""Decode-throughput probe for the flagship HNeRV-Boost UVG-1080p config.

Usage: python -c "import sys; sys.argv=['p','<N>','<dtype>','<batch>'];
exec(open('tools/decode_probe.py').read())"   (run from the repo root; the
axon plugin breaks if PYTHONPATH is set, so rely on cwd for imports)

Times N decode steps inside one lax.scan dispatch with scalar readback —
robust to the tunneled backend's dispatch-ack block_until_ready.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "float32"
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 1

print("devices:", jax.devices(), "dtype:", DTYPE, "batch:", BATCH, flush=True)
from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model

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
t0_ = jnp.asarray([0.5], jnp.float32)
params = model.init(jax.random.key(0), img, t0_)
embed = jax.jit(lambda p, i: model.apply(p, i, method="encode"))(params, img)

if DTYPE == "bfloat16":
    cast = lambda x: x.astype(jnp.bfloat16)
    params = jax.tree_util.tree_map(cast, params)
    embed = cast(embed)
if BATCH > 1:
    embed = jnp.tile(embed, (BATCH, 1, 1, 1))


@jax.jit
def decode_n(params, embed, ts):
    def body(c, tt):
        out = model.apply(params, embed, jnp.full((BATCH,), tt),
                          method="decode")
        return c + out.astype(jnp.float32).mean(), None
    acc, _ = lax.scan(body, 0.0, ts)
    return acc


ts = jnp.linspace(0.01, 1.0, N)
t0 = time.perf_counter()
v = float(decode_n(params, embed, ts))
print(f"N={N} compile+run {time.perf_counter() - t0:.1f}s v={v:.3f}", flush=True)
for k in range(4):
    t0 = time.perf_counter()
    v = float(decode_n(params, embed, ts))
    dt = time.perf_counter() - t0
    frames = N * BATCH
    print(f"N={N} trial{k}: {dt * 1e3:.1f} ms -> {dt / frames * 1e3:.2f} "
          f"ms/frame ({frames / dt:.1f} fps)", flush=True)
print("DONE", flush=True)
