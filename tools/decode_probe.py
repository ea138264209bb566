import time, sys
import jax, jax.numpy as jnp
from jax import lax
print("devices:", jax.devices(), flush=True)
from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model

N = int(sys.argv[1]) if len(sys.argv) > 1 else 8
cfg = BoostConfig(model="HNeRV_Boost", embed="pe_1.25_80", enc_strds=[5,3,2,2,2],
    enc_dim="64_16", dec_strds=[5,3,2,2,2], dec_blks=[1,1,2,2,2], ks="0_1_5",
    reduce=1.2, lower_width=12, modelsize=2.8, conv_type=["convnext","pshuffel_3x3"],
    act="sin", norm="none", sft_block="res_sft", ch_t=32, crop_list="1080_1920")
cfg = resolve_sizes(cfg, 1920*1080, 120)
model = build_model(cfg)
img = jnp.zeros((1,1080,1920,3), jnp.float32)
t = jnp.asarray([0.5], jnp.float32)
params = model.init(jax.random.key(0), img, t)
embed = jax.jit(lambda p,i: model.apply(p,i,method="encode"))(params, img)

@jax.jit
def decode_n(params, embed, ts):
    def body(c, tt):
        out = model.apply(params, embed, tt[None], method="decode")
        return c + out.mean(), None
    acc, _ = lax.scan(body, 0.0, ts)
    return acc

ts = jnp.linspace(0.01, 1.0, N)
t0 = time.perf_counter(); v = float(decode_n(params, embed, ts))
print(f"N={N} compile+run {time.perf_counter()-t0:.1f}s v={v:.3f}", flush=True)
for k in range(4):
    t0 = time.perf_counter(); v = float(decode_n(params, embed, ts))
    dt = time.perf_counter() - t0
    print(f"N={N} trial{k}: {dt*1e3:.1f} ms total -> {dt/N*1e3:.2f} ms/frame ({N/dt:.1f} fps)", flush=True)
print("DONE", flush=True)
