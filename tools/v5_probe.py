"""TPU probe: v5 fused-planar decode vs v3, UVG-1080p config.
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/v5_probe.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices(), flush=True)

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime.fast_decode import (build_fast_decode_v3,
                                                   build_fast_decode_v5)

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
print("built", flush=True)


def timed_decode(decode_fn, n=20, tag=""):
    @jax.jit
    def decode_n(embed, ts):
        def body(c, tt):
            out = decode_fn(embed + c * 1e-12, tt[None])
            return c + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, 0.0, ts)
        return acc

    ts = jnp.linspace(0.01, 1.0, n)
    try:
        t0 = time.perf_counter()
        v = float(decode_n(embed, ts))
        print(f"  [{tag}] compile {time.perf_counter()-t0:.0f}s "
              f"acc={v:.4f}", flush=True)
    except Exception as e:
        print(f"  [{tag}] FAILED {type(e).__name__}: {e}"[:300], flush=True)
        return
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(decode_n(embed, ts))
        best = min(best, time.perf_counter() - t0)
    print(f"  [{tag}] {best/n*1e3:.2f} ms/frame ({n/best:.2f} fps)",
          flush=True)


# correctness spot-check vs flax decode (bf16 tolerance)
ref = jax.jit(lambda p, e, t: model.apply(p, e, t, method="decode"))(
    params, embed, t)
for pfh, th in ((200, 8), (200, 16), (500, 8)):
    try:
        dec = build_fast_decode_v5(cfg, params, planar_from_h=pfh, th=th)
        out = jax.jit(dec)(embed, t)
        err = float(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max())
        print(f"v5 pfh={pfh} th={th} maxerr vs flax: {err:.4f}", flush=True)
        timed_decode(dec, tag=f"v5 pfh={pfh} th={th}")
    except Exception as e:
        print(f"v5 pfh={pfh} th={th} FAILED {type(e).__name__}: {e}"[:300],
              flush=True)

print("DONE", flush=True)
