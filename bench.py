#!/usr/bin/env python
"""Headline benchmark: HNeRV-Boost UVG-1080p decode throughput per chip.

Measures the jitted decode path (embedding -> frame; encoder excluded, the
reference's decode-FPS convention at /root/reference/model_hnerv.py:240-250)
on the UVG compression config (scripts/compression/hnerv_boost.sh: enc/dec
strides 5 3 2 2 2, ks 0_1_5, reduce 1.2, dec_blks 1 1 2 2 2, ~3M params),
batch size 1, fp32 parameters.

Prints ONE JSON line:
  {"metric": "uvg1080p_decode_fps_per_chip", "value": N, "unit": "fps",
   "vs_baseline": N / 45.0}

vs_baseline is measured against the north-star target of 1.5x an A100-class
PyTorch reference decode (BASELINE.md): the reference publishes no decode
fps, so we anchor on 30 fps for a ~3M-param HNeRV-Boost at 1080p on A100
(HNeRV-class models decode at ~30-40 fps there; the TAT blocks add work),
giving a 45 fps target. vs_baseline >= 1.0 means the target is met.
"""

from __future__ import annotations

import json
import time

BASELINE_TARGET_FPS = 45.0  # 1.5 x assumed 30 fps A100 reference


def main():
    import jax
    import jax.numpy as jnp

    from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
    from boosting_nerv_tpu.models import build_model

    cfg = BoostConfig(
        model="HNeRV_Boost", embed="pe_1.25_80", enc_strds=[5, 3, 2, 2, 2],
        enc_dim="64_16", dec_strds=[5, 3, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
        ks="0_1_5", reduce=1.2, lower_width=12, modelsize=2.8,
        conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
        sft_block="res_sft", ch_t=32, crop_list="1080_1920")
    cfg = resolve_sizes(cfg, final_size=1920 * 1080, full_data_length=120)

    model = build_model(cfg)
    rng = jax.random.key(0)
    img = jnp.zeros((1, 1080, 1920, 3), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    params = model.init(rng, img, t)

    embed = model.apply(params, img, method="encode")

    decode = jax.jit(lambda p, e, tt: model.apply(p, e, tt, method="decode"))
    out = decode(params, embed, t)
    out.block_until_ready()

    # measured window: enough reps for a stable number, short enough for CI
    reps = 50
    t0 = time.perf_counter()
    for i in range(reps):
        out = decode(params, embed, t)
    out.block_until_ready()
    dt = time.perf_counter() - t0
    fps = reps / dt

    print(json.dumps({
        "metric": "uvg1080p_decode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_TARGET_FPS, 3),
    }))


if __name__ == "__main__":
    main()
