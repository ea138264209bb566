"""Zero-convert W8A8 v5 decode E2E on hardware: policy sweep + quality.

Round-5 VERDICT task 2: the zero-convert int8 chain (inter-stage int8
tensors, epilogue quantisation, int8-source K-buf builds) is wired into
build_fast_decode_v5; the round-4 decomposition priced it at ~21 ms/frame
(~47 fps) vs the 29.9 ms of the shipped W8A8 mode.  This probe times the
tile policies at the UVG-1080p bench shape on the real chip and checks
quality vs the bf16 production pipeline.

Run from /root/repo with the default env (axon TPU), chip free:
  python -c "exec(open('tools/r5_zc_probe.py').read())"
"""

import math
import os
import time

import jax
import jax.numpy as jnp
from jax import lax

print("devices:", jax.devices(), flush=True)

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BNT_BENCH_CACHE", "/tmp/bnt_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import bench as _bench

cfg, model, params, embed = _bench._build()
print("model built", flush=True)

from boosting_nerv_tpu.runtime.fast_decode import (build_fast_decode_v5,
                                                   calibrate_planar_bounds)

calib = [(embed, jnp.asarray([tv], jnp.float32))
         for tv in (0.01, 0.25, 0.5, 0.75, 1.0)]
t0 = time.perf_counter()
bounds = calibrate_planar_bounds(cfg, params, calib, margin=1.05)
print(f"calibrated ({time.perf_counter()-t0:.0f}s)", flush=True)

N = 20


def fps_of(dec):
    @jax.jit
    def run(embed, ts):
        def body(c, tt):
            out = dec(embed, tt[None])
            return c + out.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, 0.0, ts)
        return acc

    ts = jnp.linspace(0.01, 1.0, N)
    t0 = time.perf_counter()
    float(run(embed, ts))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(embed, ts))
        best = min(best, time.perf_counter() - t0)
    return N / best, comp


dec_bf = build_fast_decode_v5(cfg, params, planar_from_h=200,
                              th={270: 16, "A540": 12, "B540": 12},
                              nck={"A540": 3, "B540": 3})
fps_bf, comp = fps_of(dec_bf)
print(f"{'bf16 production':28s} {fps_bf:6.2f} fps  (compile {comp:.0f}s)",
      flush=True)
ref = jax.device_get(dec_bf(embed, jnp.asarray([0.37]))).astype("float32")

POLICIES = [
    ("zc th540_12", {270: 16, 540: 12}),
    ("zc th540_16", {270: 16, 540: 16}),
    ("zc th540_12 270_24", {270: 24, 540: 12}),
    ("zc th540_16 270_24", {270: 24, 540: 16}),
    # round-5b: taller tiles (AOT-feasibility first, tools/aot_compile
    # _check.py) and the cp32 whole-tail-i8 mode (env-gated)
    ("zc th540_20 270_24", {270: 24, 540: 20}),
    ("zc th540_16 270_32", {270: 32, 540: 16}),
    ("zc th540_16 270_24 135_16", {135: 16, 270: 24, 540: 16}),
    ("cp32 th540_16 270_24", {270: 24, 540: 16}),
    ("cp32 th540_12 270_24", {270: 24, 540: 12}),
    ("cp32 th540_16 270_24 135_16", {135: 16, 270: 24, 540: 16}),
]
only = os.environ.get("BNT_ZC_ONLY")
if only:
    POLICIES = [(t, p) for t, p in POLICIES
                if any(s in t for s in only.split(","))]

for tag, th in POLICIES:
    os.environ["BNT_I8_CP32"] = "1" if tag.startswith("cp32") else "0"
    try:
        dec = build_fast_decode_v5(cfg, params, planar_from_h=200, th=th,
                                   w8a8_bounds=bounds)
        fps, comp = fps_of(dec)
        out = jax.device_get(dec(embed, jnp.asarray([0.37])))
        mse = float(((out.astype("float32") - ref) ** 2).mean())
        err = float(abs(out.astype("float32") - ref).max())
        psnr = 99.0 if mse <= 1e-12 else -10.0 * math.log10(mse)
        print(f"{tag:28s} {fps:6.2f} fps  (compile {comp:.0f}s)  "
              f"psnr_vs_bf16 {psnr:5.1f} dB  maxerr {err:.4f}  "
              f"i8 {dec.w8a8_stages} zc {dec.w8a8_zc}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{tag:28s} FAIL {type(e).__name__}: {msg}", flush=True)
