"""W8A8 v5 decode on hardware, part 2: the taller-tile int8 policies.

tools/r4_i8_e2e_probe.py measured i8 th540_8 at 31.50 fps (vs 32.36
bf16 production) before the session died; the VMEM headroom the int8
K-buffers free is only cashed by TALLER 540-grid tiles.  This measures
th540_12 and th540_16 (un-chunked — planar.py forces nck=0 on i8
stages) and reports fps + quality vs the bf16 production pipeline.

Also warms the persistent XLA cache (bench._enable_compile_cache) so
the driver's end-of-round bench.py run skips the 1080p compiles.

Run from /root/repo with the default env (axon TPU), chip free:
  python -c "exec(open('tools/r4_i8_probe2.py').read())"
"""

import math
import time

import jax
import jax.numpy as jnp
from jax import lax

import bench as _bench

_bench._enable_compile_cache()

print("devices:", jax.devices(), flush=True)

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
    ("i8 th540_12", {270: 16, 540: 12}),
    ("i8 th540_16", {270: 16, 540: 16}),
]
for tag, th in POLICIES:
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
              f"i8 stages {dec.w8a8_stages}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{tag:28s} FAIL {type(e).__name__}: {msg}", flush=True)

print("PROBE2 DONE", flush=True)
