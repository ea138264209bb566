#!/usr/bin/env python
"""Headline benchmark: HNeRV-Boost UVG-1080p decode throughput per chip.

Measures the jitted decode path (embedding -> frame; encoder excluded — the
reference's decode-FPS convention, /root/reference/model_hnerv.py:240-250)
on the UVG config (scripts/compression/hnerv_boost.sh: enc/dec strides
5 3 2 2 2, ks 0_1_5, reduce 1.2, dec_blks 1 1 2 2 2, ~3M params).

Timing method: N decode steps with distinct frame indices inside ONE
`lax.scan` under a single jit dispatch, completion forced by a scalar
readback. This is robust against the async-dispatch semantics of the
tunneled single-chip backend, where per-call block_until_ready returns at
dispatch-ack rather than completion. Fixed host overhead (RTT) is removed by
differencing two scan lengths.

Prints ONE JSON line:
  {"metric": "uvg1080p_decode_fps_per_chip", "value": N, "unit": "fps",
   "vs_baseline": N / 45.0}

vs_baseline anchors on the north-star target of 1.5x an A100-class PyTorch
reference decode. The reference publishes no decode fps and this box has no
egress, so the 30 fps A100 anchor is pinned by a documented roofline
derivation (BASELINE.md "Pinned decode-fps baseline"): eager fp32 decode of
THIS config moves 21.4 GB/frame of feature maps (61-70 fps at effective
HBM bandwidth) and costs 1 545 GFLOP/frame of convs (12.6 fps on fp32 CUDA
cores, ~65 fps on TF32 tensor cores); eager execution lands in the 30-45
fps band between those rooflines. Target = 1.5 x 30 = 45 fps;
vs_baseline >= 1.0 means the target is met.
"""

from __future__ import annotations

import json
import time

BASELINE_TARGET_FPS = 45.0  # 1.5 x assumed 30 fps A100-class reference


def _build():
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
    img = jnp.zeros((1, 1080, 1920, 3), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    params = model.init(jax.random.key(0), img, t)
    embed = jax.jit(lambda p, i: model.apply(p, i, method="encode"))(params, img)
    return cfg, model, params, embed


def _timed_scan(decode_fn, embed, n: int) -> float:
    """Seconds for n sequential decodes inside one dispatch."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def decode_n(embed, ts):
        def body(c, tt):
            out = decode_fn(embed, tt[None])
            return c + out.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, 0.0, ts)
        return acc

    ts = jnp.linspace(0.01, 1.0, n)
    float(decode_n(embed, ts))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(decode_n(embed, ts))
        best = min(best, time.perf_counter() - t0)
    return best


def _wait_for_backend(probe_timeout_s: float = 120.0,
                      deadline_s: float = 2100.0) -> bool:
    """Backend watchdog: a held or zombie TPU session makes backend init
    hang FOREVER in the main process (round-4 postmortem: the driver's
    bench produced no JSON at all).  Probe `jax.devices()` in a killable
    subprocess and retry across the ~30 min tunnel zombie-reap window
    instead of hanging.  Returns True once a probe sees the device;
    False when `deadline_s` elapses first (callers should exit nonzero
    with a message rather than hang)."""
    import os
    import subprocess
    import sys

    if os.environ.get("BNT_BENCH_NO_WATCHDOG"):
        return True
    t0 = time.perf_counter()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d = jax.devices(); "
                 "print('BNT_BACKEND_OK', d[0].platform)"],
                capture_output=True, text=True, timeout=probe_timeout_s)
            if "BNT_BACKEND_OK" in (r.stdout or ""):
                return True
            detail = (r.stderr or "").strip().splitlines()
            print(f"bench: backend probe {attempt} failed rc={r.returncode}"
                  + (f" ({detail[-1][:120]})" if detail else ""),
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"bench: backend probe {attempt} hung >"
                  f"{probe_timeout_s:.0f}s (held/zombie session?); "
                  "retrying", file=sys.stderr)
        if time.perf_counter() - t0 > deadline_s:
            return False
        time.sleep(30.0)


def _enable_compile_cache():
    """Persistent XLA compilation cache: the 1080p serving compiles cost
    minutes on this 1-core host; cache them across processes so a warm
    re-run (e.g. the driver's bench after a local validation run) skips
    straight to execution. Keyed on HLO+platform, safe on axon."""
    import os

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("BNT_BENCH_CACHE", "/tmp/bnt_xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def main():
    global _T0
    _T0 = time.perf_counter()
    if not _wait_for_backend():
        import sys
        print("bench: no TPU backend within the watchdog deadline "
              "(held or zombie session); aborting without a number",
              file=sys.stderr)
        raise SystemExit(3)

    import jax
    import jax.numpy as jnp

    _enable_compile_cache()

    cfg, model, params, embed = _build()
    # serving path (shared with the trainer's --eval_fps via
    # build_serving_decode): the fastest verified Pallas decode pipeline.
    from boosting_nerv_tpu.runtime.fast_decode import build_serving_decode

    # one 20-step scan (~1.5 s device time) vs ~0.7 ms dispatch RTT: the
    # fixed overhead is <0.1%, no differencing needed
    n = 20

    decode_bf16 = build_serving_decode(cfg, params)
    fps_bf16 = n / _timed_scan(decode_bf16, embed, n)

    # W8A8 serving mode: calibrate over frames spanning the bench t-range,
    # then verify quality against the bf16 pipeline on a held frame.
    # Headline = W8A8 only if its output tracks bf16 within the gate
    # (>= 35 dB: quantisation noise well under the model's own
    # reconstruction error on every trained config measured in
    # BASELINE.md; this bench's untrained init is the worst case).
    extra = {}
    fps = fps_bf16
    mode = "bf16"
    # soft deadline: on a cold compile cache the bf16 phase alone can eat
    # most of a driver timeout; in that case ship the bf16 headline
    # rather than risk being killed mid-W8A8 with no JSON emitted.
    # conservative default (round-4 postmortem): the driver must ALWAYS
    # get a JSON line — a warm-cache W8A8 pass costs ~2 min, a cold one
    # can eat a driver timeout, so ship the bf16 number when past budget.
    budget_s = float(__import__("os").environ.get("BNT_BENCH_BUDGET", 1200))
    if time.perf_counter() - _T0 > budget_s:
        extra = {"w8a8_skipped": f"over budget ({budget_s:.0f}s)"}
        print(json.dumps({
            "metric": "uvg1080p_decode_fps_per_chip",
            "value": round(fps, 2),
            "unit": "fps",
            "vs_baseline": round(fps / BASELINE_TARGET_FPS, 3),
            "serving_mode": mode,
            **extra,
        }))
        return
    try:
        calib = [(embed, jnp.asarray([tv], jnp.float32))
                 for tv in (0.01, 0.25, 0.5, 0.75, 1.0)]
        decode_i8 = build_serving_decode(cfg, params, w8a8_calib=calib)
        if getattr(decode_i8, "w8a8_stages", []):
            fps_i8 = n / _timed_scan(decode_i8, embed, n)
            t_hold = jnp.asarray([0.37], jnp.float32)
            a = jax.device_get(decode_bf16(embed, t_hold)).astype("float32")
            b = jax.device_get(decode_i8(embed, t_hold)).astype("float32")
            import math
            mse = float(((a - b) ** 2).mean())
            psnr = 99.0 if mse <= 1e-12 else -10.0 * math.log10(mse)
            extra = {
                "fps_bf16": round(fps_bf16, 2),
                "fps_w8a8": round(fps_i8, 2),
                "w8a8_vs_bf16_psnr_db": round(psnr, 2),
                "w8a8_stages": list(decode_i8.w8a8_stages),
            }
            if fps_i8 > fps_bf16 and psnr >= 35.0:
                fps = fps_i8
                mode = "w8a8"
    except Exception as e:  # W8A8 must never break the headline number
        extra = {"w8a8_error": f"{type(e).__name__}: {e}"[:160]}

    print(json.dumps({
        "metric": "uvg1080p_decode_fps_per_chip",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / BASELINE_TARGET_FPS, 3),
        "serving_mode": mode,
        **extra,
    }))


if __name__ == "__main__":
    main()
