"""W8A8 serving quality on TRAINED weights (VERDICT r4 task 8 + advisor
round-4 #4).

The bench gates W8A8 on an untrained random init — the easy case.  This
evaluates a trained checkpoint through the int8 serving path with the
calibration/verify split the advisor asked for: calibrate on the EVEN
frames' (embed, t), verify on the ODD frames — every verified frame is
outside the calibration set, exactly where the 1.05 margin and
dead-channel zeroing could clip.

Reports, over the verify frames: fp32-serving PSNR vs GT, W8A8 PSNR vs
GT, W8A8-vs-bf16 PSNR, and the worst per-frame deltas.  North-star
parity bar: W8A8 PSNR drop vs bf16 serving <= 0.05 dB (BASELINE.json).

Run on the TPU from /root/repo with the chip free:
  python -c "exec(open('tools/r5_w8a8_trained_eval.py').read())"
Env: BNT_EVAL_CKPT (default output/r5_1080p/synth1080/Size2.8)
"""

import dataclasses
import math
import os

import numpy as np

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("BNT_BENCH_CACHE", "/tmp/bnt_xla_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import yaml

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.data import VideoData
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime.fast_decode import build_serving_decode
from boosting_nerv_tpu.training.checkpoint import load_checkpoint

run_dir = os.environ.get("BNT_EVAL_CKPT", "output/r5_1080p/synth1080/Size2.8")
with open(os.path.join(run_dir, "args.yaml")) as f:
    raw = yaml.safe_load(f)
fields = {f.name for f in dataclasses.fields(BoostConfig)}
cfg = BoostConfig(**{k: v for k, v in raw.items() if k in fields})
ck = load_checkpoint(os.path.join(run_dir, "model_latest.ckpt"))
print(f"ckpt epoch {ck['epoch']}", flush=True)

model = build_model(cfg)
params = ck["params"]

h, w = (int(x) for x in cfg.crop_list.split("_"))
video = VideoData.from_dir(cfg.data_path, cfg.crop_list)
n = video.n
print(f"{n} frames {h}x{w}", flush=True)

encode = jax.jit(lambda p, i: model.apply(p, i, method="encode"))


def frame(i):
    b = video.get_batch([i])
    img = jnp.asarray(b["img"])
    return img, encode(params, img), jnp.asarray(b["norm_idx"])


cal_idx = list(range(0, n, 2))
ver_idx = list(range(1, n, 2))

calib = []
for i in cal_idx:
    _, e, t = frame(i)
    calib.append((e, t))
print(f"calibration set: {len(calib)} even frames", flush=True)

dec_bf = build_serving_decode(cfg, params)
dec_i8 = build_serving_decode(cfg, params, w8a8_calib=calib)
print(f"i8 stages {getattr(dec_i8, 'w8a8_stages', [])} "
      f"zc {getattr(dec_i8, 'w8a8_zc', [])}", flush=True)


def psnr(a, b):
    mse = float(((a - b) ** 2).mean())
    return 99.0 if mse <= 1e-12 else -10.0 * math.log10(mse)


rows = []
for i in ver_idx:
    img, e, t = frame(i)
    gt = np.asarray(img, np.float32)
    a = np.asarray(jax.device_get(dec_bf(e, t)), np.float32)
    b = np.asarray(jax.device_get(dec_i8(e, t)), np.float32)
    rows.append((i, psnr(a, gt), psnr(b, gt), psnr(b, a)))
    print(f"frame {i:3d}  bf16 {rows[-1][1]:6.2f}  i8 {rows[-1][2]:6.2f} "
          f" i8-vs-bf16 {rows[-1][3]:6.2f} dB", flush=True)

bf = np.array([r[1] for r in rows])
i8 = np.array([r[2] for r in rows])
xd = np.array([r[3] for r in rows])
print(f"\nverify frames: {len(rows)} (odd, outside calibration)")
print(f"bf16 serving PSNR  mean {bf.mean():.3f}  min {bf.min():.3f} dB")
print(f"W8A8 serving PSNR  mean {i8.mean():.3f}  min {i8.min():.3f} dB")
print(f"W8A8 drop vs bf16  mean {(bf - i8).mean():.4f} "
      f" worst {(bf - i8).max():.4f} dB (bar: <= 0.05)")
print(f"W8A8-vs-bf16 agreement  mean {xd.mean():.2f}  min {xd.min():.2f} dB")
