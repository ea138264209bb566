"""Round-1 closing measurements on TPU:
 1. bunny-720p HNeRV-Boost decode fps (flax vs runtime rebuild)
 2. 720p train-step time (Fusion10_freq) at precision highest vs high
 3. short HNeRV-Boost convergence check on hardware
"""

import tempfile
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("devices:", jax.devices(), flush=True)

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger

cfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_80", enc_strds=[5, 2, 2, 2, 2],
    enc_dim="64_16", dec_strds=[5, 2, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    ks="0_1_5", reduce=1.2, lower_width=12, modelsize=1.275,
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=32, crop_list="720_1280",
    loss="Fusion10_freq", lr=3e-3)
cfg = resolve_sizes(cfg, 720 * 1280, 132)
print("bunny720p fc_dim", cfg.fc_dim, flush=True)

model = build_model(cfg)
img = jnp.zeros((1, 720, 1280, 3), jnp.float32)
t = jnp.asarray([0.5], jnp.float32)
params = model.init(jax.random.key(0), img, t)
embed = jax.jit(lambda p, i: model.apply(p, i, method="encode"))(params, img)

REPS = 20


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
    per = best / REPS * 1e3
    print(f"{name:28s} {per:8.2f} ms/frame ({1e3 / per:.1f} fps)", flush=True)


bench("bunny720 flax decode",
      lambda e, tt: model.apply(params, e, tt, method="decode"))
fast = build_fast_decode(cfg, params)
bench("bunny720 rebuild decode", fast)

# --- train-step timing at 720p ------------------------------------------ #
frames = synthetic_video(8, 720, 1280, seed=5)
for prec in ("highest", "high"):
    outf = tempfile.mkdtemp(prefix=f"t720_{prec}_")
    tcfg = cfg.replace(outf=outf, epochs=1, batchSize=1, eval_freq=1000,
                       not_resume=True, train_precision=prec, print_freq=1000)
    video = VideoData(frames)
    tr = RegressionTrainer(tcfg, video=video,
                           logger=RunLogger(outf, enable_tb=False))
    batch = video.get_batch([0])
    im, tt = tr._device_batch(batch)
    # warm/compile
    tr.params, tr.opt_state, lv, ps = tr.train_step(
        tr.params, tr.opt_state, im, tt, jnp.float32(1e-3))
    float(lv)
    times = []
    for k in range(8):
        t0 = time.perf_counter()
        tr.params, tr.opt_state, lv, ps = tr.train_step(
            tr.params, tr.opt_state, im, tt, jnp.float32(1e-3))
        float(lv)
        times.append(time.perf_counter() - t0)
    print(f"720p train step ({prec}): {np.median(times) * 1e3:.0f} ms",
          flush=True)

# --- HNeRV-Boost convergence on hardware -------------------------------- #
frames_s = synthetic_video(8, 360, 640, seed=7)
outf = tempfile.mkdtemp(prefix="hboost_conv_")
scfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_40", enc_strds=[5, 2, 2, 2],
    enc_dim="32_8", dec_strds=[5, 2, 2, 2], dec_blks=[1, 1, 1, 1],
    ks="0_1_5", reduce=1.2, lower_width=12, fc_dim=48,
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=16, crop_list="360_640",
    loss="Fusion10_freq", lr=3e-3, epochs=12, batchSize=2,
    eval_freq=1000, outf=outf, not_resume=True, print_freq=1000)
video = VideoData(frames_s)
tr = RegressionTrainer(scfg, video=video,
                       logger=RunLogger(outf, enable_tb=False))
from boosting_nerv_tpu.training.schedules import lr_multiplier

n_b = max(len(tr.train_ind) // scfg.batchSize, 1)
psnrs = []
for epoch in range(scfg.epochs):
    acc = []
    for i, batch in enumerate(video.epoch_batches(
            tr.train_ind, scfg.batchSize, True, scfg.manualSeed + epoch)):
        lr_now = scfg.lr * lr_multiplier(
            scfg.lr_type, (epoch + i / n_b) / scfg.epochs)
        im, tt = tr._device_batch(batch)
        tr.params, tr.opt_state, lv, ps = tr.train_step(
            tr.params, tr.opt_state, im, tt, jnp.float32(lr_now))
        acc.append(np.asarray(ps))
    psnrs.append(float(np.concatenate(acc).mean()))
print("HNeRV_Boost psnr by epoch:",
      " ".join(f"{v:.1f}" for v in psnrs), flush=True)
print("DONE", flush=True)
