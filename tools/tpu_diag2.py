"""Round-1 follow-ups on TPU: (1) does matmul precision 'high' (3-pass
bf16) converge with the FFT loss? (2) CEM compression smoke on hardware."""

import tempfile

import jax
import numpy as np

print("devices:", jax.devices(), flush=True)

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.training.compress_trainer import CompressionTrainer
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger

frames = synthetic_video(8, 360, 640, seed=3)

# --- precision 'high' convergence --------------------------------------- #
outf = tempfile.mkdtemp(prefix="diag_high_")
cfg = BoostConfig(
    model="NeRV_Boost", embed="pe_1.25_40", fc_hw="9_16", fc_dim=48,
    dec_strds=[5, 2, 2, 2], dec_blks=[1, 1, 1, 1], ks="0_1_5",
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=16, reduce=1.2, lower_width=12,
    epochs=10, batchSize=2, lr=3e-3, loss="Fusion10_freq",
    eval_freq=1000, outf=outf, not_resume=True, optim_type="Adan",
    print_freq=1000, train_precision="high")
video = VideoData(frames)
tr = RegressionTrainer(cfg, video=video, logger=RunLogger(outf, enable_tb=False))
import time

import jax.numpy as jnp

from boosting_nerv_tpu.training.schedules import lr_multiplier

n_batches = max(len(tr.train_ind) // cfg.batchSize, 1)
psnrs = []
step_t = []
for epoch in range(cfg.epochs):
    acc = []
    for i, batch in enumerate(video.epoch_batches(
            tr.train_ind, cfg.batchSize, True, cfg.manualSeed + epoch)):
        lr_now = cfg.lr * lr_multiplier(
            cfg.lr_type, (epoch + i / n_batches) / cfg.epochs)
        img, t = tr._device_batch(batch)
        t0 = time.perf_counter()
        tr.params, tr.opt_state, loss_v, psnr = tr.train_step(
            tr.params, tr.opt_state, img, t, jnp.float32(lr_now))
        float(loss_v)  # force completion for step timing
        if epoch > 0:
            step_t.append(time.perf_counter() - t0)
        acc.append(np.asarray(psnr))
    psnrs.append(float(np.concatenate(acc).mean()))
print("precision=high psnr by epoch:",
      " ".join(f"{v:.1f}" for v in psnrs), flush=True)
print(f"step time (high): {np.median(step_t) * 1e3:.1f} ms", flush=True)

# --- CEM compression smoke on hardware ---------------------------------- #
reg_outf = tempfile.mkdtemp(prefix="smoke_reg_")
reg_cfg = cfg.replace(outf=reg_outf, epochs=20, train_precision="highest")
rt = RegressionTrainer(reg_cfg, video=video,
                       logger=RunLogger(reg_outf, enable_tb=False))
rt.train()

comp_outf = tempfile.mkdtemp(prefix="smoke_comp_")
comp_cfg = cfg.replace(
    outf=comp_outf, epochs=8, lr=5e-4, lr_type="cosine_0_1_0.1",
    quant=True, quant_model_bit=8, quant_bias_bit=8,
    quantizer_w="scale", quantizer_b="scale", quantizer_e="scalebeta",
    lambda_rate=0.05, target_bit=4, train_precision="highest",
    weight=f"{reg_outf}/model_latest.ckpt")
ct = CompressionTrainer(comp_cfg, video=video,
                        logger=RunLogger(comp_outf, enable_tb=False))
ct.train()
res = ct.evaluate_cem(coding=True)
print("CEM quant_seen_psnr:", res["quant_seen_psnr"], flush=True)
print("CEM real bpp:", ct.total_bpp, "estimate:", ct.estimate_bpp, flush=True)
assert res["quant_seen_psnr"] > 15
assert ct.total_bpp > 0
print("CEM_TPU_SMOKE_OK", flush=True)
