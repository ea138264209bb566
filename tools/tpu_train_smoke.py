"""End-to-end trainer smoke on the real TPU: overfit a synthetic 360x640
video with NeRV-Boost, then run the full eval (PTQ + Huffman + fps).
Run from repo root: python -c "exec(open('tools/tpu_train_smoke.py').read())"
"""

import tempfile

import jax

print("devices:", jax.devices(), flush=True)

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger

outf = tempfile.mkdtemp(prefix="tpu_smoke_")
cfg = BoostConfig(
    model="NeRV_Boost", embed="pe_1.25_40", fc_hw="9_16", fc_dim=48,
    dec_strds=[5, 2, 2, 2], dec_blks=[1, 1, 1, 1], ks="0_1_5",
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=16, reduce=1.2, lower_width=12,
    epochs=30, batchSize=2, lr=3e-3, loss="Fusion10_freq",
    eval_freq=1000, outf=outf, not_resume=True, optim_type="Adan",
    print_freq=100)

frames = synthetic_video(8, 360, 640, seed=3)
video = VideoData(frames)
tr = RegressionTrainer(cfg, video=video, logger=RunLogger(outf, enable_tb=False))
tr.train()
res = tr.evaluate(huffman_coding=True)
print("FINAL pred_seen_psnr:", res["pred_seen_psnr"], flush=True)
print("FINAL quant_seen_psnr:", res["quant_seen_psnr"], flush=True)
print("bits/param:", tr.bits_per_param, "bpp:", tr.total_bpp,
      "fps:", tr.fps, flush=True)
assert res["pred_seen_psnr"] > 20, "TPU overfit failed"
print("TPU_SMOKE_OK", flush=True)
