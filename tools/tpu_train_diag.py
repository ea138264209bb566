"""TPU training-quality diagnosis: loss type x matmul precision x lr."""

import tempfile

import jax

print("devices:", jax.devices(), flush=True)

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger

frames = synthetic_video(8, 360, 640, seed=3)


def run(tag, loss, lr, precision, epochs=10):
    jax.config.update("jax_default_matmul_precision", precision)
    outf = tempfile.mkdtemp(prefix=f"diag_{tag}_")
    cfg = BoostConfig(
        model="NeRV_Boost", embed="pe_1.25_40", fc_hw="9_16", fc_dim=48,
        dec_strds=[5, 2, 2, 2], dec_blks=[1, 1, 1, 1], ks="0_1_5",
        conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
        sft_block="res_sft", ch_t=16, reduce=1.2, lower_width=12,
        epochs=epochs, batchSize=2, lr=lr, loss=loss,
        eval_freq=1000, outf=outf, not_resume=True, optim_type="Adan",
        print_freq=1000)
    video = VideoData(frames)
    tr = RegressionTrainer(cfg, video=video,
                           logger=RunLogger(outf, enable_tb=False))
    import numpy as np

    psnrs = []
    n_batches = max(len(tr.train_ind) // cfg.batchSize, 1)
    import jax.numpy as jnp

    for epoch in range(cfg.epochs):
        acc = []
        for i, batch in enumerate(tr.video.epoch_batches(
                tr.train_ind, cfg.batchSize, True, cfg.manualSeed + epoch)):
            from boosting_nerv_tpu.training.schedules import lr_multiplier

            progress = (epoch + i / n_batches) / cfg.epochs
            lr_now = cfg.lr * lr_multiplier(cfg.lr_type, progress)
            img, t = tr._device_batch(batch)
            tr.params, tr.opt_state, loss_v, psnr = tr.train_step(
                tr.params, tr.opt_state, img, t, jnp.float32(lr_now))
            acc.append(np.asarray(psnr))
        psnrs.append(float(np.concatenate(acc).mean()))
    print(f"{tag:28s} psnr by epoch: "
          + " ".join(f"{v:.1f}" for v in psnrs), flush=True)


run("L2_lr3e-3_default", "L2", 3e-3, "default")
run("F10f_lr3e-3_highest", "Fusion10_freq", 3e-3, "highest")
run("F10f_lr1e-3_default", "Fusion10_freq", 1e-3, "default")
run("L1freq_lr3e-3_default", "L1_freq", 3e-3, "default")
print("DONE", flush=True)
