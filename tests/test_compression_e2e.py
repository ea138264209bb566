"""End-to-end CEM compression: regression pretrain -> quant-aware finetune
with the rate term -> real ANS coding; bpp must come out positive and
consistent with the estimate, PSNR must survive quantisation."""

import os

import numpy as np
import pytest

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.training.compress_trainer import CompressionTrainer
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger


def cfgs(tmp, model="NeRV_Boost"):
    base = dict(
        model=model, embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
        dec_strds=[2, 2], dec_blks=[1, 1], ks="0_1_5",
        conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
        sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
        enc_strds=[2, 2], enc_dim="8_4", enc_blks=1,
        batchSize=2, loss="L2", eval_freq=1000, optim_type="Adan",
    )
    reg = BoostConfig(**base, epochs=50, lr=5e-3,
                      outf=os.path.join(str(tmp), "reg"), not_resume=True)
    comp = BoostConfig(**base, epochs=20, lr=5e-4,
                       lr_type="cosine_0_1_0.1",
                       outf=os.path.join(str(tmp), "comp"), not_resume=True,
                       quant=True, quant_model_bit=8, quant_bias_bit=8,
                       quant_embed_bit=8, quantizer_w="scale",
                       quantizer_b="scale", quantizer_e="scalebeta",
                       lambda_rate=0.05, target_bit=4,
                       weight=os.path.join(str(tmp), "reg", "model_latest.ckpt"))
    return reg, comp


class TestCompressionE2E:
    def test_nerv_boost_cem(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        video = VideoData(frames)
        reg_cfg, comp_cfg = cfgs(tmp_path, "NeRV_Boost")
        rt = RegressionTrainer(reg_cfg, video=video,
                               logger=RunLogger(reg_cfg.outf, enable_tb=False))
        rt.train()

        ct = CompressionTrainer(comp_cfg, video=video,
                                logger=RunLogger(comp_cfg.outf, enable_tb=False))
        ct.train()
        res = ct.evaluate_cem(coding=True)
        assert res["quant_seen_psnr"] > 15.0, res
        assert ct.total_bpp > 0
        assert ct.estimate_bpp > 0
        # estimate and real rate should be the same order of magnitude
        assert 0.3 < ct.total_bpp / ct.estimate_bpp < 3.0

    def test_hnerv_boost_cem_with_embed_entropy(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        video = VideoData(frames)
        reg_cfg, comp_cfg = cfgs(tmp_path, "HNeRV_Boost")
        comp_cfg = comp_cfg.replace(embed_entropy=True)
        rt = RegressionTrainer(reg_cfg, video=video,
                               logger=RunLogger(reg_cfg.outf, enable_tb=False))
        rt.train()

        ct = CompressionTrainer(comp_cfg, video=video,
                                logger=RunLogger(comp_cfg.outf, enable_tb=False))
        ct.train()
        res = ct.evaluate_cem(coding=True)
        assert res["quant_seen_psnr"] > 12.0, res
        assert ct.total_bpp > 0

    def test_quantizer_params_actually_train(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        video = VideoData(frames)
        reg_cfg, comp_cfg = cfgs(tmp_path, "NeRV_Boost")
        rt = RegressionTrainer(reg_cfg, video=video,
                               logger=RunLogger(reg_cfg.outf, enable_tb=False))
        rt.train()
        ct = CompressionTrainer(comp_cfg, video=video,
                                logger=RunLogger(comp_cfg.outf, enable_tb=False))
        ct.maybe_resume()
        ct.init_qparams()
        import jax

        q0 = jax.device_get(ct.state["qp"])
        # run a few steps manually
        import jax.numpy as jnp

        key = jax.random.key(0)
        for i in range(5):
            batch = video.get_batch([0, 1])
            img, t = ct._device_batch(batch)
            key, sub = jax.random.split(key)
            ct.state, ct.opt_state, loss, psnr, bpp = ct.cem_step(
                ct.state, ct.opt_state, img, t, jnp.float32(1e-3), sub)
        q1 = jax.device_get(ct.state["qp"])
        moved = any(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 0
            for a, b in zip(jax.tree_util.tree_leaves(q0),
                            jax.tree_util.tree_leaves(q1)))
        assert moved, "quantizer scales did not receive training updates"
