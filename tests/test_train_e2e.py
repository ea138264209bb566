"""End-to-end overfit tests on a tiny synthetic video: the PSNR must rise
well above its initial value within a few epochs for every model family and
task (the framework's equivalent of the reference's --debug smoke runs)."""

import os

import numpy as np
import pytest

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger


def tiny_cfg(tmp, model="NeRV_Boost", **kw):
    base = dict(
        model=model, embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
        dec_strds=[2, 2], dec_blks=[1, 1], ks="0_1_5",
        conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
        sft_block="res_sft", ch_t=8, block_dim=16, reduce=1.2, lower_width=4,
        enc_strds=[2, 2], enc_dim="8_4", enc_blks=1,
        epochs=30, batchSize=2, lr=5e-3, lr_type="cosine_0.1_1_0.1",
        loss="L2", eval_freq=1000, outf=os.path.join(str(tmp), "run"),
        not_resume=True, optim_type="Adan",
    )
    base.update(kw)
    return BoostConfig(**base)


def run_overfit(cfg, frames):
    video = VideoData(frames, cfg.interpolation, cfg.embed_inter)
    trainer = RegressionTrainer(cfg, video=video,
                                logger=RunLogger(cfg.outf, enable_tb=False))
    trainer.train()
    return trainer


class TestOverfit:
    def test_nerv_boost_overfits(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        cfg = tiny_cfg(tmp_path, "NeRV_Boost", epochs=60)
        trainer = run_overfit(cfg, frames)
        res = trainer.evaluate()
        assert res["pred_seen_psnr"] > 20.0, res

    def test_hnerv_boost_overfits_and_quant_eval(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        cfg = tiny_cfg(tmp_path, "HNeRV_Boost", epochs=150)
        trainer = run_overfit(cfg, frames)
        res = trainer.evaluate(huffman_coding=True)
        assert res["pred_seen_psnr"] > 20.0, res
        # PTQ model evaluated and huffman accounting populated
        assert res["quant_seen_psnr"] > 10.0, res
        assert trainer.bits_per_param > 0
        assert trainer.total_bpp > 0
        assert trainer.fps > 0

    def test_enerv_boost_trains(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        cfg = tiny_cfg(tmp_path, "ENeRV_Boost", epochs=30)
        trainer = run_overfit(cfg, frames)
        res = trainer.evaluate()
        assert res["pred_seen_psnr"] > 15.0, res

    def test_enerv_forces_highest_precision(self, tmp_path):
        """The E-NeRV transformer trunk flatlines below 'highest' matmul
        precision (measured 720p, BASELINE.md): the trainer must pin it
        even when a recipe passes --train_precision high."""
        frames = synthetic_video(2, 8, 16)
        cfg = tiny_cfg(tmp_path, "ENeRV_Boost", epochs=1,
                       train_precision="high")
        video = VideoData(frames, cfg.interpolation, cfg.embed_inter)
        trainer = RegressionTrainer(
            cfg, video=video, logger=RunLogger(cfg.outf, enable_tb=False))
        assert trainer.cfg.train_precision == "highest"
        import jax
        assert jax.config.jax_default_matmul_precision == "highest"

    def test_enerv_defaults_grad_clip(self, tmp_path):
        """The norm-free E-NeRV trunk's activations explode without
        global grad clipping (15.08 dB flatline vs 19.1 dB with clip=1.0
        measured at 720p, BASELINE.md round 4): the trainer must default
        clip_max_norm=1.0 for the ENeRV family, and an explicit value
        must win."""
        frames = synthetic_video(2, 8, 16)
        cfg = tiny_cfg(tmp_path, "ENeRV_Boost", epochs=1)
        video = VideoData(frames, cfg.interpolation, cfg.embed_inter)
        trainer = RegressionTrainer(
            cfg, video=video, logger=RunLogger(cfg.outf, enable_tb=False))
        assert trainer.cfg.clip_max_norm == 1.0
        cfg2 = tiny_cfg(tmp_path, "ENeRV_Boost", epochs=1,
                        clip_max_norm=0.5,
                        outf=os.path.join(str(tmp_path), "run2"))
        t2 = RegressionTrainer(
            cfg2, video=video, logger=RunLogger(cfg2.outf, enable_tb=False))
        assert t2.cfg.clip_max_norm == 0.5
        cfg3 = tiny_cfg(tmp_path, "NeRV_Boost", epochs=1,
                        outf=os.path.join(str(tmp_path), "run3"))
        t3 = RegressionTrainer(
            cfg3, video=video, logger=RunLogger(cfg3.outf, enable_tb=False))
        assert t3.cfg.clip_max_norm == 0.0
        # an EXPLICIT 0.0 disables clipping even for the ENeRV family
        # (the reference's default dynamics stay reproducible)
        cfg4 = tiny_cfg(tmp_path, "ENeRV_Boost", epochs=1,
                        clip_max_norm=0.0,
                        outf=os.path.join(str(tmp_path), "run4"))
        t4 = RegressionTrainer(
            cfg4, video=video, logger=RunLogger(cfg4.outf, enable_tb=False))
        assert t4.cfg.clip_max_norm == 0.0

    def test_hnerv_plain_trains(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        cfg = tiny_cfg(tmp_path, "HNeRV", sft_block="none", embed="",
                       epochs=30)
        trainer = run_overfit(cfg, frames)
        res = trainer.evaluate()
        assert res["pred_seen_psnr"] > 15.0, res


class TestTasks:
    def test_inpainting_mask_applied(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        cfg = tiny_cfg(tmp_path, "NeRV_Boost", epochs=5,
                       inpanting="inpanting_center")
        trainer = run_overfit(cfg, frames)
        assert trainer.inpaint_mask is not None
        m = np.asarray(trainer.inpaint_mask)[0, :, :, 0]
        assert m.min() == 0 and m.max() == 1

    def test_interpolation_split(self, tmp_path):
        frames = synthetic_video(5, 8, 16)
        cfg = tiny_cfg(tmp_path, "HNeRV_Boost", epochs=5,
                       interpolation=True, embed_inter=True,
                       data_split="1_1_2", batchSize=1)
        video = VideoData(frames, True, True)
        trainer = RegressionTrainer(cfg, video=video,
                                    logger=RunLogger(cfg.outf, enable_tb=False))
        assert trainer.train_ind == [0, 2, 4]
        assert trainer.val_ind == [1, 3]
        trainer.train()
        res = trainer.evaluate()
        assert "pred_unseen_psnr" in res and res["pred_unseen_psnr"] != 0


class TestCheckpointResume:
    def test_resume_restores_params(self, tmp_path):
        frames = synthetic_video(4, 8, 16)
        cfg = tiny_cfg(tmp_path, "NeRV_Boost", epochs=3, not_resume=False)
        video = VideoData(frames)
        t1 = RegressionTrainer(cfg, video=video,
                               logger=RunLogger(cfg.outf, enable_tb=False))
        t1.train()
        assert os.path.isfile(os.path.join(cfg.outf, "model_latest.ckpt"))
        # new trainer auto-resumes at epoch 3 -> train() is a no-op
        t2 = RegressionTrainer(cfg, video=video,
                               logger=RunLogger(cfg.outf, enable_tb=False))
        t2.maybe_resume()
        assert t2.start_epoch == 3
        import jax

        p1 = jax.tree_util.tree_leaves(jax.device_get(t1.params))
        p2 = jax.tree_util.tree_leaves(jax.device_get(t2.params))
        for a, b in zip(p1, p2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestResidentDataset:
    def test_resident_step_matches_streaming_step(self, tmp_path):
        """The HBM-resident uint8 frame path (dp*sp == 1) must match the
        host-streaming step numerically (same math; only the /255
        normalisation moves inside jit, so allow fusion-level noise)."""
        import jax
        import jax.numpy as jnp

        frames = synthetic_video(4, 8, 16)
        cfg = tiny_cfg(tmp_path, "HNeRV_Boost", epochs=1,
                       outf=os.path.join(str(tmp_path), "resident_step"))
        video = VideoData(frames, cfg.interpolation, cfg.embed_inter)
        tr = RegressionTrainer(cfg, video=video,
                               logger=RunLogger(cfg.outf, enable_tb=False))
        batch = video.get_batch([0, 2])
        img, t = tr._device_batch(batch)
        # train_step donates params/opt_state: feed each call its own copy
        cp = lambda tree: jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree)
        p1, _, l1, ps1 = tr.train_step(cp(tr.params), cp(tr.opt_state),
                                       img, t, jnp.float32(1e-3))
        p2, _, l2, ps2 = tr.train_step_idx(
            cp(tr.params), cp(tr.opt_state), tr.frames_dev,
            jnp.asarray(batch["idx"]), jnp.asarray(batch["norm_idx"]),
            jnp.float32(1e-3))
        assert float(l1) == pytest.approx(float(l2), rel=1e-5)
        np.testing.assert_allclose(np.asarray(ps1), np.asarray(ps2),
                                   rtol=1e-4)
        fa = jax.tree_util.tree_leaves(jax.device_get(p1))
        fb = jax.tree_util.tree_leaves(jax.device_get(p2))
        for x, y in zip(fa, fb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=2e-5, rtol=1e-4)


class TestMicroBatchAccumulation:
    def test_matches_full_batch_step(self, tmp_path):
        """--micro_batch k must reproduce the full-batch update (grad of
        mean-of-chunk-means == full-batch mean for equal chunks)."""
        import os

        import jax
        import jax.numpy as jnp
        import numpy as np

        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.data import VideoData, synthetic_video
        from boosting_nerv_tpu.training.trainer import RegressionTrainer
        from boosting_nerv_tpu.utils.logger import RunLogger

        frames = synthetic_video(4, 8, 16)
        base = dict(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 1], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4", enc_blks=1, epochs=1,
            # L1_freq, not Fusion10_freq: ms_ssim (like the reference
            # pytorch_msssim) refuses frames with min side <= 160
            batchSize=4, lr=1e-3, loss="L1_freq", not_resume=True)
        outs = {}
        for tag, mb in (("full", 0), ("micro", 2)):
            cfg = BoostConfig(**base, micro_batch=mb,
                              outf=os.path.join(str(tmp_path), tag))
            video = VideoData(frames)
            tr = RegressionTrainer(cfg, video=video,
                                   logger=RunLogger(cfg.outf,
                                                    enable_tb=False))
            batch = video.get_batch(list(range(4)))
            img, t = tr._device_batch(batch)
            params, _, loss, psnr = tr.train_step(
                tr.params, tr.opt_state, img, t, jnp.float32(1e-3))
            outs[tag] = (float(loss), np.sort(np.asarray(psnr).ravel()),
                         params)
        np.testing.assert_allclose(outs["full"][0], outs["micro"][0],
                                   rtol=2e-5)
        np.testing.assert_allclose(outs["full"][1], outs["micro"][1],
                                   rtol=1e-4)
        fa = jax.tree_util.tree_leaves(outs["full"][2])
        mi = jax.tree_util.tree_leaves(outs["micro"][2])
        for a, b in zip(fa, mi):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=5e-5)
