"""Fast (Pallas-tail) decode must reproduce the flax HNeRV-Boost decode.
Runs the kernels in interpret mode on CPU with a tiny config whose tail
stages satisfy the kernel constraints (H multiple of 8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode


def _cfg():
    return BoostConfig(
        model="HNeRV_Boost", embed="pe_1.25_8", fc_dim=6,
        dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
        conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
        sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
        enc_strds=[2, 2], enc_dim="8_4", enc_blks=1, fc_hw="4_8")


class TestFastDecode:
    def test_matches_flax_decode(self):
        cfg = _cfg()
        model = build_model(cfg)
        img = jnp.asarray(np.random.default_rng(0).uniform(
            size=(1, 16, 32, 3)).astype(np.float32))
        t = jnp.array([0.4])
        params = model.init(jax.random.key(1), img, t)
        embed = model.apply(params, img, method="encode")
        ref = model.apply(params, embed, t, method="decode")

        # tail engages at H=8 (the first upsampled stage)
        decode = build_fast_decode(cfg, params, pallas_from_h=8,
                                   interpret=True)
        out = decode(embed, t)
        assert out.shape == ref.shape
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        assert err < 0.02, err  # bf16 fast path vs fp32 flax

    def test_all_xla_fallback_matches(self):
        # with a huge threshold the tail never engages: pure-XLA rebuild
        cfg = _cfg()
        model = build_model(cfg)
        img = jnp.ones((1, 16, 32, 3)) * 0.3
        t = jnp.array([0.7])
        params = model.init(jax.random.key(2), img, t)
        embed = model.apply(params, img, method="encode")
        ref = model.apply(params, embed, t, method="decode")
        decode = build_fast_decode(cfg, params, pallas_from_h=10 ** 9)
        out = decode(embed, t)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        assert err < 0.02, err

    def test_rejects_unsupported_config(self):
        cfg = _cfg().replace(act="gelu")
        model = build_model(cfg)
        img = jnp.ones((1, 16, 32, 3)) * 0.3
        t = jnp.array([0.7])
        params = model.init(jax.random.key(0), img, t)
        with pytest.raises(ValueError):
            build_fast_decode(cfg, params)


class TestServingDecodeWiring:
    """--eval_fps reports the serving runtime (VERDICT r2 #3)."""

    def test_trainer_falls_back_off_tpu(self, tmp_path):
        import os
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.data import VideoData, synthetic_video
        from boosting_nerv_tpu.training.trainer import RegressionTrainer
        from boosting_nerv_tpu.utils.logger import RunLogger

        cfg = BoostConfig(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 1], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4", enc_blks=1, epochs=1,
            batchSize=2, not_resume=True,
            outf=os.path.join(str(tmp_path), "fpsfallback"))
        video = VideoData(synthetic_video(4, 8, 16))
        tr = RegressionTrainer(cfg, video=video,
                               logger=RunLogger(cfg.outf, enable_tb=False))
        fps = tr.measure_fps(tr.params, reps=2)
        # tiny config: every stage sits below the Pallas threshold, so the
        # serving build is pure XLA and works on any backend
        assert fps > 0 and tr.fps_decode_path == "pallas"

        # ineligible config (act != sin) -> serving build raises -> flax
        cfg2 = cfg.replace(act="gelu", outf=cfg.outf + "2")
        tr2 = RegressionTrainer(cfg2, video=video,
                                logger=RunLogger(cfg2.outf, enable_tb=False))
        fps2 = tr2.measure_fps(tr2.params, reps=2)
        assert fps2 > 0 and tr2.fps_decode_path == "flax"

    def test_serving_decode_is_fast_path(self):
        import inspect
        from boosting_nerv_tpu.runtime import fast_decode as fd
        src = inspect.getsource(fd.build_serving_decode)
        assert "build_fast_decode" in src

    def test_env_policy_overrides_parse(self, monkeypatch):
        """BNT_DECODE_TH/NCK/SPLIT JSON env overrides must parse (dict
        keys may be numeric strings or kind-tagged like "A540") and the
        builder must still produce a callable."""
        import jax
        import jax.numpy as jnp

        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import (
            build_serving_decode)

        monkeypatch.setenv("BNT_DECODE_TH", '{"270": 16, "A540": 12}')
        monkeypatch.setenv("BNT_DECODE_NCK", '{"540": 4}')
        monkeypatch.setenv("BNT_DECODE_SPLIT", "1")
        cfg = BoostConfig(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin",
            norm="none", sft_block="res_sft", ch_t=8, reduce=1.2,
            lower_width=4, enc_strds=[2, 2], enc_dim="8_4")
        model = build_model(cfg)
        img = jnp.zeros((1, 16, 16, 3), jnp.float32)
        t = jnp.array([0.4])
        params = model.init(jax.random.key(0), img, t)
        assert callable(build_serving_decode(cfg, params))
