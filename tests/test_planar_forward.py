"""Planar-layout training forward: numerical equivalence against the
standard flax forward (same params, same semantics, different layout).

The planar forward exists to fix the >=720p training-memory blow-up
(XLA lane-padding of narrow-channel NHWC activations); these tests pin
its math to the reference decoder semantics via the flax model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.training.planar_forward import (
    build_planar_forward, from_planar_nhwc, planar_conv, to_planar_nhwc)


def _fine_conv(x, k, b, pad):
    return lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


class TestPlanarConv:
    @pytest.mark.parametrize("ks", [3, 1])
    def test_matches_fine_conv(self, ks):
        key = jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(key, 3)
        B, H, W, C, Co = 2, 6, 10, 5, 7
        x = jax.random.normal(k1, (B, 2 * H, 2 * W, C), jnp.float32)
        k = jax.random.normal(k2, (ks, ks, C, Co), jnp.float32) * 0.3
        b = jax.random.normal(k3, (Co,), jnp.float32)
        want = _fine_conv(x, k, b, (ks - 1) // 2)
        got = from_planar_nhwc(planar_conv(to_planar_nhwc(x), k, b))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_planar_layout_roundtrip(self):
        x = jnp.arange(2 * 4 * 6 * 3, dtype=jnp.float32).reshape(2, 4, 6, 3)
        np.testing.assert_array_equal(
            np.asarray(from_planar_nhwc(to_planar_nhwc(x))), np.asarray(x))


def tiny_cfg(model="NeRV_Boost", **kw):
    base = dict(
        model=model, embed="pe_1.25_8", fc_hw="2_4", fc_dim=8,
        dec_strds=[2, 2, 2], dec_blks=[1, 1, 2], ks="0_1_5",
        conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
        sft_block="res_sft", ch_t=8, block_dim=16, reduce=1.2,
        lower_width=4, enc_strds=[2, 2], enc_dim="8_4", enc_blks=1,
    )
    base.update(kw)
    return BoostConfig(**base)


def _setup(model):
    cfg = tiny_cfg(model)
    if model == "HNeRV_Boost":
        cfg = resolve_sizes(cfg, final_size=8 * 16, full_data_length=4)
    m = build_model(cfg)
    t = jnp.array([0.25, 0.75])
    img = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 16, 3))
    if model == "HNeRV_Boost":
        params = m.init(jax.random.key(0), img[:1], t[:1])
        ref = lambda p: m.apply(p, img, t)
    else:
        params = m.init(jax.random.key(0), t[:1])
        ref = lambda p: m.apply(p, t)
    # planar_from_h=8: both later stride-2 stages (fine H 8 and 16) and
    # the trailing stride-1 block run planar, exercising the fine->planar
    # switch, the planar-in upconv + coarse d2s, and the planar head
    fwd = build_planar_forward(cfg, m, planar_from_h=8)
    return params, ref, (lambda p: fwd(p, img, t))


@pytest.mark.parametrize("model",
                         ["HNeRV_Boost", "NeRV_Boost", "ENeRV_Boost"])
def test_forward_equivalence(model):
    params, ref, planar = _setup(model)
    want, got = ref(params), planar(params)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_gradient_equivalence():
    params, ref, planar = _setup("HNeRV_Boost")
    target = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 32, 3))

    def loss(fn):
        return lambda p: jnp.mean(jnp.abs(fn(p) - target))

    g_ref = jax.grad(loss(ref))(params)
    g_pl = jax.grad(loss(planar))(params)
    flat_r, _ = jax.flatten_util.ravel_pytree(g_ref)
    flat_p, _ = jax.flatten_util.ravel_pytree(g_pl)
    np.testing.assert_allclose(np.asarray(flat_p), np.asarray(flat_r),
                               rtol=1e-3, atol=1e-5)


def test_decode_only_equivalence():
    cfg = tiny_cfg("HNeRV_Boost")
    cfg = resolve_sizes(cfg, final_size=8 * 16, full_data_length=4)
    m = build_model(cfg)
    t = jnp.array([0.25, 0.75])
    img = jax.random.uniform(jax.random.PRNGKey(7), (2, 8, 16, 3))
    params = m.init(jax.random.key(0), img[:1], t[:1])
    embed = m.apply(params, img, method="encode")
    want = m.apply(params, embed, t, method="decode")
    dec = build_planar_forward(cfg, m, planar_from_h=8, decode_only=True)
    got = dec(params, embed, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_cem_trainer_planar(tmp_path):
    """CEM quant-aware finetune with the planar decode path engaged."""
    import os

    from boosting_nerv_tpu.data import VideoData, synthetic_video
    from boosting_nerv_tpu.training.compress_trainer import CompressionTrainer
    from boosting_nerv_tpu.training.trainer import RegressionTrainer
    from boosting_nerv_tpu.utils.logger import RunLogger

    base = dict(
        model="HNeRV_Boost", embed="pe_1.25_8", fc_hw="2_4", fc_dim=12,
        dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
        conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
        sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
        enc_strds=[2, 2], enc_dim="8_4", enc_blks=1,
        batchSize=2, loss="L2", eval_freq=1000, optim_type="Adan")
    reg_cfg = BoostConfig(**base, epochs=30, lr=5e-3, not_resume=True,
                          outf=os.path.join(str(tmp_path), "reg"))
    comp_cfg = BoostConfig(
        **base, epochs=8, lr=5e-4, lr_type="cosine_0_1_0.1",
        outf=os.path.join(str(tmp_path), "comp"), not_resume=True,
        quant=True, quant_model_bit=8, quant_bias_bit=8, quant_embed_bit=8,
        quantizer_w="scale", quantizer_b="scale", quantizer_e="scalebeta",
        lambda_rate=0.05, target_bit=4, planar_train=8,
        weight=os.path.join(str(tmp_path), "reg", "model_latest.ckpt"))
    video = VideoData(synthetic_video(4, 8, 16))
    rt = RegressionTrainer(reg_cfg, video=video,
                           logger=RunLogger(reg_cfg.outf, enable_tb=False))
    rt.train()
    ct = CompressionTrainer(comp_cfg, video=video,
                            logger=RunLogger(comp_cfg.outf, enable_tb=False))
    assert ct._planar_dec is not None
    ct.train()
    res = ct.evaluate_cem()
    assert res["quant_seen_psnr"] > 12.0, res


class TestTrainerIntegration:
    def _train(self, tmp_path, **kw):
        import os

        from boosting_nerv_tpu.data import VideoData, synthetic_video
        from boosting_nerv_tpu.training.trainer import RegressionTrainer
        from boosting_nerv_tpu.utils.logger import RunLogger

        cfg = tiny_cfg(
            "NeRV_Boost", dec_strds=[2, 2], dec_blks=[1, 2], fc_dim=12,
            epochs=40, batchSize=2, lr=5e-3, lr_type="cosine_0.1_1_0.1",
            loss="L2", eval_freq=1000, not_resume=True, optim_type="Adan",
            outf=os.path.join(str(tmp_path), "run"), **kw)
        video = VideoData(synthetic_video(4, 8, 16), cfg.interpolation,
                          cfg.embed_inter)
        tr = RegressionTrainer(cfg, video=video,
                               logger=RunLogger(cfg.outf, enable_tb=False))
        tr.train()
        return tr

    def test_planar_trainer_overfits(self, tmp_path):
        tr = self._train(tmp_path, planar_train=8)
        assert tr._planar_fwd is not None
        res = tr.evaluate()
        assert res["pred_seen_psnr"] > 20.0, res

    def test_ineligible_model_falls_back(self, tmp_path):
        # dec strides 3_2: no stride-2 stage clears ks/eligibility at the
        # switch -> builder raises, trainer falls back to the flax path
        tr = self._train(tmp_path, planar_train=10 ** 6)
        assert tr._planar_fwd is None
        res = tr.evaluate()
        assert res["pred_seen_psnr"] > 20.0, res


def test_ineligible_configs_raise():
    cfg = tiny_cfg("NeRV_Boost", dec_strds=[3, 3], dec_blks=[1, 1])
    m = build_model(cfg)
    with pytest.raises(ValueError):
        build_planar_forward(cfg, m, planar_from_h=1)
    cfg = tiny_cfg("HNeRV")
    with pytest.raises(ValueError):
        build_planar_forward(cfg, build_model(tiny_cfg("NeRV_Boost")), 1)
