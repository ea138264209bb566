"""Per-tile kernels (ops/pallas/tile_conv, v2 K-stacked and v3
pre-shifted-tile) vs XLA references, in interpret mode on CPU; plus the
v2/v3 fast-decode runtimes vs the flax decode on a small HNeRV-Boost
config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from boosting_nerv_tpu.ops.pallas.tile_conv import (conv_tile, conv_tile_v3,
                                                    resblock_sft_tile,
                                                    resblock_sft_tile_v3)

rng = np.random.default_rng(0)


def _ref_conv(x_chw, kern, bias, k):
    x = x_chw.transpose(1, 2, 0)[None].astype(jnp.float32)
    pad = (k - 1) // 2
    y = lax.conv_general_dilated(
        x, kern.astype(jnp.float32), (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y[0] + bias).transpose(2, 0, 1)


class TestConvTile:
    @pytest.mark.parametrize("c,co,h,wreal,k", [
        (5, 7, 11, 128, 3),
        (5, 7, 11, 100, 3),    # ragged width -> in-kernel mask
        (6, 4, 9, 100, 5),
        (8, 8, 17, 128, 5),
        (3, 12, 8, 256, 3),    # multi-lane-tile width
    ])
    def test_matches_xla(self, c, co, h, wreal, k):
        wd = -(-wreal // 128) * 128
        x = jnp.asarray(rng.normal(size=(c, h, wreal)).astype(np.float32))
        kern = jnp.asarray(
            rng.normal(size=(k, k, c, co)).astype(np.float32) * 0.2)
        bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wd - wreal))).astype(jnp.bfloat16)
        out = conv_tile(xp, kern, bias, k=k, w_real=wreal, interpret=True)
        ref = _ref_conv(x.astype(jnp.bfloat16).astype(jnp.float32),
                        kern, bias, k)
        err = float(jnp.abs(out[:, :, :wreal].astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err


class TestConvTileV3:
    @pytest.mark.parametrize("c,co,h,wreal,k,mode", [
        (5, 7, 11, 128, 3, "stack"),
        (5, 7, 11, 100, 3, "acc"),     # ragged width -> in-kernel mask
        (5, 7, 11, 100, 3, "dy3"),
        (3, 12, 8, 256, 3, "dy3"),     # multi-lane-tile width
        (6, 4, 9, 120, 1, "dy3"),      # 1x1 conv
        (4, 6, 19, 128, 3, "dy3"),     # >2 tiles: double-buffered DMA
        (5, 7, 11, 100, 3, "dy3x2"),
        (6, 4, 9, 120, 1, "dy3x2"),    # 1x1 conv, dual-stream
        (4, 6, 37, 128, 3, "dy3x2"),   # >2 programs, dual-stream
        (3, 12, 8, 256, 3, "stack"),
        (6, 4, 9, 120, 1, "stack"),
        (4, 6, 19, 128, 3, "stack"),
        (5, 5, 19, 100, 3, "ody"),
        (7, 3, 11, 128, 3, "ody"),     # narrowing head-style conv
        (6, 4, 9, 120, 1, "ody"),
    ])
    def test_matches_xla(self, c, co, h, wreal, k, mode):
        wd = -(-wreal // 128) * 128
        x = jnp.asarray(rng.normal(size=(c, h, wreal)).astype(np.float32))
        kern = jnp.asarray(
            rng.normal(size=(k, k, c, co)).astype(np.float32) * 0.2)
        bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wd - wreal))).astype(jnp.bfloat16)
        out = conv_tile_v3(xp, kern, bias, k=k, w_real=wreal, mode=mode,
                           interpret=True)
        ref = _ref_conv(x.astype(jnp.bfloat16).astype(jnp.float32),
                        kern, bias, k)
        err = float(jnp.abs(out[:, :, :wreal].astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err

    @pytest.mark.parametrize("act,fn", [
        ("sin", jnp.sin),
        ("outimg", lambda v: jnp.tanh(v) * 0.5 + 0.5),
    ])
    def test_fused_activation(self, act, fn):
        c, co, h, wreal = 5, 7, 11, 100
        x = jnp.asarray(rng.normal(size=(c, h, wreal)).astype(np.float32))
        kern = jnp.asarray(
            rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.4)
        bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 128 - wreal))).astype(jnp.bfloat16)
        out = conv_tile_v3(xp, kern, bias, k=3, w_real=wreal, act=act,
                           interpret=True)
        ref = fn(_ref_conv(x.astype(jnp.bfloat16).astype(jnp.float32),
                           kern, bias, 3))
        err = float(jnp.abs(out[:, :, :wreal].astype(jnp.float32) - ref).max())
        assert err < 0.02, err

    def test_sin_poly_range_reduction(self):
        # polynomial sin must stay accurate far outside [-pi, pi]
        from boosting_nerv_tpu.ops.pallas.tile_conv import _sin_poly
        x = jnp.asarray(np.linspace(-40, 40, 5001, dtype=np.float32))
        err = float(jnp.abs(_sin_poly(x) - jnp.sin(x)).max())
        assert err < 2e-5, err


def _ref_rsft(x, w0, b0, w1, b1, s0, h0, s1, h1):
    xf = x.transpose(1, 2, 0)[None].astype(jnp.float32)

    def cv(pk, pb, v):
        return lax.conv_general_dilated(
            v, pk.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + pb

    fea = xf * (s0 + 1) + h0
    fea = cv(w0, b0, fea)
    fea = jax.nn.gelu(fea, approximate=False)
    fea = fea * (s1 + 1) + h1
    fea = cv(w1, b1, fea)
    return (xf + fea)[0].transpose(2, 0, 1)


class TestResBlockSFTTile:
    @pytest.mark.parametrize("c,h,wreal", [(5, 11, 128), (6, 19, 100),
                                           (4, 9, 250)])
    def test_matches_xla(self, c, h, wreal):
        wd = -(-wreal // 128) * 128
        x = jnp.asarray(rng.normal(size=(c, h, wreal)).astype(np.float32))
        w0 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
        w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
        b0 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        s0, h0, s1, h1 = [
            jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.3)
            for _ in range(4)]
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wd - wreal))).astype(jnp.bfloat16)
        out = resblock_sft_tile(xp, w0, b0, w1, b1, s0, h0, s1, h1,
                                w_real=wreal, interpret=True)
        ref = _ref_rsft(x.astype(jnp.bfloat16).astype(jnp.float32),
                        w0, b0, w1, b1, s0, h0, s1, h1)
        err = float(jnp.abs(out[:, :, :wreal].astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err


class TestResBlockSFTTileV3:
    @pytest.mark.parametrize("c,h,wreal,mode", [
        (5, 11, 128, "stack"), (6, 19, 100, "acc"), (4, 9, 250, "stack"),
        (5, 11, 128, "dy3"), (6, 19, 100, "dy3"), (4, 25, 250, "dy3"),
        (5, 27, 128, "ody"), (6, 19, 100, "ody"),
        (5, 11, 128, "dy3x2"), (6, 19, 100, "dy3x2"),
        (4, 37, 250, "dy3x2")])
    def test_matches_xla(self, c, h, wreal, mode):
        wd = -(-wreal // 128) * 128
        x = jnp.asarray(rng.normal(size=(c, h, wreal)).astype(np.float32))
        w0 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
        w1 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
        b0 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        s0, h0, s1, h1 = [
            jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.3)
            for _ in range(4)]
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wd - wreal))).astype(jnp.bfloat16)
        out = resblock_sft_tile_v3(xp, w0, b0, w1, b1, s0, h0, s1, h1,
                                   w_real=wreal, mode=mode, interpret=True)
        ref = _ref_rsft(x.astype(jnp.bfloat16).astype(jnp.float32),
                        w0, b0, w1, b1, s0, h0, s1, h1)
        err = float(jnp.abs(out[:, :, :wreal].astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err


class TestFastDecodeV3:
    def test_matches_flax_decode(self):
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v3

        cfg = BoostConfig(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4")
        model = build_model(cfg)
        img = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
        t = jnp.array([0.4])
        params = model.init(jax.random.key(0), img, t)
        embed = model.apply(params, img, method="encode")
        ref = model.apply(params, embed, t, method="decode")

        dec = build_fast_decode_v3(cfg, params, tile_from_h=1,
                                   interpret=True)
        out = dec(embed, t)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        assert err < 0.02, err


class TestFastDecodeV2:
    def test_matches_flax_decode(self):
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v2

        cfg = BoostConfig(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4")
        model = build_model(cfg)
        img = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
        t = jnp.array([0.4])
        params = model.init(jax.random.key(0), img, t)
        embed = model.apply(params, img, method="encode")
        ref = model.apply(params, embed, t, method="decode")

        dec = build_fast_decode_v2(cfg, params, tile_from_h=1,
                                   interpret=True)
        out = dec(embed, t)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        assert err < 0.02, err  # bf16 pipeline on [0,1] pixels
