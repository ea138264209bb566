"""Subpixel-planar kernels (ops/pallas/planar) vs fine-grid XLA
references, in interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from boosting_nerv_tpu.ops.pallas.planar import (conv_planar, from_planar,
                                                 rsft_planar, to_planar,
                                                 upconv_kernel_to_planar)

rng = np.random.default_rng(1)


def _ref_conv(x_chw, kern, bias):
    x = x_chw.transpose(1, 2, 0)[None].astype(jnp.float32)
    y = lax.conv_general_dilated(
        x, kern.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y[0] + bias).transpose(2, 0, 1)


def _mk_planar(c, hc, wc_real, wd):
    """random fine (c, 2hc, 2wc_real) + its planar (4cp, hc, wd) bf16."""
    x = jnp.asarray(
        rng.normal(size=(c, 2 * hc, 2 * wc_real)).astype(np.float32))
    xf = x.astype(jnp.bfloat16).astype(jnp.float32)
    xp = to_planar(xf.astype(jnp.bfloat16))
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wd - wc_real)))
    return x, xf, xp


class TestPlanarRoundtrip:
    def test_to_from_planar(self):
        x = jnp.asarray(rng.normal(size=(5, 8, 12)).astype(np.float32))
        assert float(jnp.abs(from_planar(to_planar(x), 5) - x).max()) == 0.0

    def test_upconv_kernel_reorder(self):
        # planar rows of a d2s'd tensor == channel-reordered conv output
        from boosting_nerv_tpu.ops.pixelshuffle import depth_to_space
        c = 3
        k = jnp.asarray(rng.normal(size=(3, 3, 5, 4 * c)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(1, 6, 8, 5)).astype(np.float32))
        y = lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        fine = depth_to_space(y, 2)[0].transpose(2, 0, 1)  # (c, 12, 16)
        kp = upconv_kernel_to_planar(k)
        yp = lax.conv_general_dilated(
            x, kp, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[0].transpose(2, 0, 1)
        assert float(jnp.abs(from_planar(yp, c) - fine).max()) < 1e-5


class TestConvPlanar:
    @pytest.mark.parametrize("c,co,hc,wc_real,act", [
        (5, 7, 6, 64, "none"),
        (5, 7, 6, 50, "sin"),      # ragged coarse width
        (17, 19, 9, 64, "none"),   # cp=32 path, grid>1
        (4, 3, 11, 50, "outimg"),  # head-style narrow output, 2 tiles
    ])
    def test_matches_fine_conv(self, c, co, hc, wc_real, act):
        wd = 128
        x, xf, xp = _mk_planar(c, hc, wc_real, wd)
        kern = jnp.asarray(
            rng.normal(size=(3, 3, c, co)).astype(np.float32) * 0.2)
        bias = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
        out = conv_planar(xp, kern, bias, c_in=c, c_out=co,
                          wc_real=wc_real, act=act, th=4, interpret=True)
        fine = from_planar(out, co)[:, :, :2 * wc_real]
        ref = _ref_conv(xf, kern, bias)
        if act == "sin":
            ref = jnp.sin(ref)
        elif act == "outimg":
            ref = jnp.tanh(ref) * 0.5 + 0.5
        err = float(jnp.abs(fine.astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err


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


class TestRsftPlanar:
    @pytest.mark.parametrize("c,hc,wc_real", [
        (5, 6, 64), (6, 11, 50), (17, 9, 64)])
    def test_matches_fine_rsft(self, c, hc, wc_real):
        wd = 128
        x, xf, xp = _mk_planar(c, hc, wc_real, wd)
        w0 = jnp.asarray(
            rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
        w1 = jnp.asarray(
            rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.2)
        b0 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        b1 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.1)
        s0, h0, s1, h1 = [
            jnp.asarray(rng.normal(size=(c,)).astype(np.float32) * 0.3)
            for _ in range(4)]
        out = rsft_planar(xp, w0, b0, w1, b1, s0, h0, s1, h1, c=c,
                          hc_real=hc, wc_real=wc_real, th=4, interpret=True)
        fine = from_planar(out, c)[:, :, :2 * wc_real]
        ref = _ref_rsft(xf, w0, b0, w1, b1, s0, h0, s1, h1)
        err = float(jnp.abs(fine.astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err


class TestFusedStageKernels:
    def _rand(self, *shape, s=0.2):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)

    def test_fused_upconv_rsft(self):
        from boosting_nerv_tpu.ops.pallas.planar import (
            fused_upconv_rsft, prepare_upconv_rsft, sft_planar_vectors)
        from boosting_nerv_tpu.ops.pixelshuffle import depth_to_space

        c_in, c, hc, wc, wd = 6, 5, 9, 50, 128
        x = self._rand(c_in, hc, wc)
        upk = self._rand(3, 3, c_in, 4 * c)
        upb = self._rand(4 * c, s=0.1)
        w0, w1 = self._rand(3, 3, c, c), self._rand(3, 3, c, c)
        b0, b1 = self._rand(c, s=0.1), self._rand(c, s=0.1)
        s0, h0, s1, h1 = [self._rand(c, s=0.3) for _ in range(4)]

        # fine-grid reference: conv -> d2s -> sin -> rsft
        y = lax.conv_general_dilated(
            x.transpose(1, 2, 0)[None], upk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + upb
        fine = jnp.sin(depth_to_space(y, 2))[0].transpose(2, 0, 1)
        ref = _ref_rsft(fine, w0, b0, w1, b1, s0, h0, s1, h1)

        prep = prepare_upconv_rsft(upk, upb, w0, b0, w1, b1, c_in=c_in,
                                   c=c)
        sft = sft_planar_vectors(s0, h0, s1, h1, 16)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wd - wc))).astype(jnp.bfloat16)
        out = fused_upconv_rsft(xp, prep, sft, c_in=c_in, c=c, wc_real=wc,
                                th=4, interpret=True)
        got = from_planar(out, c)[:, :, :2 * wc]
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err

    @pytest.mark.parametrize("head", [False, True])
    def test_fused_conv_rsft(self, head):
        from boosting_nerv_tpu.ops.pallas.planar import (
            fused_conv_rsft, prepare_conv_rsft, rgb_planar_to_nhwc,
            sft_planar_vectors)

        c, hc, wc, wd = 5, 11, 50, 128
        xf = self._rand(c, 2 * hc, 2 * wc)
        ck = self._rand(3, 3, c, c)
        cb = self._rand(c, s=0.1)
        w0, w1 = self._rand(3, 3, c, c), self._rand(3, 3, c, c)
        b0, b1 = self._rand(c, s=0.1), self._rand(c, s=0.1)
        s0, h0, s1, h1 = [self._rand(c, s=0.3) for _ in range(4)]
        hk = self._rand(3, 3, c, 3)
        hb = self._rand(3, s=0.1)

        mid = jnp.sin(_ref_conv(xf, ck, cb))
        ref = _ref_rsft(mid, w0, b0, w1, b1, s0, h0, s1, h1)
        if head:
            ref = jnp.tanh(_ref_conv(ref, hk, hb)) * 0.5 + 0.5

        prep = prepare_conv_rsft(ck, cb, w0, b0, w1, b1, c=c,
                                 head_k=hk if head else None,
                                 head_b=hb if head else None)
        sft = sft_planar_vectors(s0, h0, s1, h1, 16)
        xp = to_planar(xf.astype(jnp.bfloat16))
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wd - wc)))
        out = fused_conv_rsft(xp, prep, sft, c=c, wc_real=wc, head=head,
                              th=4, interpret=True)
        if head:
            got = rgb_planar_to_nhwc(out, hc, wc)[0].transpose(2, 0, 1)
            ref = ref
        else:
            got = from_planar(out, c)[:, :, :2 * wc]
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err

    @staticmethod
    def _assert_ck_parity(got, ref):
        """nck>0 vs nck=0: same math, different emission order.  The only
        legitimate difference is a rare 1-ulp bf16 tie flip: interpret
        mode lowers the dots to XLA-CPU, whose f32 summation order varies
        with the dot's N dimension (chunked dots have smaller N), and a
        2^-24-relative f32 difference can flip bf16 rounding on a tie.
        Indexing/halo bugs produce O(1) errors on many elements — so
        require <= 8 differing elements, each within 1 bf16 ulp rel."""
        g = np.asarray(got.astype(jnp.float32))
        r = np.asarray(ref.astype(jnp.float32))
        diff = np.abs(g - r)
        bad = diff > 0
        assert int(bad.sum()) <= 8, int(bad.sum())
        tol = np.maximum(np.abs(r), np.abs(g)) * 2.0 ** -7 + 1e-30
        assert bool((diff <= tol).all()), float(diff.max())

    @pytest.mark.parametrize("nck", [2, 3])
    def test_chunked_kernels_bit_exact(self, nck):
        """The software-pipelined (nck>0) stage kernels are the same math
        as the serialized ones in a different emission order — require
        (near-)exact equality against nck=0 (see tools/r3_ck_parity.py)."""
        from boosting_nerv_tpu.ops.pallas.planar import (
            fused_conv_rsft, fused_upconv_rsft, prepare_conv_rsft,
            prepare_upconv_rsft, sft_planar_vectors)

        c_in, c, hc, wc, wd = 6, 5, 11, 50, 128
        x = self._rand(c_in, hc, wd).astype(jnp.bfloat16)
        prep_a = prepare_upconv_rsft(
            self._rand(3, 3, c_in, 4 * c), self._rand(4 * c, s=0.1),
            self._rand(3, 3, c, c), self._rand(c, s=0.1),
            self._rand(3, 3, c, c), self._rand(c, s=0.1), c_in=c_in, c=c)
        sft = sft_planar_vectors(*[self._rand(c, s=0.3) for _ in range(4)],
                                 16)
        ref = fused_upconv_rsft(x, prep_a, sft, c_in=c_in, c=c, wc_real=wc,
                                th=4, interpret=True)
        got = fused_upconv_rsft(x, prep_a, sft, c_in=c_in, c=c, wc_real=wc,
                                th=4, nck=nck, interpret=True)
        self._assert_ck_parity(got, ref)
        got_s = fused_upconv_rsft(x, prep_a, sft, c_in=c_in, c=c,
                                  wc_real=wc, th=4, nck=nck, split=True,
                                  interpret=True)
        self._assert_ck_parity(got_s, ref)

        xp = self._rand(4 * 16, hc, wd).astype(jnp.bfloat16)
        for head in (False, True):
            prep_b = prepare_conv_rsft(
                self._rand(3, 3, c, c), self._rand(c, s=0.1),
                self._rand(3, 3, c, c), self._rand(c, s=0.1),
                self._rand(3, 3, c, c), self._rand(c, s=0.1), c=c,
                head_k=self._rand(3, 3, c, 3) if head else None,
                head_b=self._rand(3, s=0.1) if head else None)
            ref = fused_conv_rsft(xp, prep_b, sft, c=c, wc_real=wc,
                                  head=head, th=4, interpret=True)
            got = fused_conv_rsft(xp, prep_b, sft, c=c, wc_real=wc,
                                  head=head, th=4, nck=nck, interpret=True)
            self._assert_ck_parity(got, ref)
            got_s = fused_conv_rsft(xp, prep_b, sft, c=c, wc_real=wc,
                                    head=head, th=4, nck=nck, split=True,
                                    interpret=True)
            self._assert_ck_parity(got_s, ref)


class TestFastDecodeV5:
    def test_matches_flax_decode(self):
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v5

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

        dec = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                   interpret=True)
        out = dec(embed, t)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        assert err < 0.02, err

        # chunked kernels end-to-end: same tolerance vs flax as nck=0
        dec_ck = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                      nck=2, interpret=True)
        out_ck = dec_ck(embed, t)
        err_ck = float(jnp.abs(out_ck.astype(jnp.float32) - ref).max())
        assert err_ck < 0.02, err_ck

        # split-dot variant end-to-end
        dec_sp = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                      nck=2, split=1, interpret=True)
        out_sp = dec_sp(embed, t)
        err_sp = float(jnp.abs(out_sp.astype(jnp.float32) - ref).max())
        assert err_sp < 0.02, err_sp


class TestFastDecodeV5NeRVBoost:
    def test_matches_flax_decode(self):
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v5

        cfg = BoostConfig(
            model="NeRV_Boost", embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4)
        model = build_model(cfg)
        t = jnp.array([0.4])
        params = model.init(jax.random.key(0), t)
        ref = model.apply(params, t)

        dec = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                   interpret=True)
        out = dec(None, t)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        assert err < 0.02, err


class TestFastDecodeV5ENeRVBoost:
    def test_matches_flax_decode(self):
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v5

        cfg = BoostConfig(
            model="ENeRV_Boost", embed="pe_1.25_20", fc_hw="2_4", fc_dim=12,
            block_dim=16,
            dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4)
        model = build_model(cfg)
        t = jnp.array([0.4])
        params = model.init(jax.random.key(0), t)
        ref = model.apply(params, t)

        # planar_from_h=1 puts every stride-2 3x3 block in the planar
        # tail; the trunk + stage-0 ConvUpBlock stay flax.
        dec = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                   interpret=True)
        out = dec(None, t)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        assert err < 0.02, err


class TestFastDecodeV5Hybrid:
    def test_fine_tail_matches_flax(self):
        """fine_from_h switches the top zone to the v3 fine-grid kernels;
        output must still match the flax decode."""
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import build_fast_decode_v5

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

        # stage fine heights are 8, 16, 16: planar stage 0, v3 stages 1-2
        dec = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                   fine_from_h=16, interpret=True)
        out = dec(embed, t)
        assert out.shape == ref.shape, (out.shape, ref.shape)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        assert err < 0.02, err
