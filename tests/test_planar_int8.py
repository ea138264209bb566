"""W8A8 planar stage kernels (ops/pallas/planar prepare_*_i8) vs the
fine-grid f32 XLA references, interpret mode on CPU.

The int8 serving path quantises activations per-fine-channel (scales
folded into the weight K-columns) and weights per-output-row; these
tests check (a) the fold+quantise round-trip reproduces the f32 planar
mats within the rounding bound, and (b) the full int8 stage kernels
track the f32 reference within the expected quantisation noise at
calibrated bounds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from boosting_nerv_tpu.ops.pallas.planar import (
    _quant_conv, from_planar, fused_conv_rsft, fused_upconv_rsft,
    planar_conv_mats, prepare_conv_rsft_i8, prepare_upconv_rsft_i8,
    rgb_planar_to_nhwc, sft_planar_vectors, to_planar)

rng = np.random.default_rng(7)


def _rand(*shape, s=0.2):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


def _conv(x_chw, kern, bias):
    x = x_chw.transpose(1, 2, 0)[None].astype(jnp.float32)
    y = lax.conv_general_dilated(
        x, kern.astype(jnp.float32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (y[0] + bias).transpose(2, 0, 1)


def _rsft_taps(x, w0, b0, w1, b1, s0, h0, s1, h1):
    """f32 TAT reference returning (out, t0_input, t1_input) taps."""
    bc = lambda v: v[:, None, None]
    t0 = x * (bc(s0) + 1) + bc(h0)
    a = _conv(t0, w0, b0)
    t1 = jax.nn.gelu(a, approximate=False) * (bc(s1) + 1) + bc(h1)
    out = x + _conv(t1, w1, b1)
    return out, t0, t1


def _chmax(v):
    return jnp.max(jnp.abs(v), axis=(1, 2))


class TestQuantMats:
    def test_fold_roundtrip(self):
        c, co = 20, 24
        cp, cpo = 32, 32
        kern = _rand(3, 3, c, co)
        bound = jnp.abs(_rand(c, s=1.0)) + 0.1
        hq, fq, sc = _quant_conv(kern, cp, cpo, bound)
        assert hq.dtype == jnp.int8 and fq.dtype == jnp.int8
        sx = bound / 127.0
        kf = kern * sx[None, None, :, None]
        half, full = planar_conv_mats(kf, cp, cpo, dtype=jnp.float32)
        # dequantised mats reproduce the folded mats within sc/2 rounding
        err_f = jnp.abs(fq.astype(jnp.float32) * sc - full)
        assert float(jnp.max(err_f - 0.5 * sc)) <= 1e-6
        sch = jnp.stack([sc[:2 * cpo, 0], sc[2 * cpo:, 0]])[:, :, None]
        err_h = jnp.abs(hq.astype(jnp.float32) * sch - half)
        assert float(jnp.max(err_h - 0.5 * sch)) <= 1e-6

    def test_dead_channel(self):
        c = 20
        kern = _rand(3, 3, c, c)
        bound = jnp.abs(_rand(c, s=1.0)) + 0.1
        bound = bound.at[3].set(0.0)
        hq, fq, sc = _quant_conv(kern, 32, 32, bound)
        # dead input channel -> zero folded weight columns
        assert int(jnp.abs(fq[:, 3]).max()) == 0


class TestInt8StageKernels:
    def test_conv_rsft_i8(self):
        c, hc, wc, wd = 20, 11, 50, 128
        xf = _rand(c, 2 * hc, 2 * wc)
        ck, cb = _rand(3, 3, c, c), _rand(c, s=0.1)
        w0, w1 = _rand(3, 3, c, c), _rand(3, 3, c, c)
        b0, b1 = _rand(c, s=0.1), _rand(c, s=0.1)
        s0, h0, s1, h1 = [_rand(c, s=0.3) for _ in range(4)]
        hk, hb = _rand(3, 3, c, 3), _rand(3, s=0.1)

        mid = jnp.sin(_conv(xf, ck, cb))
        tat, t0, t1 = _rsft_taps(mid, w0, b0, w1, b1, s0, h0, s1, h1)
        ref = jnp.tanh(_conv(tat, hk, hb)) * 0.5 + 0.5
        bounds = dict(x=_chmax(xf), t0=_chmax(t0), t1=_chmax(t1),
                      h=_chmax(tat))

        prep = prepare_conv_rsft_i8(ck, cb, w0, b0, w1, b1, c=c,
                                    bounds=bounds, head_k=hk, head_b=hb)
        sft = sft_planar_vectors(s0, h0, s1, h1, 32)
        xp = to_planar(xf.astype(jnp.bfloat16))
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wd - wc)))
        out = fused_conv_rsft(xp, prep, sft, c=c, wc_real=wc, head=True,
                              th=4, interpret=True)
        got = rgb_planar_to_nhwc(out, hc, wc)[0].transpose(2, 0, 1)
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        rms = float(jnp.sqrt(jnp.mean(
            (got.astype(jnp.float32) - ref) ** 2)))
        # W8A8 noise on RANDOM normal weights (s=0.2) at max-calibrated
        # bounds measures 0.26 max / 0.024 RMS on the [0,1] OutImg range
        # (four cascaded quantised convs); trained decoders are far
        # gentler.  Slicing/scale bugs produce O(1) errors on most
        # elements — gate on both max and RMS.
        assert err < 0.35, err
        assert rms < 0.04, rms

    def test_conv_rsft_i8_nohead(self):
        c, hc, wc, wd = 20, 9, 50, 128
        xf = _rand(c, 2 * hc, 2 * wc)
        ck, cb = _rand(3, 3, c, c), _rand(c, s=0.1)
        w0, w1 = _rand(3, 3, c, c), _rand(3, 3, c, c)
        b0, b1 = _rand(c, s=0.1), _rand(c, s=0.1)
        s0, h0, s1, h1 = [_rand(c, s=0.3) for _ in range(4)]

        mid = jnp.sin(_conv(xf, ck, cb))
        ref, t0, t1 = _rsft_taps(mid, w0, b0, w1, b1, s0, h0, s1, h1)
        bounds = dict(x=_chmax(xf), t0=_chmax(t0), t1=_chmax(t1))

        prep = prepare_conv_rsft_i8(ck, cb, w0, b0, w1, b1, c=c,
                                    bounds=bounds)
        sft = sft_planar_vectors(s0, h0, s1, h1, 32)
        xp = to_planar(xf.astype(jnp.bfloat16))
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wd - wc)))
        out = fused_conv_rsft(xp, prep, sft, c=c, wc_real=wc, head=False,
                              th=4, interpret=True)
        got = from_planar(out, c)[:, :, :2 * wc]
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err

    def test_v5_decode_w8a8_e2e(self):
        """calibrate_planar_bounds -> build_fast_decode_v5(w8a8_bounds=)
        tracks the flax decode within W8A8 noise; misaligned-cp configs
        silently keep bf16 (w8a8_stages introspection checks both)."""
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import (
            build_fast_decode_v5, calibrate_planar_bounds)

        # fc_dim 30 -> tail channels 30/25/21, all _round16 -> 32 (int8
        # sublane alignment), so every planar stage engages W8A8
        cfg = BoostConfig(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_dim=30,
            dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4")
        model = build_model(cfg)
        img = jnp.asarray(rng.uniform(size=(1, 16, 16, 3))
                          .astype(np.float32))
        params = model.init(jax.random.key(0), img, jnp.array([0.4]))
        embed = model.apply(params, img, method="encode")

        frames = [(embed, jnp.array([tv])) for tv in (0.1, 0.4, 0.9)]
        bounds = calibrate_planar_bounds(cfg, params, frames,
                                         planar_from_h=1)
        assert all(np.all(np.isfinite(v)) and v.ndim == 1
                   for v in bounds.values())

        t = jnp.array([0.4])
        ref = model.apply(params, embed, t, method="decode")
        dec = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                   w8a8_bounds=bounds, interpret=True)
        # stage 0 is the ks=1 (1x1-conv) stage — not planar-eligible;
        # the planar tail spans stages 1 (A) and 2 (B), both W8A8
        assert dec.w8a8_stages == [1, 2], dec.w8a8_stages
        # zero-convert chain: stage 2's producer (stage 1, serialized)
        # emits int8 codes, so stage 2 receives i8_in
        assert dec.w8a8_zc == [2], dec.w8a8_zc
        out = dec(embed, t)
        assert out.shape == ref.shape
        diff = out.astype(jnp.float32) - ref
        err = float(jnp.abs(diff).max())
        rms = float(jnp.sqrt(jnp.mean(diff ** 2)))
        # three cascaded W8A8 stages of an UNTRAINED random decoder on
        # the [0,1] output range; layout/scale bugs give O(1) errors
        assert err < 0.2, err
        assert rms < 0.03, rms

        # a frame OUTSIDE the calibration t-range still degrades
        # gracefully (clipping saturates, it does not wrap)
        t2 = jnp.array([0.65])
        ref2 = model.apply(params, embed, t2, method="decode")
        err2 = float(jnp.abs(dec(embed, t2).astype(jnp.float32)
                             - ref2).max())
        assert err2 < 0.3, err2

    def test_v5_decode_w8a8_misaligned_cp32_vs_fallback(self, monkeypatch):
        """cp % 32-misaligned channel counts: cp32 mode (BNT_I8_CP32=1,
        opt-in until hardware-timed) pads the planes to a 32-multiple so
        the stages still serve int8 (dead rows carry exact zeros
        end-to-end); the default keeps the old behavior — misaligned
        stages silently stay bf16."""
        from boosting_nerv_tpu.config import BoostConfig
        from boosting_nerv_tpu.models import build_model
        from boosting_nerv_tpu.runtime.fast_decode import (
            build_fast_decode_v5, calibrate_planar_bounds)

        cfg = BoostConfig(
            model="HNeRV_Boost", embed="pe_1.25_20", fc_dim=12,
            dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
            conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
            sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
            enc_strds=[2, 2], enc_dim="8_4")
        model = build_model(cfg)
        img = jnp.asarray(rng.uniform(size=(1, 16, 16, 3))
                          .astype(np.float32))
        t = jnp.array([0.4])
        params = model.init(jax.random.key(0), img, t)
        embed = model.apply(params, img, method="encode")
        bounds = calibrate_planar_bounds(cfg, params, [(embed, t)],
                                         planar_from_h=1)
        ref = model.apply(params, embed, t, method="decode")

        # cp32 mode: padding makes the cp=16 stages i8-eligible
        monkeypatch.setenv("BNT_I8_CP32", "1")
        dec = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                   w8a8_bounds=bounds, interpret=True)
        assert dec.w8a8_stages == [1, 2], dec.w8a8_stages
        assert dec.w8a8_zc == [2], dec.w8a8_zc
        diff = dec(embed, t).astype(jnp.float32) - ref
        assert float(jnp.abs(diff).max()) < 0.2
        assert float(jnp.sqrt(jnp.mean(diff ** 2))) < 0.03

        # default (cp32 off): misaligned stages stay bf16, bit-faithful
        monkeypatch.delenv("BNT_I8_CP32", raising=False)
        dec0 = build_fast_decode_v5(cfg, params, planar_from_h=1, th=4,
                                    w8a8_bounds=bounds, interpret=True)
        assert dec0.w8a8_stages == []
        err = float(jnp.abs(dec0(embed, t).astype(jnp.float32)
                            - ref).max())
        assert err < 0.02, err

    def test_pack_roll_mode_bitwise_parity(self):
        """I8_KBUF_ROLL='pack' (packed-int32 bitcast lane rolls) must be
        BITWISE identical to the 'f32' widen path: both roll the same
        quantised int8 codes, only the representation differs.  The
        round-4 SIGABRT was root-caused to slicing an iota-derived col
        plane to the packed row count (tools/r5_pack_bisect2.py); the
        masks are now built directly at Cp/4 rows."""
        import boosting_nerv_tpu.ops.pallas.planar as pkm

        c, hc, wc, wd = 20, 9, 50, 128
        xf = _rand(c, 2 * hc, 2 * wc)
        ck, cb = _rand(3, 3, c, c), _rand(c, s=0.1)
        w0, w1 = _rand(3, 3, c, c), _rand(3, 3, c, c)
        b0, b1 = _rand(c, s=0.1), _rand(c, s=0.1)
        s0, h0, s1, h1 = [_rand(c, s=0.3) for _ in range(4)]
        mid = jnp.sin(_conv(xf, ck, cb))
        _, t0, t1 = _rsft_taps(mid, w0, b0, w1, b1, s0, h0, s1, h1)
        bounds = dict(x=_chmax(xf), t0=_chmax(t0), t1=_chmax(t1))
        prep = prepare_conv_rsft_i8(ck, cb, w0, b0, w1, b1, c=c,
                                    bounds=bounds)
        sft = sft_planar_vectors(s0, h0, s1, h1, 32)
        xp = to_planar(xf.astype(jnp.bfloat16))
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, wd - wc)))
        outs = {}
        old = pkm.I8_KBUF_ROLL
        try:
            for mode in ("f32", "pack"):
                pkm.I8_KBUF_ROLL = mode
                outs[mode] = fused_conv_rsft(
                    xp, prep, sft, c=c, wc_real=wc, head=False, th=4,
                    interpret=True)
        finally:
            pkm.I8_KBUF_ROLL = old
        a = np.asarray(outs["f32"].astype(jnp.float32))
        b = np.asarray(outs["pack"].astype(jnp.float32))
        assert (a == b).all(), float(np.abs(a - b).max())

    def test_upconv_rsft_i8(self):
        from boosting_nerv_tpu.ops.pixelshuffle import depth_to_space

        c_in, c, hc, wc, wd = 20, 20, 9, 50, 128
        x = _rand(c_in, hc, wc)
        upk, upb = _rand(3, 3, c_in, 4 * c), _rand(4 * c, s=0.1)
        w0, w1 = _rand(3, 3, c, c), _rand(3, 3, c, c)
        b0, b1 = _rand(c, s=0.1), _rand(c, s=0.1)
        s0, h0, s1, h1 = [_rand(c, s=0.3) for _ in range(4)]

        y = lax.conv_general_dilated(
            x.transpose(1, 2, 0)[None], upk, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + upb
        fine = jnp.sin(depth_to_space(y, 2))[0].transpose(2, 0, 1)
        ref, t0, t1 = _rsft_taps(fine, w0, b0, w1, b1, s0, h0, s1, h1)
        bounds = dict(x=_chmax(x), t0=_chmax(t0), t1=_chmax(t1))

        prep = prepare_upconv_rsft_i8(upk, upb, w0, b0, w1, b1,
                                      c_in=c_in, c=c, bounds=bounds)
        sft = sft_planar_vectors(s0, h0, s1, h1, 32)
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, wd - wc))).astype(jnp.bfloat16)
        out = fused_upconv_rsft(xp, prep, sft, c_in=c_in, c=c, wc_real=wc,
                                th=4, interpret=True)
        got = from_planar(out, c)[:, :, :2 * wc]
        err = float(jnp.abs(got.astype(jnp.float32) - ref).max())
        assert err < 0.05 * max(float(jnp.abs(ref).max()), 1.0), err
