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
