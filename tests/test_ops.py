"""Unit tests for core ops: PE, activations, pixelshuffle, losses, metrics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from boosting_nerv_tpu.ops import (PEConfig, depth_to_space, get_activation,
                                   loss_fn, position_encoding, psnr_per_frame,
                                   space_to_depth)
from boosting_nerv_tpu.ops.losses import out_img


class TestPE:
    def test_matches_closed_form(self):
        cfg = PEConfig.from_string("pe_1.25_80")
        pos = jnp.array([0.5])
        out = position_encoding(pos, cfg)
        assert out.shape == (1, 160)
        # Closed-form check on levels 0..39 (arguments < ~1.2e3 where fp32
        # sin is well-conditioned). Beyond that, 1.25**level amplifies fp32
        # pow rounding (~5e-6 relative) to O(100) radians, so the exact values
        # are implementation-defined — in the fp32 reference as well; we only
        # require boundedness there.
        bases = 1.25 ** np.arange(24, dtype=np.float64) * math.pi
        np.testing.assert_allclose(np.asarray(out[0, :24]),
                                   np.sin(0.5 * bases), rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out[0, 80:104]),
                                   np.cos(0.5 * bases), rtol=1e-4, atol=1e-3)
        assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-6)

    def test_lfreq_override(self):
        cfg = PEConfig.from_string("pe_1.05_80", lfreq="2.0")
        assert cfg.lfreq == 2.0
        assert cfg.embed_length == 160

    def test_batched(self):
        cfg = PEConfig.from_string("pe_1.25_8")
        out = position_encoding(jnp.linspace(0.1, 1.0, 4), cfg)
        assert out.shape == (4, 16)


class TestActivations:
    @pytest.mark.parametrize("name,tfn", [
        ("relu", torch.nn.ReLU()),
        ("leaky", torch.nn.LeakyReLU()),
        ("leaky01", torch.nn.LeakyReLU(0.1)),
        ("relu6", torch.nn.ReLU6()),
        ("gelu", torch.nn.GELU()),
        ("swish", torch.nn.SiLU()),
        ("softplus", torch.nn.Softplus()),
        ("hardswish", torch.nn.Hardswish()),
        ("sin", torch.sin),
    ])
    def test_matches_torch(self, name, tfn):
        x = np.linspace(-5, 5, 101, dtype=np.float32)
        ours = np.asarray(get_activation(name)(jnp.asarray(x)))
        theirs = tfn(torch.from_numpy(x)).numpy()
        # softplus: torch evaluates log1p(exp(x)) with a different fp32
        # ordering; ~1e-4 absolute drift is expected
        atol = 2e-4 if name == "softplus" else 1e-6
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=atol)

    def test_unknown_raises(self):
        with pytest.raises(KeyError):
            get_activation("ressin")


class TestPixelShuffle:
    def test_roundtrip(self):
        x = jnp.arange(2 * 3 * 4 * 18, dtype=jnp.float32).reshape(2, 3, 4, 18)
        y = depth_to_space(x, 3)
        assert y.shape == (2, 9, 12, 2)
        np.testing.assert_array_equal(np.asarray(space_to_depth(y, 3)),
                                      np.asarray(x))

    def test_upsample_structure(self):
        # each output rxr block must be exactly the r*r channels of one pixel
        r = 2
        x = np.random.default_rng(0).normal(size=(1, 2, 2, 4)).astype(np.float32)
        y = np.asarray(depth_to_space(jnp.asarray(x), r))
        for i in range(2):
            for j in range(2):
                block = y[0, i * r:(i + 1) * r, j * r:(j + 1) * r, 0].ravel()
                np.testing.assert_array_equal(np.sort(block), np.sort(x[0, i, j]))

    def test_identity_r1(self):
        x = jnp.ones((1, 4, 4, 3))
        assert depth_to_space(x, 1) is x


class TestOutImg:
    def test_tanh(self):
        x = jnp.array([-100.0, 0.0, 100.0])
        y = out_img(x, "tanh")
        np.testing.assert_allclose(np.asarray(y), [0.0, 0.5, 1.0], atol=1e-6)

    def test_sigmoid(self):
        x = jnp.array([0.0])
        np.testing.assert_allclose(np.asarray(out_img(x, "sigmoid")), [0.5])

    def test_bias(self):
        np.testing.assert_allclose(np.asarray(out_img(jnp.array([0.1]), "0.5")),
                                   [0.6], rtol=1e-6)


class TestLosses:
    def _pair(self, h=64, w=64):
        rng = np.random.default_rng(42)
        a = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
        b = np.clip(a + rng.normal(scale=0.05, size=a.shape), 0, 1).astype(np.float32)
        return a, b

    def test_l1_l2_match_torch(self):
        a, b = self._pair()
        ta, tb = torch.from_numpy(a), torch.from_numpy(b)
        l1_ref = F.l1_loss(ta, tb, reduction="none").flatten(1).mean(1).mean().item()
        l2_ref = F.mse_loss(ta, tb, reduction="none").flatten(1).mean(1).mean().item()
        assert float(loss_fn(jnp.asarray(a), jnp.asarray(b), "L1")) == pytest.approx(l1_ref, rel=1e-5)
        assert float(loss_fn(jnp.asarray(a), jnp.asarray(b), "L2")) == pytest.approx(l2_ref, rel=1e-5)

    def test_freq_term_matches_torch(self):
        a, b = self._pair()
        # torch reference computes in NCHW over dims (-2,-1); ours in NHWC over (1,2)
        ta = torch.from_numpy(a).permute(0, 3, 1, 2)
        tb = torch.from_numpy(b).permute(0, 3, 1, 2)
        pf = torch.fft.fft2(ta, dim=(-2, -1))
        tf_ = torch.fft.fft2(tb, dim=(-2, -1))
        pf = torch.stack([pf.real, pf.imag], -1)
        tf_ = torch.stack([tf_.real, tf_.imag], -1)
        l1_ref = F.l1_loss(ta, tb, reduction="none").flatten(1).mean(1)
        freq_ref = F.l1_loss(pf, tf_, reduction="none").flatten(1).mean(1)
        ref = (60.0 * l1_ref + freq_ref).mean().item()
        ours = float(loss_fn(jnp.asarray(a), jnp.asarray(b), "L1_freq"))
        assert ours == pytest.approx(ref, rel=1e-4)

    def test_fusion10_freq_runs_720p_shape(self):
        a, b = self._pair(h=180, w=320)
        v = float(loss_fn(jnp.asarray(a), jnp.asarray(b), "Fusion10_freq"))
        assert np.isfinite(v) and v > 0

    def test_unknown_loss(self):
        a, b = self._pair(8, 8)
        with pytest.raises(KeyError):
            loss_fn(jnp.asarray(a), jnp.asarray(b), "nope")


class TestMetrics:
    def test_psnr_identity(self):
        x = jnp.ones((2, 8, 8, 3)) * 0.5
        p = psnr_per_frame(x, x)
        np.testing.assert_allclose(np.asarray(p), 90.0, atol=1.0)

    def test_psnr_known_value(self):
        x = jnp.zeros((1, 8, 8, 3))
        y = jnp.full((1, 8, 8, 3), 0.1)
        # mse = 0.01 -> psnr = 20
        assert float(psnr_per_frame(x, y)[0]) == pytest.approx(20.0, abs=1e-3)
