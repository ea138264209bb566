"""Tests: quantizer zoo roundtrips + gradients, entropy model numerics vs
torch, native rANS codec roundtrip and near-entropy rate, PTQ, Huffman."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from boosting_nerv_tpu.compress.huffman import (huffman_code_lengths,
                                                huffman_total_bits)
from boosting_nerv_tpu.compress.rans import (gaussian_ans_bits,
                                             gaussian_ans_decode,
                                             gaussian_ans_encode)
from boosting_nerv_tpu.ops.entropy import gaussian_bits, lower_bound, rate_bits
from boosting_nerv_tpu.ops.ptq import dequant_tensor, quant_tensor
from boosting_nerv_tpu.ops.quantize import QUANT_MAP, get_quantizer


def _w(seed=0, shape=(32, 16)):
    return jnp.asarray(np.random.default_rng(seed).normal(
        scale=0.1, size=shape).astype(np.float32))


class TestQuantizers:
    @pytest.mark.parametrize("name", sorted(QUANT_MAP))
    def test_roundtrip_accuracy(self, name):
        q = get_quantizer(name)
        x = _w()
        # lsqv2 is the reference's *embedding* quantizer, constructed
        # unsigned (model_hnerv.py:217); its min-based offset init needs the
        # unsigned code range
        signed = name != "lsqv2"
        qp = q.init_params(x, bits=8, signed=signed)
        code, quant, dequant = q.apply(x, qp, bits=8, signed=signed)
        assert code.shape == x.shape == dequant.shape
        if name == "dq":
            err = float(jnp.abs(dequant - jnp.round(x)).max())
            assert err < 1e-6
        elif name == "log":
            # reference Log_T is non-invertible over its init domain (its
            # decode assumes codes the encode cannot produce) — dead code in
            # the reference, kept for API parity; require finiteness only
            assert np.all(np.isfinite(np.asarray(dequant)))
        else:
            # 8-bit quantisation of a [-0.4, 0.4] weight: error ~ scale/2
            mae = float(jnp.abs(dequant - x).mean())
            assert mae < 0.01, (name, mae)

    @pytest.mark.parametrize("name", ["scale", "scalebeta", "lsq", "lsqv2"])
    def test_gradients_flow_to_scale(self, name):
        q = get_quantizer(name)
        x = _w(1)
        qp = q.init_params(x, bits=8, signed=True)

        def loss(qp, x):
            _, _, dq = q.apply(x, qp, bits=8, signed=True)
            return jnp.sum((dq - x) ** 2) + jnp.abs(dq).sum() * 0.01

        g = jax.grad(loss)(qp, x)
        assert float(jnp.abs(g["scale"]).sum()) > 0

    def test_ste_gradient_identity(self):
        from boosting_nerv_tpu.ops.quantize import ste

        g = jax.grad(lambda x: jnp.sum(ste(x) * 2.0))(jnp.array([0.3, 1.7]))
        np.testing.assert_allclose(np.asarray(g), [2.0, 2.0])

    def test_quant_is_rounded_code(self):
        q = get_quantizer("scale")
        x = _w(2)
        qp = q.init_params(x, bits=8, signed=True)
        code, quant, _ = q.apply(x, qp, bits=8, signed=True)
        np.testing.assert_allclose(np.asarray(quant), np.round(np.asarray(code)),
                                   atol=1e-5)

    def test_lsq_clamps(self):
        q = get_quantizer("lsq")
        x = jnp.asarray([10.0, -10.0, 0.01])
        qp = {"scale": jnp.asarray([0.01])}
        code, quant, _ = q.apply(x, qp, bits=8, signed=True)
        assert float(code.max()) <= 127 and float(code.min()) >= -128

    PER_CHANNEL = ["scale", "scalebeta", "lsq", "lsqv2", "edgescale"]

    @pytest.mark.parametrize("name", PER_CHANNEL)
    def test_per_channel_roundtrip(self, name):
        """One scale per out-channel (last axis of a flax NHWC kernel).
        Channels with very different ranges must each quantise well — the
        per-tensor scale would be dominated by the large channel."""
        q = get_quantizer(name)
        rng = np.random.default_rng(3)
        # kernel (3,3,8,4): channel 0 tiny, channel 3 large
        x = rng.normal(size=(3, 3, 8, 4)).astype(np.float32)
        x *= np.asarray([0.001, 0.01, 0.1, 1.0], np.float32)
        x = jnp.asarray(x)
        signed = name != "lsqv2"
        qp = q.init_params(x, bits=8, signed=signed, per_channel=True)
        assert qp["scale"].shape == (4,)
        code, quant, dequant = q.apply(x, qp, bits=8, signed=signed,
                                       per_channel=True)
        assert dequant.shape == x.shape
        # per-channel must be accurate on the SMALL channel too
        err_small = float(jnp.abs(dequant[..., 0] - x[..., 0]).max())
        assert err_small < 5e-4, (name, err_small)

        # and strictly better than per-tensor on that channel
        qp_t = q.init_params(x, bits=8, signed=signed, per_channel=False)
        _, _, dq_t = q.apply(x, qp_t, bits=8, signed=signed,
                             per_channel=False)
        err_t = float(jnp.abs(dq_t[..., 0] - x[..., 0]).max())
        assert err_small < err_t, (name, err_small, err_t)

    @pytest.mark.parametrize("name", PER_CHANNEL)
    def test_per_channel_gradients(self, name):
        q = get_quantizer(name)
        x = _w(5, shape=(2, 2, 4, 6))
        signed = name != "lsqv2"
        qp = q.init_params(x, bits=8, signed=signed, per_channel=True)

        def loss(qp):
            _, _, dq = q.apply(x, qp, bits=8, signed=signed,
                               per_channel=True)
            return jnp.sum(dq ** 2)

        g = jax.grad(loss)(qp)
        assert g["scale"].shape == qp["scale"].shape
        assert float(jnp.abs(g["scale"]).sum()) > 0

    def test_per_channel_bias_is_per_element(self):
        q = get_quantizer("lsq")
        x = jnp.asarray([0.001, 0.5, -0.5])
        qp = q.init_params(x, bits=8, signed=True, per_channel=True)
        assert qp["scale"].shape == (3,)
        # global range broadcast per element (transform_ops.py:88-90)
        np.testing.assert_allclose(np.asarray(qp["scale"]),
                                   np.full(3, 1.0 / 255), rtol=1e-5)
        _, _, dq = q.apply(x, qp, bits=8, signed=True, per_channel=True)
        assert float(jnp.abs(dq - x).max()) < 0.01

    @pytest.mark.parametrize("name", ["log", "exp", "multiscale"])
    def test_per_channel_unsupported_raises(self, name):
        """The reference silently ignores per_channel for these transforms
        (transform_ops.py:307-310,343-346,377-379); we refuse loudly."""
        q = get_quantizer(name)
        with pytest.raises(ValueError, match="per_channel"):
            q.init_params(_w(6), bits=8, signed=True, per_channel=True)


class TestEntropyModel:
    def test_bits_match_torch_reference(self):
        rng = np.random.default_rng(0)
        code = rng.normal(3.0, 20.0, size=1000).astype(np.float32)
        mean, std = code.mean(), code.std(ddof=1)
        ours = np.asarray(gaussian_bits(jnp.asarray(code), mean, std))
        tg = torch.distributions.normal.Normal(
            torch.tensor(float(mean)), torch.tensor(float(std)))
        probs = tg.cdf(torch.from_numpy(code) + 0.5) - tg.cdf(torch.from_numpy(code) - 0.5)
        ref = torch.clamp(-torch.log(probs + 1e-5) / math.log(2.0), min=0).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)

    def test_lower_bound_gradient(self):
        # below bound, positive grad -> blocked; negative grad -> passes
        g = jax.grad(lambda x: lower_bound(x, 0.0))(jnp.float32(-1.0))
        assert float(g) == 0.0
        g = jax.grad(lambda x: -lower_bound(x, 0.0))(jnp.float32(-1.0))
        assert float(g) == -1.0
        g = jax.grad(lambda x: lower_bound(x, 0.0))(jnp.float32(1.0))
        assert float(g) == 1.0

    def test_rate_bits_train_vs_eval(self):
        code = jnp.asarray(np.random.default_rng(1).normal(0, 5, 500).astype(np.float32))
        r_eval = rate_bits(jnp.round(code), None, training=False)
        r_train = rate_bits(code, jax.random.key(0), training=True)
        # both are ~ entropy * n; within 15%
        assert abs(float(r_eval["bitrate"]) - float(r_train["bitrate"])) \
            / float(r_eval["bitrate"]) < 0.15


class TestRANS:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        sym = np.round(rng.normal(2.0, 9.0, size=5000)).astype(np.int32)
        stream, mn, mx = gaussian_ans_encode(sym, sym.mean(), sym.std())
        dec = gaussian_ans_decode(stream, sym.size, sym.mean(), sym.std(), mn, mx)
        np.testing.assert_array_equal(dec, sym)

    def test_rate_near_entropy(self):
        rng = np.random.default_rng(1)
        sigma = 12.0
        sym = np.round(rng.normal(0, sigma, size=20000)).astype(np.int32)
        bits = gaussian_ans_bits(sym, float(sym.mean()), float(sym.std()))
        # model-based ideal rate
        ideal = float(np.sum(np.asarray(gaussian_bits(
            jnp.asarray(sym, jnp.float32), float(sym.mean()), float(sym.std())))))
        assert bits < ideal * 1.01 + 64 * 8, (bits, ideal)
        assert bits > ideal * 0.95

    def test_categorical_roundtrip(self):
        from boosting_nerv_tpu.compress.rans import (categorical_ans_decode,
                                                     categorical_ans_encode)

        rng = np.random.default_rng(3)
        vals = rng.choice([-7, 0, 1, 3, 250], p=[.1, .5, .2, .15, .05],
                          size=8000).astype(np.int64)
        stream, unique, counts = categorical_ans_encode(vals)
        dec = categorical_ans_decode(stream, vals.size, unique, counts)
        np.testing.assert_array_equal(dec, vals)
        # near the empirical entropy
        p = counts / counts.sum()
        h = float(-(p * np.log2(p)).sum()) * vals.size
        assert stream.size * 32 < h * 1.02 + 96

    def test_degenerate_constant_tensor(self):
        sym = np.zeros(100, dtype=np.int32)
        bits = gaussian_ans_bits(sym, 0.0, 1e-9)
        assert bits >= 64  # state flush only
        stream, mn, mx = gaussian_ans_encode(sym, 0.0, 1e-9)
        dec = gaussian_ans_decode(stream, 100, 0.0, 1e-9, mn, mx)
        np.testing.assert_array_equal(dec, sym)


class TestPTQ:
    def test_roundtrip_error_small(self):
        t = np.random.default_rng(0).normal(size=(16, 3, 3, 8)).astype(np.float32)
        q, new_t = quant_tensor(t, 8)
        assert q["quant"].dtype == np.uint8
        assert np.abs(new_t - t).mean() < 0.02
        np.testing.assert_allclose(dequant_tensor(q), new_t, atol=1e-3)

    def test_matches_reference_whole_tensor_grid(self):
        t = np.array([[0.0, 1.0], [2.0, 3.0]], dtype=np.float32)
        q, new_t = quant_tensor(t, 8)
        np.testing.assert_allclose(new_t, t, atol=0.02)

    def test_axis_candidate_used_when_better(self):
        # rows with very different ranges: per-axis wins
        t = np.stack([np.linspace(0, 1, 64), np.linspace(0, 100, 64)]
                     ).astype(np.float32).T  # (64, 2): per-column ranges differ
        q, new_t = quant_tensor(t, 8)
        assert np.abs(new_t - t).mean() < 0.3


class TestHuffman:
    def test_known_code_lengths(self):
        lengths = huffman_code_lengths({"a": 45, "b": 13, "c": 12, "d": 16,
                                        "e": 9, "f": 5})
        assert lengths["a"] == 1
        assert lengths["f"] == 4
        # Kraft equality for a complete code
        assert sum(2.0 ** -l for l in lengths.values()) == pytest.approx(1.0)

    def test_total_bits(self):
        vals = [0] * 90 + [1] * 9 + [2]
        total, n = huffman_total_bits(vals)
        assert n == 100
        assert total == 90 * 1 + 9 * 2 + 1 * 2
