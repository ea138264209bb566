"""Correctness of the fused Pallas ResBlock_SFT kernel against the plain
jnp reference, run in Pallas interpret mode on CPU (skipped if this JAX
version can't interpret the TPU DMA/roll primitives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from boosting_nerv_tpu.ops.pallas.fused_sft import resblock_sft_chw

C, H, W = 8, 16, 128


def _ref(x, w0, b0, w1, b1, s0, h0, s1, h1):
    xn = x.transpose(1, 2, 0)[None].astype(jnp.float32)
    wa = np.asarray(w0, np.float32).reshape(3, 3, C, C).transpose(0, 1, 3, 2)
    wb = np.asarray(w1, np.float32).reshape(3, 3, C, C).transpose(0, 1, 3, 2)
    fea = xn * (s0 + 1.0) + h0
    fea = lax.conv_general_dilated(fea, wa, (1, 1), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fea = jax.nn.gelu(fea + b0, approximate=False)
    fea = fea * (s1 + 1.0) + h1
    fea = lax.conv_general_dilated(fea, wb, (1, 1), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (xn + fea + b1)[0].transpose(2, 0, 1)


class TestFusedResblockSFT:
    def test_matches_reference_interpret(self):
        key = jax.random.key(0)
        ks = jax.random.split(key, 9)
        x = jax.random.normal(ks[0], (C, H, W), jnp.bfloat16)
        w0 = jax.random.normal(ks[1], (9, C, C), jnp.bfloat16) * 0.1
        w1 = jax.random.normal(ks[2], (9, C, C), jnp.bfloat16) * 0.1
        b0 = jax.random.normal(ks[3], (C,), jnp.float32) * 0.1
        b1 = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
        s0 = jax.random.normal(ks[5], (C,), jnp.float32) * 0.2
        h0 = jax.random.normal(ks[6], (C,), jnp.float32) * 0.2
        s1 = jax.random.normal(ks[7], (C,), jnp.float32) * 0.2
        h1 = jax.random.normal(ks[8], (C,), jnp.float32) * 0.2

        try:
            out = resblock_sft_chw(x, w0, b0, w1, b1, s0, h0, s1, h1,
                                   interpret=True)
        except Exception as e:  # interpret-mode gap in this jax version
            pytest.skip(f"pallas interpret mode unavailable: {type(e).__name__}")

        ref = _ref(x, w0, b0, w1, b1, s0, h0, s1, h1)
        err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
        scale = float(jnp.abs(ref).max())
        assert err / (scale + 1e-6) < 0.05, (err, scale)
