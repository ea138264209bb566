"""Differentiable entropy model (Consistent Entropy Minimisation core).

Parity with `DiffEntropyModel` (/root/reference/lib/entropy_model.py:14-43):
a single global Gaussian (or Laplace) per tensor over its quantiser codes;
training perturbs codes with U(-1/2, 1/2) noise and estimates
bits = -log2(CDF(x+1/2) - CDF(x-1/2) + 1e-5), floored at 0 through
`lower_bound` — a custom-VJP clamp that passes gradients when the input is
above the bound OR the gradient pushes it up (entropy_model.py:100-114).

Std uses the unbiased (ddof=1) estimator to match torch.std.
Real bitstream sizes at eval come from the native rANS codec
(boosting_nerv_tpu.compress.rans), not from this module.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


@jax.custom_vjp
def lower_bound(x: jnp.ndarray, bound: float) -> jnp.ndarray:
    return jnp.maximum(x, bound)


def _lb_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lb_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lb_fwd, _lb_bwd)


def _normal_cdf(x):
    return 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def _laplace_cdf(x, mu, b):
    z = x - mu
    return 0.5 - 0.5 * jnp.sign(z) * jnp.expm1(-jnp.abs(z) / b)


def gaussian_bits(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray,
                  distribution: str = "gaussian") -> jnp.ndarray:
    """Per-element bit estimate under the global Gaussian/Laplace model."""
    std = jnp.clip(std, 1e-5, 1e10)
    if distribution == "gaussian":
        probs = (_normal_cdf((x + 0.5 - mean) / std)
                 - _normal_cdf((x - 0.5 - mean) / std))
    else:
        probs = (_laplace_cdf(x + 0.5, mean, std)
                 - _laplace_cdf(x - 0.5, mean, std))
    bits = -jnp.log(probs + 1e-5) / math.log(2.0)
    return lower_bound(bits, 0.0)


def code_stats(code: jnp.ndarray):
    """(mean, unbiased std) of a code tensor — the per-tensor model params."""
    mean = code.mean()
    std = jnp.std(code, ddof=1) if code.size > 1 else jnp.zeros(())
    return mean, std


def rate_bits(code: jnp.ndarray, key, training: bool,
              distribution: str = "gaussian") -> Dict[str, jnp.ndarray]:
    """Total estimated bits for one tensor. During training the codes are
    noise-relaxed (U(-0.5, 0.5)); at eval pass the rounded codes directly."""
    mean, std = code_stats(code)
    x = code
    if training:
        x = code + jax.random.uniform(key, code.shape, code.dtype, -0.5, 0.5)
    bits = jnp.sum(gaussian_bits(x, mean, std, distribution))
    return {"bitrate": bits, "mean": mean, "std": std}
