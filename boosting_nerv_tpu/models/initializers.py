"""Parameter initializers matching torch layer defaults.

The reference model trains from torch's default Conv2d/Linear init
(kaiming_uniform with a=sqrt(5) => U(+-1/sqrt(fan_in)) on weights, and
U(+-1/sqrt(fan_in)) on biases). INR overfitting dynamics are sensitive to
init scale, so we reproduce those bounds for all conv/dense layers, and
trunc_normal(0.02)/zeros for ConvNeXt layers
(/root/reference/model_blocks.py:309-312).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_from_kernel_shape(shape) -> int:
    # Dense kernel: (in, out); Conv kernel HWIO: (kh, kw, in, out)
    if len(shape) == 2:
        return shape[0]
    return int(shape[0] * shape[1] * shape[2])


def torch_kernel_init(key, shape, dtype=jnp.float32):
    fan_in = _fan_in_from_kernel_shape(shape)
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def trunc_normal_init(stddev: float = 0.02):
    def init(key, shape, dtype=jnp.float32):
        # truncation at +-2 std, matching timm trunc_normal_
        return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)

    return init
