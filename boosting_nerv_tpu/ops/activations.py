"""Activation registry.

Same activation menu as the reference `ActivationLayer`
(/root/reference/model_blocks.py:136-158): relu, leaky (slope .01),
leaky01 (slope .1), relu6, gelu (exact erf form, matching torch nn.GELU),
sin (the Boost default), swish, softplus, hardswish.

The reference also advertises a ``ressin`` CLI choice with no implementation
(KeyError at model_blocks.py:156); we intentionally reject it the same way.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _gelu_exact(x):
    return jax.nn.gelu(x, approximate=False)


def _hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


_ACTS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "leaky": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    "leaky01": lambda x: jax.nn.leaky_relu(x, negative_slope=0.1),
    "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
    "gelu": _gelu_exact,
    "sin": jnp.sin,
    "swish": jax.nn.silu,
    "softplus": jax.nn.softplus,
    "hardswish": _hardswish,
    "none": lambda x: x,
}


def get_activation(name: str) -> Callable:
    try:
        return _ACTS[name]
    except KeyError:
        raise KeyError(f"Unknown activation function {name}.")
