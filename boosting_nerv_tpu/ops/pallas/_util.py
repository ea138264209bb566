"""Shared Pallas plumbing."""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl


def pallas_call(*args, **kwargs):
    """`pl.pallas_call` whose returned callable traces with the matmul
    precision pinned to 'default'.

    The trainer sets `jax_default_matmul_precision` globally from
    `cfg.train_precision` ('high'/'highest' — the fp32 training-numerics
    requirement, CLAUDE.md).  `lax.dot` inside a Mosaic kernel inherits
    that global at trace time, and Mosaic cannot lower dots at
    HIGH/HIGHEST ("Unsupported dot precision: HIGH"), which silently
    knocked every in-training fast-decode/fps path back to the flax
    fallback.  The kernels compute in bf16/int8, where the precision
    flag (an f32-decomposition knob) is meaningless — pinning 'default'
    changes nothing numerically and keeps the kernels lowerable under
    any trainer precision."""
    inner = pl.pallas_call(*args, **kwargs)

    def call(*xs):
        with jax.default_matmul_precision("default"):
            return inner(*xs)

    return call
