"""NHWC depth<->space rearranges (PixelShuffle / PixelUnshuffle equivalents).

The reference uses torch ``nn.PixelShuffle`` / ``nn.PixelUnshuffle`` in NCHW
(/root/reference/model_blocks.py:196-220, 174-193). On TPU the native conv
layout is NHWC, so we use the channels-last depth-to-space convention
(block-position-major channel packing); since all models here are trained
from scratch, the intra-channel permutation relative to torch is immaterial —
only the structural upsample matters. XLA lowers these reshape+transpose
pairs to free layout ops fused with the surrounding convs.
"""

from __future__ import annotations

import jax.numpy as jnp


def depth_to_space(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B,H,W,C*r*r] -> [B,H*r,W*r,C]."""
    if r == 1:
        return x
    b, h, w, c = x.shape
    cout = c // (r * r)
    if cout * r * r != c:
        raise ValueError(f"channels {c} not divisible by r^2={r*r}")
    x = x.reshape(b, h, w, r, r, cout)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * r, w * r, cout)


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """[B,H*r,W*r,C] -> [B,H,W,C*r*r]. Inverse of depth_to_space."""
    if r == 1:
        return x
    b, hr, wr, c = x.shape
    h, w = hr // r, wr // r
    if h * r != hr or w * r != wr:
        raise ValueError(f"spatial dims {(hr, wr)} not divisible by r={r}")
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, r * r * c)
