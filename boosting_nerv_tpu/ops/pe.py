"""Sinusoidal frame-index positional encoding.

Capability parity with the reference `PositionEncoding`
(/root/reference/model_blocks.py:108-126): an embed spec string
``pe_<lbase>_<levels>`` produces frequencies ``lbase**arange(levels) * lfreq``
(``lfreq`` defaults to pi) and the embedding is ``[sin(pos*f), cos(pos*f)]``
of length ``2*levels``.

TPU-native design note: the encoding is a flat ``[..., 2L]`` feature vector
(NHWC models consume it through Dense stems); the reference's trailing
``[B, 2L, 1, 1]`` NCHW reshape is layout noise we do not reproduce.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class PEConfig:
    lbase: float
    levels: int
    lfreq: float = math.pi

    @property
    def embed_length(self) -> int:
        return 2 * self.levels

    @staticmethod
    def from_string(embed: str, lfreq: str = "pi") -> "PEConfig":
        """Parse the reference CLI spelling, e.g. ``pe_1.25_80``."""
        if "pe" not in embed:
            raise ValueError(f"not a positional-encoding spec: {embed!r}")
        parts = embed.split("_")
        lbase, levels = float(parts[-2]), int(float(parts[-1]))
        freq = math.pi if lfreq == "pi" else float(lfreq)
        return PEConfig(lbase=lbase, levels=levels, lfreq=freq)


def position_encoding(pos: jnp.ndarray, cfg: PEConfig) -> jnp.ndarray:
    """pos: [...] scalar positions in (0, 1] -> [..., 2*levels] embedding."""
    bases = cfg.lbase ** jnp.arange(cfg.levels, dtype=jnp.float32) * cfg.lfreq
    vals = pos[..., None].astype(jnp.float32) * bases
    return jnp.concatenate([jnp.sin(vals), jnp.cos(vals)], axis=-1)
