"""Model registry: the four trainable families the reference exposes
(train_nerv_all.py:220-231)."""

from __future__ import annotations

from ..config import BoostConfig
from .enerv import ENeRV, ENeRVBoost
from .hnerv import HNeRV, HNeRVBoost
from .nerv import NeRVBoost

_REGISTRY = {
    "NeRV_Boost": NeRVBoost,
    "ENeRV": ENeRV,
    "ENeRV_Boost": ENeRVBoost,
    "HNeRV_Boost": HNeRVBoost,
    "HNeRV": HNeRV,
}


def build_model(cfg: BoostConfig):
    try:
        cls = _REGISTRY[cfg.model]
    except KeyError:
        raise KeyError(f"Unknown model {cfg.model!r}; "
                       f"available: {sorted(_REGISTRY)}")
    return cls(cfg)
