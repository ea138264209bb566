"""Post-training quantisation for the regression eval path.

Mirrors `quant_tensor` / `dequant_tensor`
(/root/reference/hnerv_utils.py:101-134, 185-188): candidates are the
whole-tensor affine grid plus one per axis whose min/scale overhead is <2%
of the element count (axis candidates' min/scale are cast to fp16, the
whole-tensor candidate stays fp32 — a reference quirk we reproduce); the
lowest-mean-absolute-error candidate wins. Quantised codes are uint8 (up to
8 bits); min/scale overhead is accounted at 16 bits each
(train_nerv_all.py:609).

Host-side numpy: this runs once per eval, not in the train step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_EPS = 1e-19


def quant_tensor(t: np.ndarray, bits: int = 8) -> Tuple[Dict, np.ndarray]:
    t = np.asarray(t, dtype=np.float32)
    qmax = 2 ** bits - 1
    candidates = []  # (t_min, scale) possibly axis-shaped

    t_min, t_max = t.min(), t.max()
    candidates.append((np.float32(t_min),
                       np.float32((t_max - t_min) / qmax)))
    for axis in range(t.ndim):
        a_min = t.min(axis=axis, keepdims=True)
        a_max = t.max(axis=axis, keepdims=True)
        if a_min.size / t.size < 0.02:
            scale = ((a_max - a_min) / qmax).astype(np.float16)
            candidates.append((a_min.astype(np.float16), scale))

    best = None
    for t_min_c, scale_c in candidates:
        tm = np.broadcast_to(np.asarray(t_min_c, np.float32), t.shape)
        sc = np.broadcast_to(np.asarray(scale_c, np.float32), t.shape)
        quant = np.clip(np.round((t - tm) / (sc + _EPS)), 0, qmax)
        new_t = tm + sc * quant
        err = np.abs(t - new_t).mean()
        if best is None or err < best[0]:
            best = (err, quant, new_t, t_min_c, scale_c)

    _, quant, new_t, t_min_c, scale_c = best
    quant_t = {"quant": quant.astype(np.uint8), "min": t_min_c,
               "scale": scale_c}
    return quant_t, new_t.astype(np.float32)


def dequant_tensor(quant_t: Dict) -> np.ndarray:
    quant = quant_t["quant"].astype(np.float32)
    tm = np.asarray(quant_t["min"], np.float32)
    sc = np.asarray(quant_t["scale"], np.float32)
    return tm + sc * quant


def _nonzero_minmax(rows: np.ndarray):
    """Per-row (min, max) over non-zero entries; (0, 0) for all-zero rows
    (the reference's sparse-aware grid, hnerv_utils.py:141-148)."""
    mask = rows != 0
    any_valid = mask.any(axis=1)
    big = np.float32(np.inf)
    mins = np.where(mask, rows, big).min(axis=1)
    maxs = np.where(mask, rows, -big).max(axis=1)
    mins = np.where(any_valid, mins, 0.0)
    maxs = np.where(any_valid, maxs, 0.0)
    return mins.astype(np.float32), maxs.astype(np.float32)


def quantize_per_tensor(t: np.ndarray, bits: int = 8, axis: int = -1):
    """Affine quantisation over the whole tensor or along axis 0/1, with
    zeros excluded from the range fit (parity with `quantize_per_tensor`,
    /root/reference/hnerv_utils.py:136-181). Returns
    (quant, dequant, t_min, scale); min/scale are fp16."""
    t = np.asarray(t, dtype=np.float32)
    qmax = 2 ** bits - 1
    if axis == -1:
        valid = t[t != 0]
        src = valid if valid.size else t.ravel()
        t_min = np.float32(src.min())
        scale = np.float32((src.max() - t_min) / qmax)
    else:
        moved = np.moveaxis(t, axis, 0).reshape(t.shape[axis], -1)
        mins, maxs = _nonzero_minmax(moved)
        shape = [1] * t.ndim
        shape[axis] = t.shape[axis]
        t_min = mins.reshape(shape)
        scale = ((maxs - mins) / qmax).reshape(shape)
    t_min = t_min.astype(np.float16)
    scale = scale.astype(np.float16)
    tm32, sc32 = t_min.astype(np.float32), scale.astype(np.float32)
    quant = np.round((t - tm32) / (sc32 + _EPS))
    new_t = tm32 + sc32 * quant
    return quant, new_t, t_min, scale
