"""ctypes binding for the native rANS codec (csrc/rans.cpp).

Replaces the reference's constriction dependency
(/root/reference/lib/entropy_model.py:46-62): `gaussian_ans_bits` returns
the REAL compressed size in bits of a quantized-integer tensor under the
global quantized-Gaussian model, and encode/decode round-trip losslessly.

The shared library is compiled on first use with the in-image g++ and
cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_SO = os.path.join(_CSRC, "librans.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> None:
    src = os.path.join(_CSRC, "rans.cpp")
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _lib() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is None:
            src = os.path.join(_CSRC, "rans.cpp")
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(src)):
                _build()
            lib = ctypes.CDLL(_SO)
            lib.rans_gaussian_encode.restype = ctypes.c_long
            lib.rans_gaussian_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                ctypes.c_double, ctypes.c_double, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_uint32),
                ctypes.c_long]
            lib.rans_gaussian_decode.restype = ctypes.c_long
            lib.rans_gaussian_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_long,
                ctypes.c_double, ctypes.c_double, ctypes.c_int32,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int32)]
            lib.rans_categorical_encode.restype = ctypes.c_long
            lib.rans_categorical_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_long]
            lib.rans_categorical_decode.restype = ctypes.c_long
            lib.rans_categorical_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_long, ctypes.c_long,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int32)]
            _LIB = lib
    return _LIB


def _model_range(symbols: np.ndarray) -> Tuple[int, int]:
    """min/max with the reference's degenerate-range fix
    (entropy_model.py:53-55)."""
    min_v = int(symbols.min())
    max_v = int(symbols.max())
    if min_v == max_v:
        max_v = min_v + 1
    return min_v, max_v


def gaussian_ans_encode(symbols: np.ndarray, mean: float, std: float
                        ) -> Tuple[np.ndarray, int, int]:
    """Encode int symbols; returns (stream words, min_v, max_v)."""
    sym = np.ascontiguousarray(np.asarray(symbols).ravel(), dtype=np.int32)
    std = float(np.clip(std, 1e-5, 1e10))
    min_v, max_v = _model_range(sym)
    cap = sym.size + 16
    out = np.empty(cap, dtype=np.uint32)
    n = _lib().rans_gaussian_encode(
        sym.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), sym.size,
        float(mean), std, min_v, max_v,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
    if n < 0:
        raise RuntimeError("rANS output buffer overflow (incompressible data)")
    return out[:n].copy(), min_v, max_v


def gaussian_ans_decode(stream: np.ndarray, n_symbols: int, mean: float,
                        std: float, min_v: int, max_v: int) -> np.ndarray:
    stream = np.ascontiguousarray(stream, dtype=np.uint32)
    std = float(np.clip(std, 1e-5, 1e10))
    out = np.empty(n_symbols, dtype=np.int32)
    r = _lib().rans_gaussian_decode(
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), stream.size,
        n_symbols, float(mean), std, min_v, max_v,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if r != 0:
        raise RuntimeError("rANS decode failed")
    return out


def gaussian_ans_bits(symbols: np.ndarray, mean: float, std: float) -> int:
    """Real compressed size in bits (the reference's real_bitrate,
    entropy_model.py:46-62)."""
    stream, _, _ = gaussian_ans_encode(symbols, mean, std)
    return int(stream.size) * 32


def categorical_ans_encode(values: np.ndarray
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Empirical-table ANS coding of an arbitrary integer tensor (parity
    with compress_matrix_flatten_categorical, entropy_model.py:65-81).
    Returns (stream words, unique symbol values, their counts)."""
    vals = np.asarray(values).ravel()
    unique, inverse, counts = np.unique(vals, return_inverse=True,
                                        return_counts=True)
    probs = np.ascontiguousarray(counts / counts.sum(), dtype=np.float64)
    msg = np.ascontiguousarray(inverse, dtype=np.int32)
    cap = msg.size + 16
    out = np.empty(cap, dtype=np.uint32)
    n = _lib().rans_categorical_encode(
        msg.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), msg.size,
        probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), probs.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap)
    if n < 0:
        raise RuntimeError(f"categorical rANS encode failed ({n})")
    return out[:n].copy(), unique, counts


def categorical_ans_decode(stream: np.ndarray, n_symbols: int,
                           unique: np.ndarray, counts: np.ndarray
                           ) -> np.ndarray:
    stream = np.ascontiguousarray(stream, dtype=np.uint32)
    probs = np.ascontiguousarray(counts / counts.sum(), dtype=np.float64)
    idx = np.empty(n_symbols, dtype=np.int32)
    r = _lib().rans_categorical_decode(
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), stream.size,
        n_symbols, probs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        probs.size, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if r != 0:
        raise RuntimeError("categorical rANS decode failed")
    return np.asarray(unique)[idx]
