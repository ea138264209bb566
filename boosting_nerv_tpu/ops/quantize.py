"""Quantizer zoo: the nine QAT transforms of the CEM compression path.

Functional redesign of /root/reference/lib/transform_ops.py: each quantizer
is a pair of pure functions —

  init_params(x, bits, signed, per_channel) -> dict of trainable arrays
  apply(x, qp, bits, signed, per_channel)   -> (code, quant, dequant)

`quant = ste(code)` rounds with a straight-through gradient; learned scales
receive gradients through both the dequantised weights (task loss) and the
`code` statistics (rate loss), exactly the coupling CEM trains through.
Quantizer params live in their own pytree next to the model params and are
updated by the same Adan step (the reference registers them as module
parameters on CustomConv2d/CustomLinear, lib/quant_ops.py:18-65).

Registry names match the CLI: lsq, lsqv2, scale, scalebeta, edgescale,
multiscale, log, exp, dq (lib/quant_ops.py:6-16). The paper's compression
scripts use scale (weights/biases) + scalebeta (embeddings).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray
QP = Dict[str, Array]


def ste(x: Array) -> Array:
    """Round with identity gradient (lib/transform_ops.py:8-9)."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def grad_scale(x: Array, scale) -> Array:
    """Value x, gradient scaled by `scale` (lib/transform_ops.py:5-6)."""
    return x * scale + jax.lax.stop_gradient(x - x * scale)


def _myabs(x):
    return jnp.where(x == 0, x, jnp.abs(x))


def _mysign(x):
    return jnp.where(x == 0, jnp.ones_like(x), jnp.sign(x))


def _reject_per_channel(name: str, per_channel: bool):
    """The reference's log/exp/multiscale transforms silently ignore
    per_channel (transform_ops.py:307-310, 343-346, 377-379); we raise so
    the flag can't silently no-op."""
    if per_channel:
        raise ValueError(
            f"quantizer {name!r} does not support per_channel "
            "(use lsq/lsqv2/scale/scalebeta/edgescale)")


def qrange(bits: int, signed: bool) -> Tuple[int, int]:
    if signed:
        return -(2 ** (bits - 1)), 2 ** (bits - 1) - 1
    return 0, 2 ** bits - 1


def _range_scale(x: Array, bits: int, signed: bool) -> Array:
    qmin, qmax = qrange(bits, signed)
    return (x.max() - x.min()) / (qmax - qmin)


def _per_channel_reduce(x, fn):
    """Reduce over all axes except the channel axis (the out-channel = LAST
    axis of a flax NHWC kernel). The reference's convention is dim 0 of
    OIHW torch kernels (transform_ops.py:97-98) — the same out-channel,
    different layout. 1-D tensors (biases) get the global statistic
    broadcast per element, the reference's init (transform_ops.py:88-90)."""
    if x.ndim > 1:
        return fn(x, tuple(range(x.ndim - 1)))
    return jnp.full((x.shape[0],), fn(x))


def _per_channel_minmax_scale(x, bits, signed):
    qmin, qmax = qrange(bits, signed)
    hi = _per_channel_reduce(x, jnp.max)
    lo = _per_channel_reduce(x, jnp.min)
    return (hi - lo) / (qmax - qmin)


def _bcast_ch(p: Array, x: Array) -> Array:
    """Broadcast a per-channel (last-axis) param over x's leading dims."""
    if p.ndim == 1 and x.ndim > 1:
        return p.reshape((1,) * (x.ndim - 1) + (-1,))
    return p


# --------------------------------------------------------------------- #
class _Base:
    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        raise NotImplementedError

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        raise NotImplementedError


class ScaleQ(_Base):
    """Plain learned scale, no clamp (Scale_T, transform_ops.py:200-251)."""

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        if per_channel:
            return {"scale": _per_channel_minmax_scale(x, bits, signed)}
        return {"scale": _range_scale(x, bits, signed).reshape(1)}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        scale = _bcast_ch(qp["scale"], x) if per_channel else qp["scale"]
        code = x / scale
        quant = ste(code)
        return code, quant, quant * scale


class ScaleBetaQ(_Base):
    """Learned affine scale+offset (ScaleBeta_T, transform_ops.py:253-286).

    per_channel: one scale/beta per out-channel. (The reference's
    per-channel init_form at transform_ops.py:268-271 is immediately
    overwritten to scalars by init_data:273-280 — effectively dead; we
    implement the intended behavior.)"""

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        if per_channel:
            return {"scale": _per_channel_minmax_scale(x, bits, signed),
                    "beta": _per_channel_reduce(x, jnp.min)}
        return {"scale": _range_scale(x, bits, signed).reshape(1),
                "beta": x.min().reshape(1)}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        scale, beta = qp["scale"], qp["beta"]
        if per_channel:
            scale, beta = _bcast_ch(scale, x), _bcast_ch(beta, x)
        code = (x - beta) / scale
        quant = ste(code)
        return code, quant, quant * scale + beta


class LSQ(_Base):
    """Learned step size with 1/sqrt(qmax*numel) gradient scaling and code
    clamping (transform_ops.py:58-102)."""

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        if per_channel:
            return {"scale": _per_channel_minmax_scale(x, bits, signed)}
        return {"scale": _range_scale(x, bits, signed).reshape(1)}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        qmin, qmax = qrange(bits, signed)
        g = 1.0 / jnp.sqrt(jnp.float32(qmax * x.size))
        s = grad_scale(qp["scale"], g)
        if per_channel and x.ndim > 1:
            s = _bcast_ch(s, x)
        code = jnp.clip(x / s, qmin, qmax)
        quant = ste(code)
        return code, quant, quant * s


class LSQV2(_Base):
    """LSQ + learned offset beta (transform_ops.py:17-56).

    per_channel: one scale/beta per out-channel (the reference's
    per-channel init_form at transform_ops.py:33-36 is overwritten to
    scalars by init_data:38-45; we implement the intended behavior)."""

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        if per_channel:
            return {"scale": _per_channel_minmax_scale(x, bits, signed),
                    "beta": _per_channel_reduce(x, jnp.min)}
        return {"scale": _range_scale(x, bits, signed).reshape(1),
                "beta": x.min().reshape(1)}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        qmin, qmax = qrange(bits, signed)
        g = 1.0 / jnp.sqrt(jnp.float32(qmax * x.size))
        s = grad_scale(qp["scale"], g)
        b = grad_scale(qp["beta"], g)
        if per_channel:
            s, b = _bcast_ch(s, x), _bcast_ch(b, x)
        code = jnp.clip((x - b) / s, qmin, qmax)
        quant = ste(code)
        return code, quant, quant * s + b


class EdgeScaleQ(_Base):
    """Learned dead-zone threshold + step (EdgeScale_T,
    transform_ops.py:125-198)."""

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        if per_channel:
            s = _per_channel_minmax_scale(x, bits, signed)
            return {"scale": s, "thresold": s}
        s = _range_scale(x, bits, signed).reshape(1)
        return {"scale": s, "thresold": s}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        th = qp["thresold"]
        sc = qp["scale"]
        if per_channel and x.ndim > 1:
            th, sc = _bcast_ch(th, x), _bcast_ch(sc, x)
        sign = jnp.sign(x)
        keep = jnp.abs(x) > jnp.abs(th)
        sparse = x / (2 * jnp.abs(th))
        reserve = sign * (0.5 + (jnp.abs(x) - jnp.abs(th)) / jnp.abs(sc))
        code = jnp.where(keep, reserve, sparse)
        quant = ste(code)
        csign = jnp.sign(quant)
        dkeep = jnp.abs(quant) > 0.5
        dsparse = quant * (2 * jnp.abs(th))
        dreserve = csign * (jnp.abs(th) + (jnp.abs(quant) - 0.5) * jnp.abs(sc))
        dequant = jnp.where(dkeep, dreserve, dsparse)
        return code, quant, dequant


class MultiScaleQ(_Base):
    """5-segment piecewise-linear companding (MS_T,
    transform_ops.py:360-422). `param_range` is a non-trainable constant
    derived at init (stored alongside but masked from the optimiser by the
    compression trainer via stop_gradient in apply)."""
    NUM_LIN = 5

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        _reject_per_channel("multiscale", per_channel)
        n = MultiScaleQ.NUM_LIN
        scale = jnp.full((n,), (x.max() - x.min()) / 256.0)
        rng = jnp.arange(1, n, dtype=jnp.float32) * (jnp.abs(x).max() / n)
        return {"scale": scale, "param_range": rng}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        scale = qp["scale"]
        ranges = jax.lax.stop_gradient(qp["param_range"])
        sign = _mysign(x)
        ax = _myabs(x)

        def encode(ax):
            res = jnp.zeros_like(ax)
            filled = jnp.zeros_like(ax, dtype=bool)
            base_last, range_last = 0.0, 0.0
            for i in range(len(ranges)):
                m = (ax < ranges[i]) & (~filled)
                res = jnp.where(m, base_last + (ax - range_last) / _myabs(scale[i]), res)
                filled = filled | m
                base_last = base_last + (ranges[i] - range_last) / _myabs(scale[i])
                range_last = ranges[i]
            res = jnp.where(~filled, base_last + (ax - range_last) / _myabs(scale[-1]), res)
            return res

        code = encode(ax) * sign
        quant = ste(code)

        aq = _myabs(quant)
        qsign = _mysign(quant)
        res = jnp.zeros_like(aq)
        filled = jnp.zeros_like(aq, dtype=bool)
        base_last, range_last = 0.0, 0.0
        for i in range(len(ranges)):
            base_now = base_last + (ranges[i] - range_last) / scale[i]
            m = (aq < base_now) & (~filled)
            res = jnp.where(m, range_last + (aq - base_last) * scale[i], res)
            filled = filled | m
            base_last = base_now
            range_last = ranges[i]
        res = jnp.where(~filled, range_last + (aq - base_last) * scale[-1], res)
        dequant = res * qsign
        return code, quant, dequant


class LogQ(_Base):
    """Log companding (Log_T, transform_ops.py:324-358)."""

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        _reject_per_channel("log", per_channel)
        return {"scale": jnp.array([1.0 / 64]), "shift": jnp.array([-1.0]),
                "inner_scale": (jnp.abs(x).max() / 1.718281828459045).reshape(1)}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        s, sh, inner = qp["scale"], qp["shift"], qp["inner_scale"]
        # the reference takes log of a negative argument for |x| < inner*1
        # (shift init -1.0, transform_ops.py:348-349) — NaN; we clamp the
        # argument to keep the transform finite over the whole domain
        arg = jnp.maximum(sh + _myabs(x) / inner, 1e-9)
        code = _mysign(x) * jnp.log(arg) / s
        quant = ste(code)
        dequant = _mysign(quant) * (jnp.exp(_myabs(quant) * s) - sh) * inner
        return code, quant, dequant


class ExpQ(_Base):
    """Exp companding (Exp_T, transform_ops.py:288-322)."""

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        _reject_per_channel("exp", per_channel)
        return {"scale": jnp.array([1.0 / 64]), "shift": jnp.array([-1.0]),
                "inner_scale": (jnp.abs(x).max() / 0.69314718056).reshape(1)}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        s, sh, inner = qp["scale"], qp["shift"], qp["inner_scale"]
        code = _mysign(x) * (jnp.exp(_myabs(x) / inner) + sh) / s
        quant = ste(code)
        dequant = _mysign(quant) * jnp.log(_myabs(quant) * s - sh) * inner
        return code, quant, dequant


class DirectQuant(_Base):
    """Passthrough STE (transform_ops.py:105-122)."""

    @staticmethod
    def init_params(x, bits, signed=True, per_channel=False) -> QP:
        return {}

    @staticmethod
    def apply(x, qp, bits, signed=True, per_channel=False):
        code = x
        quant = ste(code)
        return code, quant, quant


QUANT_MAP = {
    "edgescale": EdgeScaleQ,
    "scale": ScaleQ,
    "scalebeta": ScaleBetaQ,
    "multiscale": MultiScaleQ,
    "log": LogQ,
    "exp": ExpQ,
    "lsq": LSQ,
    "lsqv2": LSQV2,
    "dq": DirectQuant,
}


def get_quantizer(name: str):
    try:
        return QUANT_MAP[name]
    except KeyError:
        raise KeyError(f"unknown quantizer {name!r}; available {sorted(QUANT_MAP)}")
