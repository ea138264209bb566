"""Reconstruction loss library + output squashing.

Loss menu and weights mirror the reference `loss_fn`
(/root/reference/hnerv_utils.py:335-397). The paper loss is
``Fusion10_freq``: 60*(0.7*L1 + 0.3*(1-MS-SSIM)) + L1(FFT2(pred), FFT2(gt))
with the FFT L1 taken over stacked real/imag parts
(hnerv_utils.py:369-376).

`out_img` mirrors `OutImg` (/root/reference/model_blocks.py:57-63):
sigmoid / tanh*0.5+0.5 (default) / +constant bias.

All tensors are NHWC; the FFT runs over the spatial axes (1, 2), which is
numerically identical to the reference's NCHW dim=(-2,-1) choice because the
subsequent L1 averages over all per-sample elements.
"""

from __future__ import annotations

import jax.numpy as jnp

from .msssim import ms_ssim, ssim


def out_img(x: jnp.ndarray, out_bias: str = "tanh") -> jnp.ndarray:
    if out_bias == "sigmoid":
        return jnp.reciprocal(1.0 + jnp.exp(-x))
    elif out_bias == "tanh":
        return jnp.tanh(x) * 0.5 + 0.5
    else:
        return x + float(out_bias)


def _per_sample_mean(t: jnp.ndarray) -> jnp.ndarray:
    return t.reshape(t.shape[0], -1).mean(axis=1)


def _l1(pred, target):
    return _per_sample_mean(jnp.abs(pred - target))


def _l2(pred, target):
    return _per_sample_mean((pred - target) ** 2)


def _one_minus_ssim(pred, target):
    return 1.0 - ssim(pred, target, data_range=1.0, size_average=False)


def _one_minus_msssim(pred, target):
    return 1.0 - ms_ssim(pred, target, data_range=1.0, size_average=False)


def _freq_l1(pred, target):
    pf = jnp.fft.fft2(pred, axes=(1, 2))
    tf = jnp.fft.fft2(target, axes=(1, 2))
    diff = jnp.abs(pf.real - tf.real) + jnp.abs(pf.imag - tf.imag)
    # stacked real/imag doubles the element count relative to the image
    return diff.reshape(diff.shape[0], -1).mean(axis=1) * 0.5


def loss_fn(pred: jnp.ndarray, target: jnp.ndarray, loss_type: str = "L2",
            batch_average: bool = True) -> jnp.ndarray:
    target = jnp.asarray(target)  # targets carry no gradient by construction
    if loss_type == "L2":
        loss = _l2(pred, target)
    elif loss_type == "L1":
        loss = _l1(pred, target)
    elif loss_type == "SSIM":
        loss = _one_minus_ssim(pred, target)
    elif loss_type == "Fusion1":
        loss = 0.3 * _l2(pred, target) + 0.7 * _one_minus_ssim(pred, target)
    elif loss_type == "Fusion2":
        loss = 0.3 * _l1(pred, target) + 0.7 * _one_minus_ssim(pred, target)
    elif loss_type == "Fusion3":
        loss = 0.5 * _l2(pred, target) + 0.5 * _one_minus_ssim(pred, target)
    elif loss_type == "Fusion4":
        loss = 0.5 * _l1(pred, target) + 0.5 * _one_minus_ssim(pred, target)
    elif loss_type == "Fusion5":
        loss = 0.7 * _l2(pred, target) + 0.3 * _one_minus_ssim(pred, target)
    elif loss_type == "Fusion6":
        loss = 0.7 * _l1(pred, target) + 0.3 * _one_minus_ssim(pred, target)
    elif loss_type == "Fusion7":
        loss = 0.7 * _l2(pred, target) + 0.3 * _l1(pred, target)
    elif loss_type == "Fusion8":
        loss = 0.5 * _l2(pred, target) + 0.5 * _l1(pred, target)
    elif loss_type == "Fusion9":
        loss = 0.9 * _l1(pred, target) + 0.1 * _one_minus_ssim(pred, target)
    elif loss_type == "Fusion10":
        loss = 0.7 * _l1(pred, target) + 0.3 * _one_minus_msssim(pred, target)
    elif loss_type == "Fusion11":
        loss = 0.9 * _l1(pred, target) + 0.1 * _one_minus_msssim(pred, target)
    elif loss_type == "Fusion12":
        loss = 0.8 * _l1(pred, target) + 0.2 * _one_minus_msssim(pred, target)
    elif loss_type == "Fusion10_freq":
        base = 0.7 * _l1(pred, target) + 0.3 * _one_minus_msssim(pred, target)
        loss = 60.0 * base + _freq_l1(pred, target)
    elif loss_type == "L1_freq":
        loss = 60.0 * _l1(pred, target) + _freq_l1(pred, target)
    elif loss_type == "L1_ssim_freq":
        base = 0.7 * _l1(pred, target) + 0.3 * _one_minus_ssim(pred, target)
        loss = 60.0 * base + _freq_l1(pred, target)
    else:
        raise KeyError(f"Unknown loss type {loss_type}")
    return loss.mean() if batch_average else loss
