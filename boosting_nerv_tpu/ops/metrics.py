"""PSNR / MS-SSIM evaluation metrics.

Mirrors the reference metric functions
(/root/reference/hnerv_utils.py:400-443): per-frame PSNR is
``-10*log10(mean-squared-error + 1e-9)`` over each sample's pixels; MS-SSIM
uses the standard 5-level pyramid (only valid for frames >= 160 px on the
short side, as in the reference's usage).
"""

from __future__ import annotations

import jax.numpy as jnp

from .msssim import ms_ssim


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Scalar PSNR over the whole batch."""
    mse = jnp.mean((pred - target) ** 2)
    return -10.0 * jnp.log10(mse + 1e-9)


def psnr_per_frame(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[B,...] -> [B] per-frame PSNR."""
    mse = ((pred - target) ** 2).reshape(pred.shape[0], -1).mean(axis=1)
    return -10.0 * jnp.log10(mse + 1e-9)


def msssim_per_frame(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B] per-frame MS-SSIM."""
    return ms_ssim(pred, target, data_range=1.0, size_average=False)
