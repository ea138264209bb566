"""SSIM / MS-SSIM in NHWC JAX.

Capability parity with the `pytorch_msssim` package the reference depends on
(/root/reference/hnerv_utils.py:8, used by the Fusion losses and metrics):
 - Gaussian window 11x11, sigma 1.5, applied separably, VALID padding,
   depthwise per channel.
 - MS-SSIM: 5 levels, weights (0.0448, 0.2856, 0.3001, 0.2363, 0.1333),
   cs terms relu'd, 2x2 average-pool downsample between levels with
   zero-padding of odd spatial dims (count-include-pad semantics).
 - K = (0.01, 0.03), data_range scaling of C1/C2.

Implemented from the MS-SSIM paper definition (Wang et al., 2003) with the
same edge-case conventions so trained-model metrics are comparable.
Everything is jit-friendly: static shapes, lax convs that map onto the TPU
MXU/VPU, no host sync.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


@functools.lru_cache(maxsize=None)
def _gaussian_window(win_size: int, sigma: float) -> tuple:
    import numpy as np

    coords = np.arange(win_size, dtype=np.float64) - win_size // 2
    g = np.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return tuple(g.astype(np.float32).tolist())


def _depthwise_blur(x: jnp.ndarray, win_size: int, sigma: float) -> jnp.ndarray:
    """Separable depthwise Gaussian filter, VALID padding. x: [B,H,W,C]."""
    c = x.shape[-1]
    g = jnp.asarray(_gaussian_window(win_size, sigma), dtype=x.dtype)
    kh = jnp.tile(g.reshape(win_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(g.reshape(1, win_size, 1, 1), (1, 1, 1, c))
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c)
    x = lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                 dimension_numbers=dn, feature_group_count=c)
    return x


def _ssim_maps(x, y, data_range, win_size, sigma, k1, k2):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    blur = lambda t: _depthwise_blur(t, win_size, sigma)
    mu1, mu2 = blur(x), blur(y)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(x * x) - mu1_sq
    sigma2_sq = blur(y * y) - mu2_sq
    sigma12 = blur(x * y) - mu1_mu2
    cs_map = (2.0 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2.0 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # per-sample, per-channel spatial means -> [B, C]
    ssim_pc = ssim_map.mean(axis=(1, 2))
    cs_pc = cs_map.mean(axis=(1, 2))
    return ssim_pc, cs_pc


def _avg_pool2_padded(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pool; odd dims zero-padded on both sides and the
    zeros included in the mean (torch avg_pool2d count_include_pad=True)."""
    _, h, w, _ = x.shape
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    s = lax.reduce_window(x, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return s * 0.25


def ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
         size_average: bool = True, win_size: int = 11, win_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Single-scale SSIM over NHWC images. Returns scalar (size_average) or [B]."""
    ssim_pc, _ = _ssim_maps(x, y, data_range, win_size, win_sigma, k1, k2)
    per_image = ssim_pc.mean(axis=-1)
    return per_image.mean() if size_average else per_image


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
            size_average: bool = True, win_size: int = 11,
            win_sigma: float = 1.5, weights=_MS_WEIGHTS,
            k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Multi-scale SSIM over NHWC images. Returns scalar (size_average) or [B].

    Requires min(H, W) > (win_size-1) * 2**(levels-1), same as the upstream
    implementation's usable range (160+ pixels for the default 5 levels).
    """
    levels = len(weights)
    min_side = (win_size - 1) * 2 ** (levels - 1)
    if min(x.shape[1], x.shape[2]) <= min_side:
        # pytorch_msssim raises here too; without the check the smallest
        # scale underflows the window and silently yields NaN (which then
        # poisons Fusion10* training losses).
        raise ValueError(
            f"ms_ssim needs min(H, W) > {min_side} for {levels} levels "
            f"(got {x.shape[1]}x{x.shape[2]})")
    w = jnp.asarray(weights, dtype=x.dtype)
    mcs = []
    ssim_pc = None
    for i in range(levels):
        ssim_pc, cs_pc = _ssim_maps(x, y, data_range, win_size, win_sigma, k1, k2)
        if i < levels - 1:
            mcs.append(jax.nn.relu(cs_pc))
            x = _avg_pool2_padded(x)
            y = _avg_pool2_padded(y)
    ssim_pc = jax.nn.relu(ssim_pc)
    stack = jnp.stack(mcs + [ssim_pc], axis=0)  # [levels, B, C]
    msv = jnp.prod(stack ** w[:, None, None], axis=0)  # [B, C]
    per_image = msv.mean(axis=-1)
    return per_image.mean() if size_average else per_image
