"""Golden tests for SSIM / MS-SSIM against an independent torch reference.

The torch reference below reimplements the standard Wang et al. MS-SSIM with
the same conventions the reference repo's pytorch_msssim dependency uses
(11x11 sigma-1.5 separable Gaussian, VALID padding, relu'd cs, 2x2 avg-pool
with odd-dim zero padding). Cross-checking two independent implementations
(torch NCHW vs JAX NHWC) guards both against transcription errors.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from boosting_nerv_tpu.ops.msssim import ms_ssim, ssim

WEIGHTS = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]


def _win(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float64) - size // 2
    g = torch.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return g.float()


def _blur(x, g):
    c = x.shape[1]
    kh = g.view(1, 1, -1, 1).repeat(c, 1, 1, 1)
    kw = g.view(1, 1, 1, -1).repeat(c, 1, 1, 1)
    x = F.conv2d(x, kh, groups=c)
    return F.conv2d(x, kw, groups=c)


def _ssim_torch(x, y, data_range=1.0, k=(0.01, 0.03)):
    g = _win()
    c1, c2 = (k[0] * data_range) ** 2, (k[1] * data_range) ** 2
    mu1, mu2 = _blur(x, g), _blur(y, g)
    s1 = _blur(x * x, g) - mu1 * mu1
    s2 = _blur(y * y, g) - mu2 * mu2
    s12 = _blur(x * y, g) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    sm = ((2 * mu1 * mu2 + c1) / (mu1 * mu1 + mu2 * mu2 + c1)) * cs
    return sm.flatten(2).mean(-1), cs.flatten(2).mean(-1)


def _msssim_torch(x, y):
    mcs = []
    for i in range(5):
        sm, cs = _ssim_torch(x, y)
        if i < 4:
            mcs.append(torch.relu(cs))
            pad = [s % 2 for s in x.shape[2:]]
            x = F.avg_pool2d(x, 2, padding=pad)
            y = F.avg_pool2d(y, 2, padding=pad)
    sm = torch.relu(sm)
    stack = torch.stack(mcs + [sm], dim=0)
    w = torch.tensor(WEIGHTS).view(-1, 1, 1)
    return torch.prod(stack ** w, dim=0).mean(1)


def _pair(h, w, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(size=(2, h, w, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.08, size=a.shape), 0, 1).astype(np.float32)
    return a, b


# --------------------------------------------------------------------- #
# Third, mechanism-independent implementation: float64 NumPy with the
# blur as an explicit 2D sliding-window tensordot against the full 11x11
# outer-product window (no separable conv, no conv library at all).
# Triangulating three independently-written implementations (JAX NHWC
# separable conv / torch NCHW grouped conv / NumPy sliding windows)
# addresses the "self-refereed" concern for the MS-SSIM parity claim —
# the environment has no pytorch_msssim and no egress (PARITY.md).
# --------------------------------------------------------------------- #


def _np_blur2d(img, win2d):
    """img: [H, W] float64 -> VALID 2D correlation with win2d [11, 11]."""
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(img, win2d.shape)  # [H-10, W-10, 11, 11]
    return np.tensordot(wins, win2d, axes=([2, 3], [0, 1]))


def _np_ssim_cs(x, y, data_range=1.0, k=(0.01, 0.03)):
    """x, y: [H, W] float64; returns (mean ssim, mean cs) over the map."""
    g = np.asarray(_win().double())
    w2 = np.outer(g, g)
    c1, c2 = (k[0] * data_range) ** 2, (k[1] * data_range) ** 2
    mu1, mu2 = _np_blur2d(x, w2), _np_blur2d(y, w2)
    s1 = _np_blur2d(x * x, w2) - mu1 * mu1
    s2 = _np_blur2d(y * y, w2) - mu2 * mu2
    s12 = _np_blur2d(x * y, w2) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    sm = ((2 * mu1 * mu2 + c1) / (mu1 ** 2 + mu2 ** 2 + c1)) * cs
    return sm.mean(), cs.mean()


def _np_pool2(x):
    h, w = x.shape
    if h % 2 or w % 2:
        # zero-pad both sides (count_include_pad), floor mode drops the
        # trailing padded row/col — matching torch avg_pool2d and the JAX
        # reduce_window VALID semantics
        x = np.pad(x, ((h % 2, h % 2), (w % 2, w % 2)))
        h, w = x.shape
    x = x[:2 * (h // 2), :2 * (w // 2)]
    return x.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def _np_msssim_1ch(x, y):
    vals = []
    for i in range(5):
        sm, cs = _np_ssim_cs(x, y)
        vals.append(max(sm, 0.0) if i == 4 else max(cs, 0.0))
        if i < 4:
            x, y = _np_pool2(x), _np_pool2(y)
    return float(np.prod([v ** w for v, w in zip(vals, WEIGHTS)]))


def _np_msssim(a, b):
    """a, b: [B, H, W, C] float -> [B] (channel-mean, like the others)."""
    return np.array([
        np.mean([_np_msssim_1ch(a[n, :, :, c].astype(np.float64),
                                b[n, :, :, c].astype(np.float64))
                 for c in range(a.shape[-1])])
        for n in range(a.shape[0])])


class TestSSIM:
    def test_identity(self):
        a, _ = _pair(64, 64)
        assert float(ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)

    def test_matches_torch(self):
        a, b = _pair(64, 96)
        ours = np.asarray(ssim(jnp.asarray(a), jnp.asarray(b), size_average=False))
        ta = torch.from_numpy(a).permute(0, 3, 1, 2)
        tb = torch.from_numpy(b).permute(0, 3, 1, 2)
        ref = _ssim_torch(ta, tb)[0].mean(1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestMSSSIM:
    def test_identity(self):
        a, _ = _pair(176, 176)
        assert float(ms_ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)

    @pytest.mark.parametrize("h,w", [(176, 176), (180, 320), (167, 191)])
    def test_matches_torch_including_odd_dims(self, h, w):
        a, b = _pair(h, w, seed=h * w)
        ours = np.asarray(ms_ssim(jnp.asarray(a), jnp.asarray(b), size_average=False))
        ta = torch.from_numpy(a).permute(0, 3, 1, 2)
        tb = torch.from_numpy(b).permute(0, 3, 1, 2)
        ref = _msssim_torch(ta, tb).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("h,w", [(176, 192), (167, 191)])
    def test_three_way_triangulation(self, h, w):
        """JAX vs torch vs mechanism-independent float64 NumPy: all three
        must agree, so no single transcription error can self-confirm."""
        a, b = _pair(h, w, seed=7)
        ours = np.asarray(ms_ssim(jnp.asarray(a), jnp.asarray(b),
                                  size_average=False))
        ta = torch.from_numpy(a).permute(0, 3, 1, 2)
        tb = torch.from_numpy(b).permute(0, 3, 1, 2)
        tref = _msssim_torch(ta, tb).numpy()
        nref = _np_msssim(a, b)
        np.testing.assert_allclose(ours, nref, rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(tref, nref, rtol=2e-5, atol=2e-5)

    def test_rejects_small_frames(self):
        # parity with pytorch_msssim's assert: the 4 downsamplings need
        # min(H, W) > (win_size-1)*2**4 = 160; below that the smallest
        # scale silently NaNs (measured: poisons Fusion10* training)
        a, b = _pair(64, 128)
        with pytest.raises(ValueError, match="ms_ssim needs"):
            ms_ssim(jnp.asarray(a), jnp.asarray(b))

    def test_degrades_with_noise(self):
        a, _ = _pair(176, 176)
        rng = np.random.default_rng(1)
        b1 = np.clip(a + rng.normal(scale=0.02, size=a.shape), 0, 1).astype(np.float32)
        b2 = np.clip(a + rng.normal(scale=0.2, size=a.shape), 0, 1).astype(np.float32)
        v1 = float(ms_ssim(jnp.asarray(a), jnp.asarray(b1)))
        v2 = float(ms_ssim(jnp.asarray(a), jnp.asarray(b2)))
        assert v1 > v2
