"""Minimal pytorch_msssim-compatible shim (this repo's own torch MS-SSIM,
the same implementation cross-checked against ops/msssim.py in
tests/test_msssim.py). Used only to RUN the reference repo on this box for
parity measurements — pytorch_msssim is not installed here and the
environment has no egress.

Wang et al. conventions: 11x11 sigma-1.5 separable Gaussian, VALID padding,
relu'd cs terms, 2x2 avg-pool with odd-dim zero padding.
"""

import torch
import torch.nn.functional as F

_WEIGHTS = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333]


def _win(size=11, sigma=1.5):
    coords = torch.arange(size, dtype=torch.float64) - size // 2
    g = torch.exp(-(coords ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return g.float()


def _blur(x, g):
    c = x.shape[1]
    kh = g.view(1, 1, -1, 1).repeat(c, 1, 1, 1).to(x.device)
    kw = g.view(1, 1, 1, -1).repeat(c, 1, 1, 1).to(x.device)
    x = F.conv2d(x, kh, groups=c)
    return F.conv2d(x, kw, groups=c)


def _ssim_parts(x, y, data_range=1.0, k=(0.01, 0.03)):
    g = _win()
    c1, c2 = (k[0] * data_range) ** 2, (k[1] * data_range) ** 2
    mu1, mu2 = _blur(x, g), _blur(y, g)
    s1 = _blur(x * x, g) - mu1 * mu1
    s2 = _blur(y * y, g) - mu2 * mu2
    s12 = _blur(x * y, g) - mu1 * mu2
    cs = (2 * s12 + c2) / (s1 + s2 + c2)
    sm = ((2 * mu1 * mu2 + c1) / (mu1 * mu1 + mu2 * mu2 + c1)) * cs
    return sm.flatten(2).mean(-1), cs.flatten(2).mean(-1)


def ssim(x, y, data_range=1.0, size_average=True, **_):
    sm, _cs = _ssim_parts(x, y, data_range)
    out = sm.mean(1)
    return out.mean() if size_average else out


def ms_ssim(x, y, data_range=1.0, size_average=True, **_):
    mcs = []
    for i in range(5):
        sm, cs = _ssim_parts(x, y, data_range)
        if i < 4:
            mcs.append(torch.relu(cs))
            pad = [s % 2 for s in x.shape[2:]]
            x = F.avg_pool2d(x, 2, padding=pad)
            y = F.avg_pool2d(y, 2, padding=pad)
    sm = torch.relu(sm)
    stack = torch.stack(mcs + [sm], dim=0)
    w = torch.tensor(_WEIGHTS, device=stack.device).view(-1, 1, 1)
    out = torch.prod(stack ** w, dim=0).mean(1)
    return out.mean() if size_average else out
