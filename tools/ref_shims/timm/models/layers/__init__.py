"""trunc_normal_ / DropPath, implemented per their standard definitions."""

import math

import torch
import torch.nn as nn


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    """In-place truncated normal via inverse-CDF sampling on [a, b]."""
    with torch.no_grad():
        def cdf(x):
            return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

        lo = cdf((a - mean) / std)
        hi = cdf((b - mean) / std)
        tensor.uniform_(2 * lo - 1, 2 * hi - 1)
        tensor.erfinv_()
        tensor.mul_(std * math.sqrt(2.0))
        tensor.add_(mean)
        tensor.clamp_(min=a * std + mean, max=b * std + mean)
        return tensor


class DropPath(nn.Module):
    """Stochastic depth per sample (identity when drop_prob == 0)."""

    def __init__(self, drop_prob=0.0, scale_by_keep=True):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        if self.scale_by_keep:
            mask.div_(keep)
        return x * mask
