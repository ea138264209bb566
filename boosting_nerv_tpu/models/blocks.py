"""Model building blocks (NHWC, flax.linen).

Capability parity with /root/reference/model_blocks.py, redesigned for TPU:
 - `UpConv` / `DownConv`: conv + depth<->space rearranges (the PixelShuffle
   strategy, model_blocks.py:196-220 / 174-193), transposed conv, or
   bilinear-resize conv. All convs are NHWC so XLA tiles them directly onto
   the MXU; the depth-to-space reshape fuses with the producing conv.
 - `SFTLayer` / `ResBlockSFT`: the temporal-aware affine transform (TAT)
   conditional-decoder modulation (model_blocks.py:74-105). The conditioning
   input is a flat [B, ch_t] vector (the reference's [B, ch_t, 1, 1] 1x1-conv
   maps are Dense layers here); scale/shift broadcast over H, W — XLA fuses
   the modulation into the surrounding convs' epilogues.
 - `NeRVBlock`: upsample conv -> norm -> activation (sin in Boost configs)
   -> optional TAT block (model_blocks.py:14-46), including the legacy
   fc_h/fc_w pixel-block rearrange used by encoder-less stems.
 - `MLP`: 1x1-conv stack == Dense stack (NeRV_MLP, model_blocks.py:66-71;
   activation after every layer, including the last).
 - `ConvNeXtEncoder`: stride-configurable ConvNeXt (model_blocks.py:223-320)
   with depthwise 7x7, LN, 4x MLP, layer-scale; drop-path rate 0 as used by
   all HNeRV configs.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.activations import get_activation
from ..ops.pixelshuffle import depth_to_space, space_to_depth
from .initializers import torch_bias_init, torch_kernel_init, trunc_normal_init


def _ceil_div_pad(v: int) -> int:
    return math.ceil(v)


class TConv(nn.Module):
    """2D conv with torch-default init and integer symmetric padding."""
    features: int
    kernel: int
    stride: int = 1
    pad: int = 0
    use_bias: bool = True
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        fan_in = (self.kernel ** 2) * in_ch // self.groups
        return nn.Conv(self.features, (self.kernel, self.kernel),
                       strides=(self.stride, self.stride),
                       padding=[(self.pad, self.pad), (self.pad, self.pad)],
                       feature_group_count=self.groups,
                       use_bias=self.use_bias,
                       kernel_init=torch_kernel_init,
                       bias_init=torch_bias_init(fan_in))(x)


class TDense(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        return nn.Dense(self.features, use_bias=self.use_bias,
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(fan_in))(x)


class TConvTranspose(nn.Module):
    """Transposed conv with torch ConvTranspose2d geometry:
    out = (in-1)*stride - 2*pad + kernel. Implemented as an input-dilated
    conv (lhs_dilation), which XLA lowers to the MXU directly."""
    features: int
    kernel: int
    stride: int
    pad: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel
        kernel = self.param("kernel", torch_kernel_init, (k, k, in_ch, self.features))
        bias = self.param("bias", torch_bias_init(in_ch * k * k), (self.features,))
        p = k - 1 - self.pad
        y = lax.conv_general_dilated(
            x, jnp.flip(kernel, (0, 1)), window_strides=(1, 1),
            padding=[(p, p), (p, p)], lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias


class MLP(nn.Module):
    """Dense stack; `act` applied after every layer (NeRV_MLP semantics)."""
    dims: Sequence[int]  # output dims, input inferred
    act: str = "relu"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.act)
        for d in self.dims:
            x = act(TDense(d, use_bias=self.use_bias)(x))
        return x


class UpConv(nn.Module):
    """Upsampling conv (model_blocks.py:196-220). conv_type:
    pshuffel | pshuffel_3x3 (kernel clamped <=3; all Boost configs) |
    conv (transposed) | interpolate (bilinear resize + conv)."""
    conv_type: str
    new_ngf: int
    ks: int
    strd: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ks, strd = self.ks, self.strd
        if self.conv_type in ("pshuffel", "pshuffel_3x3"):
            if self.conv_type == "pshuffel_3x3":
                ks = min(ks, 3)
            pad = (ks - 1) // 2
            x = TConv(self.new_ngf * strd * strd, ks, 1, pad,
                      use_bias=self.use_bias)(x)
            return depth_to_space(x, strd)
        elif self.conv_type == "conv":
            return TConvTranspose(self.new_ngf, ks + strd, strd,
                                  _ceil_div_pad(ks / 2))(x)
        elif self.conv_type == "interpolate":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * strd, w * strd, c), "bilinear")
            k = strd + ks
            pad = _ceil_div_pad((ks + strd - 1) / 2)
            return TConv(self.new_ngf, k, 1, pad, use_bias=self.use_bias)(x)
        raise KeyError(f"unknown upconv type {self.conv_type}")


class DownConv(nn.Module):
    """Downsampling conv (model_blocks.py:174-193)."""
    conv_type: str
    new_ngf: int
    ks: int
    strd: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ks, strd = self.ks, self.strd
        if self.conv_type == "pshuffel":
            if strd != 1:
                x = space_to_depth(x, strd)
            return TConv(self.new_ngf, ks, 1, (ks - 1) // 2,
                         use_bias=self.use_bias)(x)
        elif self.conv_type == "conv":
            return TConv(self.new_ngf, ks + strd, strd, _ceil_div_pad(ks / 2),
                         use_bias=self.use_bias)(x)
        elif self.conv_type == "interpolate":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h // strd, w // strd, c), "bilinear")
            return TConv(self.new_ngf, ks + strd, 1,
                         _ceil_div_pad((ks + strd - 1) / 2),
                         use_bias=self.use_bias)(x)
        raise KeyError(f"unknown downconv type {self.conv_type}")


def norm_layer(norm: str, x: jnp.ndarray) -> jnp.ndarray:
    """none | in (InstanceNorm, no affine) | bn (batch-stat norm).

    Boost configs all run norm='none'. 'bn' here always normalises with the
    current batch statistics (the reference's train-mode behaviour); running
    stats are deliberately not tracked."""
    if norm == "none":
        return x
    if norm == "in":
        mean = x.mean(axis=(1, 2), keepdims=True)
        var = x.var(axis=(1, 2), keepdims=True)
        return (x - mean) * lax.rsqrt(var + 1e-5)
    if norm == "bn":
        mean = x.mean(axis=(0, 1, 2), keepdims=True)
        var = x.var(axis=(0, 1, 2), keepdims=True)
        return (x - mean) * lax.rsqrt(var + 1e-5)
    raise NotImplementedError(norm)


class SFTLayer(nn.Module):
    """Temporal-aware affine transform: x * (scale(t)+1) + shift(t)
    (model_blocks.py:92-105). cond: [B, cond_ch] -> per-channel scale/shift."""
    out_ch: int
    factor: int = 1
    act: str = "relu"

    @nn.compact
    def __call__(self, x, cond):
        a = get_activation(self.act)
        cond_ch = cond.shape[-1]
        scale = TDense(self.out_ch)(a(TDense(cond_ch // self.factor)(cond)))
        shift = TDense(self.out_ch)(a(TDense(cond_ch // self.factor)(cond)))
        scale = scale[:, None, None, :]
        shift = shift[:, None, None, :]
        return x * (scale + 1.0) + shift


class ResBlockSFT(nn.Module):
    """SFT -> conv3x3 -> act -> SFT -> conv3x3, residual add
    (model_blocks.py:74-89)."""
    ch: int
    in_act: str = "relu"
    out_act: str = "gelu"

    @nn.compact
    def __call__(self, x, cond):
        act = get_activation(self.out_act)
        fea = SFTLayer(self.ch, act=self.in_act)(x, cond)
        fea = act(TConv(self.ch, 3, 1, 1)(fea))
        fea = SFTLayer(self.ch, act=self.in_act)(fea, cond)
        fea = TConv(self.ch, 3, 1, 1)(fea)
        return x + fea


class NeRVBlock(nn.Module):
    """Sinusoidal NeRV-like block + optional TAT modulation
    (model_blocks.py:14-46). With `fc_hw` set (encoder-less stem case) the
    post-conv feature is pixel-block-rearranged before the TAT block."""
    dec_block: bool
    conv_type: str
    new_ngf: int
    ks: int
    strd: int
    norm: str = "none"
    act: str = "gelu"
    sft: bool = False
    has_encoder: bool = True
    fc_hw: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x, t_embed=None):
        conv_cls = UpConv if self.dec_block else DownConv
        y = conv_cls(conv_type=self.conv_type, new_ngf=self.new_ngf,
                     ks=self.ks, strd=self.strd)(x)
        y = get_activation(self.act)(norm_layer(self.norm, y))
        if not (self.sft and t_embed is not None):
            return y
        if self.dec_block or self.has_encoder:
            return ResBlockSFT(self.new_ngf)(y, t_embed)
        # legacy stem: rearrange channels into an fc_h x fc_w pixel block
        fc_h, fc_w = self.fc_hw
        b, h, w, c = y.shape
        y = y.reshape(b, h, w, fc_h, fc_w, c // (fc_h * fc_w))
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h * fc_h, w * fc_w, c // (fc_h * fc_w))
        return ResBlockSFT(c // (fc_h * fc_w))(y, t_embed)


class ConvUpBlock(nn.Module):
    """ENeRV stage-0 factorised conv-then-upsample block
    (/root/reference/model_enerv.py:73-102)."""
    conv_type: str
    ngf: int
    new_ngf: int
    ks: int
    strd: int
    norm: str = "none"
    act: str = "gelu"
    sft: bool = False

    @nn.compact
    def __call__(self, x, t_embed=None):
        if self.ngf <= self.new_ngf:
            x = UpConv(conv_type=self.conv_type, new_ngf=self.ngf // 4,
                       ks=self.ks, strd=self.strd)(x)
            x = TConv(self.new_ngf, 3, 1, 1)(x)
        else:
            x = TConv(self.new_ngf, 3, 1, 1)(x)
            x = UpConv(conv_type=self.conv_type, new_ngf=self.new_ngf,
                       ks=self.ks, strd=self.strd)(x)
        x = get_activation(self.act)(norm_layer(self.norm, x))
        if self.sft and t_embed is not None:
            x = ResBlockSFT(self.new_ngf)(x, t_embed)
        return x


class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> 4x MLP -> layer-scale, residual
    (model_blocks.py:223-258); drop-path 0."""
    dim: int
    layer_scale_init_value: float = 1e-6

    @nn.compact
    def __call__(self, x):
        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    kernel_init=trunc_normal_init(),
                    bias_init=nn.initializers.zeros)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.Dense(4 * self.dim, kernel_init=trunc_normal_init(),
                     bias_init=nn.initializers.zeros)(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, kernel_init=trunc_normal_init(),
                     bias_init=nn.initializers.zeros)(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda k, s: jnp.full(s, self.layer_scale_init_value),
                (self.dim,))
            x = gamma * x
        return inp + x


class ConvNeXtEncoder(nn.Module):
    """Stride-configurable ConvNeXt content encoder
    (model_blocks.py:261-320). dims[-1] is the per-frame embedding width."""
    stage_blocks: int
    strds: Sequence[int]
    dims: Sequence[int]

    @nn.compact
    def __call__(self, x):
        for i, (strd, dim) in enumerate(zip(self.strds, self.dims)):
            if i == 0:
                x = nn.Conv(dim, (strd, strd), strides=(strd, strd),
                            padding="VALID", kernel_init=trunc_normal_init(),
                            bias_init=nn.initializers.zeros)(x)
                x = nn.LayerNorm(epsilon=1e-6)(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6)(x)
                x = nn.Conv(dim, (strd, strd), strides=(strd, strd),
                            padding="VALID", kernel_init=trunc_normal_init(),
                            bias_init=nn.initializers.zeros)(x)
            for _ in range(self.stage_blocks):
                x = ConvNeXtBlock(dim)(x)
        return x
