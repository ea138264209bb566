"""Subpixel-planar TRAINING forward for the *NeRV-Boost decoders.

Why this exists: at >=720p the standard fine-grid NHWC forward is
memory-bound during training — XLA pads the narrow-channel activations
(e.g. C=35 -> 128 lanes, 3.66x) and the padded conv temps OOM the 16 GB
HBM already at batch 2 (measured round 2: f32[720,16,161,35]-shaped
temps -> 905 MB each; CLAUDE.md).  This module re-expresses the stride-2
3x3 decoder tail in the SUBPIXEL-PLANAR layout of the serving kernels
(ops/pallas/planar.py) but with plain, autodiff-able XLA convolutions:

    fine [B, 2H, 2W, C]  <->  planar [B, H, W, 4C]
    planar[..., (2*r1 + r2)*C + c] = fine[..., 2y+r1, 2x+r2, c]

(the ops/pixelshuffle.space_to_depth(x, 2) packing, so the layout switch
into planar after an upconv is *free*: it is the conv output before
depth_to_space).  Channel dims stay at 4*C (e.g. 140 -> 256 lanes,
1.83x pad) instead of C (35 -> 128, 3.66x), and the spatial area is 4x
smaller, halving the padded activation footprint; the weird conv-temp
padding disappears with the narrow-channel convs themselves.

A 3x3 conv on the fine grid becomes ONE 2x2-window conv on the coarse
grid with a (2, 2, 4*Cin, 4*Cout) kernel assembled (differentiably)
from the fine 3x3 kernel: output subpixel (py, px) tap (dy, dx) reads
coarse offset u, r1 = divmod(py+dy, 2) / v, r2 = divmod(px+dx, 2), all
of which land in a 2x2 coarse window whose base shifts with (py, px) —
handled by computing the conv once over a 1-padded input and slicing
the four shifted output planes.  The dense 2x2 planar kernel carries
16 fine-tap slots where the 3x3 kernel fills 9, i.e. ~1.78x the minimal
conv FLOPs — the same deliberate trade the serving kernels make, bought
back at training time by the memory headroom (b>=2 fits) and the
MXU-friendlier channel dims.

The math is EXACTLY the reference decoder semantics
(/root/reference/model_hnerv.py:224-251, model_blocks.py:14-46,74-105)
on the same parameter pytree — only the layout and summation order
differ; tests/test_planar_forward.py asserts forward and gradient
equivalence against the flax model.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import BoostConfig, decoder_stage_plan, model_expansion
from ..ops.activations import get_activation
from ..ops.losses import out_img
from ..ops.pe import position_encoding
from ..ops.pixelshuffle import depth_to_space, space_to_depth


def to_planar_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """fine [B, 2H, 2W, C] -> planar [B, H, W, 4C] (s2d packing)."""
    return space_to_depth(x, 2)


def from_planar_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """planar [B, H, W, 4C] -> fine [B, 2H, 2W, C]."""
    return depth_to_space(x, 2)


@functools.lru_cache(maxsize=None)
def _placement(kh: int, kw: int) -> np.ndarray:
    """Constant 0/1 tap-placement tensor S[iy, ix, a, b, rin, q]: fine tap
    (iy, ix) of output subpixel q = 2*py+px lands at planar-kernel window
    position (a, b) reading input plane rin = 2*r1+r2, where
    u, r1 = divmod(py + iy - kh//2, 2) and a = u+1-py (same for cols)."""
    s = np.zeros((kh, kw, 2, 2, 4, 4), np.float32)
    for py in (0, 1):
        for px in (0, 1):
            q = 2 * py + px
            for iy in range(kh):
                u, r1 = divmod(py + iy - kh // 2, 2)
                for ix in range(kw):
                    v, r2 = divmod(px + ix - kw // 2, 2)
                    s[iy, ix, u + 1 - py, v + 1 - px, 2 * r1 + r2, q] = 1.0
    return s


def planar_kernel(k: jnp.ndarray) -> jnp.ndarray:
    """Fine-grid HWIO (kh, kw, Cin, Cout), kh/kw in {1, 3} -> planar
    (2, 2, 4*Cin, 4*Cout) HWIO kernel for a 2x2-window conv over the
    1-padded planar input.  Output channel (2*py+px)*Cout + co is the
    fine conv at subpixel (py, px); its 2x2 window base is
    (y-1+py, x-1+px), so kernel row a = u+1-py (in {0, 1}).  One einsum
    against a constant placement tensor — differentiable, scatter-free
    (a .at[].add formulation compiled pathologically slowly)."""
    kh, kw, cin, cout = k.shape
    assert kh in (1, 3) and kw in (1, 3), (kh, kw)
    s = jnp.asarray(_placement(kh, kw), k.dtype)
    kp = jnp.einsum("yxio,yxabrq->abriqo", k, s)
    return kp.reshape(2, 2, 4 * cin, 4 * cout)


def planar_conv(xp: jnp.ndarray, k: jnp.ndarray,
                bias: jnp.ndarray) -> jnp.ndarray:
    """Fine-grid conv (3x3 or 1x1, SAME) applied in planar layout:
    [B, H, W, 4*Cin] x (kh, kw, Cin, Cout) -> [B, H, W, 4*Cout]."""
    kh, kw, cin, cout = k.shape
    bsz, hc, wc, c4 = xp.shape
    assert c4 == 4 * cin, (xp.shape, k.shape)
    if kh == 1 and kw == 1:
        # per-plane matmul: every output subpixel reads its own plane
        y = xp.reshape(bsz, hc, wc, 4, cin) @ k[0, 0] + bias
        return y.reshape(bsz, hc, wc, 4 * cout)
    kp = planar_kernel(k)
    y = lax.conv_general_dilated(
        xp, kp, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # y: [B, H+1, W+1, 4*Cout]; plane (py, px) lives at spatial offset
    # (py, px) (its window base is one coarse cell lower/righter)
    planes = [y[:, py:py + hc, px:px + wc,
                (2 * py + px) * cout:(2 * py + px + 1) * cout]
              for py in (0, 1) for px in (0, 1)]
    return jnp.concatenate(planes, axis=-1) + jnp.tile(bias, 4)


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _sft_vectors(rsft, t_embed):
    """Batched scale/shift vectors [(B, C)] of both SFT layers (flax
    numbers children by construction order: outer TDense first —
    runtime/fast_decode._sft_vectors)."""
    vecs = []
    for li in (0, 1):
        sft = rsft[f"SFTLayer_{li}"]
        scale = _dense(sft["TDense_0"]["Dense_0"], jax.nn.relu(
            _dense(sft["TDense_1"]["Dense_0"], t_embed)))
        shift = _dense(sft["TDense_2"]["Dense_0"], jax.nn.relu(
            _dense(sft["TDense_3"]["Dense_0"], t_embed)))
        vecs.append((scale, shift))
    return vecs


def _planar_rsft(rsft, xp, t_embed):
    """ResBlockSFT (models/blocks.py:210-224) in planar layout: the
    per-fine-channel scale/shift broadcast to the 4 planes by tiling."""
    (s0, h0), (s1, h1) = _sft_vectors(rsft, t_embed)
    t4 = lambda v: jnp.tile(v, (1, 4))[:, None, None, :]
    gelu = get_activation("gelu")
    fea = xp * (t4(s0) + 1.0) + t4(h0)
    fea = gelu(planar_conv(fea, rsft["TConv_0"]["Conv_0"]["kernel"],
                           rsft["TConv_0"]["Conv_0"]["bias"]))
    fea = fea * (t4(s1) + 1.0) + t4(h1)
    fea = planar_conv(fea, rsft["TConv_1"]["Conv_0"]["kernel"],
                      rsft["TConv_1"]["Conv_0"]["bias"])
    return xp + fea


def _conv_nhwc(p, x, pad):
    return lax.conv_general_dilated(
        x, p["kernel"], (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"]


def build_planar_forward(cfg: BoostConfig, model, planar_from_h: int,
                         decode_only: bool = False) -> Callable:
    """Returns fwd(params, img, t) -> [B, H, W, 3], numerically
    equivalent to the model's training forward, with every stride-2 3x3
    decoder stage from the first whose FINE output height reaches
    `planar_from_h` computed in planar layout.  The prefix (encoder /
    trunk, stem, early stages) runs through flax `apply` so its
    numerics are byte-identical to the standard path.  Raises
    ValueError for ineligible configs (caller falls back).

    With `decode_only` (HNeRV_Boost) the first argument is the embedding
    instead of the frame — the CEM trainer's decode-after-embedding-
    quantisation path (compress_trainer.py)."""
    if cfg.model not in ("HNeRV_Boost", "NeRV_Boost", "ENeRV_Boost"):
        raise ValueError(f"planar training forward: unsupported model "
                         f"{cfg.model}")
    if cfg.conv_type[1] != "pshuffel_3x3" or cfg.norm != "none":
        raise ValueError("planar training forward needs pshuffel_3x3 "
                         "decoder convs and norm='none'")
    use_sft = cfg.sft_block == "res_sft" and cfg.ch_t != 0
    if cfg.model == "HNeRV_Boost":
        plan = decoder_stage_plan(cfg, cfg.fc_dim, hnerv_style=True)
    else:
        plan = decoder_stage_plan(cfg, cfg.fc_dim,
                                  expansion=model_expansion(cfg.model))

    out_hw, h_cur, w_cur = [], cfg.fc_h, cfg.fc_w
    for spec in plan:
        h_cur, w_cur = h_cur * spec.strd, w_cur * spec.strd
        out_hw.append((h_cur, w_cur))

    # ENeRV stage 0 is a ConvUpBlock (factorised conv-then-up) — always
    # in the flax prefix, like the serving v5 builder.
    first = 1 if cfg.model == "ENeRV_Boost" else 0
    switch_at = len(plan)
    for start in range(first, len(plan)):
        if plan[start].strd != 2 or min(plan[start].ks, 3) != 3:
            continue
        if out_hw[start][0] < planar_from_h:
            continue
        if all(plan[j].strd in (1, 2) and min(plan[j].ks, 3) in (1, 3)
               for j in range(start, len(plan))):
            switch_at = start
            break
    if switch_at == len(plan):
        raise ValueError("no planar-eligible decoder tail "
                         f"(planar_from_h={planar_from_h})")

    act = get_activation(cfg.act)

    if cfg.model == "HNeRV_Boost":
        def _prefix(m, img, t):
            embed = img if decode_only else m.encoder(img)
            t_embed = m.stem_t(position_encoding(t, m.pe))
            x = m.stem(embed, t_embed)
            for blk in m.blocks[:switch_at]:
                x = blk(x, t_embed)
            return x, t_embed
    elif cfg.model == "NeRV_Boost":
        def _prefix(m, img, t):
            pe_t = position_encoding(t, m.pe)
            x = m.stem(pe_t).reshape(-1, cfg.fc_h, cfg.fc_w, cfg.fc_dim)
            t_embed = m.stem_t(pe_t)
            for blk in m.blocks[:switch_at]:
                x = blk(x, t_embed)
            return x, t_embed
    else:  # ENeRV_Boost: tail blocks consume the t_branch output
        def _prefix(m, img, t):
            x, pe_t = m.trunk(t)
            t_embed = m.t_branch(pe_t)
            for blk in m.blocks[:switch_at]:
                x = blk(x, t_embed)
            return x, t_embed

    def fwd(params, img, t):
        x, t_embed = model.apply(params, img, t, method=_prefix)
        p = params["params"] if "params" in params else params
        xp = None
        for bi in range(switch_at, len(plan)):
            spec = plan[bi]
            blk = p[f"blocks_{bi}"]
            conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
            ks = min(spec.ks, 3)
            if xp is None:
                # layout switch: the stride-2 upconv's raw output IS the
                # planar tensor (conv channels = d2s packing) — free
                xp = _conv_nhwc(conv, x, (ks - 1) // 2)
            elif spec.strd == 2:
                # planar-in upconv: 16*C' channels on the old coarse
                # grid, then a coarse-grid d2s -> planar of the new grid
                xp = depth_to_space(
                    planar_conv(xp, conv["kernel"], conv["bias"]), 2)
            else:
                xp = planar_conv(xp, conv["kernel"], conv["bias"])
            xp = act(xp)
            if use_sft:
                xp = _planar_rsft(blk["ResBlockSFT_0"], xp, t_embed)
        head = p["head"]["Conv_0"]
        out = from_planar_nhwc(planar_conv(xp, head["kernel"],
                                           head["bias"]))
        return out_img(out, cfg.out_bias)

    return fwd
