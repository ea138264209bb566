"""Serving-grade HNeRV-Boost decode path with a channels-major Pallas tail.

The flax decode (models/hnerv.py) is a stack of sinusoidal NeRVBlocks; XLA
runs each 1080p conv with ~4 ms of fixed layout overhead and separate
elementwise passes. This runtime rebuilds the same computation from the raw
parameter pytree:

 - frame-index embedding, decoder stem and the low-resolution stages run in
   XLA NHWC (they are tiny);
 - once the feature map is large (H >= `pallas_from_h`), data switches to a
   channels-major (C, H, W) layout and flows through the fused Pallas
   kernels (ops/pallas): conv+sin, fused TAT residual block (with the
   preceding sin folded into its prologue), and the head conv + OutImg —
   one HBM round-trip per kernel instead of one per op.

Supported config: HNeRV_Boost with conv_type[1] == pshuffel_3x3, act 'sin',
sft_block 'res_sft', norm 'none' (the Boost paper configuration). The
builder raises for anything else — callers fall back to the flax path.

Everything is bfloat16 (weights cast once at build). Batch size 1 per call
(the decode-FPS serving convention, reference model_hnerv.py:240-250).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..config import BoostConfig, decoder_stage_plan
from ..ops.pallas.conv_chw import conv3x3_act_chw, head_conv_chw
from ..ops.pallas.fused_sft import resblock_sft_chw
from ..ops.pe import PEConfig, position_encoding

DT = jnp.bfloat16


def _dense(p, x, act=None):
    y = x @ p["kernel"] + p["bias"]
    return act(y) if act else y


def _mlp_sin(tree, x, n_layers):
    for i in range(n_layers):
        x = jnp.sin(_dense(tree[f"TDense_{i}"]["Dense_0"], x))
    return x


def _sft_vectors(rsft, t_embed):
    """scale/shift vectors of both SFT layers of a ResBlockSFT
    (models/blocks.py SFTLayer: Dense -> relu -> Dense, twice). Note flax
    numbers children by CONSTRUCTION order: in `TDense(out)(act(TDense(in)
    (cond)))` the outer projection is TDense_0 and the inner is TDense_1."""
    out = []
    for li in (0, 1):
        sft = rsft[f"SFTLayer_{li}"]
        scale = _dense(sft["TDense_0"]["Dense_0"],
                       jax.nn.relu(_dense(sft["TDense_1"]["Dense_0"], t_embed)))
        shift = _dense(sft["TDense_2"]["Dense_0"],
                       jax.nn.relu(_dense(sft["TDense_3"]["Dense_0"], t_embed)))
        out.append((scale, shift))
    return out


def _conv_nhwc(p, x, pad):
    return lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["bias"].astype(x.dtype)


def _w9(p):
    """flax HWIO (3,3,Cin,Cout) -> (9, Cout, Cin) taps."""
    k = p["kernel"]
    return k.transpose(0, 1, 3, 2).reshape(9, k.shape[3], k.shape[2])


def _rsft_w(rsft):
    return (_w9(rsft["TConv_0"]["Conv_0"]), rsft["TConv_0"]["Conv_0"]["bias"],
            _w9(rsft["TConv_1"]["Conv_0"]), rsft["TConv_1"]["Conv_0"]["bias"])


def _d2s_nhwc(x, r):
    from ..ops.pixelshuffle import depth_to_space

    return depth_to_space(x, r)


def _d2s_chw(x, r):
    """(C*r*r, H, W) -> (C, H*r, W*r) matching the NHWC (r1, r2, c)
    channel packing of ops/pixelshuffle.depth_to_space."""
    if r == 1:
        return x
    crr, h, w = x.shape
    c = crr // (r * r)
    x = x.reshape(r, r, c, h, w)
    x = x.transpose(2, 3, 0, 4, 1)
    return x.reshape(c, h * r, w * r)


def _rsft_apply_nhwc(rsft, x, t_embed):
    (s0, h0), (s1, h1) = _sft_vectors(rsft, t_embed)
    bc = lambda v: v[:, None, None, :].astype(x.dtype)
    fea = x * (bc(s0) + 1) + bc(h0)
    fea = _conv_nhwc(rsft["TConv_0"]["Conv_0"], fea, 1)
    fea = jax.nn.gelu(fea, approximate=False)
    fea = fea * (bc(s1) + 1) + bc(h1)
    fea = _conv_nhwc(rsft["TConv_1"]["Conv_0"], fea, 1)
    return x + fea


def build_fast_decode_v2(cfg: BoostConfig, params, tile_from_h: int = 200,
                         crop_repad: bool = True,
                         interpret: bool = False) -> Callable:
    """Decode with the v2 per-tile K-stacked kernels (ops/pallas/tile_conv).

    Layout: NHWC XLA for the tiny early stages; channels-major (C, H, W)
    with W zero-padded to a lane multiple from the first stage whose output
    height reaches `tile_from_h`. Per stage: conv_tile (one K-stacked MXU
    dot per 8-row tile) -> depth_to_space + sin in XLA (pure
    bandwidth / fused elementwise — XLA wins those, CLAUDE.md) ->
    resblock_sft_tile (whole TAT block, one kernel). Ragged widths (e.g.
    960 -> 1024) are masked in-kernel; `crop_repad` re-crops when
    depth_to_space doubles the padding (2048 -> 1920).
    """
    if not (cfg.model == "HNeRV_Boost" and cfg.conv_type[1] == "pshuffel_3x3"
            and cfg.act == "sin" and cfg.sft_block == "res_sft"
            and cfg.norm == "none"):
        raise ValueError("fast decode supports the HNeRV-Boost paper config "
                         "(pshuffel_3x3 / sin / res_sft / no norm)")
    from ..ops.pallas.tile_conv import conv_tile, resblock_sft_tile

    p = params["params"] if "params" in params else params
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), p)
    pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
    plan = decoder_stage_plan(cfg, cfg.fc_dim, hnerv_style=True)

    out_hw = []
    h_cur, w_cur = cfg.fc_h, cfg.fc_w
    for spec in plan:
        h_cur, w_cur = h_cur * spec.strd, w_cur * spec.strd
        out_hw.append((h_cur, w_cur))

    def _pad_w(a, wreal):
        wd = -(-wreal // 128) * 128
        return (jnp.pad(a, ((0, 0), (0, 0), (0, wd - wreal)))
                if wd != a.shape[2] else a)

    def decode(embed, t):
        pe_t = position_encoding(t, pe).astype(DT)
        t_embed = _mlp_sin(p["stem_t"], pe_t, 2)

        x = embed.astype(DT)
        stem = p["stem"]
        x = _conv_nhwc(stem["DownConv_0"]["TConv_0"]["Conv_0"], x, 0)
        x = jnp.sin(x)
        x = _rsft_apply_nhwc(stem["ResBlockSFT_0"], x, t_embed)

        chw = None
        wreal = None
        for bi, spec in enumerate(plan):
            blk = p[f"blocks_{bi}"]
            conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
            rsft = blk["ResBlockSFT_0"]
            ks = min(spec.ks, 3)  # pshuffel_3x3 clamps (model_blocks.py:203)
            (s0v, h0v), (s1v, h1v) = _sft_vectors(rsft, t_embed)
            f32 = lambda v: v[0].astype(jnp.float32)

            if chw is None and out_hw[bi][0] < tile_from_h:
                x = _conv_nhwc(conv, x, (ks - 1) // 2)
                x = _d2s_nhwc(x, spec.strd)
                x = jnp.sin(x)
                x = _rsft_apply_nhwc(rsft, x, t_embed)
                continue

            if chw is None:
                # switch stage: upconv+d2s still in XLA (input is small)
                x = _conv_nhwc(conv, x, (ks - 1) // 2)
                x = _d2s_nhwc(x, spec.strd)
                chw = jnp.sin(x[0].transpose(2, 0, 1))
                wreal = chw.shape[2]
                chw = _pad_w(chw, wreal)
            else:
                chw = conv_tile(chw, conv["kernel"], conv["bias"], k=ks,
                                w_real=wreal, interpret=interpret)
                chw = _d2s_chw(chw, spec.strd)
                wreal = wreal * spec.strd
                if crop_repad:
                    wd = -(-wreal // 128) * 128
                    if wd != chw.shape[2]:
                        chw = chw[:, :, :wd]
                chw = jnp.sin(chw)

            chw = resblock_sft_tile(
                chw, rsft["TConv_0"]["Conv_0"]["kernel"],
                rsft["TConv_0"]["Conv_0"]["bias"],
                rsft["TConv_1"]["Conv_0"]["kernel"],
                rsft["TConv_1"]["Conv_0"]["bias"],
                f32(s0v), f32(h0v), f32(s1v), f32(h1v),
                w_real=wreal, interpret=interpret)

        head = p["head"]["Conv_0"]
        if chw is None:
            out = _conv_nhwc(head, x, 1)
            return jnp.tanh(out) * 0.5 + 0.5
        out = conv_tile(chw, head["kernel"], head["bias"], k=3,
                        w_real=wreal, interpret=interpret)
        out = out[:, :, :wreal]
        out = jnp.tanh(out.astype(jnp.float32)) * 0.5 + 0.5
        return out.transpose(1, 2, 0)[None].astype(DT)

    return decode


def build_fast_decode_v3(cfg: BoostConfig, params, tile_from_h: int = 200,
                         mode: str = "dy3", head_th: int = 24,
                         interpret: bool = False) -> Callable:
    """v3: pre-shifted-tile kernels with FUSED activations.

    sin commutes with depth_to_space, so each tiled upconv emits
    sin(conv(x)) from the kernel epilogue (polynomial sin — Mosaic's native
    sin is 5-8x slower than XLA's); d2s stays in XLA as a pure relayout;
    the head conv fuses OutImg (tanh*0.5+0.5 == sigmoid(2x)). One HBM
    round-trip per kernel, no elementwise interludes.
    """
    if not (cfg.model == "HNeRV_Boost" and cfg.conv_type[1] == "pshuffel_3x3"
            and cfg.act == "sin" and cfg.sft_block == "res_sft"
            and cfg.norm == "none"):
        raise ValueError("fast decode supports the HNeRV-Boost paper config "
                         "(pshuffel_3x3 / sin / res_sft / no norm)")
    from ..ops.pallas.tile_conv import conv_tile_v3, resblock_sft_tile_v3

    p = params["params"] if "params" in params else params
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), p)
    pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
    plan = decoder_stage_plan(cfg, cfg.fc_dim, hnerv_style=True)

    out_hw = []
    h_cur, w_cur = cfg.fc_h, cfg.fc_w
    for spec in plan:
        h_cur, w_cur = h_cur * spec.strd, w_cur * spec.strd
        out_hw.append((h_cur, w_cur))

    def _pad_w(a, wreal):
        wd = -(-wreal // 128) * 128
        return (jnp.pad(a, ((0, 0), (0, 0), (0, wd - wreal)))
                if wd != a.shape[2] else a)

    def decode(embed, t):
        pe_t = position_encoding(t, pe).astype(DT)
        t_embed = _mlp_sin(p["stem_t"], pe_t, 2)

        x = embed.astype(DT)
        stem = p["stem"]
        x = _conv_nhwc(stem["DownConv_0"]["TConv_0"]["Conv_0"], x, 0)
        x = jnp.sin(x)
        x = _rsft_apply_nhwc(stem["ResBlockSFT_0"], x, t_embed)

        chw = None
        wreal = None
        for bi, spec in enumerate(plan):
            blk = p[f"blocks_{bi}"]
            conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
            rsft = blk["ResBlockSFT_0"]
            ks = min(spec.ks, 3)  # pshuffel_3x3 clamps (model_blocks.py:203)
            (s0v, h0v), (s1v, h1v) = _sft_vectors(rsft, t_embed)
            f32 = lambda v: v[0].astype(jnp.float32)

            if chw is None and out_hw[bi][0] < tile_from_h:
                x = _conv_nhwc(conv, x, (ks - 1) // 2)
                x = _d2s_nhwc(x, spec.strd)
                x = jnp.sin(x)
                x = _rsft_apply_nhwc(rsft, x, t_embed)
                continue

            if chw is None:
                # switch stage: upconv+d2s still in XLA (input is small)
                x = _conv_nhwc(conv, x, (ks - 1) // 2)
                x = _d2s_nhwc(x, spec.strd)
                chw = jnp.sin(x[0].transpose(2, 0, 1))
                wreal = chw.shape[2]
                chw = _pad_w(chw, wreal)
            else:
                kshape = conv["kernel"].shape
                cmode = mode if (mode != "ody" or kshape[3] <= kshape[2]) \
                    else "dy3"  # ody needs Cout <= Cin (upconvs widen)
                chw = conv_tile_v3(chw, conv["kernel"], conv["bias"], k=ks,
                                   w_real=wreal, act="sin", mode=cmode,
                                   interpret=interpret)
                if spec.strd > 1:
                    chw = _d2s_chw(chw, spec.strd)
                    wreal = wreal * spec.strd
                    wd = -(-wreal // 128) * 128
                    if wd != chw.shape[2]:
                        chw = chw[:, :, :wd]

            chw = resblock_sft_tile_v3(
                chw, rsft["TConv_0"]["Conv_0"]["kernel"],
                rsft["TConv_0"]["Conv_0"]["bias"],
                rsft["TConv_1"]["Conv_0"]["kernel"],
                rsft["TConv_1"]["Conv_0"]["bias"],
                f32(s0v), f32(h0v), f32(s1v), f32(h1v),
                w_real=wreal, mode=mode, interpret=interpret)

        head = p["head"]["Conv_0"]
        if chw is None:
            out = _conv_nhwc(head, x, 1)
            return jnp.tanh(out) * 0.5 + 0.5
        out = conv_tile_v3(chw, head["kernel"], head["bias"], k=3,
                           w_real=wreal, act="outimg", mode=mode,
                           th=head_th if chw.shape[1] % head_th == 0 else 8,
                           interpret=interpret)
        out = out[:, :, :wreal]
        return out.transpose(1, 2, 0)[None].astype(DT)

    return decode


def _planar_tail_span(cfg, plan, out_hw, planar_from_h, fine_from_h):
    """(switch_at, fine_at) of the v5 subpixel-planar tail — the single
    source of truth shared by build_fast_decode_v5 and the W8A8
    calibrator so their stage indexing can never diverge."""
    switch_at = len(plan)
    first = 1 if cfg.model == "ENeRV_Boost" else 0
    for start in range(first, len(plan)):
        if plan[start].strd != 2 or min(plan[start].ks, 3) != 3:
            continue
        if out_hw[start][0] < planar_from_h:
            continue
        if all(plan[j].strd in (1, 2) and min(plan[j].ks, 3) == 3
               for j in range(start, len(plan))):
            switch_at = start
            break
    if switch_at == len(plan):
        raise ValueError("no planar-eligible tail for this config")
    fine_at = len(plan)
    for bi in range(switch_at, len(plan)):
        if out_hw[bi][0] >= fine_from_h:
            fine_at = bi
            break
    return switch_at, fine_at


def build_planar_bounds_fn(cfg: BoostConfig, params,
                           planar_from_h: int = 200,
                           fine_from_h: int = 10 ** 9) -> Callable:
    """Jittable W8A8 calibration pass: `calib(embed, t)` decodes one frame
    with the plain XLA fine-grid math (bit-identical semantics to the
    planar kernels up to layout) and returns the per-fine-channel |x|
    maxima at every conv input of every planar-tail stage, keyed
    "{bi}.x" / "{bi}.t0" / "{bi}.t1" (+ "{bi}.h" on the fused-head
    stage).  Feed several frames and tree-maximize; the result is the
    `bounds` input of ops.pallas.planar.prepare_*_i8 via
    build_fast_decode_v5(w8a8_bounds=...).

    Serving quantisation surface of the reference
    (/root/reference/train_nerv_all.py quant_model / --quant_model_bit 8)
    extended to activations for the 2x-int8 MXU path."""
    from ..config import model_expansion

    p = params["params"] if "params" in params else params
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), p)
    pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
    if cfg.model == "HNeRV_Boost":
        plan = decoder_stage_plan(cfg, cfg.fc_dim, hnerv_style=True)
    else:
        plan = decoder_stage_plan(cfg, cfg.fc_dim,
                                  expansion=model_expansion(cfg.model))
    out_hw = []
    h_cur, w_cur = cfg.fc_h, cfg.fc_w
    for spec in plan:
        h_cur, w_cur = h_cur * spec.strd, w_cur * spec.strd
        out_hw.append((h_cur, w_cur))
    switch_at, fine_at = _planar_tail_span(cfg, plan, out_hw,
                                           planar_from_h, fine_from_h)

    if cfg.model == "ENeRV_Boost":
        from ..models import build_model
        _enerv = build_model(cfg)

        def _prefix(embed, t):
            def run(m, tt):
                x, pe_t = m.trunk(tt)
                t_manip = m.t_branch(pe_t)
                for blk in m.blocks[:switch_at]:
                    x = blk(x, t_manip)
                return x, t_manip
            return _enerv.apply({"params": p}, t, method=run)
    else:
        def _prefix(embed, t):
            pe_t = position_encoding(t, pe).astype(DT)
            t_embed = _mlp_sin(p["stem_t"], pe_t, 2)
            if cfg.model == "HNeRV_Boost":
                x = embed.astype(DT)
                stem = p["stem"]
                x = _conv_nhwc(stem["DownConv_0"]["TConv_0"]["Conv_0"],
                               x, 0)
                x = jnp.sin(x)
                x = _rsft_apply_nhwc(stem["ResBlockSFT_0"], x, t_embed)
            else:
                x = _mlp_sin(p["stem"], pe_t, 2)
                x = x.reshape(1, cfg.fc_h, cfg.fc_w, cfg.fc_dim)
            for bi in range(switch_at):
                spec = plan[bi]
                blk = p[f"blocks_{bi}"]
                conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
                ks = min(spec.ks, 3)
                x = _conv_nhwc(conv, x, (ks - 1) // 2)
                if spec.strd > 1:
                    x = _d2s_nhwc(x, spec.strd)
                x = jnp.sin(x)
                x = _rsft_apply_nhwc(blk["ResBlockSFT_0"], x, t_embed)
            return x, t_embed

    def _chmax(x):
        return jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))

    def calib(embed, t):
        x, t_embed = _prefix(embed, t)
        bounds = {}
        for bi in range(switch_at, fine_at):
            spec = plan[bi]
            blk = p[f"blocks_{bi}"]
            conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
            rsft = blk["ResBlockSFT_0"]
            bounds[f"{bi}.x"] = _chmax(x)
            if spec.strd == 2:
                x = _conv_nhwc(conv, x, 1)
                x = _d2s_nhwc(x, 2)
                x = jnp.sin(x)
            else:
                x = jnp.sin(_conv_nhwc(conv, x, 1))
            (s0, h0), (s1, h1) = _sft_vectors(rsft, t_embed)
            bc = lambda v: v[:, None, None, :].astype(x.dtype)
            t0 = x * (bc(s0) + 1) + bc(h0)
            bounds[f"{bi}.t0"] = _chmax(t0)
            a = _conv_nhwc(rsft["TConv_0"]["Conv_0"], t0, 1)
            t1 = jax.nn.gelu(a, approximate=False) * (bc(s1) + 1) + bc(h1)
            bounds[f"{bi}.t1"] = _chmax(t1)
            x = x + _conv_nhwc(rsft["TConv_1"]["Conv_0"], t1, 1)
            if bi == len(plan) - 1 and spec.strd == 1:
                bounds[f"{bi}.h"] = _chmax(x)
        return bounds

    return calib


def calibrate_planar_bounds(cfg: BoostConfig, params, frames,
                            planar_from_h: int = 200,
                            fine_from_h: int = 10 ** 9,
                            margin: float = 1.0):
    """Run the W8A8 calibration pass over `frames` (iterable of
    (embed, t) pairs) and return the tree-maximized bounds dict for
    build_fast_decode_v5(w8a8_bounds=...).  `margin` scales the maxima
    (>1 leaves headroom for un-calibrated frames; clipping saturates, so
    modest overshoot degrades gracefully)."""
    calib = jax.jit(build_planar_bounds_fn(cfg, params, planar_from_h,
                                           fine_from_h))
    acc = None
    for embed, t in frames:
        b = calib(embed, t)
        acc = b if acc is None else jax.tree_util.tree_map(jnp.maximum,
                                                           acc, b)
    return jax.tree_util.tree_map(
        lambda a: jax.device_get(a * margin), acc)


def build_serving_decode(cfg: BoostConfig, params,
                         w8a8_calib=None) -> Callable:
    """The production decode path: the fastest verified kernel pipeline
    for the config.  Single source of truth for bench.py and the
    trainer's --eval_fps (reference fps convention,
    /root/reference/train_nerv_all.py:490-496).  Raises ValueError for
    configs outside the supported Boost paper shapes.

    `w8a8_calib`: optional iterable of (embed, t) calibration frames.
    When given (and BNT_DECODE_W8A8 != "0"), the int8-aligned planar
    stages serve W8A8 — calibrated per-channel activation quantisation
    folded into int8 weight mats, int32-accumulate MXU dots (2x int8
    MXU rate on v5e, half the K-buffer traffic).  Quality is the
    caller's contract: W8A8 adds quantisation noise on top of bf16
    (measured PSNR-vs-bf16 per config in BASELINE.md); pass None for
    the bit-faithful bf16 pipeline.

    v5 fused-planar when the config has a stride-2 3x3 tail (measured
    32.5 fps UVG-1080p with the default policy below vs 22.2 for v3,
    maxerr 2.6e-3 vs flax; tools/v5_probe.py, tools/r3_nck_probe.py);
    v3 dy3 otherwise.  Default policy (hardware-measured 2026-08-19):
    th=12 beats th=8 on both 540-grid stage kernels but OOMs scoped VMEM
    un-chunked; nck=3 chunking shrinks the K-buffers enough that the
    taller tile fits (chunking pays ONLY via the tile it unlocks — at
    th=8 it is strictly slower).  {270: 16} unchunked for the 270 grid.
    Bench trajectory: {270:16} 31.1 -> +B540:12/nck3 31.95 ->
    +A540:12/nck3 32.52 fps.

    Env overrides for measurement sessions (JSON dicts/ints, same
    semantics as the th/nck/split kwargs; string keys like "A540" or
    "270" are accepted): BNT_DECODE_TH, BNT_DECODE_NCK,
    BNT_DECODE_SPLIT."""
    import json as _json
    import os as _os

    def _policy(env, default):
        raw = _os.environ.get(env)
        if not raw:
            return default
        v = _json.loads(raw)
        if isinstance(v, dict):
            v = {(int(k) if k.lstrip("-").isdigit() else k): int(x)
                 for k, x in v.items()}
        return v

    # The aggressive th/nck defaults are hardware-verified ONLY at the
    # UVG-1080p bench shape (crop 1080_1920, fc_dim 127 channel plan) —
    # scoped-VMEM fit depends on both the stage widths and the channel
    # counts, and a Mosaic overflow surfaces as a compile error at first
    # call, past the ValueError fallback below.  Any other shape gets the
    # universally-safe th=8/nck=0 policy; new shapes should be
    # AOT-validated first (tools/aot_compile_check.py) and added here.
    if cfg.crop_list == "1080_1920":
        th_default = {270: 16, "A540": 12, "B540": 12}
        nck_default = {"A540": 3, "B540": 3}
    else:
        th_default, nck_default = 8, 0

    bounds = None
    th_bf16 = nck_bf16 = None
    if w8a8_calib is not None and _os.environ.get("BNT_DECODE_W8A8") != "0":
        try:
            bounds = calibrate_planar_bounds(cfg, params, w8a8_calib,
                                             margin=1.05)
        except Exception as e:  # W8A8 is opportunistic: calibration
            # failure (unsupported config, malformed calib iterable,
            # off-plan params tree) must degrade to the bf16 pipeline
            print(f"W8A8 calibration failed ({type(e).__name__}: {e}); "
                  "serving bf16")
            bounds = None
        if bounds is not None:
            # Zero-convert int8 (round 5): inter-stage tensors stay int8,
            # K-bufs build from the int8 source with packed lane-rolls, so
            # the VMEM footprint shrinks enough for th=16 UN-chunked on
            # the 540-grid stages (nck is forced 0 on i8 stages inside
            # the builder) and th=24 on the bf16 270 grid.  Measured
            # 2026-08-20 (tools/r5_zc_probe.py): {270:24,540:16} 40.0 fps
            # vs 32.5 bf16 production, psnr-vs-bf16 59.3 dB.  A VMEM
            # overflow on an unprobed shape surfaces at first jit call
            # (bench.py catches it and keeps the bf16 headline).
            # int8 eligibility is per-stage (cp % 32 == 0 inside the
            # builder): any 540 stage that stays bf16 keeps the CHUNKED
            # bf16 policy via th_bf16/nck_bf16 — th=12/nck=0 is a known
            # scoped-VMEM OOM for a bf16 540 kernel (CLAUDE.md round 3).
            if cfg.crop_list == "1080_1920":
                th_bf16, nck_bf16 = th_default, nck_default
                th_default = {270: 24, 540: 16}
                nck_default = 0

    th_use = _policy("BNT_DECODE_TH", th_default)
    nck_use = _policy("BNT_DECODE_NCK", nck_default)
    split_use = _policy("BNT_DECODE_SPLIT", 0)

    # Deviceless AOT pre-gate (round-5, VERDICT r4 weak #4): an
    # aggressive tile policy on a shape that was never hardware-verified
    # (or any env-override policy) is compile-checked on the offline
    # v5e Mosaic target first; a scoped-VMEM overflow then degrades to
    # the universally-safe policy here instead of surfacing as a
    # remote-compile failure at the caller's first jit.  The bench shape
    # with the default policy skips the gate (hardware-verified).
    def _is_safe(t, n, s):
        return ((t == 8 or t == {}) and (n == 0 or n == {})
                and (s == 0 or s == {}))

    overridden = any(_os.environ.get(k) for k in
                     ("BNT_DECODE_TH", "BNT_DECODE_NCK",
                      "BNT_DECODE_SPLIT"))
    hw_verified = cfg.crop_list == "1080_1920" and cfg.fc_dim == 127
    gate_fallback = False
    if ((overridden or not hw_verified)
            and not _is_safe(th_use, nck_use, split_use)
            and _os.environ.get("BNT_AOT_GATE", "1") != "0"):
        from .aot_gate import gate_policy
        if not gate_policy(cfg, th_use, nck_use, split_use,
                           w8a8=bounds is not None):
            print("build_serving_decode: policy failed the deviceless "
                  "AOT gate; serving the safe th=8/nck=0 policy")
            th_use, nck_use, split_use = 8, 0, 0
            th_bf16 = nck_bf16 = None
            gate_fallback = True

    try:
        dec = build_fast_decode_v5(
            cfg, params, planar_from_h=200,
            th=th_use, nck=nck_use, split=split_use,
            w8a8_bounds=bounds, th_bf16=th_bf16, nck_bf16=nck_bf16)
    except ValueError:
        return build_fast_decode_v3(cfg, params, tile_from_h=45,
                                    mode="dy3")
    dec.serving_policy = {"th": th_use, "nck": nck_use, "split": split_use,
                          "w8a8": bounds is not None,
                          "gate_fallback": gate_fallback}
    return dec


def build_fast_decode(cfg: BoostConfig, params,
                      pallas_from_h: int = 10 ** 9,
                      interpret: bool = False) -> Callable:
    """Returns decode(embed, t) -> [1, H, W, 3] for B=1 inputs.

    The Pallas tail engages at the first stage whose output height reaches
    `pallas_from_h` AND from which every remaining stage has a 128-aligned
    output width (lane tiling) with 3x3 convs; otherwise those stages stay
    in XLA. Default is OFF (pure bf16 XLA rebuild, 74.7 ms/frame at UVG
    1080p vs 88 ms for the flax path): the current row-dot kernels win in
    isolation but lose in situ — see CLAUDE.md round-2 roadmap."""
    if not (cfg.model == "HNeRV_Boost" and cfg.conv_type[1] == "pshuffel_3x3"
            and cfg.act == "sin" and cfg.sft_block == "res_sft"
            and cfg.norm == "none"):
        raise ValueError("fast decode supports the HNeRV-Boost paper config "
                         "(pshuffel_3x3 / sin / res_sft / no norm)")
    p = params["params"] if "params" in params else params
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), p)
    pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
    plan = decoder_stage_plan(cfg, cfg.fc_dim, hnerv_style=True)
    _, ks1, ks2 = cfg.ks_triple

    # per-stage output sizes + first index from which the whole remaining
    # chain is pallas-eligible (W % 128 == 0, 3x3 kernels after the switch)
    out_hw = []
    h_cur, w_cur = cfg.fc_h, cfg.fc_w
    for spec in plan:
        h_cur, w_cur = h_cur * spec.strd, w_cur * spec.strd
        out_hw.append((h_cur, w_cur))
    switch_at = len(plan)
    w_align = 1 if interpret else 128  # lane tiling is a hardware constraint
    for start in range(len(plan)):
        if out_hw[start][0] < pallas_from_h:
            continue
        ok = all(out_hw[j][1] % w_align == 0 and
                 (j == start or min(plan[j].ks, 3) == 3)
                 for j in range(start, len(plan)))
        if ok:
            switch_at = start
            break

    def decode(embed, t):
        # --- conditioning (XLA, microscopic) --------------------------- #
        pe_t = position_encoding(t, pe).astype(DT)
        t_embed = _mlp_sin(p["stem_t"], pe_t, 2)

        # --- stem: 1x1 conv + sin + TAT at fc resolution --------------- #
        x = embed.astype(DT)
        stem = p["stem"]
        x = _conv_nhwc(stem["DownConv_0"]["TConv_0"]["Conv_0"], x, 0)
        x = jnp.sin(x)
        x = _rsft_apply_nhwc(stem["ResBlockSFT_0"], x, t_embed)

        # --- upsampling stages ----------------------------------------- #
        chw = None  # (C, H, W) once we switch layouts
        for bi, spec in enumerate(plan):
            blk = p[f"blocks_{bi}"]
            conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
            rsft = blk["ResBlockSFT_0"]
            ks = min(spec.ks, 3)

            if bi < switch_at:
                # small/ineligible stage: plain XLA NHWC
                x = _conv_nhwc(conv, x, (ks - 1) // 2)
                x = _d2s_nhwc(x, spec.strd)
                x = jnp.sin(x)
                x = _rsft_apply_nhwc(rsft, x, t_embed)
                continue

            (s0v, h0v), (s1v, h1v) = _sft_vectors(rsft, t_embed)
            w0, b0, w1, b1 = _rsft_w(rsft)
            f32 = lambda v: v[0].astype(jnp.float32)

            if chw is None:
                # layout switch: run this upconv in XLA, transpose after
                x = _conv_nhwc(conv, x, (ks - 1) // 2)
                x = _d2s_nhwc(x, spec.strd)
                chw = x[0].transpose(2, 0, 1)  # sin fused into the kernel
                chw = resblock_sft_chw(chw, w0, b0, w1, b1, f32(s0v),
                                       f32(h0v), f32(s1v), f32(h1v),
                                       interpret=interpret, input_sin=True)
            else:
                if ks != 3:
                    raise ValueError("pallas tail expects 3x3 convs")
                chw = conv3x3_act_chw(chw, _w9(conv), conv["bias"],
                                      interpret=interpret)
                chw = _d2s_chw(chw, spec.strd)
                chw = resblock_sft_chw(chw, w0, b0, w1, b1, f32(s0v),
                                       f32(h0v), f32(s1v), f32(h1v),
                                       interpret=interpret, input_sin=False)

        head = p["head"]["Conv_0"]
        if chw is None:
            out = _conv_nhwc(head, x, 1)
            return jnp.tanh(out) * 0.5 + 0.5
        out = head_conv_chw(chw, _w9(head), head["bias"], interpret=interpret)
        return out.transpose(1, 2, 0)[None]

    return decode


def build_fast_decode_v5(cfg: BoostConfig, params, planar_from_h: int = 200,
                         th: int | dict = 8, fine_from_h: int = 10 ** 9,
                         head_th: int = 24, nck: int | dict = 0,
                         split: int | dict = 0, w8a8_bounds=None,
                         th_bf16: int | dict | None = None,
                         nck_bf16: int | dict | None = None,
                         interpret: bool = False) -> Callable:
    """v5: fused-stage subpixel-planar tail (ops/pallas/planar).

    Every stride-2 NeRVBlock from the first whose FINE output height
    reaches `planar_from_h` runs as ONE Pallas kernel on the coarse grid
    (upconv -> sin -> TAT fused; 9 chained MXU dots per tile), each
    following stride-1 block as another (conv -> sin -> TAT [-> head],
    12-15 chained dots).  Tensors stay in subpixel-planar layout between
    kernels — no depth-to-space, crop or re-pad interludes anywhere in
    the tail; the only relayouts are one XLA interleave before each
    stride-2 stage and the final 12-channel planar->RGB expansion.
    Motivation + measured dot-pipeline numbers: tools/planar_diag*.py,
    CLAUDE.md round-3 notes.  Matches /root/reference/model_hnerv.py:
    224-251 (HNeRV-Boost), model_nerv.py:45-61 (NeRV-Boost) and
    model_enerv.py:279-317 (E-NeRV-Boost) decode semantics; for the
    index-only models `embed` is ignored and the stem (MLP / transformer
    trunk) is included in the timed path per the reference fps
    convention.  The E-NeRV trunk and its stage-0 ConvUpBlock run as
    plain flax/XLA (144-token attention — negligible next to the conv
    tail); only the stride-2 3x3 NeRVBlock tail goes planar.

    `fine_from_h` (hybrid mode): stages whose FINE output height reaches
    it leave the planar layout and run the v3 fine-grid kernels
    (tile_conv: dy3 conv+sin, fused TAT, head+OutImg) with an XLA d2s
    relayout — at the 1080 zone the fine-grid formulation carries 1x the
    conv FLOPs where planar carries ~1.8x, and the v3 iso timings (3.0 +
    7.7 + 3.8 ms) undercut the planar pair (9.4 + 13.5 ms); the planar
    zones keep their zero-interlude pipeline."""
    if not (cfg.model in ("HNeRV_Boost", "NeRV_Boost", "ENeRV_Boost")
            and cfg.conv_type[1] == "pshuffel_3x3"
            and cfg.act == "sin" and cfg.sft_block == "res_sft"
            and cfg.norm == "none" and cfg.ch_t):
        raise ValueError("fast decode supports the *NeRV-Boost "
                         "paper configs (pshuffel_3x3 / sin / res_sft / "
                         "no norm)")
    from ..config import model_expansion
    from ..ops.pallas import planar as pk

    p = params["params"] if "params" in params else params
    p = jax.tree_util.tree_map(lambda a: jnp.asarray(a, DT), p)
    pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
    if cfg.model == "HNeRV_Boost":
        plan = decoder_stage_plan(cfg, cfg.fc_dim, hnerv_style=True)
    else:
        plan = decoder_stage_plan(cfg, cfg.fc_dim,
                                  expansion=model_expansion(cfg.model))

    out_hw = []
    h_cur, w_cur = cfg.fc_h, cfg.fc_w
    for spec in plan:
        h_cur, w_cur = h_cur * spec.strd, w_cur * spec.strd
        out_hw.append((h_cur, w_cur))

    # switch: first stride-2 3x3 stage whose fine output height clears the
    # threshold AND from which the rest of the plan is planar-eligible.
    # (ENeRV stage 0 is a ConvUpBlock that always stays in the flax
    # prefix — handled inside the shared helper.)
    switch_at, fine_at = _planar_tail_span(cfg, plan, out_hw,
                                           planar_from_h, fine_from_h)
    head_fused = fine_at == len(plan) and plan[-1].strd == 1

    # per-stage tile height: int applies everywhere; a dict maps the
    # stage's COARSE height (e.g. 270) or kind+height (e.g. "A540" for
    # the stride-2 kernel only) -> th, missing keys fall back to 8.  The
    # measured-best UVG-1080p policy (tools/v5_iso_probe.py,
    # tools/r3_nck_probe.py, 2026-08-19) is th={270:16, A540:12,
    # B540:12} with nck=3 chunking on both 540-grid kernels: th=16 helps
    # the 270-zone kernels but exceeds scoped VMEM at 540 even chunked;
    # th=12 at 540 only FITS once nck=3 chunk-sized K-buffers shrink the
    # scoped footprint (un-chunked th=12 OOMs on both 540 kernels), and
    # chunking pays ONLY via the taller tile it unlocks (strictly slower
    # at th=8).
    def _policy_fn(v, default):
        if isinstance(v, int):
            return lambda kind, hc: v
        return lambda kind, hc: v.get(f"{kind}{hc}", v.get(hc, default))

    th_of = _policy_fn(th, 8)
    # chunk count for the software-pipelined kernel variants (planar.py
    # _ck kernels): 0 = production serialized kernels; same dict keying
    # as `th` ("A540"/"B540"/540/... -> nck).
    nck_of = _policy_fn(nck, 0)
    # i8 eligibility is decided per stage inside this builder (cp % 32
    # alignment): with a W8A8 policy, a stage that STAYS bf16 must keep a
    # bf16-safe policy — th_bf16/nck_bf16 (defaulting to th/nck) apply to
    # exactly those stages so an i8-only tile policy can never compile a
    # bf16 kernel into a scoped-VMEM overflow (advisor round 4).
    th_of_bf16 = th_of if th_bf16 is None else _policy_fn(th_bf16, 8)
    nck_of_bf16 = nck_of if nck_bf16 is None else _policy_fn(nck_bf16, 0)
    # split-dot (source-direct unshifted planes) policy; effective only
    # on stages whose nck >= 1 (a global split=1 with a per-stage nck
    # dict simply leaves the non-chunked stages on the production path)
    split_of = ((lambda kind, hc: bool(split)) if isinstance(split, int)
                else (lambda kind, hc: bool(split.get(f"{kind}{hc}",
                                                      split.get(hc, 0)))))

    def _pow2(v):
        w = 128
        while w < v:
            w *= 2
        return w

    # ---- build-time weight preparation --------------------------------- #
    # W8A8: a stage goes int8 when calibration bounds were supplied AND
    # its padded channel counts satisfy the int8 sublane alignment
    # (cp % 32 == 0 — (32, 128) int8 tiling).  cp32 mode (round 5):
    # pad EVERY tail stage's channel planes to a
    # 32-multiple so misaligned stages (the cp=80 270 zone) become
    # i8-eligible too — 1.2x dead rows on those stages against the 2x
    # int8 MXU rate and the zero-convert K-buf chain running tail-wide.
    # opt-in until hardware-timed (BNT_I8_CP32=1): interpret-parity and
    # deviceless Mosaic compile are green, but the 1.2x padded rows on
    # the 270 zone must prove a net win on-chip before becoming default.
    import os as _os_
    i8_cp32 = (w8a8_bounds is not None
               and _os_.environ.get("BNT_I8_CP32", "0") == "1")

    def _cpad(c):
        m = 32 if i8_cp32 else 16
        return (c + m - 1) // m * m

    def _i8_bounds(bi, keys):
        if w8a8_bounds is None:
            return None
        cpo = _cpad(plan[bi].new_ngf)
        cpi = _cpad(plan[bi].ngf)
        aligned = cpo % 32 == 0 and (plan[bi].strd == 1 or cpi % 32 == 0)
        if not aligned:
            return None
        return {k: jnp.asarray(w8a8_bounds[f"{bi}.{k}"], jnp.float32)
                for k in keys}

    preps = []
    for bi in range(switch_at, fine_at):
        blk = p[f"blocks_{bi}"]
        conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
        rsft = blk["ResBlockSFT_0"]
        w0 = rsft["TConv_0"]["Conv_0"]["kernel"]
        b0 = rsft["TConv_0"]["Conv_0"]["bias"]
        w1 = rsft["TConv_1"]["Conv_0"]["kernel"]
        b1 = rsft["TConv_1"]["Conv_0"]["bias"]
        c = plan[bi].new_ngf
        if plan[bi].strd == 2:
            b8 = _i8_bounds(bi, ("x", "t0", "t1"))
            if b8 is not None:
                prep = pk.prepare_upconv_rsft_i8(
                    conv["kernel"], conv["bias"], w0, b0, w1, b1,
                    c_in=plan[bi].ngf, c=c, bounds=b8,
                    cpi=_cpad(plan[bi].ngf), cp=_cpad(c))
            else:
                prep = pk.prepare_upconv_rsft(
                    conv["kernel"], conv["bias"], w0, b0, w1, b1,
                    c_in=plan[bi].ngf, c=c,
                    cpi=_cpad(plan[bi].ngf), cp=_cpad(c))
        else:
            is_last = bi == len(plan) - 1
            head = p["head"]["Conv_0"] if (is_last and head_fused) else None
            b8 = _i8_bounds(bi, ("x", "t0", "t1") + (("h",) if head
                                                     else ()))
            if b8 is not None:
                prep = pk.prepare_conv_rsft_i8(
                    conv["kernel"], conv["bias"], w0, b0, w1, b1, c=c,
                    bounds=b8, cp=_cpad(c),
                    head_k=head["kernel"] if head else None,
                    head_b=head["bias"] if head else None)
            else:
                prep = pk.prepare_conv_rsft(
                    conv["kernel"], conv["bias"], w0, b0, w1, b1, c=c,
                    cp=_cpad(c),
                    head_k=head["kernel"] if head else None,
                    head_b=head["bias"] if head else None)
        preps.append(prep)

    # ---- zero-convert int8 chain ---------------------------------------- #
    # A W8A8 stage whose PRODUCER (the previous tail stage) runs a
    # serialized kernel receives its input as int8 codes: the producer
    # quantises in its output epilogue (out_inv — a store that was
    # happening anyway, at 1/2 the bf16 bytes) and the consumer's K-buf
    # build becomes pure int8 copies + rolls instead of an f32->int8
    # convert+pack pass (the round-4 decomposition priced those converts
    # at ~half the i8 kernel time — tools/r4_i8_build_probe.py).  The
    # producer itself may be bf16 (e.g. the cpi-misaligned A@270 stage):
    # output quantisation needs no int8 weights.
    i8_in_flags = [False] * len(preps)
    out_invs = [None] * len(preps)
    for off, bi in enumerate(range(switch_at, fine_at)):
        if off == 0 or not preps[off].get("i8"):
            continue
        po, pbi = off - 1, bi - 1
        kind_p = "A" if plan[pbi].strd == 2 else "B"
        hc_p = out_hw[pbi][0] // 2
        p_i8 = bool(preps[po].get("i8"))
        nck_p = 0 if p_i8 else nck_of_bf16(kind_p, hc_p)
        if nck_p != 0:
            continue  # chunked producers cannot emit int8
        cp_p = _cpad(plan[pbi].new_ngf)
        out_invs[po] = pk.out_quant_vec(
            jnp.asarray(w8a8_bounds[f"{bi}.x"], jnp.float32), cp_p)
        i8_in_flags[off] = True

    # E-NeRV-Boost prefix: transformer trunk + t_branch + pre-switch
    # blocks (incl. the stage-0 ConvUpBlock) via plain flax — all coarse
    # and tiny relative to the planar tail.  The tail's SFT cond vector
    # is t_manip (model_enerv.py:313: blocks consume the t_branch
    # output, not stem_t).
    if cfg.model == "ENeRV_Boost":
        from ..models import build_model
        _enerv = build_model(cfg)

        def _enerv_prefix(t):
            def run(m, tt):
                x, pe_t = m.trunk(tt)
                t_manip = m.t_branch(pe_t)
                for blk in m.blocks[:switch_at]:
                    x = blk(x, t_manip)
                return x, t_manip
            return _enerv.apply({"params": p}, t, method=run)

    def decode(embed, t):
        if cfg.model == "ENeRV_Boost":
            x, t_embed = _enerv_prefix(t)
        else:
            pe_t = position_encoding(t, pe).astype(DT)
            t_embed = _mlp_sin(p["stem_t"], pe_t, 2)

            if cfg.model == "HNeRV_Boost":
                x = embed.astype(DT)
                stem = p["stem"]
                x = _conv_nhwc(stem["DownConv_0"]["TConv_0"]["Conv_0"], x, 0)
                x = jnp.sin(x)
                x = _rsft_apply_nhwc(stem["ResBlockSFT_0"], x, t_embed)
            else:  # NeRV_Boost: PE -> stem MLP -> [1, fc_h, fc_w, fc_dim]
                x = _mlp_sin(p["stem"], pe_t, 2)
                x = x.reshape(1, cfg.fc_h, cfg.fc_w, cfg.fc_dim)

            for bi in range(switch_at):
                spec = plan[bi]
                blk = p[f"blocks_{bi}"]
                conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
                ks = min(spec.ks, 3)
                x = _conv_nhwc(conv, x, (ks - 1) // 2)
                if spec.strd > 1:
                    x = _d2s_nhwc(x, spec.strd)
                x = jnp.sin(x)
                x = _rsft_apply_nhwc(blk["ResBlockSFT_0"], x, t_embed)

        # interleaved (C, Hc, Wd) input of the first planar stage
        chw = x[0].transpose(2, 0, 1)
        hc, wc = chw.shape[1], chw.shape[2]
        wd = _pow2(wc)
        chw = jnp.pad(chw, ((0, 0), (0, 0), (0, wd - wc)))

        planar = None
        for off, bi in enumerate(range(switch_at, fine_at)):
            spec = plan[bi]
            rsft = p[f"blocks_{bi}"]["ResBlockSFT_0"]
            c = spec.new_ngf
            cp = _cpad(c)
            (s0v, h0v), (s1v, h1v) = _sft_vectors(rsft, t_embed)
            f32 = lambda v: v[0].astype(jnp.float32)
            sft = pk.sft_planar_vectors(f32(s0v), f32(h0v), f32(s1v),
                                        f32(h1v), cp)
            if spec.strd == 2:
                if planar is not None:
                    # interleave the previous planar tensor (XLA)
                    fine = pk.from_planar(planar, spec.ngf)[:, :, :2 * wc]
                    hc, wc = fine.shape[1], fine.shape[2]
                    wd = _pow2(wc)
                    chw = jnp.pad(fine, ((0, 0), (0, 0), (0, wd - wc)))
                # int8 stage kernels are serialized-only: chunking exists
                # to shrink bf16 K-buffers under scoped VMEM, int8 halves
                # them outright (planar.py asserts nck == 0 for i8).
                i8_s = bool(preps[off].get("i8"))
                hc_key = out_hw[bi][0] // 2
                nck_v = 0 if i8_s else nck_of_bf16("A", hc_key)
                planar = pk.fused_upconv_rsft(
                    chw, preps[off], sft, c_in=spec.ngf, c=c, wc_real=wc,
                    th=(th_of if i8_s else th_of_bf16)("A", hc_key),
                    nck=nck_v,
                    split=(not i8_s and split_of("A", hc_key)
                           and nck_v >= 1),
                    i8_in=i8_in_flags[off], out_inv=out_invs[off],
                    cpi=_cpad(spec.ngf), cp=cp,
                    interpret=interpret)
            else:
                is_last_head = head_fused and bi == len(plan) - 1
                i8_s = bool(preps[off].get("i8"))
                hc_key = out_hw[bi][0] // 2
                nck_v = 0 if i8_s else nck_of_bf16("B", hc_key)
                planar = pk.fused_conv_rsft(
                    planar, preps[off], sft, c=c, wc_real=wc,
                    head=is_last_head,
                    th=(th_of if i8_s else th_of_bf16)("B", hc_key),
                    nck=nck_v,
                    split=(not i8_s and split_of("B", hc_key)
                           and nck_v >= 1),
                    i8_in=i8_in_flags[off], out_inv=out_invs[off],
                    interpret=interpret)

        if fine_at < len(plan):
            # hybrid fine-grid tail (v3 dy3 kernels + XLA d2s)
            from ..ops.pallas.tile_conv import (conv_tile_v3,
                                                resblock_sft_tile_v3)
            if planar is not None:
                chwf = pk.from_planar(
                    planar, plan[fine_at - 1].new_ngf)[:, :, :2 * wc]
            else:
                chwf = x[0].transpose(2, 0, 1)
            wreal = chwf.shape[2]
            wdn = -(-wreal // 128) * 128
            if wdn != chwf.shape[2]:
                chwf = jnp.pad(chwf,
                               ((0, 0), (0, 0), (0, wdn - chwf.shape[2])))
            for bi in range(fine_at, len(plan)):
                spec = plan[bi]
                blk = p[f"blocks_{bi}"]
                conv = blk["UpConv_0"]["TConv_0"]["Conv_0"]
                rsft = blk["ResBlockSFT_0"]
                ks = min(spec.ks, 3)
                (s0v, h0v), (s1v, h1v) = _sft_vectors(rsft, t_embed)
                f32 = lambda v: v[0].astype(jnp.float32)
                chwf = conv_tile_v3(chwf, conv["kernel"], conv["bias"],
                                    k=ks, w_real=wreal, act="sin",
                                    mode="dy3", interpret=interpret)
                if spec.strd > 1:
                    chwf = _d2s_chw(chwf, spec.strd)
                    wreal = wreal * spec.strd
                    wdn = -(-wreal // 128) * 128
                    if wdn != chwf.shape[2]:
                        chwf = chwf[:, :, :wdn]
                chwf = resblock_sft_tile_v3(
                    chwf, rsft["TConv_0"]["Conv_0"]["kernel"],
                    rsft["TConv_0"]["Conv_0"]["bias"],
                    rsft["TConv_1"]["Conv_0"]["kernel"],
                    rsft["TConv_1"]["Conv_0"]["bias"],
                    f32(s0v), f32(h0v), f32(s1v), f32(h1v),
                    w_real=wreal, mode="dy3", interpret=interpret)
            head = p["head"]["Conv_0"]
            out = conv_tile_v3(
                chwf, head["kernel"], head["bias"], k=3, w_real=wreal,
                act="outimg", mode="dy3",
                th=head_th if chwf.shape[1] % head_th == 0 else 8,
                interpret=interpret)
            out = out[:, :, :wreal]
            return out.transpose(1, 2, 0)[None].astype(DT)

        if head_fused:
            return pk.rgb_planar_to_nhwc(planar, hc, wc).astype(DT)
        # stride-2-final configs: head on the interleaved fine tensor
        fine = pk.from_planar(planar, plan[-1].new_ngf)[:, :, :2 * wc]
        head = p["head"]["Conv_0"]
        out = _conv_nhwc(head, fine.transpose(1, 2, 0)[None], 1)
        return jnp.tanh(out) * 0.5 + 0.5

    # introspection for bench/tests: which tail stages run W8A8, and
    # which receive their input as int8 codes (zero-convert chain)
    decode.w8a8_stages = [switch_at + off for off, pr in enumerate(preps)
                          if pr.get("i8")]
    decode.w8a8_zc = [switch_at + off for off, f in enumerate(i8_in_flags)
                      if f]
    return decode
