"""Typed configuration for the Boost-NeRV model families and trainers.

One dataclass carries the same knob set as the reference's argparse surface
(/root/reference/train_nerv_all.py:27-112 and
train_nerv_compression.py:30-159), including the composite string-encoded
flags (``--embed pe_1.25_80``, ``--ks 0_1_5``, ``--fc_hw 9_16``,
``--enc_dim 64_16``, ``--data_split 1_1_2``, ``--crop_list 720_1280``).

`solve_fc_dim` reproduces the reference's auto model-sizing solver
(train_nerv_all.py:193-217): given a parameter budget ``modelsize`` (M), it
solves the quadratic ``a*fc_dim^2 + b*fc_dim + (c - decoder_size) = 0`` for
the base channel width, after reserving the per-frame embedding budget for
HNeRV-family models (and halving it for interpolation runs,
train_nerv_all.py:204-205).

`decoder_stage_plan` centralises the per-stage channel/kernel schedule so all
model families share the exact reference arithmetic (floor-div by ``reduce``
for NeRV/ENeRV at model_nerv.py:26-39, round-div for HNeRV-family at
model_hnerv.py:49-56 / 204-211).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class BoostConfig:
    # dataset
    data_path: str = ""
    vid: str = "video"
    shuffle_data: bool = False
    data_split: str = "1_1_1"
    crop_list: str = "640_1280"
    resize_list: str = "-1"

    # architecture
    model: str = "HNeRV_Boost"  # NeRV_Boost | ENeRV_Boost | HNeRV_Boost | HNeRV
    embed: str = "pe_1.25_80"
    ks: str = "0_1_5"
    enc_blks: int = 1
    enc_strds: List[int] = field(default_factory=list)
    enc_dim: str = "64_16"
    modelsize: float = 1.5
    saturate_stages: int = -1

    lfreq: str = "pi"
    fc_dim: Optional[int] = None
    fc_hw: str = "9_16"
    reduce: float = 1.2
    lower_width: int = 32
    dec_strds: List[int] = field(default_factory=lambda: [5, 3, 2, 2, 2])
    dec_blks: List[int] = field(default_factory=lambda: [1, 1, 1, 1, 1])
    conv_type: List[str] = field(default_factory=lambda: ["convnext", "pshuffel"])
    norm: str = "none"
    act: str = "gelu"
    sft_block: str = "none"  # "res_sft" enables the TAT conditional decoder
    ch_t: int = 32
    block_dim: int = 128
    out_bias: str = "tanh"

    # training
    workers: int = 2
    batchSize: int = 1
    start_epoch: int = -1
    not_resume: bool = False
    epochs: int = 5
    lr: float = 0.001
    lr_type: str = "cosine_0.1_1_0.1"
    loss: str = "Fusion6"
    optim_type: str = "Adan"
    # None = unset (reference CLI default 0.0 = clipping disabled;
    # train_nerv_all.py:79).  The ENeRV family substitutes 1.0 when unset
    # (measured necessity, BASELINE.md round 4) — an EXPLICIT 0.0 disables
    # clipping even there, so the unclipped reference dynamics stay
    # reproducible.
    clip_max_norm: Optional[float] = None
    inpanting: str = "none"
    interpolation: bool = False
    embed_inter: bool = False

    # quantization / compression
    quant: bool = False
    quant_model_bit: int = 8
    quant_bias_bit: int = 8
    quant_embed_bit: int = 6
    # dead flag, matched for CLI parity: the reference parses --quant_axis
    # (train_nerv_all.py:92) but never consumes it — its PTQ path
    # (hnerv_utils.py:101-134) does its own per-axis search, and the only
    # would-be consumer quantize_per_tensor (hnerv_utils.py:136-181) is
    # never called
    quant_axis: int = 0
    per_channel_w: bool = False
    per_channel_b: bool = False
    per_channel_e: bool = False
    quantizer_w: str = "lsq"
    quantizer_b: str = "lsq"
    quantizer_e: str = "lsqv2"
    embed_entropy: bool = False
    target_bit: float = 5.0
    lambda_rate: float = 0.2

    # evaluation
    eval_only: bool = False
    eval_freq: int = 10
    dump_images: bool = False
    dump_videos: bool = False
    eval_fps: bool = False

    # misc
    manualSeed: int = 1
    debug: bool = False
    print_freq: int = 50
    weight: str = "None"
    overwrite: bool = False
    outf: str = "unify"
    suffix: str = ""

    # compute / parallelism (TPU-specific knobs; no reference analog)
    dp: int = 1          # data-parallel mesh size (frames axis)
    sp: int = 1          # spatial mesh size (H axis of decoder features)
    decode_dtype: str = "float32"  # "bfloat16" for the fast decode path
    profile: bool = False  # capture a jax.profiler trace of early steps
    # fp32 matmuls during training: with the TPU default (1-pass bf16) the
    # FFT-loss gradients diverge (measured: PSNR 10.4 -> 8.3 over 10 epochs
    # vs 11.6 -> 18.6 at "highest"); the torch reference trains fp32.
    # "high" (3-pass bf16) measured convergence-identical and is the
    # recommended speed knob at >=720p.
    train_precision: str = "highest"
    # gradient accumulation: split the frame batch into micro-batches of
    # this size inside the jitted step (lax.scan), averaging gradients —
    # b>=2 semantics at b=micro activation memory. 0 = off. The XLA
    # lane-padding of narrow-channel NHWC temps makes full b>=2 batches
    # OOM at 720p+ on one chip (CLAUDE.md); this is the memory-safe path.
    micro_batch: int = 0
    # rematerialize the forward in the backward pass (jax.checkpoint):
    # trades ~30% step time for activation memory, enabling 1080p training
    # and larger frame batches on a single chip
    remat: bool = False
    # subpixel-planar training forward (training/planar_forward.py):
    # decoder stages whose FINE output height reaches this threshold run
    # in planar layout ([B,H,W,4C] on the coarse grid), shrinking the
    # XLA lane-padding of narrow-channel activations (35 -> 128 lanes,
    # 3.66x) to 1.3-1.8x and quartering the padded spatial area — the
    # measured cause of the b>=2 OOM at 720p+. 0 = off. Numerically
    # equivalent to the standard forward (tests/test_planar_forward.py);
    # falls back silently for ineligible model/config combinations.
    planar_train: int = 0

    # ---- derived helpers -------------------------------------------------
    @property
    def fc_h(self) -> int:
        return int(self.fc_hw.split("_")[0])

    @property
    def fc_w(self) -> int:
        return int(self.fc_hw.split("_")[1])

    @property
    def crop_h(self) -> int:
        return int(self.crop_list.split("_")[0])

    @property
    def crop_w(self) -> int:
        return int(self.crop_list.split("_")[1])

    @property
    def ks_triple(self) -> Tuple[int, int, int]:
        a, b, c = [int(x) for x in self.ks.split("_")]
        return a, b, c

    @property
    def enc_dim1(self) -> int:
        return int(float(self.enc_dim.split("_")[0]))

    @property
    def enc_dim2(self) -> int:
        """Embedding channel count (only valid after `resolve_sizes`)."""
        return int(float(self.enc_dim.split("_")[1]))

    @property
    def is_hnerv_family(self) -> bool:
        return "HNeRV" in self.model

    @property
    def uses_frame_input(self) -> bool:
        """True when the model consumes frames (encoder path), matching the
        reference's cur_input selection (train_nerv_all.py:337-340)."""
        return "pe" not in self.embed or "HNeRV_Boost" in self.model

    def replace(self, **kw) -> "BoostConfig":
        return dataclasses.replace(self, **kw)


@dataclass(frozen=True)
class StageSpec:
    """One decoder conv block: ngf -> new_ngf, kernel ks, upsample strd."""
    ngf: int
    new_ngf: int
    ks: int
    strd: int


def decoder_stage_plan(cfg: BoostConfig, fc_dim: int, expansion: float = 1.0,
                       hnerv_style: bool = False) -> List[StageSpec]:
    """Per-block channel schedule for the upsampling decoder stack.

    NeRV/ENeRV style (model_nerv.py:26-39): stage 0 widens by `expansion`,
    later stages floor-divide by `reduce` (stride-1 stages keep width).
    HNeRV style (model_hnerv.py:49-56): every stage round-divides by
    `reduce` (or sqrt(strd) when reduce == -1).
    """
    _, ks1, ks2 = cfg.ks_triple
    plan: List[StageSpec] = []
    ngf = fc_dim
    for i, strd in enumerate(cfg.dec_strds):
        if hnerv_style:
            reduction = math.sqrt(strd) if cfg.reduce == -1 else cfg.reduce
            new_ngf = int(max(round(ngf / reduction), cfg.lower_width))
        else:
            if i == 0:
                new_ngf = int(ngf * expansion)
            else:
                new_ngf = int(max(ngf // (1 if strd == 1 else cfg.reduce),
                                  cfg.lower_width))
        for j in range(cfg.dec_blks[i]):
            plan.append(StageSpec(ngf=ngf, new_ngf=new_ngf,
                                  ks=min(ks1 + 2 * i, ks2),
                                  strd=1 if j else strd))
            ngf = new_ngf
    return plan


def resolve_sizes(cfg: BoostConfig, final_size: int, full_data_length: int
                  ) -> BoostConfig:
    """Reproduce the reference sizing pass (train_nerv_all.py:193-217):
    derive the HNeRV embedding dim, the embedding parameter budget, and
    solve for fc_dim if unset. Returns an updated config; also records
    `embed_param` / `embed_dim` / `fc_param` as attributes used for bpp math.
    """
    if ("pe" in cfg.embed or "le" in cfg.embed) and "HNeRV_Boost" not in cfg.model:
        embed_param = 0.0
        embed_dim = int(cfg.embed.split("_")[-1]) * 2
        fc_param = float(np.prod([int(x) for x in cfg.fc_hw.split("_")]))
        new_enc_dim = cfg.enc_dim
    else:
        total_enc_strds = float(np.prod(cfg.enc_strds))
        embed_hw = final_size / total_enc_strds ** 2
        enc_dim1, embed_ratio = [float(x) for x in cfg.enc_dim.split("_")]
        embed_dim = (int(embed_ratio * cfg.modelsize * 1e6 / full_data_length / embed_hw)
                     if embed_ratio < 1 else int(embed_ratio))
        embed_param = float(embed_dim) / total_enc_strds ** 2 * final_size * full_data_length
        if cfg.interpolation:
            embed_param = embed_param / 2
        new_enc_dim = f"{int(enc_dim1)}_{embed_dim}"
        fc_param = (np.prod(cfg.enc_strds) // np.prod(cfg.dec_strds)) ** 2 * 9

    decoder_size = cfg.modelsize * 1e6 - embed_param
    ch_reduce = 1.0 / cfg.reduce
    dec_ks1, dec_ks2 = [int(x) for x in cfg.ks.split("_")[1:]]
    n_stages = len(cfg.dec_strds)
    fix_ch_stages = n_stages if cfg.saturate_stages == -1 else cfg.saturate_stages
    a = ch_reduce * sum(
        ch_reduce ** (2 * i) * s ** 2 * min((2 * i + dec_ks1), dec_ks2) ** 2
        for i, s in enumerate(cfg.dec_strds[:fix_ch_stages]))
    b = embed_dim * fc_param
    c = cfg.lower_width ** 2 * sum(
        s ** 2 * min(2 * (fix_ch_stages + i) + dec_ks1, dec_ks2) ** 2
        for i, s in enumerate(cfg.dec_strds[fix_ch_stages:]))
    fc_dim = cfg.fc_dim
    if fc_dim is None:
        fc_dim = int(np.roots([a, b, c - decoder_size]).max())

    out = cfg.replace(fc_dim=fc_dim, enc_dim=new_enc_dim)
    out.embed_param = embed_param          # type: ignore[attr-defined]
    out.embed_dim = embed_dim              # type: ignore[attr-defined]
    out.fc_param = fc_param                # type: ignore[attr-defined]
    out.final_size = final_size            # type: ignore[attr-defined]
    out.full_data_length = full_data_length  # type: ignore[attr-defined]
    return out


def model_expansion(model: str) -> float:
    """Channel expansion of decoder stage 0 (train_nerv_all.py:220-227)."""
    return {"NeRV_Boost": 1, "ENeRV_Boost": 3}.get(model, 1)
