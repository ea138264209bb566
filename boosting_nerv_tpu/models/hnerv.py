"""HNeRV / HNeRV-Boost: content-adaptive INR with a ConvNeXt encoder
producing a tiny per-frame embedding, plus (Boost) the TAT time branch.

Structure parity with /root/reference/model_hnerv.py:
 - HNeRV (:11-158): encoder (ConvNeXt or strided NeRV blocks, or a pure PE
   when `enc_strds` is empty) -> 1x1-conv stem -> fc_h/fc_w pixel-block
   rearrange (:87-88) -> plain NeRVBlock decoder -> 3x3 head.
 - HNeRV_Boost (:178-322): ConvNeXt encoder -> [B, h, w, embed_dim]
   embedding; decoder stem 1x1 conv + TAT; every decoder stage is a
   sinusoidal NeRVBlock modulated by stem_t(PE(t)).
 - The split API forward_encoder / forward_decoder (:254-277) maps to
   `encode` / `decode` methods here; the embedding-quantisation hook between
   them is applied *functionally* by the compression trainer (quantisers own
   their state in a separate pytree — no module mutation).

Decode-FPS accounting note: the reference clock starts after the embedding
is available (model_hnerv.py:240), so benchmark `decode`, not `__call__`.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..config import BoostConfig, decoder_stage_plan
from ..ops.losses import out_img
from ..ops.pe import PEConfig, position_encoding
from .blocks import (MLP, ConvNeXtEncoder, NeRVBlock, TConv)


def _encoder_dims(cfg: BoostConfig) -> Sequence[int]:
    dims = [cfg.enc_dim1] * len(cfg.enc_strds)
    dims[-1] = cfg.enc_dim2
    return dims


class HNeRVBoost(nn.Module):
    cfg: BoostConfig

    def setup(self):
        cfg = self.cfg
        self.pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
        self.encoder = ConvNeXtEncoder(stage_blocks=cfg.enc_blks,
                                       strds=cfg.enc_strds,
                                       dims=_encoder_dims(cfg))
        self.stem_t = MLP(dims=(cfg.ch_t * 2, cfg.ch_t), act=cfg.act)
        use_sft = cfg.sft_block == "res_sft" and cfg.ch_t != 0
        # decoder stem: 1x1 conv embed_dim -> fc_dim (+ TAT)
        self.stem = NeRVBlock(dec_block=False, conv_type="conv",
                              new_ngf=cfg.fc_dim, ks=0, strd=1, norm=cfg.norm,
                              act=cfg.act, sft=use_sft, has_encoder=True)
        plan = decoder_stage_plan(cfg, cfg.fc_dim, hnerv_style=True)
        self.blocks = [
            NeRVBlock(dec_block=True, conv_type=cfg.conv_type[1],
                      new_ngf=s.new_ngf, ks=s.ks, strd=s.strd, norm=cfg.norm,
                      act=cfg.act, sft=use_sft, has_encoder=True)
            for s in plan]
        self.head = TConv(3, 3, 1, 1)

    def encode(self, img: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] frame -> [B, h, w, embed_dim] content embedding."""
        return self.encoder(img)

    def decode(self, embed: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        """Embedding + normalised index -> [B, H, W, 3] frame. This is the
        hot decode path (reference fps clock, model_hnerv.py:240-250)."""
        t_embed = self.stem_t(position_encoding(t, self.pe))
        x = self.stem(embed, t_embed)
        for blk in self.blocks:
            x = blk(x, t_embed)
        return out_img(self.head(x), self.cfg.out_bias)

    def __call__(self, img: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(img), t)


def decoder_only_params(params):
    """Strip the encoder subtree — the deployable decode-only artifact (the
    reference's standalone `HNeRVDecoder`, model_hnerv.py:160-175). The
    result applies directly with `method="decode"` since that path never
    touches encoder parameters."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    flat = flatten_dict(params)
    kept = {k: v for k, v in flat.items()
            if not any("encoder" in str(p) for p in k)}
    return unflatten_dict(kept)


class HNeRV(nn.Module):
    """Baseline HNeRV (no TAT). Also covers the encoder-less PE variant."""
    cfg: BoostConfig

    def setup(self):
        cfg = self.cfg
        ks_enc, _, _ = cfg.ks_triple
        if len(cfg.enc_strds):
            if cfg.conv_type[0] == "convnext":
                self.encoder = ConvNeXtEncoder(stage_blocks=cfg.enc_blks,
                                               strds=cfg.enc_strds,
                                               dims=_encoder_dims(cfg))
            else:
                self.encoder = [
                    NeRVBlock(dec_block=False, conv_type=cfg.conv_type[0],
                              new_ngf=d, ks=ks_enc, strd=s, norm=cfg.norm,
                              act=cfg.act, sft=False)
                    for d, s in zip(_encoder_dims(cfg), cfg.enc_strds)]
            import numpy as np
            hw = int(np.prod(cfg.enc_strds) // np.prod(cfg.dec_strds))
            self.fc_h = self.fc_w = hw
            self.pe = None
        else:
            self.pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
            self.fc_h, self.fc_w = cfg.fc_h, cfg.fc_w
            self.encoder = None

        fc_dim = cfg.fc_dim
        out_f = int(fc_dim * self.fc_h * self.fc_w)
        self.stem = NeRVBlock(dec_block=False, conv_type="conv",
                              new_ngf=out_f, ks=0, strd=1, norm=cfg.norm,
                              act=cfg.act, sft=False)
        plan = decoder_stage_plan(cfg, fc_dim, hnerv_style=True)
        self.blocks = [
            NeRVBlock(dec_block=True, conv_type=cfg.conv_type[1],
                      new_ngf=s.new_ngf, ks=s.ks, strd=s.strd, norm=cfg.norm,
                      act=cfg.act, sft=False)
            for s in plan]
        self.head = TConv(3, 3, 1, 1)

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Frame [B,H,W,3] -> embedding; or norm_idx [B] -> PE embedding
        reshaped to [B,1,1,2L] when running encoder-less."""
        if self.encoder is None:
            pe = position_encoding(x, self.pe)
            return pe[:, None, None, :]
        if isinstance(self.encoder, list):
            for blk in self.encoder:
                x = blk(x)
            return x
        return self.encoder(x)

    def decode(self, embed: jnp.ndarray) -> jnp.ndarray:
        x = self.stem(embed)
        # fc pixel-block rearrange (model_hnerv.py:87-88)
        b, h, w, c = x.shape
        fh, fw = self.fc_h, self.fc_w
        if fh * fw > 1:
            x = x.reshape(b, h, w, c // (fh * fw), fh, fw)
            x = x.transpose(0, 1, 4, 2, 5, 3)
            x = x.reshape(b, h * fh, w * fw, c // (fh * fw))
        for blk in self.blocks:
            x = blk(x)
        return out_img(self.head(x), self.cfg.out_bias)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))
