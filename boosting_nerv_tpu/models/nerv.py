"""NeRV-Boost: index-only INR with the TAT conditional decoder.

Structure parity with /root/reference/model_nerv.py:11-61:
 PE(t) -> stem MLP [2L, 256, fc_h*fc_w*fc_dim] -> [B, fc_h, fc_w, fc_dim]
 PE(t) -> stem_t MLP [2L, 2*ch_t, ch_t] -> t_embed
 -> NeRVBlock stack (stage-0 expansion, floor-div channel schedule)
 -> 1x1 head conv -> OutImg.

The whole forward is a single jittable function of (params, t): on TPU the
per-stage conv -> depth_to_space -> sin -> TAT chain compiles to fused MXU
convolutions with elementwise epilogues.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import BoostConfig, decoder_stage_plan, model_expansion
from ..ops.losses import out_img
from ..ops.pe import PEConfig, position_encoding
from .blocks import MLP, NeRVBlock, TConv


class NeRVBoost(nn.Module):
    cfg: BoostConfig

    def setup(self):
        cfg = self.cfg
        self.pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
        fc_h, fc_w, fc_dim = cfg.fc_h, cfg.fc_w, cfg.fc_dim
        self.stem = MLP(dims=(256, fc_h * fc_w * fc_dim), act=cfg.act)
        self.stem_t = MLP(dims=(cfg.ch_t * 2, cfg.ch_t), act=cfg.act)
        plan = decoder_stage_plan(cfg, fc_dim,
                                  expansion=model_expansion("NeRV_Boost"))
        use_sft = cfg.sft_block == "res_sft" and cfg.ch_t != 0
        self.blocks = [
            NeRVBlock(dec_block=True, conv_type=cfg.conv_type[1],
                      new_ngf=s.new_ngf, ks=s.ks, strd=s.strd, norm=cfg.norm,
                      act=cfg.act, sft=use_sft, has_encoder=True)
            for s in plan]
        self.head = TConv(3, 1, 1, 0)
        self._plan = plan

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        """t: [B] normalised frame indices in (0, 1] -> [B, H, W, 3]."""
        cfg = self.cfg
        pe = position_encoding(t, self.pe)               # [B, 2L]
        x = self.stem(pe)                                # [B, fc_h*fc_w*fc_dim]
        x = x.reshape(x.shape[0], cfg.fc_h, cfg.fc_w, cfg.fc_dim)
        t_embed = self.stem_t(pe)                        # [B, ch_t]
        for blk in self.blocks:
            x = blk(x, t_embed)
        return out_img(self.head(x), cfg.out_bias)
