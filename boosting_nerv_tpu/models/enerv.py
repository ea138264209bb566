"""E-NeRV / E-NeRV-Boost: MLP-split trunk (separate t- and xy-branches fused
through a tiny spatial transformer) ahead of the conditional conv decoder.

Structure parity with /root/reference/model_enerv.py:
 - Attention / FeedForward / TransformerBlock (post-norm-free residuals,
   model_enerv.py:32-71)
 - trunk: PE(xy) -> stem_xy -> trans1(1 head) -> * broadcast t-emb ->
   trans2(8 heads) -> [B, fc_h, fc_w, block_dim] -> toconv (forward at
   model_enerv.py:279-317)
 - ENeRV_Boost (expansion=3): stage-0 Conv_Up_Block then NeRVBlocks, all
   modulated by the shared TAT t_manipulate vector.

The 144-token (9x16) attention is tiny; it runs as two MXU matmuls per
block — no sequence-axis sharding is warranted (SURVEY.md §2.3).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import BoostConfig, decoder_stage_plan, model_expansion
from ..ops.activations import get_activation
from ..ops.losses import out_img
from ..ops.pe import PEConfig, position_encoding
from .blocks import MLP, ConvUpBlock, NeRVBlock, TConv, TDense


class Attention(nn.Module):
    dim: int
    heads: int = 8
    dim_head: int = 64

    @nn.compact
    def __call__(self, x):
        inner = self.heads * self.dim_head
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        b, n, _ = x.shape
        qkv = TDense(inner * 3, use_bias=False)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)
        q, k, v = split(q), split(k), split(v)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * (self.dim_head ** -0.5)
        attn = nn.softmax(dots, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", attn, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if project_out:
            o = TDense(self.dim)(o)
        return o


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        x = TDense(self.hidden_dim)(x)
        x = get_activation("gelu")(x)
        return TDense(self.dim)(x)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dim_head: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        x = Attention(self.dim, self.heads, self.dim_head)(x) + x
        x = FeedForward(self.dim, self.mlp_dim)(x) + x
        return x


class _ENeRVTrunk(nn.Module):
    """Shared E-NeRV trunk: t-branch + xy-branch fused through the two
    transformer blocks (model_enerv.py:175-199)."""
    cfg: BoostConfig

    def setup(self):
        cfg = self.cfg
        self.pe = PEConfig.from_string(cfg.embed, cfg.lfreq)
        block_dim = cfg.block_dim
        self.stem_t = MLP(dims=(block_dim * 2, block_dim), act=cfg.act)
        self.stem_xy = MLP(dims=(block_dim,), act=cfg.act)
        self.trans1 = TransformerBlock(dim=block_dim, heads=1, dim_head=64,
                                       mlp_dim=block_dim // 2)
        self.trans2 = TransformerBlock(dim=block_dim, heads=8, dim_head=64,
                                       mlp_dim=block_dim // 2)
        self.to_conv = (None if block_dim == cfg.fc_dim
                        else MLP(dims=(cfg.fc_dim,), act=cfg.act))

    def __call__(self, t):
        cfg = self.cfg
        b = t.shape[0]
        fc_h, fc_w = cfg.fc_h, cfg.fc_w
        pe_t = position_encoding(t, self.pe)
        t_emb = self.stem_t(pe_t)
        xs = (np.arange(fc_h) / fc_h).astype(np.float32)
        ys = (np.arange(fc_w) / fc_w).astype(np.float32)
        gx, gy = jnp.meshgrid(jnp.asarray(xs), jnp.asarray(ys), indexing="ij")
        x_pe = position_encoding(gx.reshape(-1), self.pe)
        y_pe = position_encoding(gy.reshape(-1), self.pe)
        xy = jnp.concatenate([x_pe, y_pe], axis=-1)
        xy = self.stem_xy(xy)[None].repeat(b, axis=0)
        xy = self.trans1(xy)
        emb = xy * t_emb[:, None, :]
        emb = self.trans2(emb)
        emb = emb.reshape(b, fc_h, fc_w, -1)
        if self.to_conv is not None:
            emb = self.to_conv(emb)
        return emb, pe_t


class ENeRV(nn.Module):
    """Baseline E-NeRV (no TAT): per-stage InstanceNorm + FiLM modulation
    from a 128-wide t-branch (model_enerv.py:104-218, fuse_t at :163-173)."""
    cfg: BoostConfig

    def setup(self):
        cfg = self.cfg
        self.trunk = _ENeRVTrunk(cfg)
        self.t_branch = MLP(dims=(128, 128), act=cfg.act)
        plan = decoder_stage_plan(cfg, cfg.fc_dim, expansion=3)
        blocks, t_layers = [], []
        idx = 0
        for i, _ in enumerate(cfg.dec_strds):
            for j in range(cfg.dec_blks[i]):
                s = plan[idx]
                t_layers.append(MLP(dims=(2 * s.ngf,), act=cfg.act))
                if i == 0:
                    blocks.append(ConvUpBlock(
                        conv_type=cfg.conv_type[1], ngf=s.ngf,
                        new_ngf=s.new_ngf, ks=s.ks, strd=s.strd,
                        norm=cfg.norm, act=cfg.act, sft=False))
                else:
                    blocks.append(NeRVBlock(
                        dec_block=True, conv_type=cfg.conv_type[1],
                        new_ngf=s.new_ngf, ks=s.ks, strd=s.strd,
                        norm=cfg.norm, act=cfg.act, sft=False,
                        has_encoder=True))
                idx += 1
        self.blocks = blocks
        self.t_layers = t_layers
        self.head = TConv(3, 1, 1, 0)

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x, pe_t = self.trunk(t)
        t_manip = self.t_branch(pe_t)          # [B, 128]
        for blk, t_layer in zip(self.blocks, self.t_layers):
            # InstanceNorm (no affine) then FiLM from the t feature
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            x = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            tf = t_layer(t_manip)
            c = tf.shape[-1] // 2
            gamma, beta = tf[:, :c], tf[:, c:]
            x = x * gamma[:, None, None, :] + beta[:, None, None, :]
            x = blk(x)
        return out_img(self.head(x), cfg.out_bias)


class ENeRVBoost(nn.Module):
    cfg: BoostConfig

    def setup(self):
        cfg = self.cfg
        self.trunk = _ENeRVTrunk(cfg)
        self.t_branch = MLP(dims=(cfg.ch_t * 2, cfg.ch_t), act=cfg.act)
        plan = decoder_stage_plan(cfg, cfg.fc_dim,
                                  expansion=model_expansion("ENeRV_Boost"))
        use_sft = cfg.sft_block == "res_sft" and cfg.ch_t != 0
        blocks = []
        idx = 0
        for i, _ in enumerate(cfg.dec_strds):
            for j in range(cfg.dec_blks[i]):
                s = plan[idx]
                if i == 0:
                    blocks.append(ConvUpBlock(
                        conv_type=cfg.conv_type[1], ngf=s.ngf,
                        new_ngf=s.new_ngf, ks=s.ks, strd=s.strd,
                        norm=cfg.norm, act=cfg.act, sft=use_sft))
                else:
                    blocks.append(NeRVBlock(
                        dec_block=True, conv_type=cfg.conv_type[1],
                        new_ngf=s.new_ngf, ks=s.ks, strd=s.strd,
                        norm=cfg.norm, act=cfg.act, sft=use_sft,
                        has_encoder=True))
                idx += 1
        self.blocks = blocks
        self.head = TConv(3, 1, 1, 0)

    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x, pe_t = self.trunk(t)
        t_manip = self.t_branch(pe_t)                   # [B, ch_t]
        for blk in self.blocks:
            x = blk(x, t_manip)
        return out_img(self.head(x), cfg.out_bias)
