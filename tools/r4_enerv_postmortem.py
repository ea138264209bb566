"""Post-mortem of the flatlined E-NeRV-Boost 720p runs.

Both the round-3 `high` run and the round-4 `highest` rerun flatline at
~15 dB from epoch 2 (output/atscale_enerv_hp), so matmul precision is
NOT the cause.  This probe localizes where the signal dies: it loads
the flatlined checkpoint and a fresh init, taps every trunk/block
boundary at three t values, and prints per-tap (std, cross-t max
diff) plus the output PSNR vs the ground-truth frames.

Collapse signatures:
 - cross-t diff ~0 at t_emb / t_manip  -> the t path is dead (PE or MLP)
 - spatial std ~0 after trans2/toconv  -> the trunk collapsed
 - healthy trunk but flat blocks       -> SFT modulation / decoder issue

CPU-only, run from /root/repo with the chip free of host contention:
  env -u PYTHONPATH JAX_PLATFORMS=cpu python -c \
      "exec(open('tools/r4_enerv_postmortem.py').read())"
"""

import numpy as np
import jax
import jax.numpy as jnp

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.training.checkpoint import load_checkpoint, tree_restore

CKPT = "output/atscale_enerv_hp/synth720/Size1.25/model_latest.ckpt"

cfg = BoostConfig(
    data_path="data/synth720", vid="synth720", crop_list="720_1280",
    model="ENeRV_Boost", embed="pe_1.25_80", ks="0_3_3",
    modelsize=1.25, fc_hw="9_16", reduce=2.0, lower_width=12,
    dec_strds=[5, 2, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    conv_type=["convnext", "pshuffel_3x3"], norm="none", act="sin",
    sft_block="res_sft", ch_t=32, block_dim=128, out_bias="tanh",
    enc_strds=[], enc_dim="64_16", loss="Fusion10_freq",
    optim_type="Adan", lr=0.0015, epochs=60, not_resume=True,
    train_precision="highest", outf="output/_postmortem")

tr = RegressionTrainer(cfg)
model, video = tr.model, tr.video
print(f"fc_dim {tr.cfg.fc_dim} params "
      f"{sum(x.size for x in jax.tree_util.tree_leaves(tr.params))/1e6:.3f}M",
      flush=True)

saved = load_checkpoint(CKPT)
params_tr = tree_restore(tr.params, saved["params"])
print(f"loaded ckpt epoch {saved.get('epoch')}", flush=True)


def taps(params, t):
    """Forward with boundary taps (mirrors ENeRVBoost.__call__)."""
    def run(m, tt):
        out = {}
        x, pe_t = m.trunk(tt)
        out["trunk_emb"] = x
        out["pe_t"] = pe_t
        t_manip = m.t_branch(pe_t)
        out["t_manip"] = t_manip
        for i, blk in enumerate(m.blocks):
            x = blk(x, t_manip)
            out[f"block{i}"] = x
        from boosting_nerv_tpu.ops.losses import out_img
        out["img"] = out_img(m.head(x), m.cfg.out_bias)
        return out
    return model.apply(params, jnp.asarray([t], jnp.float32), method=run)


def trunk_taps(params, t):
    """Inside the trunk: stem_t / xy after trans1 / fused / after trans2."""
    def run(m, tt):
        tk = m.trunk
        out = {}
        pe_t = __import__("boosting_nerv_tpu.ops.pe", fromlist=["x"]) \
            .position_encoding(tt, tk.pe)
        t_emb = tk.stem_t(pe_t)
        out["t_emb"] = t_emb
        fc_h, fc_w = m.cfg.fc_h, m.cfg.fc_w
        xs = (np.arange(fc_h) / fc_h).astype(np.float32)
        ys = (np.arange(fc_w) / fc_w).astype(np.float32)
        gx, gy = jnp.meshgrid(jnp.asarray(xs), jnp.asarray(ys),
                              indexing="ij")
        from boosting_nerv_tpu.ops.pe import position_encoding
        x_pe = position_encoding(gx.reshape(-1), tk.pe)
        y_pe = position_encoding(gy.reshape(-1), tk.pe)
        xy = jnp.concatenate([x_pe, y_pe], axis=-1)
        xy = tk.stem_xy(xy)[None]
        out["stem_xy"] = xy
        xy = tk.trans1(xy)
        out["trans1"] = xy
        emb = xy * t_emb[:, None, :]
        out["fused"] = emb
        emb = tk.trans2(emb)
        out["trans2"] = emb
        if tk.to_conv is not None:
            out["toconv"] = tk.to_conv(
                emb.reshape(1, fc_h, fc_w, -1))
        return out
    return model.apply(params, jnp.asarray([t], jnp.float32), method=run)


n = video.n
T_VALS = [(10 + 1) / n, (n // 2 + 1) / n, (n - 10 + 1) / n]
IDX = [10, n // 2, n - 10]

for name, params in (("TRAINED(flatlined)", params_tr),
                     ("FRESH-INIT", tr.params)):
    print(f"\n===== {name} =====", flush=True)
    outs = [taps(params, t) for t in T_VALS]
    trk = [trunk_taps(params, t) for t in T_VALS]
    keys = list(trk[0].keys()) + list(outs[0].keys())
    both = [dict(**a, **b) for a, b in zip(trk, outs)]
    for k in keys:
        a = np.asarray(both[0][k], np.float32)
        b = np.asarray(both[1][k], np.float32)
        c = np.asarray(both[2][k], np.float32)
        tdiff = max(np.abs(a - b).max(), np.abs(b - c).max())
        spat = a.std(axis=tuple(range(a.ndim - 1))).mean() if a.ndim > 2 \
            else a.std()
        print(f"  {k:12s} shape {str(a.shape):22s} std {a.std():9.4f} "
              f"spatial_std {spat:9.4f} cross_t_maxdiff {tdiff:9.5f}",
              flush=True)
    # PSNR vs GT
    for i, (ti, out) in enumerate(zip(IDX, outs)):
        gt = video.frames[ti].astype(np.float32) / 255.0
        mse = float(((np.asarray(out["img"])[0] - gt) ** 2).mean())
        print(f"  frame {ti:3d} PSNR {-10*np.log10(mse):6.2f} dB", flush=True)
