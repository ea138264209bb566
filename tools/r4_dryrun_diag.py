"""Diagnose the dryrun grad drift: which leaves, and which comparison leg.

Run:  env -u PYTHONPATH JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -c "exec(open('tools/r4_dryrun_diag.py').read())"
"""
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import optax
import tempfile

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger
from boosting_nerv_tpu.ops.metrics import psnr_per_frame as _ppf
from boosting_nerv_tpu.ops.losses import loss_fn as _lf

dp, sp, b = 4, 2, 4
frames = synthetic_video(b, 160, 160)
tmp = tempfile.mkdtemp(prefix="diag_")
cfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_80",
    enc_strds=[5, 2, 2, 2, 2], enc_dim="64_16",
    dec_strds=[5, 2, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    ks="0_1_5", reduce=1.2, lower_width=12, modelsize=1.275,
    conv_type=["convnext", "pshuffel_3x3"], act="sin",
    norm="none", sft_block="res_sft", ch_t=32,
    crop_list="160_160", loss="L2",
    epochs=1, batchSize=b, lr=1e-3, outf=tmp, not_resume=True,
    dp=dp, sp=sp,
)
cfg = resolve_sizes(cfg, final_size=720 * 1280, full_data_length=132)
trainer = RegressionTrainer(cfg, video=VideoData(frames),
                            logger=RunLogger(tmp, enable_tb=False))
batch = trainer.video.get_batch(list(range(b)))
img_sh = trainer.mesh.shard_batch(jnp.asarray(batch["img"]), spatial_axis=1)
t_sh = trainer.mesh.shard_batch(jnp.asarray(batch["norm_idx"]))


def lossf(p, img, t):
    out = trainer._forward(p, img, t)
    return _lf(out, img, cfg.loss), _ppf(out, img)


def step_full(params, opt_state, img, t, lr):
    (l, psnr), grads = jax.value_and_grad(lossf, has_aux=True)(params, img, t)
    updates, opt_state = trainer.opt.update(grads, opt_state, params, lr=lr)
    params = optax.apply_updates(params, updates)
    return params, opt_state, l, psnr, grads


_, _, l_a, _, g_a = jax.jit(step_full)(
    trainer.params, trainer.opt_state, img_sh, t_sh, jnp.float32(1e-3))
g_a = jax.device_get(g_a)
print("A: sharded step_full loss", float(l_a), flush=True)

(l_b, _), g_b = jax.jit(jax.value_and_grad(lossf, has_aux=True))(
    trainer.params, img_sh, t_sh)
g_b = jax.device_get(g_b)
print("B: sharded plain v&g loss", float(l_b), flush=True)

params_1 = jax.device_get(trainer.params)
(l_c, _), g_c = jax.jit(jax.value_and_grad(lossf, has_aux=True))(
    params_1, jnp.asarray(batch["img"]), jnp.asarray(batch["norm_idx"]))
g_c = jax.device_get(g_c)
print("C: unsharded plain v&g loss", float(l_c), flush=True)


def drift_report(ga, gb, tag):
    from flax.traverse_util import flatten_dict
    fa, fb = flatten_dict(ga), flatten_dict(gb)
    rows = []
    for k in fa:
        a = np.asarray(fa[k], np.float64)
        bb = np.asarray(fb[k], np.float64)
        scale = max(float(np.abs(bb).max()), 1e-12)
        rows.append((float(np.abs(a - bb).max()) / scale,
                     "/".join(map(str, k))))
    rows.sort(reverse=True)
    print(f"--- {tag}: worst {rows[0][0]:.2e}")
    for d, k in rows[:6]:
        print(f"    {d:.3e}  {k}")


drift_report(g_a, g_b, "A(step_full sharded) vs B(plain sharded)")
drift_report(g_b, g_c, "B(plain sharded) vs C(plain unsharded)")

# leg D: old-style second trainer on a 1x1 mesh, fresh init, same seed
tmp2 = tempfile.mkdtemp(prefix="diag1_")
cfg1 = cfg.replace(dp=1, sp=1, outf=tmp2)
single = RegressionTrainer(cfg1, video=VideoData(frames),
                           logger=RunLogger(tmp2, enable_tb=False))
pe_eq = all(
    np.array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(trainer.params)),
                    jax.tree_util.tree_leaves(jax.device_get(single.params))))
print("params(8dev trainer) == params(1x1 trainer):", pe_eq, flush=True)

img_1 = single.mesh.shard_batch(jnp.asarray(batch["img"]), spatial_axis=1)
t_1 = single.mesh.shard_batch(jnp.asarray(batch["norm_idx"]))


def lossf_d(p, img, t):
    out = single._forward(p, img, t)
    return _lf(out, img, cfg1.loss), _ppf(out, img)


(l_d, _), g_d = jax.jit(jax.value_and_grad(lossf_d, has_aux=True))(
    single.params, img_1, t_1)
g_d = jax.device_get(g_d)
print("D: 1x1-mesh trainer loss", float(l_d), flush=True)
drift_report(g_d, g_c, "D(1x1 trainer) vs C(unsharded numpy)")
drift_report(g_b, g_d, "B(plain sharded) vs D(1x1 trainer)")
