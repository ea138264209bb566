"""Grad drift + wall time of candidate dryrun configs at 240x240/Fusion.

Run:  env -u PYTHONPATH JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -c "exec(open('tools/r4_dryrun_diag3.py').read())" CFG
with CFG one of: 4_2_8  2_4_4
"""
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
import tempfile

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.data import VideoData, synthetic_video
from boosting_nerv_tpu.training.trainer import RegressionTrainer
from boosting_nerv_tpu.utils.logger import RunLogger
from boosting_nerv_tpu.ops.metrics import psnr_per_frame as _ppf
from boosting_nerv_tpu.ops.losses import loss_fn as _lf

arg = (sys.argv[1] if len(sys.argv) > 1 else "4_2_8")
dp, sp, b = [int(x) for x in arg.split("_")]
t0 = time.perf_counter()
frames = synthetic_video(b, 240, 240)
tmp = tempfile.mkdtemp(prefix="d3_")
cfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_80",
    enc_strds=[5, 2, 2, 2, 2], enc_dim="64_16",
    dec_strds=[5, 2, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    ks="0_1_5", reduce=1.2, lower_width=12, modelsize=1.275,
    conv_type=["convnext", "pshuffel_3x3"], act="sin",
    norm="none", sft_block="res_sft", ch_t=32,
    crop_list="240_240", loss="Fusion10_freq",
    epochs=1, batchSize=b, lr=1e-3, outf=tmp, not_resume=True,
    dp=dp, sp=sp,
)
cfg = resolve_sizes(cfg, final_size=720 * 1280, full_data_length=132)
tr = RegressionTrainer(cfg, video=VideoData(frames),
                       logger=RunLogger(tmp, enable_tb=False))
print(f"+{time.perf_counter()-t0:.0f}s trainer built", flush=True)
batch = tr.video.get_batch(list(range(b)))
img_sh = tr.mesh.shard_batch(jnp.asarray(batch["img"]), spatial_axis=1)
t_sh = tr.mesh.shard_batch(jnp.asarray(batch["norm_idx"]))


def lossf(p, img, t):
    out = tr._forward(p, img, t)
    return _lf(out, img, cfg.loss), _ppf(out, img)


(l_b, _), g_b = jax.jit(jax.value_and_grad(lossf, has_aux=True))(
    tr.params, img_sh, t_sh)
g_b = jax.device_get(g_b)
print(f"+{time.perf_counter()-t0:.0f}s sharded v&g done loss={float(l_b)}",
      flush=True)

params_1 = jax.device_get(tr.params)
(l_c, _), g_c = jax.jit(jax.value_and_grad(lossf, has_aux=True))(
    params_1, jnp.asarray(batch["img"]), jnp.asarray(batch["norm_idx"]))
g_c = jax.device_get(g_c)
print(f"+{time.perf_counter()-t0:.0f}s unsharded v&g done loss={float(l_c)}",
      flush=True)

worst = 0.0
for a, bb in zip(jax.tree_util.tree_leaves(g_b),
                 jax.tree_util.tree_leaves(g_c)):
    a = np.asarray(a, np.float64)
    bb = np.asarray(bb, np.float64)
    scale = max(float(np.abs(bb).max()), 1e-12)
    worst = max(worst, float(np.abs(a - bb).max()) / scale)
print(f"cfg dp={dp} sp={sp} b={b}: grad drift {worst:.2e}, "
      f"loss diff {abs(float(l_b)-float(l_c)):.2e}, "
      f"total {time.perf_counter()-t0:.0f}s", flush=True)

from flax.traverse_util import flatten_dict
fa, fb = flatten_dict(g_b), flatten_dict(g_c)
rows = []
for k in fa:
    a = np.asarray(fa[k], np.float64)
    bb = np.asarray(fb[k], np.float64)
    scale = max(float(np.abs(bb).max()), 1e-12)
    rows.append((float(np.abs(a - bb).max()) / scale,
                 float(np.abs(a).max()), float(np.abs(bb).max()),
                 "/".join(map(str, k))))
rows.sort(reverse=True)
for d, ma, mb, k in rows[:10]:
    print(f"  {d:.3e}  |sh|max {ma:.3e} |un|max {mb:.3e}  {k}")
