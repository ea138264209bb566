"""Diagnose the planar-forward compile-time blowup: time jit-compiles of
the planar vs standard grad step at 240x320 flagship channels on a CPU
mesh: unsharded, dp-only, and dp x sp. Run:
  env -u PYTHONPATH JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -u -c "exec(open('tools/planar_compile_diag.py').read())"
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.ops.losses import loss_fn
from boosting_nerv_tpu.parallel.mesh import make_mesh_plan
from boosting_nerv_tpu.training.planar_forward import build_planar_forward

cfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_80", enc_strds=[5, 2, 2, 2, 2],
    enc_dim="64_16", dec_strds=[5, 2, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    ks="0_1_5", reduce=1.2, lower_width=12, modelsize=1.275,
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=32, crop_list="240_320", loss="Fusion10_freq")
cfg = resolve_sizes(cfg, final_size=720 * 1280, full_data_length=132)
model = build_model(cfg)

b = 4
rng = np.random.default_rng(0)
img_h = jnp.asarray(rng.uniform(size=(b, 240, 320, 3)).astype(np.float32))
t_h = jnp.linspace(0.1, 0.9, b)
params = model.init(jax.random.key(0), img_h[:1], t_h[:1])

plfwd = build_planar_forward(cfg, model, 60)
std = lambda p, i, t: model.apply(p, i, t)


def timed(tag, fwd, dp, sp):
    mesh = make_mesh_plan(dp, sp)
    img = mesh.shard_batch(img_h, spatial_axis=1)
    t = mesh.shard_batch(t_h)
    p = mesh.replicate(params)

    f = jax.jit(jax.grad(lambda pp: loss_fn(fwd(pp, img, t), img, cfg.loss)))
    t0 = time.perf_counter()
    g = f(p)
    jax.block_until_ready(g)
    print(f"{tag:28s} compile+run {time.perf_counter()-t0:6.1f}s",
          flush=True)


timed("std   dp=1 sp=1", std, 1, 1)
timed("planar dp=1 sp=1", plfwd, 1, 1)
timed("std   dp=4 sp=1", std, 4, 1)
timed("planar dp=4 sp=1", plfwd, 4, 1)
timed("std   dp=4 sp=2", std, 4, 2)
timed("planar dp=4 sp=2", plfwd, 4, 2)
