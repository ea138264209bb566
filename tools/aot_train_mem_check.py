"""Deviceless XLA:TPU memory analysis of the 720p HNeRV-Boost TRAIN step:
standard fine-grid forward vs the subpixel-planar training forward
(training/planar_forward.py), across batch sizes.

Round-2 measured fact: b>=2 at 720p OOMs the 16 GB v5e HBM because XLA
lane-pads the narrow-channel NHWC conv temps 3.7x (CLAUDE.md).  The
planar forward keeps tail channels at 4*C on the coarse grid; this
script PROVES the fit offline (no TPU needed) via the same deviceless
v5e topology trick as tools/aot_compile_check.py — compile the full
jitted train step (fwd + Fusion10_freq loss + backward + Adan update,
donated params/opt_state) and read compiled.memory_analysis().

Run from /root/repo:
  env -u PYTHONPATH JAX_PLATFORMS=cpu TPU_ACCELERATOR_TYPE=v5litepod-4 \
    TPU_WORKER_HOSTNAMES=localhost TPU_WORKER_ID=0 \
    python -c "exec(open('tools/aot_train_mem_check.py').read())"
"""
import time

import jax
import jax.numpy as jnp
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.ops.losses import loss_fn
from boosting_nerv_tpu.training.planar_forward import build_planar_forward
from boosting_nerv_tpu.training.trainer import make_optimizer

import optax

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2")
DEV = topo.devices[0]
print("deviceless target:", DEV, flush=True)

jax.config.update("jax_default_matmul_precision", "high")

cfg = BoostConfig(
    model="HNeRV_Boost", embed="pe_1.25_80", enc_strds=[5, 2, 2, 2, 2],
    enc_dim="64_16", dec_strds=[5, 2, 2, 2, 2], dec_blks=[1, 1, 2, 2, 2],
    ks="0_1_5", reduce=1.2, lower_width=12, modelsize=1.275,
    conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
    sft_block="res_sft", ch_t=32, crop_list="720_1280",
    loss="Fusion10_freq", optim_type="Adan")
cfg = resolve_sizes(cfg, final_size=720 * 1280, full_data_length=132)
print("fc_dim", cfg.fc_dim, flush=True)

model = build_model(cfg)
opt = make_optimizer("Adan", 0.0)

HBM = 16 * 2 ** 30


def check(tag, b, planar_from_h=0, remat=False):
    img = jax.ShapeDtypeStruct((b, 720, 1280, 3), jnp.float32)
    ts = jax.ShapeDtypeStruct((b,), jnp.float32)
    p_shape = jax.eval_shape(model.init, jax.random.key(0), img, ts)
    o_shape = jax.eval_shape(opt.init, p_shape)

    if planar_from_h:
        fwd = build_planar_forward(cfg, model, planar_from_h)
    else:
        fwd = lambda p, i, t: model.apply(p, i, t)
    if remat:
        fwd = jax.checkpoint(fwd)

    def step(params, opt_state, img, t):
        def lossf(p):
            out = fwd(p, img, t)
            return loss_fn(out, img, cfg.loss)

        l, grads = jax.value_and_grad(lossf)(params)
        updates, opt_state = opt.update(grads, opt_state, params, lr=1e-3)
        params = optax.apply_updates(params, updates)
        return params, opt_state, l

    shd = SingleDeviceSharding(DEV)
    spec = lambda s: jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=shd), s)
    t0 = time.perf_counter()
    try:
        compiled = (jax.jit(step, donate_argnums=(0, 1))
                    .trace(spec(p_shape), spec(o_shape), spec(img), spec(ts))
                    .lower().compile())
        m = compiled.memory_analysis()
        tot = (m.temp_size_in_bytes + m.argument_size_in_bytes
               + m.output_size_in_bytes - m.alias_size_in_bytes)
        print(f"{tag:24s} temp={m.temp_size_in_bytes / 2**30:7.2f}G "
              f"args={m.argument_size_in_bytes / 2**30:5.2f}G "
              f"out={m.output_size_in_bytes / 2**30:5.2f}G "
              f"alias={m.alias_size_in_bytes / 2**30:5.2f}G "
              f"total={tot / 2**30:7.2f}G "
              f"{'FITS' if tot < HBM * 0.97 else 'OOM'} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:200]
        print(f"{tag:24s} FAIL {type(e).__name__}: {msg}", flush=True)


check("b1 standard", 1)
check("b2 standard", 2)
check("b2 standard remat", 2, remat=True)
check("b2 planar@360", 2, planar_from_h=360)
check("b2 planar@180", 2, planar_from_h=180)
check("b2 planar@90", 2, planar_from_h=90)
check("b4 planar@180", 4, planar_from_h=180)
check("b4 planar@90", 4, planar_from_h=90)
