"""TPU probe: 720p HNeRV-Boost train-step throughput with the
subpixel-planar training forward (training/planar_forward.py) vs the
standard fine-grid forward — the round-3 encode lever.  Memory
feasibility is proven offline by tools/aot_train_mem_check.py; this
measures whether b>=2 planar beats the b=1 standard path per frame.

Run from /root/repo with NO PYTHONPATH (owns the chip):
  python -c "exec(open('tools/planar_train_probe.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from boosting_nerv_tpu.config import BoostConfig, resolve_sizes
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.ops.losses import loss_fn
from boosting_nerv_tpu.training.planar_forward import build_planar_forward
from boosting_nerv_tpu.training.trainer import make_optimizer

print("devices:", jax.devices(), flush=True)

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
rng = np.random.default_rng(0)
opt = make_optimizer("Adan", 0.0)
N = 10


def bench(b, planar_from_h=0, precision="high", n=N):
    jax.config.update("jax_default_matmul_precision", precision)
    img = jnp.asarray(rng.uniform(size=(b, 720, 1280, 3)).astype(np.float32))
    ts = jnp.linspace(0.1, 0.9, b)
    params = model.init(jax.random.key(0), img[:1], ts[:1])
    opt_state = opt.init(params)

    if planar_from_h:
        fwd = build_planar_forward(cfg, model, planar_from_h)
    else:
        fwd = lambda p, i, t: model.apply(p, i, t)

    def step(params, opt_state, img, t):
        def lossf(p):
            return loss_fn(fwd(p, img, t), img, cfg.loss)
        l, g = jax.value_and_grad(lossf)(params)
        up, opt_state = opt.update(g, opt_state, params, lr=3e-3)
        params = optax.apply_updates(params, up)
        return params, opt_state, l

    def l_pert(l):
        return (l * 1e-12).astype(jnp.float32)

    @jax.jit
    def steps_n(params, opt_state, img, ts):
        def body(c, _):
            p, o, l = step(c[0], c[1], img + l_pert(c[2]), ts)
            return (p, o, l), None
        (p, o, l), _ = lax.scan(body, (params, opt_state, 0.0),
                                jnp.arange(n))
        return l

    tag = f"b={b} planar@{planar_from_h:<4d} prec={precision:7s}"
    try:
        t0 = time.perf_counter()
        float(steps_n(params, opt_state, img, ts))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: "
              f"{str(e)[:120]}", flush=True)
        return
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(steps_n(params, opt_state, img, ts))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {best/n*1e3:7.1f} ms/step  {best/n/b*1e3:7.1f} ms/frame",
          f"(compile {comp:.0f}s)", flush=True)


bench(1, 0)            # round-2 baseline shape (288 ms expected)
bench(1, 180)          # planar overhead at b=1
bench(2, 180)          # the lever: does b=2 planar beat b=1 std/frame?
bench(2, 90)
bench(4, 180)
bench(2, 0)            # expected OOM (control)
