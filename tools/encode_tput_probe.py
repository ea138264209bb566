"""TPU probe: 720p HNeRV-Boost train-step throughput vs batch size,
matmul precision, and remat. Feeds the encode-time config choice for the
at-scale run (VERDICT #3) and the BASELINE encode numbers.
Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/encode_tput_probe.py').read())"
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


def bench(b, precision, remat, n=10):
    jax.config.update("jax_default_matmul_precision", precision)
    img = jnp.asarray(rng.uniform(size=(b, 720, 1280, 3)).astype(np.float32))
    ts = jnp.linspace(0.1, 0.9, b)
    params = model.init(jax.random.key(0), img, ts)
    opt_state = opt.init(params)

    fwd = model.apply
    if remat:
        fwd = jax.checkpoint(fwd)

    def step(params, opt_state, img, t):
        def lossf(p):
            out = fwd(p, img, t)
            return loss_fn(out, img, cfg.loss), out
        (l, out), g = jax.value_and_grad(lossf, has_aux=True)(params)
        up, opt_state = opt.update(g, opt_state, params, lr=3e-3)
        params = optax.apply_updates(params, up)
        return params, opt_state, l

    @jax.jit
    def steps_n(params, opt_state, img, ts):
        def body(c, _):
            p, o, l = step(c[0], c[1], img + l_pert(c[2]), ts)
            return (p, o, l), None
        (p, o, l), _ = lax.scan(body, (params, opt_state, 0.0),
                                jnp.arange(n))
        return l

    def l_pert(l):
        return (l * 1e-12).astype(jnp.float32)

    tag = f"b={b} prec={precision:7s} remat={int(remat)}"
    try:
        t0 = time.perf_counter()
        float(steps_n(params, opt_state, img, ts))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}", flush=True)
        return
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(steps_n(params, opt_state, img, ts))
        best = min(best, time.perf_counter() - t0)
    per_frame = best / n / b
    print(f"{tag}: {best/n*1e3:7.1f} ms/step  {per_frame*1e3:7.1f} ms/frame"
          f"  (compile {comp:.0f}s)", flush=True)


bench(1, "highest", False)
bench(1, "high", False)
bench(2, "high", False)
bench(4, "high", False)
bench(4, "high", True)
bench(2, "highest", False)
