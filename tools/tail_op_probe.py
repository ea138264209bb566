"""Per-op timing of the Pallas decode tail at 1080p/51ch."""

import time

import jax
import jax.numpy as jnp
from jax import lax

print("devices:", jax.devices(), flush=True)
from boosting_nerv_tpu.ops.pallas.conv_chw import conv3x3_act_chw, head_conv_chw
from boosting_nerv_tpu.ops.pallas.fused_sft import resblock_sft_chw

C, H, W = 51, 1080, 1920
DT = jnp.bfloat16
key = jax.random.key(0)
ks = jax.random.split(key, 12)
x = jax.random.normal(ks[0], (C, H, W), DT)
w9 = jax.random.normal(ks[1], (9, C, C), DT) * 0.05
wh = jax.random.normal(ks[2], (9, 3, C), DT) * 0.05
b = jax.random.normal(ks[3], (C,), jnp.float32) * 0.1
b3 = jax.random.normal(ks[4], (3,), jnp.float32) * 0.1
vecs = [jax.random.normal(k, (C,), jnp.float32) * 0.2 for k in ks[5:9]]

REPS = 10


def bench(name, fn, *args):
    @jax.jit
    def run(args):
        def body(c, _):
            a0 = args[0] + c.astype(args[0].dtype) * 1e-12
            o = fn(a0, *args[1:])
            return c + o.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, 0.0, None, length=REPS)
        return acc

    float(run(args))
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:32s} {best / REPS * 1e3:8.2f} ms/op", flush=True)


bench("conv3x3_act_chw 51->51", conv3x3_act_chw, x, w9, b)
bench("head_conv_chw 51->3", head_conv_chw, x, wh, b3)
bench("rsft (input_sin)", lambda x, *a: resblock_sft_chw(x, *a, input_sin=True),
      x, w9, b, w9, b, *vecs)
print("DONE", flush=True)
