"""TPU probe: fused Pallas ResBlock_SFT vs the XLA (NHWC flax-equivalent)
sequence, correctness + speed at stage-5 shape (51ch, 1080p).
Run from repo root: python -c "exec(open('tools/fused_block_probe.py').read())"
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

print("devices:", jax.devices(), flush=True)
from boosting_nerv_tpu.ops.pallas import resblock_sft_chw

C, H, W = 51, 1080, 1920
DT = jnp.bfloat16
key = jax.random.key(0)
ks = jax.random.split(key, 12)
x = jax.random.normal(ks[0], (C, H, W), DT)
w0 = (jax.random.normal(ks[1], (9, C, C), DT) * 0.05)
w1 = (jax.random.normal(ks[2], (9, C, C), DT) * 0.05)
b0 = jax.random.normal(ks[3], (C,), jnp.float32) * 0.1
b1 = jax.random.normal(ks[4], (C,), jnp.float32) * 0.1
s0 = jax.random.normal(ks[5], (C,), jnp.float32) * 0.2
h0 = jax.random.normal(ks[6], (C,), jnp.float32) * 0.2
s1 = jax.random.normal(ks[7], (C,), jnp.float32) * 0.2
h1 = jax.random.normal(ks[8], (C,), jnp.float32) * 0.2


@jax.jit
def xla_block(x, w0, b0, w1, b1, s0, h0, s1, h1):
    """Reference semantics in NHWC float path (what the flax decode runs)."""
    xn = x.transpose(1, 2, 0)[None].astype(jnp.float32)
    wa = w0.reshape(3, 3, C, C).transpose(0, 1, 3, 2).astype(jnp.float32)
    wb = w1.reshape(3, 3, C, C).transpose(0, 1, 3, 2).astype(jnp.float32)
    fea = xn * (s0 + 1.0) + h0
    fea = lax.conv_general_dilated(fea, wa, (1, 1), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fea = jax.nn.gelu(fea + b0, approximate=False)
    fea = fea * (s1 + 1.0) + h1
    fea = lax.conv_general_dilated(fea, wb, (1, 1), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = xn + fea + b1
    return out[0].transpose(2, 0, 1)


ref = xla_block(x, w0, b0, w1, b1, s0, h0, s1, h1)
out = resblock_sft_chw(x, w0, b0, w1, b1, s0, h0, s1, h1)
err = float(jnp.abs(out.astype(jnp.float32) - ref).max()
            / (jnp.abs(ref).max() + 1e-6))
print("rel err fused vs xla:", err, flush=True)

REPS = 20


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
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best / REPS * 1e3:8.3f} ms/block", flush=True)


args = (x, w0, b0, w1, b1, s0, h0, s1, h1)
bench("xla resblock_sft", xla_block, *args)
bench("pallas resblock_sft", resblock_sft_chw, *args)

# bf16 XLA variant (same dtype as the pallas path computes in)
@jax.jit
def xla_block_bf16(x, w0, b0, w1, b1, s0, h0, s1, h1):
    xn = x.transpose(1, 2, 0)[None]
    wa = w0.reshape(3, 3, C, C).transpose(0, 1, 3, 2)
    wb = w1.reshape(3, 3, C, C).transpose(0, 1, 3, 2)
    fea = xn * (s0.astype(DT) + 1) + h0.astype(DT)
    fea = lax.conv_general_dilated(fea, wa, (1, 1), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fea = jax.nn.gelu(fea + b0.astype(DT), approximate=False)
    fea = fea * (s1.astype(DT) + 1) + h1.astype(DT)
    fea = lax.conv_general_dilated(fea, wb, (1, 1), "SAME",
                                   dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return (xn + fea + b1.astype(DT))[0].transpose(2, 0, 1)


bench("xla resblock_sft bf16", xla_block_bf16, *args)
print("DONE", flush=True)
