"""Micro-probe: can Mosaic concat 9 row-slabs along sublanes, and is one
(51,459)@(459,1920) dot faster than 9 (51,51)@(51,1920) dots?"""

import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

C, W = 51, 1920
REPS = 4000  # inner-kernel repetitions via grid (amortise ~0.7ms RTT)
DT = jnp.bfloat16


def kernel_9dots(x_ref, w_ref, out_ref):
    acc = jnp.zeros((C, W), jnp.float32)
    for k in range(9):
        acc = acc + lax.dot(w_ref[k], x_ref[k], preferred_element_type=jnp.float32)
    out_ref[...] = acc.astype(DT)


def kernel_1dot(x_ref, wflat_ref, out_ref):
    slabs = [x_ref[k] for k in range(9)]
    big = jnp.concatenate(slabs, axis=0)  # (459, W) sublane concat
    out_ref[...] = lax.dot(wflat_ref[...], big,
                           preferred_element_type=jnp.float32).astype(DT)


key = jax.random.key(0)
x = jax.random.normal(key, (9, C, W), DT)
w = jax.random.normal(key, (9, C, C), DT) * 0.1
wflat = w.transpose(1, 0, 2).reshape(C, 9 * C)  # (C_out, 9*C_in), tap-major K


def run(kernel, ops):
    f = pl.pallas_call(
        kernel,
        grid=(REPS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, W), DT),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda a, b: f(a, b))
    o = g(*ops)
    o.block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(g(*ops).mean())
        best = min(best, time.perf_counter() - t0)
    return best / REPS * 1e6  # us per row-conv


try:
    t1 = run(kernel_1dot, (x, wflat))
    print(f"1 big dot (concat K): {t1:.2f} us/row", flush=True)
except Exception as e:
    print("concat variant failed:", type(e).__name__, str(e)[:300], flush=True)

t9 = run(kernel_9dots, (x, w))
print(f"9 small dots:         {t9:.2f} us/row", flush=True)
print("DONE", flush=True)
