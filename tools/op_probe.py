"""Per-op microbenchmarks for the decode hot path (scan-timed, scalar
readback). Run from repo root:
  python -c "exec(open('tools/op_probe.py').read())"
"""

import time

import jax
import jax.numpy as jnp
from jax import lax

print("devices:", jax.devices(), flush=True)

DT = jnp.bfloat16
REPS = 20


def timeit(name, f, *args):
    # the first argument is perturbed by the loop carry so XLA cannot hoist
    # the op out of the scan (loop-invariant code motion would otherwise
    # make the timing measure a single execution)
    @jax.jit
    def run(args):
        def body(c, _):
            first = args[0] + c.astype(args[0].dtype) * 1e-12
            out = f(first, *args[1:])
            return c + out.astype(jnp.float32).mean(), None
        acc, _ = lax.scan(body, 0.0, None, length=REPS)
        return acc

    float(run(args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(args))
        best = min(best, time.perf_counter() - t0)
    per = best / REPS * 1e3
    print(f"{name:48s} {per:8.3f} ms/op", flush=True)
    return per


def conv(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))


key = jax.random.key(0)


def mk(shape):
    return jax.random.normal(key, shape, DT)


# stage-5 full-res SFT convs: 3x3 51->51 @ 1080x1920
x = mk((1, 1080, 1920, 51)); w = mk((3, 3, 51, 51))
timeit("conv3x3 51->51 @1080p", conv, x, w)
# padded-channel variant for comparison
x2 = mk((1, 1080, 1920, 128)); w2 = mk((3, 3, 128, 128))
timeit("conv3x3 128->128 @1080p", conv, x2, w2)
# stage-5 upconv: 3x3 61->204 @540x960
x3 = mk((1, 540, 960, 61)); w3 = mk((3, 3, 61, 204))
timeit("conv3x3 61->204 @540x960", conv, x3, w3)
# stage-4 convs: 3x3 61->61 @540x960
x4 = mk((1, 540, 960, 61)); w4 = mk((3, 3, 61, 61))
timeit("conv3x3 61->61 @540x960", conv, x4, w4)
# head: 3x3 51->3 @1080p
w5 = mk((3, 3, 51, 3))
timeit("conv3x3 51->3 @1080p (head)", conv, x, w5)
# elementwise chain at full res: sin + affine + residual
s = mk((1, 1, 1, 51)); b = mk((1, 1, 1, 51))
timeit("elementwise sin+affine+res @1080p x51",
       lambda x: x + jnp.sin(x) * (s + 1) + b, x)
# depth_to_space via reshape/transpose from 540x960x204
x6 = mk((1, 540, 960, 204))
def d2s(x):
    b_, h, w_, c = x.shape
    r = 2
    y = x.reshape(b_, h, w_, r, r, c // 4)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b_, h * r, w_ * r, c // 4)
timeit("depth_to_space 540x960x204 -> 1080p x51", d2s, x6)
# fused conv+d2s (what the decoder actually runs)
timeit("conv 61->204 + d2s", lambda x, w: d2s(conv(x, w)), x3, w3)
print("DONE", flush=True)
