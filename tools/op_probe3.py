"""Layout/formulation diagnostics for the full-res conv bottleneck."""

import time

import jax
import jax.numpy as jnp
from jax import lax

print("devices:", jax.devices(), flush=True)

DT = jnp.bfloat16
REPS = 20
key = jax.random.key(0)
mk = lambda s: jax.random.normal(key, s, DT)


def timeit(name, f, *args):
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
    print(f"{name:52s} {best / REPS * 1e3:8.3f} ms/op", flush=True)


def conv_nhwc(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_nchw(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                    dimension_numbers=("NCHW", "OIHW", "NCHW"))


# channel sweep: flat time => lane padding to 128 dominates
for c in (16, 32, 51, 64, 96, 128):
    x = mk((1, 1080, 1920, c)); w = mk((3, 3, c, c))
    timeit(f"NHWC conv3x3 {c}->{c} @1080p", conv_nhwc, x, w)

# NCHW formulation at 51 channels
xc = mk((1, 51, 1080, 1920)); wc = mk((51, 51, 3, 3))
timeit("NCHW conv3x3 51->51 @1080p", conv_nchw, xc, wc)

# tap-accumulated matmul formulation: 9 shifted (HW, C) @ (C, C)
x = mk((1, 1080, 1920, 51)); w = mk((3, 3, 51, 51))
def conv_taps(x, w):
    _, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((H * W, C), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = xp[0, dy:dy + H, dx:dx + W, :].reshape(H * W, C)
            out = out + jnp.dot(sl, w[dy, dx],
                                preferred_element_type=jnp.float32)
    return out.reshape(1, H, W, C).astype(DT)
timeit("tap-matmul conv3x3 51->51 @1080p", conv_taps, x, w)

# batched-tap single matmul: concat taps into K
def conv_im2col(x, w):
    _, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[0, dy:dy + H, dx:dx + W, :] for dy in range(3) for dx in range(3)]
    patches = jnp.concatenate(cols, axis=-1).reshape(H * W, 9 * C)
    return jnp.dot(patches, w.reshape(9 * C, C),
                   preferred_element_type=jnp.float32).reshape(1, H, W, C).astype(DT)
timeit("im2col-matmul conv3x3 51->51 @1080p", conv_im2col, x, w)
print("DONE", flush=True)
