"""Feasibility probe: Pallas 3x3 conv on (C, H, W) layout at 1080p.

Input is H-padded by 1 in XLA so every kernel access is static: tile i reads
rows [i*TH, i*TH+TH+2) of the padded array. W=1920 rides the lanes (15x128,
no padding); the 9 taps are (C_out, C_in) @ (C_in, W) row matmuls
accumulated in fp32. Compare against XLA's ~7.4 ms NHWC conv.
Run from repo root: python -c "exec(open('tools/pallas_conv_probe.py').read())"
"""

import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print("devices:", jax.devices(), flush=True)

C = 51
H, W = 1080, 1920
TH = 8
DT = jnp.bfloat16


def conv_kernel(x_hbm, w_ref, out_ref, xtile, sem):
    """x_hbm: (C, H+2, W) H-padded input in ANY; w_ref: (9, C, C) VMEM;
    out_ref: (C, TH, W) VMEM block; xtile: (C, TH+2, W) VMEM scratch."""
    i = pl.program_id(0)
    src = pl.multiple_of(i * TH, TH)
    # DMA sublane spans must be 8-aligned: load a 16-row tile (rows 0..9
    # used: 8 outputs + 2 halo)
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, 16), :], xtile, sem)
    cp.start()
    cp.wait()
    col = jax.lax.broadcasted_iota(jnp.int32, (C, W), 1)
    for h in range(TH):
        acc = jnp.zeros((C, W), jnp.float32)
        for dy in range(3):
            row = xtile[:, h + dy, :]  # (C, W), static index
            for dx in range(3):
                # lane rotate is 32-bit only on this Mosaic version: roll a
                # f32 copy, then cast back for the MXU
                if dx == 0:
                    r32 = pltpu.roll(row.astype(jnp.float32), 1, axis=1)
                    shifted = jnp.where(col == 0, 0.0, r32).astype(DT)
                elif dx == 2:
                    r32 = pltpu.roll(row.astype(jnp.float32), W - 1, axis=1)
                    shifted = jnp.where(col == W - 1, 0.0, r32).astype(DT)
                else:
                    shifted = row
                acc = acc + jax.lax.dot(
                    w_ref[dy * 3 + dx], shifted,
                    preferred_element_type=jnp.float32)
        out_ref[:, h, :] = acc.astype(out_ref.dtype)


@jax.jit
def pallas_conv(x, w9):
    grid = H // TH
    # pad: 1 top halo row + enough bottom rows that every 16-row DMA fits
    hp = (grid - 1) * TH + 16
    xp = jnp.pad(x, ((0, 0), (1, hp - H - 1), (0, 0)))
    return pl.pallas_call(
        conv_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, TH, W), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, H, W), DT),
        scratch_shapes=[pltpu.VMEM((C, 16, W), DT),
                        pltpu.SemaphoreType.DMA],
    )(xp, w9)


key = jax.random.key(0)
x = jax.random.normal(key, (C, H, W), DT)
w9 = jax.random.normal(key, (9, C, C), DT) * 0.1

out = pallas_conv(x, w9)
print("pallas out", out.shape, flush=True)

xn = x.transpose(1, 2, 0)[None]
wn = w9.reshape(3, 3, C, C).transpose(0, 1, 3, 2)
ref = lax.conv_general_dilated(
    xn.astype(jnp.float32), wn.astype(jnp.float32), (1, 1), "SAME",
    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0].transpose(2, 0, 1)
err = jnp.abs(out.astype(jnp.float32) - ref).max() / (jnp.abs(ref).max() + 1e-6)
print("rel err:", float(err), flush=True)

REPS = 20


@jax.jit
def run(x, w9):
    def body(c, _):
        xx = x + c.astype(x.dtype) * 1e-12
        o = pallas_conv(xx, w9)
        return c + o.astype(jnp.float32).mean(), None
    acc, _ = lax.scan(body, 0.0, None, length=REPS)
    return acc


float(run(x, w9))
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    float(run(x, w9))
    best = min(best, time.perf_counter() - t0)
print(f"pallas conv3x3 {C}->{C} @1080p CHW: {best / REPS * 1e3:.3f} ms/op",
      flush=True)
print("DONE", flush=True)
