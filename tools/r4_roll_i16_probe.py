"""Does Mosaic support lane-rolls on 16-bit data (bf16 bitcast to i16)?

CLAUDE.md records "no bf16 lane roll (roll f32)" from round 1; if a
bitcast-to-i16 roll compiles, the K-buffer prologue can skip its f32
casts entirely (load bf16 -> roll i16 -> store bf16).  Deviceless AOT
compile check — no TPU needed:

  env -u PYTHONPATH JAX_PLATFORMS=cpu TPU_ACCELERATOR_TYPE=v5litepod-4 \
    TPU_WORKER_HOSTNAMES=localhost TPU_WORKER_ID=0 \
    python -c "exec(open('tools/r4_roll_i16_probe.py').read())"
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental import topologies
from jax.sharding import SingleDeviceSharding

topo = topologies.get_topology_desc(platform="tpu", topology_name="v5e:2x2")
DEV = topo.devices[0]
SHD = SingleDeviceSharding(DEV)
print("deviceless target:", DEV, flush=True)

ROWS, L = 64, 8 * 1024


def k_bitcast_i16(x_ref, o_ref):
    x = x_ref[...]
    xi = pltpu.bitcast(x, jnp.int16)
    r = pltpu.roll(xi, 1, axis=1)
    o_ref[...] = pltpu.bitcast(r, jnp.bfloat16)


def k_roll_bf16(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], 1, axis=1)


def k_roll_u16_view(x_ref, o_ref):
    x = x_ref[...]
    xi = jax.lax.bitcast_convert_type(x, jnp.uint16)
    r = pltpu.roll(xi, 1, axis=1)
    o_ref[...] = jax.lax.bitcast_convert_type(r, jnp.bfloat16)


def k_roll_f32(x_ref, o_ref):  # the current production pattern (control)
    o_ref[...] = pltpu.roll(x_ref[...].astype(jnp.float32), 1,
                            axis=1).astype(jnp.bfloat16)


def compile_check(kern, tag):
    t0 = time.perf_counter()
    try:
        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ROWS, L), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        spec = jax.ShapeDtypeStruct((ROWS, L), jnp.bfloat16, sharding=SHD)
        jax.jit(fn).trace(spec).lower().compile()
        print(f"{tag:24s} COMPILE OK ({time.perf_counter()-t0:.0f}s)",
              flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:140]
        print(f"{tag:24s} FAIL {type(e).__name__}: {msg}", flush=True)


compile_check(k_roll_f32, "roll f32 (control)")
compile_check(k_roll_bf16, "roll bf16 direct")
compile_check(k_bitcast_i16, "pltpu.bitcast i16 roll")
compile_check(k_roll_u16_view, "lax.bitcast u16 roll")
