"""Bisect the packed-int8 lane-roll Mosaic abort (array.h:480
"limits[i] <= dim(i) (2 vs. 1)") to the exact op, deviceless.

Cases build a ladder from plain int8 stores to the full
_roll_packed_i8 pattern; each runs in its own subprocess (SIGABRT
kills the process).  Usage: python tools/r5_pack_bisect.py [case]
"""
import os
import subprocess
import sys
import time

CASES = [
    "store",        # f32 -> int8 store, read back, store again
    "bitcast",      # + bitcast int8->int32 and back (no roll)
    "bitcast_val",  # bitcast a VALUE (no ref read-back)
    "roll1",        # + pltpu.roll(+1) on the int32 view
    "rolln",        # roll by lanes-1
    "mask",         # + jnp.where mask (the full _roll_packed_i8)
    "roll_i32",     # control: roll an int32 iota directly (no bitcast)
    "bitcast_8sub", # bitcast with 8-row (sub-32) sublane count
    "kbuf_pack",    # the real _build_kbuf pack path at K-buf shape
    "kbuf_r1only",  # same but a single r1 group
    "kbuf_then_dot",# kbuf_pack + an int8 dot reading the buffer
]


def _run_case(case: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental import topologies
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import SingleDeviceSharding

    import boosting_nerv_tpu.ops.pallas.planar as pk

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    shd = SingleDeviceSharding(topo.devices[0])

    CP = 64 if case != "bitcast_8sub" else 32
    LN = 10 * 1024
    WD = 1024

    def kern(x_ref, o_ref, buf):
        x32 = x_ref[...].astype(jnp.float32)
        q = pk._quant_act(x32, jnp.float32(127.0))
        buf[pl.ds(0, CP), pl.ds(0, LN)] = q.astype(jnp.int8)
        p = buf[pl.ds(0, CP), pl.ds(0, LN)]
        if case == "store":
            out = p
        elif case in ("bitcast", "roll1", "rolln", "mask"):
            v = pltpu.bitcast(p, jnp.int32)
            if case == "roll1":
                v = pltpu.roll(v, 1, axis=1)
            elif case == "rolln":
                v = pltpu.roll(v, LN - 1, axis=1)
            elif case == "mask":
                colp = pk._col_plane(CP // 4, LN, WD)
                v = pltpu.roll(v, 1, axis=1)
                v = jnp.where(colp > 0, v, jnp.int32(0))
            out = pltpu.bitcast(v, jnp.int8)
        elif case == "bitcast_val":
            v = pltpu.bitcast(q.astype(jnp.int8), jnp.int32)
            out = pltpu.bitcast(v, jnp.int8)
        elif case == "bitcast_8sub":
            p8 = buf[pl.ds(0, 8), pl.ds(0, LN)]
            v = pltpu.bitcast(p8, jnp.int32)
            out8 = pltpu.bitcast(v, jnp.int8)
            buf[pl.ds(8, 8), pl.ds(0, LN)] = out8
            out = p
        elif case in ("kbuf_pack", "kbuf_r1only", "kbuf_then_dot"):
            out = p  # kbuf cases use their own kernel below
        elif case == "roll_i32":
            v = lax.broadcasted_iota(jnp.int32, (CP // 4, LN), 1)
            v = pltpu.roll(v, 1, axis=1)
            buf[pl.ds(0, CP), pl.ds(0, LN)] = pltpu.bitcast(
                v, jnp.int8)
            out = buf[pl.ds(0, CP), pl.ds(0, LN)]
        buf[pl.ds(CP, CP), pl.ds(0, LN)] = out
        o_ref[...] = buf[pl.ds(CP, CP), pl.ds(0, LN)].astype(jnp.float32)

    if case.startswith("kbuf"):
        def kern(x_ref, w_ref, o_ref, kbuf):
            x32 = x_ref[...].astype(jnp.float32)
            colp = pk._col_plane(CP, LN, WD)

            def get(r1):
                return pk._quant_act(
                    lax.slice_in_dim(x32, r1 * 2 * CP,
                                     (r1 + 1) * 2 * CP, axis=0),
                    jnp.float32(127.0))

            old = pk.I8_KBUF_ROLL
            pk.I8_KBUF_ROLL = "pack"
            try:
                if case == "kbuf_r1only":
                    g = get(0)
                    kbuf[pl.ds(0, 2 * CP), pl.ds(0, LN)] = g.astype(
                        jnp.int8)
                    p0 = kbuf[pl.ds(0, CP), pl.ds(0, LN)]
                    p1 = kbuf[pl.ds(CP, CP), pl.ds(0, LN)]
                    c32 = lax.slice_in_dim(colp, 0, CP // 4, axis=0)
                    vm = pk._roll_packed_i8(p1, 1, c32 > 0)
                    vp = pk._roll_packed_i8(p0, LN - 1,
                                            c32 < WD - 1)
                    kbuf[pl.ds(2 * CP, CP), pl.ds(0, LN)] = vm
                    kbuf[pl.ds(3 * CP, CP), pl.ds(0, LN)] = vp
                else:
                    pk._build_kbuf(kbuf, get, colp, WD, CP, jnp.int8)
            finally:
                pk.I8_KBUF_ROLL = old
            if case == "kbuf_then_dot":
                a = lax.dot(w_ref[...], kbuf[:, pl.ds(0, LN)],
                            preferred_element_type=jnp.int32)
                o_ref[...] = a.astype(jnp.float32)
            else:
                o_ref[...] = kbuf[pl.ds(0, 2 * CP),
                                  pl.ds(0, LN)].astype(jnp.float32)

        import numpy as np
        w = jnp.asarray(np.zeros((2 * CP, 8 * CP), np.int8))
        x = jnp.zeros((4 * CP, LN), jnp.bfloat16)
        oshape = ((2 * CP, LN) if case != "kbuf_then_dot"
                  else (2 * CP, LN))
        fn = pk._precision_safe_pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
            scratch_shapes=[pltpu.VMEM((8 * CP, LN), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=pk.VMEM_LIMIT),
        )
        xs = jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shd)
        ws = jax.ShapeDtypeStruct(w.shape, w.dtype, sharding=shd)
        jax.jit(fn).trace(xs, ws).lower().compile()
        print(f"{case}: COMPILE OK", flush=True)
        return

    x = jnp.zeros((CP, LN), jnp.bfloat16)
    fn = pk._precision_safe_pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CP, LN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2 * CP, LN), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=pk.VMEM_LIMIT),
    )
    xs = jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shd)
    jax.jit(fn).trace(xs).lower().compile()
    print(f"{case}: COMPILE OK", flush=True)


def main() -> None:
    if len(sys.argv) > 1:
        _run_case(sys.argv[1])
        return
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.update(JAX_PLATFORMS="cpu", TPU_ACCELERATOR_TYPE="v5litepod-4",
               TPU_WORKER_HOSTNAMES="localhost", TPU_WORKER_ID="0")
    for case in CASES:
        t0 = time.perf_counter()
        r = subprocess.run([sys.executable, __file__, case],
                           capture_output=True, text=True, env=env,
                           cwd="/root/repo", timeout=900)
        dt = time.perf_counter() - t0
        if r.returncode == 0:
            print(f"{case:14s} OK    ({dt:.0f}s)", flush=True)
        else:
            tail = [ln for ln in (r.stderr or "").splitlines()
                    if "Check failed" in ln or "error:" in ln.lower()]
            print(f"{case:14s} FAIL rc={r.returncode} ({dt:.0f}s)"
                  + (f"  {tail[-1][:140]}" if tail else ""), flush=True)


if __name__ == "__main__":
    main()

# appended cases: replicate _build_kbuf pack exactly (two r1 groups,
# K-buf offsets) and its sub-ingredients — driven via BISECT2=case
