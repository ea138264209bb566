"""Second-stage bisect: mutate the PASSING single-roll case toward the
FAILING _build_kbuf pack composition one ingredient at a time.
Usage: python tools/r5_pack_bisect2.py [case]  (no arg = all)."""
import os
import subprocess
import sys
import time

CASES = [
    "base",       # = the passing 'mask' case (store 64, read 64, 1 roll)
    "wide_store", # store 128 rows at once, read rows 0:64
    "off_read",   # store 128 rows, read rows 64:128
    "two_rolls",  # store 64, two rolls (vm and vp) of the same plane
    "sliced_col", # mask from a 64-row colp sliced to 16 rows
    "full_r1",    # all of the above = kbuf_r1only
]


def _run_case(case: str) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental import topologies
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import SingleDeviceSharding

    import boosting_nerv_tpu.ops.pallas.planar as pk

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    shd = SingleDeviceSharding(topo.devices[0])

    CP = 64
    LN = 10 * 1024
    WD = 1024

    def kern(x_ref, o_ref, buf):
        x32 = x_ref[...].astype(jnp.float32)
        q = pk._quant_act(x32, jnp.float32(127.0))
        if case == "sliced_col":
            colp64 = pk._col_plane(CP, LN, WD)
            c32 = lax.slice_in_dim(colp64, 0, CP // 4, axis=0)
        else:
            c32 = pk._col_plane(CP // 4, LN, WD)
        if case in ("wide_store", "off_read", "full_r1"):
            buf[pl.ds(0, 2 * CP), pl.ds(0, LN)] = lax.slice_in_dim(
                q, 0, 2 * CP, axis=0).astype(jnp.int8)
        else:
            buf[pl.ds(0, CP), pl.ds(0, LN)] = lax.slice_in_dim(
                q, 0, CP, axis=0).astype(jnp.int8)
        off = CP if case in ("off_read", "full_r1") else 0
        p = buf[pl.ds(off, CP), pl.ds(0, LN)]
        vm = pk._roll_packed_i8(p, 1, c32 > 0)
        buf[pl.ds(2 * CP, CP), pl.ds(0, LN)] = vm
        if case in ("two_rolls", "full_r1"):
            p0 = buf[pl.ds(0, CP), pl.ds(0, LN)]
            vp = pk._roll_packed_i8(p0, LN - 1, c32 < WD - 1)
            buf[pl.ds(3 * CP, CP), pl.ds(0, LN)] = vp
        o_ref[...] = buf[pl.ds(2 * CP, CP),
                         pl.ds(0, LN)].astype(jnp.float32)

    x = jnp.zeros((4 * CP, LN), jnp.bfloat16)
    fn = pk._precision_safe_pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CP, LN), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4 * CP, LN), jnp.int8)],
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
        tail = [ln for ln in (r.stderr or "").splitlines()
                if "Check failed" in ln]
        print(f"{case:12s} "
              + ("OK  " if r.returncode == 0 else
                 f"FAIL rc={r.returncode}")
              + f" ({dt:.0f}s)" + (f"  {tail[-1][:110]}" if tail else ""),
              flush=True)


if __name__ == "__main__":
    main()
