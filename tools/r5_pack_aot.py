"""Deviceless AOT reproduction of the I8_KBUF_ROLL='pack' Mosaic SIGABRT.

Round-4 finding (tools/r4_i8_build_probe.py): the packed-int32 lane-roll
build strategy for int8 K-buffers is bitwise-exact in a standalone micro
kernel but SIGABRTs the Mosaic compiler inside the FULL fused stage
kernels.  This script compiles a ladder of kernels from micro to full on
the deviceless v5e target so the differential (which ingredient breaks
it) and the real abort message land offline, without chip time.

Run EACH CASE in a subprocess (a SIGABRT kills the process):
  env -u PYTHONPATH JAX_PLATFORMS=cpu TPU_ACCELERATOR_TYPE=v5litepod-4 \
    TPU_WORKER_HOSTNAMES=localhost TPU_WORKER_ID=0 \
    python tools/r5_pack_aot.py <case>
or with no argument to run all cases, each in its own subprocess, and
print a PASS/ABORT table.
"""
import os
import subprocess
import sys
import time

CASES = [
    "b_f32",          # full stage kernel B+head, f32 roll mode (control)
    "b_pack",         # full stage kernel B+head, pack mode (the SIGABRT)
    "b_pack_nohead",  # stage kernel B without the fused head
    "a_f32",          # full stage kernel A, f32 mode (control)
    "a_pack",         # full stage kernel A, pack mode
    "micro_pack",     # standalone micro kernel: build_kbuf(pack)+one dot
    "micro_pack_2x",  # micro with TWO chained pack builds (kb1 -> kb2)
]


def _run_case(case: str) -> None:
    # `python tools/r5_pack_aot.py <case>` puts tools/ (not the repo
    # root) on sys.path; running with no PYTHONPATH (required for the
    # deviceless TPU target) the repo import needs an explicit root
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

    import boosting_nerv_tpu.ops.pallas.planar as pk

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    dev = topo.devices[0]
    shd = SingleDeviceSharding(dev)

    pk.I8_KBUF_ROLL = "pack" if "pack" in case else "f32"

    C, WC, HC, TH = 51, 960, 540, 8
    CP = 64
    WD = 1024
    rng = np.random.default_rng(0)

    def arr(*s):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)

    bounds = {k: jnp.ones((C,), jnp.float32) for k in ("x", "t0", "t1",
                                                       "h")}

    if case.startswith("micro"):
        # standalone: one quantising K-buf build + one int8 dot, the
        # round-4 micro shape that COMPILED and was bitwise-exact.
        import functools

        from jax import lax
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        lanes = (TH + 2) * WD
        nout = TH * WD

        def kern(x_ref, w_ref, o_ref, kb1, kb2):
            x32 = x_ref[...].astype(jnp.float32)
            colp = pk._col_plane(CP, lanes, WD)
            inv = jnp.float32(127.0)

            def get(r1):
                return pk._quant_act(
                    lax.slice_in_dim(x32, r1 * 2 * CP, (r1 + 1) * 2 * CP,
                                     axis=0), inv)

            pk._build_kbuf(kb1, get, colp, WC, CP, jnp.int8, wd=WD)
            a = lax.dot(w_ref[...], kb1[:, pl.ds(WD, nout)],
                        preferred_element_type=jnp.int32)
            if case == "micro_pack_2x":
                mid = (a.astype(jnp.float32) * 1e-4)
                colm = pk._col_plane(CP, nout, WD)

                def get2(r1, _m=mid):
                    return pk._quant_act(
                        lax.slice_in_dim(_m, 0, 2 * CP, axis=0), inv)

                pk._build_kbuf(kb2, get2, colm, WC, CP, jnp.int8, wd=WD)
                a = a + lax.dot(w_ref[...],
                                kb2[:, pl.ds(0, nout)],
                                preferred_element_type=jnp.int32)
            o_ref[...] = a.astype(jnp.float32)

        x = arr(4 * CP, lanes).astype(jnp.bfloat16)
        w = jnp.asarray(
            rng.integers(-127, 127, (2 * CP, 8 * CP)).astype(np.int8))
        fn = pk._precision_safe_pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2 * CP, nout), jnp.float32),
            scratch_shapes=[pltpu.VMEM((8 * CP, lanes), jnp.int8),
                            pltpu.VMEM((8 * CP, nout), jnp.int8)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=pk.VMEM_LIMIT),
        )
        xs = jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shd)
        ws = jax.ShapeDtypeStruct(w.shape, w.dtype, sharding=shd)
        jax.jit(fn).trace(xs, ws).lower().compile()
        print(f"{case}: COMPILE OK", flush=True)
        return

    w0, b0 = arr(3, 3, C, C), arr(C)
    w1, b1 = arr(3, 3, C, C), arr(C)
    sft = pk.sft_planar_vectors(arr(C), arr(C), arr(C), arr(C), CP)

    if case.startswith("a"):
        upk, upb = arr(3, 3, C, 4 * C), arr(4 * C)
        prep = pk.prepare_upconv_rsft_i8(upk, upb, w0, b0, w1, b1,
                                         c_in=C, c=C, bounds=bounds)
        x = arr(C, HC, WD).astype(jnp.bfloat16)

        def f(xv, sftv):
            return pk.fused_upconv_rsft(xv, prep, sftv, c_in=C, c=C,
                                        wc_real=WC, th=TH)
    else:
        head = not case.endswith("nohead")
        ck, cb = arr(3, 3, C, C), arr(C)
        hk, hb = (arr(3, 3, C, 3), arr(3)) if head else (None, None)
        prep = pk.prepare_conv_rsft_i8(ck, cb, w0, b0, w1, b1, c=C,
                                       bounds=bounds, head_k=hk,
                                       head_b=hb)
        x = arr(4 * CP, HC, WD).astype(jnp.bfloat16)

        def f(xv, sftv):
            return pk.fused_conv_rsft(xv, prep, sftv, c=C, wc_real=WC,
                                      head=head, th=TH)

    xs = jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=shd)
    ss = jax.ShapeDtypeStruct(sft.shape, sft.dtype, sharding=shd)
    jax.jit(f).trace(xs, ss).lower().compile()
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
                           cwd="/root/repo", timeout=1800)
        dt = time.perf_counter() - t0
        if r.returncode == 0:
            print(f"{case:16s} OK    ({dt:.0f}s)", flush=True)
        else:
            tail = (r.stderr or "").strip().splitlines()
            sig = f"rc={r.returncode}"
            print(f"{case:16s} FAIL  {sig} ({dt:.0f}s)", flush=True)
            for ln in tail[-25:]:
                print("   |", ln[:200], flush=True)


if __name__ == "__main__":
    main()
