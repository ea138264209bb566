"""Is int8 MXU the decode lever?  (round 4, VERDICT task 2a)

The round-4 nodots/noprolog split (/tmp/r4_prologue.log) shows the
B+head@540 stage kernel is DOT-bound: noprolog (dots + epilogues on a
garbage K-buf) is 12.78 ms of the 13.51 ms total.  v5e's MXU runs int8
at 2x the bf16 rate and an int8 K-buffer halves the VMEM traffic, so an
int8 dot path bounds the achievable win.  This probe builds an int8
`noprolog` twin of the stage kernel — int8 K-buf scratch (uninitialized,
timing only), int8 weight mats, int32-accumulate dots, per-output-row
f32 dequant scale folded into the existing bias epilogue — and compares.

Deviceless compile check (no TPU needed):
  env -u PYTHONPATH JAX_PLATFORMS=cpu TPU_ACCELERATOR_TYPE=v5litepod-4 \
    TPU_WORKER_HOSTNAMES=localhost TPU_WORKER_ID=0 \
    python -c "exec(open('tools/r4_int8_probe.py').read())"

Hardware timings (run from /root/repo with NO PYTHONPATH, chip free):
  python -c "exec(open('tools/r4_int8_probe.py').read())" --tpu
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import boosting_nerv_tpu.ops.pallas.planar as pk
from boosting_nerv_tpu.ops.pallas.planar import (_col_plane, _region_planes,
                                                 _round16, VMEM_LIMIT)
from boosting_nerv_tpu.ops.pallas.tile_conv import (_gelu, _outimg,
                                                    _sin_poly)

rng = np.random.default_rng(0)
I8 = jnp.int8
I32 = jnp.int32
F32 = jnp.float32


def _dots_i8(buf, half_ref, full_ref, sc_ref, cp, cpo, wd, nout,
             merge=True):
    """_planar_dots with int8 operands + int32 accumulate; sc_ref is the
    (4*Cpo, 1) f32 per-output-row dequant scale."""
    if merge:
        af = lax.dot(full_ref[...], buf[:, pl.ds(wd, nout)],
                     preferred_element_type=I32)
    accs = []
    for py, u_half in enumerate((-1, 1)):
        r1h = 1 - py
        off_h = (u_half + 1) * wd
        a = lax.dot(
            half_ref[py],
            buf[pl.ds(r1h * 4 * cp, 4 * cp), pl.ds(off_h, nout)],
            preferred_element_type=I32)
        if merge:
            a = a + lax.slice_in_dim(af, py * 2 * cpo, (py + 1) * 2 * cpo,
                                     axis=0)
        else:
            a = a + lax.dot(full_ref[pl.ds(py * 2 * cpo, 2 * cpo)],
                            buf[:, pl.ds(wd, nout)],
                            preferred_element_type=I32)
        accs.append(a.astype(F32)
                    * sc_ref[pl.ds(py * 2 * cpo, 2 * cpo)])
    return accs


def _b_kernel_i8_noprolog(hc_real, wc_real, wd, cp, th, x_hbm, hc_ref,
                          fc_ref, bc_ref, h0_ref, f0_ref, b0_ref, h1_ref,
                          f1_ref, b1_ref, hh_ref, fh_ref, bh_ref, sft_ref,
                          sc_ref, planes_ref, out_ref, xtile, cbuf, kb1,
                          mid, kb2, rbuf, sem):
    """int8 twin of the r3_prologue_probe 'noprolog' variant: the full
    B+head chain's dots + epilogues, K-bufs left uninitialized (timing
    bound only — the real int8 prologue adds a mul+clip+round+convert
    per plane, bounded by the bf16 nodots number)."""
    dt = out_ref.dtype
    i = pl.program_id(0)
    halo = 4
    lanes_in = (th + 2 * halo) * wd
    n_c = (th + 2 * halo - 2) * wd
    n_r = (th + 2) * wd
    thr = th + 2
    nmid = (thr + 2) * wd
    nout = thr * wd

    def cp_dma(step, slot):
        src = pl.multiple_of(step * th * wd, th * wd)
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes_in)],
                                     xtile.at[slot], sem.at[slot])

    slot = lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cp_dma(i, slot).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        cp_dma(i + 1, 1 - slot).start()

    cp_dma(i, slot).wait()
    x32 = xtile[slot].astype(F32)

    # pre conv + sin
    c0, c1 = _dots_i8(kb1, hc_ref, fc_ref, sc_ref, cp, cp, wd, n_c,
                      merge=False)
    cbuf[pl.ds(0, 2 * cp), :] = _sin_poly(
        c0 + bc_ref[pl.ds(0, 2 * cp)]).astype(dt)
    cbuf[pl.ds(2 * cp, 2 * cp), :] = _sin_poly(
        c1 + bc_ref[pl.ds(2 * cp, 2 * cp)]).astype(dt)

    c32 = cbuf[...].astype(F32)
    rowr = planes_ref[0, :, pl.ds(0, n_r)] + (i * th - 1)
    colr = planes_ref[1, :, pl.ds(0, n_r)]
    ok_r = (rowr >= 0) & (rowr < hc_real) & (colr < wc_real)

    # TAT chain (conv0 -> gelu/SFT -> conv1 -> +resid), int8 dots
    s1 = sft_ref[2] + 1.0
    h1v = sft_ref[3]
    a0, a1 = _dots_i8(kb1, h0_ref, f0_ref, sc_ref, cp, cp, wd, nmid,
                      merge=False)
    m0 = _gelu(a0 + b0_ref[pl.ds(0, 2 * cp)]) * \
        lax.slice_in_dim(s1, 0, 2 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 0, 2 * cp, axis=0)
    m1 = _gelu(a1 + b0_ref[pl.ds(2 * cp, 2 * cp)]) * \
        lax.slice_in_dim(s1, 2 * cp, 4 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 2 * cp, 4 * cp, axis=0)
    mid[pl.ds(0, 2 * cp), :] = m0.astype(dt)
    mid[pl.ds(2 * cp, 2 * cp), :] = m1.astype(dt)
    r0, r1 = _dots_i8(kb2, h1_ref, f1_ref, sc_ref, cp, cp, wd, nout,
                      merge=False)
    for py, rr in ((0, r0), (1, r1)):
        resid = lax.slice_in_dim(
            lax.slice_in_dim(c32, py * 2 * cp, (py + 1) * 2 * cp, axis=0),
            2 * wd, 2 * wd + nout, axis=1)
        rbuf[pl.ds(py * 2 * cp, 2 * cp), :] = jnp.where(
            ok_r, rr + b1_ref[pl.ds(py * 2 * cp, 2 * cp)] + resid,
            0.0).astype(dt)

    # head + OutImg
    h0o, h1o = _dots_i8(kb1, hh_ref, fh_ref, sc_ref, cp, 16, wd, th * wd,
                        merge=False)
    out_ref[pl.ds(0, 32), :] = _outimg(
        h0o + bh_ref[pl.ds(0, 32)]).astype(dt)
    out_ref[pl.ds(32, 32), :] = _outimg(
        h1o + bh_ref[pl.ds(32, 32)]).astype(dt)


@functools.partial(jax.jit, static_argnames=("c", "wc_real", "th",
                                             "interpret"))
def b_head_i8_noprolog(xp, prep, sft, sc, *, c, wc_real, th=8,
                       interpret=False):
    g, hc, wd = xp.shape
    cp = g // 4
    assert cp == _round16(c), (cp, c)
    halo = 4
    grid = pl.cdiv(hc, th)
    hp = grid * th + 2 * halo
    xf = jnp.pad(xp, ((0, 0), (halo, hp - hc - halo), (0, 0)))
    xf = xf.reshape(4 * cp, hp * wd)
    n_r = (th + 2) * wd
    planes = _region_planes(2 * cp, th + 2 * halo - 2, wd)
    fn = functools.partial(_b_kernel_i8_noprolog, hc, wc_real, wd, cp, th)
    out = pl.pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 15,
        out_specs=pl.BlockSpec((64, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, hc * wd), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4 * cp, (th + 2 * halo) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2 * halo - 2) * wd), xp.dtype),
            pltpu.VMEM((8 * cp, (th + 2 * halo) * wd), I8),
            pltpu.VMEM((4 * cp, (th + 2 * halo - 4) * wd), xp.dtype),
            pltpu.VMEM((8 * cp, (th + 2 * halo - 4) * wd), I8),
            pltpu.VMEM((4 * cp, n_r), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xf, prep["hc"], prep["fc"], prep["bc"], prep["h0"], prep["f0"],
      prep["b0"], prep["h1"], prep["f1"], prep["b1"], prep["hh"],
      prep["fh"], prep["bh"], sft, sc, planes)
    return out.reshape(64, hc, wd)


# ------------------------------------------------------------------ #
# int8 K-buf build feasibility: quantize (mul + clip + round) in f32,
# roll in f32, store int8 with pl.ds partial writes.
# ------------------------------------------------------------------ #


def _kbuf_i8_kernel(wc_real, wd, cp, x_ref, inv_ref, o_ref, kbuf):
    x32 = x_ref[...].astype(F32)
    lanes = x32.shape[1]
    colp = _col_plane(cp, lanes, wd)
    for r1 in (0, 1):
        g = lax.slice_in_dim(x32, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        gq = jnp.clip(
            jnp.round(g * inv_ref[pl.ds(r1 * 2 * cp, 2 * cp)]),
            -127.0, 127.0)
        base = r1 * 4 * cp
        kbuf[pl.ds(base, 2 * cp), pl.ds(0, lanes)] = gq.astype(I8)
        p0 = lax.slice_in_dim(gq, 0, cp, axis=0)
        p1 = lax.slice_in_dim(gq, cp, 2 * cp, axis=0)
        vm = jnp.where(colp > 0, pltpu.roll(p1, 1, axis=1), 0.0)
        vp = jnp.where(colp < wc_real - 1,
                       pltpu.roll(p0, lanes - 1, axis=1), 0.0)
        kbuf[pl.ds(base + 2 * cp, cp), pl.ds(0, lanes)] = vm.astype(I8)
        kbuf[pl.ds(base + 3 * cp, cp), pl.ds(0, lanes)] = vp.astype(I8)
    o_ref[...] = kbuf[...].astype(jnp.bfloat16)


def kbuf_i8_build(x, inv, *, wc_real, interpret=False):
    g, lanes = x.shape
    cp = g // 4
    wd = 1024
    return pl.pallas_call(
        functools.partial(_kbuf_i8_kernel, wc_real, wd, cp),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * cp, lanes), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((8 * cp, lanes), I8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(x, inv)


def r(*shape, s=0.1):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


def make_inputs(c, hc, wd, i8=False):
    cp = _round16(c)
    x = r(4 * cp, hc, wd).astype(jnp.bfloat16)
    prep = pk.prepare_conv_rsft(
        r(3, 3, c, c), r(c), r(3, 3, c, c), r(c), r(3, 3, c, c), r(c),
        c=c, head_k=r(3, 3, c, 3), head_b=r(3))
    if i8:
        for k in ("hc", "fc", "h0", "f0", "h1", "f1", "hh", "fh"):
            w = prep[k].astype(F32)
            prep[k] = jnp.clip(jnp.round(w * 127.0), -127, 127).astype(I8)
    sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)
    sc = jnp.full((4 * cp, 1), 1 / 127.0, F32)
    return x, prep, sft, sc


def aot_check():
    import os
    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding
    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    dev = topo.devices[0]
    shd = SingleDeviceSharding(dev)
    print("deviceless target:", dev, flush=True)

    x, prep, sft, sc = make_inputs(51, 540, 1024, i8=True)

    def spec(a):
        return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=shd)

    for tag, th in (("i8 noprolog th=8", 8), ("i8 noprolog th=12", 12),
                    ("i8 noprolog th=16", 16)):
        t0 = time.perf_counter()
        try:
            fn = functools.partial(b_head_i8_noprolog, c=51, wc_real=960,
                                   th=th)
            jax.jit(fn).trace(
                spec(x), jax.tree.map(spec, prep), spec(sft),
                spec(sc)).lower().compile()
            print(f"{tag:24s} COMPILE OK ({time.perf_counter()-t0:.0f}s)",
                  flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            print(f"{tag:24s} FAIL {type(e).__name__}: {msg}", flush=True)

    xk = r(4 * 64, 12 * 1024).astype(jnp.bfloat16)
    inv = jnp.full((4 * 64, 1), 127.0, F32)
    t0 = time.perf_counter()
    try:
        fn = functools.partial(kbuf_i8_build, wc_real=960)
        jax.jit(fn).trace(spec(xk), spec(inv)).lower().compile()
        print(f"{'i8 kbuf build':24s} COMPILE OK "
              f"({time.perf_counter()-t0:.0f}s)", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{'i8 kbuf build':24s} FAIL {type(e).__name__}: {msg}",
              flush=True)


def timeit(fn, x, *args, tag="", n=30):
    @jax.jit
    def run(x, *a):
        def body(cr, _):
            out = fn(x + (cr * 1e-8).astype(x.dtype), *a)
            return cr + out.astype(F32).mean() * 1e-12, None
        acc, _ = lax.scan(body, F32(0.0), jnp.arange(n))
        return acc

    try:
        t0 = time.perf_counter()
        float(run(x, *args))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{tag:40s} FAILED: {type(e).__name__} {e}"[:200], flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:40s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return best / n


def tpu_timings():
    print("devices:", jax.devices(), flush=True)
    x, prep, sft, sc = make_inputs(51, 540, 1024, i8=True)
    for th in (8, 12, 16):
        timeit(functools.partial(b_head_i8_noprolog, prep=prep, sft=sft,
                                 sc=sc, c=51, wc_real=960, th=th),
               x, tag=f"B+head@540 i8 noprolog th={th}")


if "--tpu" in sys.argv:
    tpu_timings()
else:
    aot_check()
