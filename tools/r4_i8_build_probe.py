"""Where does the full W8A8 stage kernel lose the int8 MXU win?

Measured so far (CLAUDE.md, /tmp/r4_prologue.log, tools/r4_int8_probe.py):
  bf16 B+head@540 th=8:  full 13.60, nodots (VPU only) 5.12,
                         noprolog (dots+epilogues) 12.78 ms
  i8   B+head@540 th=8:  noprolog ~6.5 ms (the 2x int8 MXU rate is real),
                         but E2E at th=8 is a WASH vs bf16
=> the i8 K-buffer BUILD (quantise + f32 lane-rolls + f32->int8 packing
stores) must cost ~+6 ms over the bf16 build.  This probe decomposes it:

  kernel iso:  bf16 full th8 | i8 full th8 | i8 full th12 | i8 nodots th8
  build micro: one K-buffer build at the B540 region shape, four ways —
    bf16      f32 rolls, bf16 stores             (production bf16 path)
    i8_f32    quant, f32 rolls, int8 stores      (production i8 path)
    i8_i8roll quant, int8 staging store, pltpu.roll on the int8 value
    i8_pack   quant, int8 staging store, bitcast int32 (4 packed
              sublanes), 32-bit lane roll, bitcast back
  the i8 variants are parity-checked (exact integer equality) against
  i8_f32 on hardware before timing.

Run from /root/repo with NO PYTHONPATH, chip free:
  python -c "exec(open('tools/r4_i8_build_probe.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import boosting_nerv_tpu.ops.pallas.planar as pk
from boosting_nerv_tpu.ops.pallas.planar import (VMEM_LIMIT, _build_kbuf,
                                                 _col_plane, _quant_act,
                                                 _region_planes, _round16)
from boosting_nerv_tpu.ops.pallas.tile_conv import _gelu, _outimg, _sin_poly

rng = np.random.default_rng(0)
F32 = jnp.float32
I8 = jnp.int8
I32 = jnp.int32

jax.config.update("jax_compilation_cache_dir", "/tmp/bnt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def r(*shape, s=0.1):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


# ------------------------------------------------------------------ #
# i8 NODOTS twin of _conv_rsft_kernel (head=True): the full i8 VPU
# prologue chain (quantising K-buf builds) + epilogues, dots replaced
# by K-buf slices.  Timing bound only.
# ------------------------------------------------------------------ #


def _fake_dots(buf, cp, cpo, wd, nout, sc):
    accs = []
    for py in (0, 1):
        a = buf[pl.ds(py * 2 * (cpo if cpo <= cp else cp), 2 * cpo),
                pl.ds(wd, nout)].astype(F32)
        accs.append(a * sc[pl.ds(py * 2 * cpo, 2 * cpo)])
    return accs


def _b_kernel_i8_nodots(hc_real, wc_real, wd, cp, th, x_hbm, bc_ref,
                        b0_ref, b1_ref, bh_ref, sft_ref, planes_ref,
                        invq_ref, scq_ref, out_ref, xtile, cbuf, kb1, mid,
                        kb2, rbuf, sem):
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
    colp = _col_plane(cp, lanes_in, wd)
    invx = invq_ref[0]

    def src_x(r1):
        return _quant_act(
            lax.slice_in_dim(x32, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0),
            lax.slice_in_dim(invx, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0))

    _build_kbuf(kb1, src_x, colp, wc_real, cp, dt)
    c0, c1 = _fake_dots(kb1, cp, cp, wd, n_c, scq_ref[0])
    cbuf[pl.ds(0, 2 * cp), :] = _sin_poly(
        c0 + bc_ref[pl.ds(0, 2 * cp)]).astype(dt)
    cbuf[pl.ds(2 * cp, 2 * cp), :] = _sin_poly(
        c1 + bc_ref[pl.ds(2 * cp, 2 * cp)]).astype(dt)

    c32 = cbuf[...].astype(F32)
    rowr = planes_ref[0, :, pl.ds(0, n_r)] + (i * th - 1)
    colr = planes_ref[1, :, pl.ds(0, n_r)]
    ok_r = (rowr >= 0) & (rowr < hc_real) & (colr < wc_real)

    # TAT: SFT0 -> quantising kb1 build -> fake conv0 -> gelu/SFT1 ->
    # mid -> quantising kb2 build -> fake conv1 -> +resid
    s0 = sft_ref[0] + 1.0
    h0v = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1v = sft_ref[3]
    inv0, inv1 = invq_ref[1], invq_ref[2]
    lanes_r = (thr + 4) * wd
    rowp2 = planes_ref[0, :, pl.ds(0, lanes_r)] + (i * th - 1 - 2)
    colp2 = planes_ref[1, :, pl.ds(0, lanes_r)]
    in_frame = (rowp2 >= 0) & (rowp2 < hc_real) & (colp2 < wc_real)

    def sft0(r1):
        sl = lax.slice_in_dim(c32, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        sl = lax.slice_in_dim(sl, 0, lanes_r, axis=1)
        sv = lax.slice_in_dim(s0, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        hv = lax.slice_in_dim(h0v, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        v = jnp.where(in_frame, sl * sv + hv, 0.0)
        return _quant_act(v, lax.slice_in_dim(
            inv0, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0))

    colpr = lax.slice_in_dim(colp2, 0, cp, axis=0)
    _build_kbuf(kb1, sft0, colpr, wc_real, cp, dt)
    a0, a1 = _fake_dots(kb1, cp, cp, wd, nmid, scq_ref[1])
    m0 = _gelu(a0 + b0_ref[pl.ds(0, 2 * cp)]) * \
        lax.slice_in_dim(s1, 0, 2 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 0, 2 * cp, axis=0)
    m1 = _gelu(a1 + b0_ref[pl.ds(2 * cp, 2 * cp)]) * \
        lax.slice_in_dim(s1, 2 * cp, 4 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 2 * cp, 4 * cp, axis=0)
    okm = lax.slice_in_dim(in_frame, wd, wd + nmid, axis=1)
    mid[pl.ds(0, 2 * cp), :] = jnp.where(okm, m0, 0.0).astype(dt)
    mid[pl.ds(2 * cp, 2 * cp), :] = jnp.where(okm, m1, 0.0).astype(dt)

    def src1(r1):
        g = mid[pl.ds(r1 * 2 * cp, 2 * cp), :].astype(F32)
        return _quant_act(g, lax.slice_in_dim(
            inv1, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0))

    colm = lax.slice_in_dim(colpr, 0, nmid, axis=1)
    _build_kbuf(kb2, src1, colm, wc_real, cp, dt)
    r0, r1v = _fake_dots(kb2, cp, cp, wd, nout, scq_ref[2])
    for py, rr in ((0, r0), (1, r1v)):
        resid = lax.slice_in_dim(
            lax.slice_in_dim(c32, py * 2 * cp, (py + 1) * 2 * cp, axis=0),
            2 * wd, 2 * wd + nout, axis=1)
        rbuf[pl.ds(py * 2 * cp, 2 * cp), :] = jnp.where(
            ok_r, rr + b1_ref[pl.ds(py * 2 * cp, 2 * cp)] + resid,
            0.0).astype(dt)

    # head: quantising kb1 rebuild + fake head dots + OutImg
    colh = _col_plane(cp, n_r, wd)
    invh = invq_ref[3]

    def src_h(r1):
        return _quant_act(
            rbuf[pl.ds(r1 * 2 * cp, 2 * cp), :].astype(F32),
            lax.slice_in_dim(invh, r1 * 2 * cp, (r1 + 1) * 2 * cp,
                             axis=0))

    _build_kbuf(kb1, src_h, colh, wc_real, cp, dt)
    h0o, h1o = _fake_dots(kb1, cp, 16, wd, th * wd, scq_ref[3])
    out_ref[pl.ds(0, 32), :] = _outimg(
        h0o + bh_ref[pl.ds(0, 32)]).astype(dt)
    out_ref[pl.ds(32, 32), :] = _outimg(
        h1o + bh_ref[pl.ds(32, 32)]).astype(dt)


@functools.partial(jax.jit, static_argnames=("c", "wc_real", "th"))
def b_head_i8_nodots(xp, prep, sft, *, c, wc_real, th=8):
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
    fn = functools.partial(_b_kernel_i8_nodots, hc, wc_real, wd, cp, th)
    out = pl.pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
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
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(xf, prep["bc"], prep["b0"], prep["b1"], prep["bh"], sft, planes,
      prep["invq"], prep["scq"])
    return out.reshape(64, hc, wd)


# ------------------------------------------------------------------ #
# K-buffer build microbenchmark: four build strategies, one region.
# Shapes: cp=64 (c=51 rounded), lanes = (th+8)*wd at th=8, wd=1024 —
# the B+head@540 conv-input region.
# ------------------------------------------------------------------ #


def _mk_build_kernel(strategy, wc_real, wd, cp, rep=0):
    def kern(x_ref, inv_ref, out_ref, kbuf):
        # rep-dependent input perturbation defeats cross-rep CSE
        x32 = x_ref[...].astype(F32) + F32(rep) * F32(1e-30)
        lanes = x32.shape[1]
        colp = _col_plane(cp, lanes, wd)
        bt = kbuf.dtype

        if strategy == "bf16":
            _build_kbuf(kbuf, x32, colp, wc_real, cp, bt)
        elif strategy == "i8_f32":
            def getq(r1):
                return _quant_act(
                    lax.slice_in_dim(x32, r1 * 2 * cp, (r1 + 1) * 2 * cp,
                                     axis=0),
                    inv_ref[pl.ds(r1 * 2 * cp, 2 * cp)])
            _build_kbuf(kbuf, getq, colp, wc_real, cp, bt)
        else:
            # quantise once, store int8 staging rows, roll the int8
            # (or the packed-int32 view) instead of the f32 planes
            for r1 in (0, 1):
                g = lax.slice_in_dim(x32, r1 * 2 * cp, (r1 + 1) * 2 * cp,
                                     axis=0)
                gq = _quant_act(g, inv_ref[pl.ds(r1 * 2 * cp, 2 * cp)])
                base = r1 * 4 * cp
                kbuf[pl.ds(base, 2 * cp), pl.ds(0, lanes)] = gq.astype(I8)
                p0 = kbuf[pl.ds(base, cp), pl.ds(0, lanes)]
                p1 = kbuf[pl.ds(base + cp, cp), pl.ds(0, lanes)]
                if strategy == "i8_i8roll":
                    vm = jnp.where(colp > 0, pltpu.roll(p1, 1, axis=1),
                                   jnp.int8(0))
                    vp = jnp.where(colp < wc_real - 1,
                                   pltpu.roll(p0, lanes - 1, axis=1),
                                   jnp.int8(0))
                elif strategy == "i8_pack":
                    colp32 = _col_plane(cp // 4, lanes, wd)
                    pm = pltpu.roll(pltpu.bitcast(p1, I32), 1, axis=1)
                    pp = pltpu.roll(pltpu.bitcast(p0, I32), lanes - 1,
                                    axis=1)
                    vm = pltpu.bitcast(
                        jnp.where(colp32 > 0, pm, jnp.int32(0)), I8)
                    vp = pltpu.bitcast(
                        jnp.where(colp32 < wc_real - 1, pp,
                                  jnp.int32(0)), I8)
                else:
                    raise ValueError(strategy)
                kbuf[pl.ds(base + 2 * cp, cp), pl.ds(0, lanes)] = vm
                kbuf[pl.ds(base + 3 * cp, cp), pl.ds(0, lanes)] = vp
        # tiny readback so the build isn't dead-code eliminated
        out_ref[...] = kbuf[pl.ds(0, 8), pl.ds(0, 128)].astype(F32)

    return kern


def kbuf_build(x, inv, *, strategy, wc_real, wd, reps=8):
    """reps sequential builds inside one kernel call (the per-call
    overhead at ~25us/build would otherwise dominate)."""
    g, lanes = x.shape
    cp = g // 4
    kdt = jnp.bfloat16 if strategy == "bf16" else I8
    kerns = [_mk_build_kernel(strategy, wc_real, wd, cp, rep=k)
             for k in range(reps)]

    def kern_reps(x_ref, inv_ref, out_ref, kbuf):
        for kern in kerns:
            kern(x_ref, inv_ref, out_ref, kbuf)

    return pl.pallas_call(
        kern_reps,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), F32),
        scratch_shapes=[pltpu.VMEM((8 * cp, lanes), kdt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(x, inv)


def kbuf_value(x, inv, *, strategy, wc_real, wd):
    """Full K-buffer contents for parity checks (single build)."""
    g, lanes = x.shape
    cp = g // 4
    kdt = jnp.bfloat16 if strategy == "bf16" else I8
    kern = _mk_build_kernel(strategy, wc_real, wd, cp)

    def kern_out(x_ref, inv_ref, out_ref, dummy_ref, kbuf):
        kern(x_ref, inv_ref, dummy_ref, kbuf)
        out_ref[...] = kbuf[...]

    return pl.pallas_call(
        lambda x_ref, inv_ref, out_ref, dref, kbuf: kern_out(
            x_ref, inv_ref, out_ref, dref, kbuf),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((8 * cp, lanes), kdt),
                   jax.ShapeDtypeStruct((8, 128), F32)],
        scratch_shapes=[pltpu.VMEM((8 * cp, lanes), kdt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(x, inv)[0]


# ------------------------------------------------------------------ #


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
        print(f"{tag:36s} FAILED: {type(e).__name__} {e}"[:220], flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:36s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return best / n


def main():
    print("devices:", jax.devices(), flush=True)
    c, hc, wd, wc = 51, 540, 1024, 960
    cp = _round16(c)

    # ---- build micro: parity first, then timing --------------------- #
    lanes = 16 * wd  # (th + 2*halo) * wd at th=8, halo=4
    xs = r(4 * cp, lanes).astype(jnp.bfloat16)
    inv = jnp.asarray(
        np.tile(rng.uniform(50.0, 200.0, (4 * cp, 1)).astype(np.float32),
                (1, 1)))
    ref = None
    for strat in ("i8_f32", "i8_i8roll", "i8_pack"):
        try:
            v = jax.device_get(kbuf_value(xs, inv, strategy=strat,
                                          wc_real=wc, wd=wd))
            if ref is None:
                ref = v
                print(f"parity {strat}: REF", flush=True)
            else:
                eq = (v == ref).all()
                print(f"parity {strat}: {'EXACT' if eq else 'MISMATCH'}"
                      f" ({(v != ref).sum()} diffs)", flush=True)
        except Exception as e:
            print(f"parity {strat}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
    for strat in ("bf16", "i8_f32", "i8_i8roll", "i8_pack"):
        timeit(functools.partial(kbuf_build, inv=inv, strategy=strat,
                                 wc_real=wc, wd=wd, reps=8),
               xs, tag=f"kbuf build x8 {strat}")

    # ---- kernel iso ------------------------------------------------- #
    x = r(4 * cp, hc, wd).astype(jnp.bfloat16)
    prep_bf = pk.prepare_conv_rsft(
        r(3, 3, c, c), r(c), r(3, 3, c, c), r(c), r(3, 3, c, c), r(c),
        c=c, head_k=r(3, 3, c, 3), head_b=r(3))
    bounds = {k: np.full(c, 0.5, np.float32) for k in ("x", "t0", "t1",
                                                       "h")}
    prep_i8 = pk.prepare_conv_rsft_i8(
        r(3, 3, c, c), r(c), r(3, 3, c, c), r(c), r(3, 3, c, c), r(c),
        c=c, bounds=bounds, head_k=r(3, 3, c, 3), head_b=r(3))
    sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)

    timeit(functools.partial(pk.fused_conv_rsft, prep=prep_bf, sft=sft,
                             c=c, wc_real=wc, head=True, th=8),
           x, tag="B+head@540 bf16 full th=8")
    timeit(functools.partial(pk.fused_conv_rsft, prep=prep_i8, sft=sft,
                             c=c, wc_real=wc, head=True, th=8),
           x, tag="B+head@540 i8 full th=8")
    timeit(functools.partial(pk.fused_conv_rsft, prep=prep_i8, sft=sft,
                             c=c, wc_real=wc, head=True, th=12),
           x, tag="B+head@540 i8 full th=12")
    timeit(functools.partial(b_head_i8_nodots, prep=prep_i8, sft=sft,
                             c=c, wc_real=wc, th=8),
           x, tag="B+head@540 i8 nodots th=8")

    # ---- production kernel with the pack-roll build ------------------ #
    ref_out = jax.device_get(pk.fused_conv_rsft(
        x, prep_i8, sft, c=c, wc_real=wc, head=True, th=8))
    pk.I8_KBUF_ROLL = "pack"
    jax.clear_caches()
    try:
        out_p = jax.device_get(pk.fused_conv_rsft(
            x, prep_i8, sft, c=c, wc_real=wc, head=True, th=8))
        eq = np.array_equal(
            np.asarray(out_p, np.float32), np.asarray(ref_out, np.float32))
        print(f"pack-roll production parity: "
              f"{'EXACT' if eq else 'MISMATCH'}", flush=True)
        for th in (8, 12, 16):
            timeit(functools.partial(pk.fused_conv_rsft, prep=prep_i8,
                                     sft=sft, c=c, wc_real=wc, head=True,
                                     th=th),
                   x, tag=f"B+head@540 i8 PACK full th={th}")
    except Exception as e:
        print(f"pack-roll production: FAIL {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)
    finally:
        pk.I8_KBUF_ROLL = "f32"
        jax.clear_caches()

    print("I8 BUILD PROBE DONE", flush=True)


main()
