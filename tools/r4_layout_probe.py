"""int8 K-buffer layout-poisoning test.

Measured: i8 noprolog (dots+epilogues, K-bufs never written) runs the
B+head@540 dot chain at ~6.5 ms (2x the bf16 12.78), but the FULL i8
kernel (identical dots, K-bufs written by the VPU quant build) is a
wash with bf16 (13.87 vs 13.69) while the build itself micro-times
CHEAPER than bf16's.  Hypothesis: any VPU store into an int8 scratch
forces a VPU-friendly layout on the whole buffer, and every MXU dot
read then pays a relayout — int8-specific (bf16 shows no such
interaction: full 13.69 ~= noprolog 12.78 + build 0.9).

Variants (B+head@540 shape, th=8):
  touch  — i8 noprolog + ONE 32x128 zero store into each K-buf before
           the dots.  If this alone reproduces the wash, layout
           poisoning is confirmed (the store is 4 KB; arithmetic
           unchanged).
  dma    — the conv K-buf arrives as an int8 HBM INPUT, DMA'd into the
           scratch (no VPU store ever touches it); dots read the DMA'd
           buffer.  If this keeps the 2x rate, int8 operands are clean
           as long as they are DMA-written -> the fix path is
           quantised inter-stage tensors + source-direct dots.

Run from /root/repo with NO PYTHONPATH, chip free:
  python -c "exec(open('tools/r4_layout_probe.py').read())"
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from boosting_nerv_tpu.ops.pallas.planar import VMEM_LIMIT, _round16
import boosting_nerv_tpu.ops.pallas.planar as pk
from boosting_nerv_tpu.ops.pallas.tile_conv import _gelu, _outimg, _sin_poly

jax.config.update("jax_compilation_cache_dir", "/tmp/bnt_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

rng = np.random.default_rng(0)
F32 = jnp.float32
I8 = jnp.int8
I32 = jnp.int32


def r(*shape, s=0.1):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


def _dots_i8(buf, half_ref, full_ref, sc_ref, cp, cpo, wd, nout):
    accs = []
    for py, u_half in enumerate((-1, 1)):
        r1h = 1 - py
        off_h = (u_half + 1) * wd
        a = lax.dot(
            half_ref[py],
            buf[pl.ds(r1h * 4 * cp, 4 * cp), pl.ds(off_h, nout)],
            preferred_element_type=I32)
        a = a + lax.dot(full_ref[pl.ds(py * 2 * cpo, 2 * cpo)],
                        buf[:, pl.ds(wd, nout)],
                        preferred_element_type=I32)
        accs.append(a.astype(F32) * sc_ref[pl.ds(py * 2 * cpo, 2 * cpo)])
    return accs


def _b_kernel(variant, hc_real, wc_real, wd, cp, th, x_hbm, kq_hbm, hc_ref,
              fc_ref, bc_ref, h0_ref, f0_ref, b0_ref, h1_ref, f1_ref,
              b1_ref, hh_ref, fh_ref, bh_ref, sft_ref, sc_ref, planes_ref,
              out_ref, xtile, cbuf, kb1, mid, kb2, rbuf, sem, qsem):
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
    if variant == "dma":
        # fill kb1 by DMA from an int8 HBM tensor (no VPU store)
        src = pl.multiple_of(i * th * wd, th * wd)
        q_dma = pltpu.make_async_copy(
            kq_hbm.at[:, pl.ds(src, lanes_in)],
            kb1.at[:, pl.ds(0, lanes_in)], qsem)
        q_dma.start()
        q_dma.wait()
    elif variant == "touch":
        kb1[pl.ds(0, 32), pl.ds(0, 128)] = jnp.zeros((32, 128), I8)
        kb2[pl.ds(0, 32), pl.ds(0, 128)] = jnp.zeros((32, 128), I8)

    x32 = xtile[slot].astype(F32)

    c0, c1 = _dots_i8(kb1, hc_ref, fc_ref, sc_ref, cp, cp, wd, n_c)
    cbuf[pl.ds(0, 2 * cp), :] = _sin_poly(
        c0 + bc_ref[pl.ds(0, 2 * cp)]).astype(dt)
    cbuf[pl.ds(2 * cp, 2 * cp), :] = _sin_poly(
        c1 + bc_ref[pl.ds(2 * cp, 2 * cp)]).astype(dt)

    c32 = cbuf[...].astype(F32)
    rowr = planes_ref[0, :, pl.ds(0, n_r)] + (i * th - 1)
    colr = planes_ref[1, :, pl.ds(0, n_r)]
    ok_r = (rowr >= 0) & (rowr < hc_real) & (colr < wc_real)

    s1 = sft_ref[2] + 1.0
    h1v = sft_ref[3]
    a0, a1 = _dots_i8(kb1, h0_ref, f0_ref, sc_ref, cp, cp, wd, nmid)
    m0 = _gelu(a0 + b0_ref[pl.ds(0, 2 * cp)]) * \
        lax.slice_in_dim(s1, 0, 2 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 0, 2 * cp, axis=0)
    m1 = _gelu(a1 + b0_ref[pl.ds(2 * cp, 2 * cp)]) * \
        lax.slice_in_dim(s1, 2 * cp, 4 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 2 * cp, 4 * cp, axis=0)
    mid[pl.ds(0, 2 * cp), :] = m0.astype(dt)
    mid[pl.ds(2 * cp, 2 * cp), :] = m1.astype(dt)
    r0, r1v = _dots_i8(kb2, h1_ref, f1_ref, sc_ref, cp, cp, wd, nout)
    for py, rr in ((0, r0), (1, r1v)):
        resid = lax.slice_in_dim(
            lax.slice_in_dim(c32, py * 2 * cp, (py + 1) * 2 * cp, axis=0),
            2 * wd, 2 * wd + nout, axis=1)
        rbuf[pl.ds(py * 2 * cp, 2 * cp), :] = jnp.where(
            ok_r, rr + b1_ref[pl.ds(py * 2 * cp, 2 * cp)] + resid,
            0.0).astype(dt)

    h0o, h1o = _dots_i8(kb1, hh_ref, fh_ref, sc_ref, cp, 16, wd, th * wd)
    out_ref[pl.ds(0, 32), :] = _outimg(
        h0o + bh_ref[pl.ds(0, 32)]).astype(dt)
    out_ref[pl.ds(32, 32), :] = _outimg(
        h1o + bh_ref[pl.ds(32, 32)]).astype(dt)


@functools.partial(jax.jit, static_argnames=("variant", "c", "wc_real",
                                             "th"))
def b_head_variant(xp, kq, prep, sft, sc, *, variant, c, wc_real, th=8):
    g, hc, wd = xp.shape
    cp = g // 4
    assert cp == _round16(c), (cp, c)
    halo = 4
    grid = pl.cdiv(hc, th)
    hp = grid * th + 2 * halo
    xf = jnp.pad(xp, ((0, 0), (halo, hp - hc - halo), (0, 0)))
    xf = xf.reshape(4 * cp, hp * wd)
    kqf = jnp.pad(kq, ((0, 0), (halo, hp - hc - halo), (0, 0)))
    kqf = kqf.reshape(8 * cp, hp * wd)
    n_r = (th + 2) * wd
    planes = pk._region_planes(2 * cp, th + 2 * halo - 2, wd)
    fn = functools.partial(_b_kernel, variant, hc, wc_real, wd, cp, th)
    out = pl.pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
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
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
    )(xf, kqf, prep["hc"], prep["fc"], prep["bc"], prep["h0"],
      prep["f0"], prep["b0"], prep["h1"], prep["f1"], prep["b1"],
      prep["hh"], prep["fh"], prep["bh"], sft, sc, planes)
    return out.reshape(64, hc, wd)


def timeit(fn, x, *args, tag="", n=30):
    """fn(x, *args) — args are passed through run's jit boundary as real
    arguments (NOT closure consts: a closed-over 400 MB int8 array gets
    embedded in the compile payload and the tunnel rejects it, HTTP
    413)."""
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
        print(f"{tag:34s} FAILED: {type(e).__name__} {e}"[:220], flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x, *args))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:34s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return best / n


def main():
    print("devices:", jax.devices(), flush=True)
    c, hc, wd, wc = 51, 540, 1024, 960
    cp = _round16(c)
    x = r(4 * cp, hc, wd).astype(jnp.bfloat16)
    kq = jnp.asarray(
        rng.integers(-127, 127, (8 * cp, hc, wd)), I8)
    prep = pk.prepare_conv_rsft(
        r(3, 3, c, c), r(c), r(3, 3, c, c), r(c), r(3, 3, c, c), r(c),
        c=c, head_k=r(3, 3, c, 3), head_b=r(3))
    for k in ("hc", "fc", "h0", "f0", "h1", "f1", "hh", "fh"):
        w = prep[k].astype(F32)
        prep[k] = jnp.clip(jnp.round(w * 127.0), -127, 127).astype(I8)
    sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)
    sc = jnp.full((4 * cp, 1), 1 / 127.0, F32)

    for variant in ("none", "touch", "dma"):
        timeit(lambda xx, kqq, v=variant: b_head_variant(
                   xx, kqq, prep, sft, sc, variant=v, c=c, wc_real=wc,
                   th=8),
               x, kq, tag=f"B+head@540 i8 {variant} th=8")

    print("LAYOUT PROBE DONE", flush=True)


main()
