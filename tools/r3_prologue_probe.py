"""Where do the 540-grid v5 stage kernels spend their ~2.5x-above-floor
time?  Variants of stage kernel B (+head) at the UVG-1080p 540-grid shape:

  cur      — production fused_conv_rsft (planar.py)
  sslot    — static-slot xtile read: the production kernel reads
             xtile[slot] with slot = i%2, a dynamic-MAJOR-index vector
             load (the pattern CLAUDE.md flags as slow); this variant
             copies the DMA'd block to a single fixed buffer under
             pl.when(slot==k) with static indices, body unchanged.
  nodots   — full VPU prologue chain, MXU dots removed (accs = kbuf
             slices).  Timing-only: bounds the VPU share.
  noprolog — dots + output stores only, kbuf builds removed (dots read
             uninitialized scratch).  Timing-only: bounds the MXU share.

Run from /root/repo with NO PYTHONPATH:
  python -c "exec(open('tools/r3_prologue_probe.py').read())"

Interpret-mode parity of sslot vs cur runs on CPU first (tiny shape).
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
from boosting_nerv_tpu.ops.pallas.planar import (
    _build_kbuf, _col_plane, _planar_dots, _region_planes, _round16,
    _rsft_chain, VMEM_LIMIT)
from boosting_nerv_tpu.ops.pallas.tile_conv import _outimg, _sin_poly

rng = np.random.default_rng(0)


def _chain_nodots(row0, th, wd, cp, hc_real, wc_real, dt, x32, planes_ref,
                  sft_ref, b0_ref, b1_ref, kb1, mid, kb2, out_write):
    """_rsft_chain with the MXU dots replaced by kbuf slices (VPU-only)."""
    from boosting_nerv_tpu.ops.pallas.planar import _gelu
    lanes = (th + 4) * wd
    nmid = (th + 2) * wd
    nout = th * wd
    s0 = sft_ref[0] + 1.0
    h0v = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1v = sft_ref[3]
    rowp2 = planes_ref[0, :, pl.ds(0, lanes)] + (row0 - 2)
    colp2 = planes_ref[1, :, pl.ds(0, lanes)]
    in_frame = ((rowp2 >= 0) & (rowp2 < hc_real) & (colp2 < wc_real))

    def sft0(r1):
        sl = lax.slice_in_dim(x32, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        sv = lax.slice_in_dim(s0, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        hv = lax.slice_in_dim(h0v, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        return jnp.where(in_frame, sl * sv + hv, 0.0)

    colp = lax.slice_in_dim(colp2, 0, cp, axis=0)
    _build_kbuf(kb1, sft0, colp, wc_real, cp, dt)
    a0 = kb1[pl.ds(0, 2 * cp), pl.ds(wd, nmid)].astype(jnp.float32)
    a1 = kb1[pl.ds(2 * cp, 2 * cp), pl.ds(wd, nmid)].astype(jnp.float32)
    m0 = _gelu(a0 + b0_ref[pl.ds(0, 2 * cp)]) * \
        lax.slice_in_dim(s1, 0, 2 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 0, 2 * cp, axis=0)
    m1 = _gelu(a1 + b0_ref[pl.ds(2 * cp, 2 * cp)]) * \
        lax.slice_in_dim(s1, 2 * cp, 4 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 2 * cp, 4 * cp, axis=0)
    okm = lax.slice_in_dim(in_frame, wd, wd + nmid, axis=1)
    mid[pl.ds(0, 2 * cp), :] = jnp.where(okm, m0, 0.0).astype(dt)
    mid[pl.ds(2 * cp, 2 * cp), :] = jnp.where(okm, m1, 0.0).astype(dt)

    m32 = mid[...].astype(jnp.float32)
    colm = lax.slice_in_dim(
        lax.slice_in_dim(colp2, 0, cp, axis=0), 0, nmid, axis=1)
    _build_kbuf(kb2, m32, colm, wc_real, cp, dt)
    for py in (0, 1):
        r = kb2[pl.ds(py * 2 * cp, 2 * cp), pl.ds(wd, nout)].astype(
            jnp.float32)
        resid = lax.slice_in_dim(
            lax.slice_in_dim(x32, py * 2 * cp, (py + 1) * 2 * cp, axis=0),
            2 * wd, 2 * wd + nout, axis=1)
        out_write(py, (r + b1_ref[pl.ds(py * 2 * cp, 2 * cp)] + resid))


def _b_kernel_var(mode, hc_real, wc_real, wd, cp, th, x_hbm, hc_ref,
                  fc_ref, bc_ref, h0_ref, f0_ref, b0_ref, h1_ref, f1_ref,
                  b1_ref, hh_ref, fh_ref, bh_ref, sft_ref, planes_ref,
                  out_ref, xtile, xcur, cbuf, kb1, mid, kb2, rbuf, sem):
    """Variant copy of planar._conv_rsft_kernel (head=True path only)."""
    dt = out_ref.dtype
    i = pl.program_id(0)
    halo = 4
    lanes_in = (th + 2 * halo) * wd
    n_c = (th + 2 * halo - 2) * wd
    n_r = (th + 2) * wd

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

    if mode == "sslot":
        @pl.when(slot == 0)
        def _():
            xcur[...] = xtile[0]

        @pl.when(slot == 1)
        def _():
            xcur[...] = xtile[1]

        x32 = xcur[...].astype(jnp.float32)
    else:
        x32 = xtile[slot].astype(jnp.float32)

    colp = _col_plane(cp, lanes_in, wd)
    if mode != "noprolog":
        _build_kbuf(kb1, x32, colp, wc_real, cp, dt)
    if mode == "nodots":
        c0 = kb1[pl.ds(0, 2 * cp), pl.ds(wd, n_c)].astype(jnp.float32)
        c1 = kb1[pl.ds(2 * cp, 2 * cp), pl.ds(wd, n_c)].astype(jnp.float32)
    else:
        c0, c1 = _planar_dots(kb1, hc_ref, fc_ref, cp, cp, wd, n_c,
                              merge=False)
    cbuf[pl.ds(0, 2 * cp), :] = _sin_poly(
        c0 + bc_ref[pl.ds(0, 2 * cp)]).astype(dt)
    cbuf[pl.ds(2 * cp, 2 * cp), :] = _sin_poly(
        c1 + bc_ref[pl.ds(2 * cp, 2 * cp)]).astype(dt)

    c32 = cbuf[...].astype(jnp.float32)
    thr = th + 2
    rowr = planes_ref[0, :, pl.ds(0, n_r)] + (i * th - 1)
    colr = planes_ref[1, :, pl.ds(0, n_r)]
    ok_r = (rowr >= 0) & (rowr < hc_real) & (colr < wc_real)

    def out_write_r(py, val):
        rbuf[pl.ds(py * 2 * cp, 2 * cp), :] = jnp.where(
            ok_r, val, 0.0).astype(dt)

    if mode == "nodots":
        _chain_nodots(i * th - 1, thr, wd, cp, hc_real, wc_real, dt, c32,
                      planes_ref, sft_ref, b0_ref, b1_ref, kb1, mid, kb2,
                      out_write_r)
    else:
        _rsft_chain(i * th - 1, thr, wd, cp, hc_real, wc_real, dt, c32,
                    planes_ref, sft_ref, h0_ref, f0_ref, b0_ref, h1_ref,
                    f1_ref, b1_ref, kb1, mid, kb2, out_write_r,
                    merge=False)

    r32 = rbuf[...].astype(jnp.float32)
    colh = _col_plane(cp, n_r, wd)
    if mode != "noprolog":
        _build_kbuf(kb1, r32, colh, wc_real, cp, dt)
    if mode == "nodots":
        h0o = kb1[pl.ds(0, 32), pl.ds(wd, th * wd)].astype(jnp.float32)
        h1o = kb1[pl.ds(32, 32), pl.ds(wd, th * wd)].astype(jnp.float32)
    else:
        h0o, h1o = _planar_dots(kb1, hh_ref, fh_ref, cp, 16, wd, th * wd,
                                merge=False)
    out_ref[pl.ds(0, 32), :] = _outimg(
        h0o + bh_ref[pl.ds(0, 32)]).astype(dt)
    out_ref[pl.ds(32, 32), :] = _outimg(
        h1o + bh_ref[pl.ds(32, 32)]).astype(dt)


@functools.partial(jax.jit, static_argnames=("mode", "c", "wc_real", "th",
                                             "interpret"))
def b_head_var(xp, prep, sft, *, mode, c, wc_real, th=8, interpret=False):
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
    fn = functools.partial(_b_kernel_var, mode, hc, wc_real, wd, cp, th)
    out = pl.pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 14,
        out_specs=pl.BlockSpec((64, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, hc * wd), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4 * cp, (th + 2 * halo) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2 * halo) * wd), xp.dtype)
            if mode == "sslot" else pltpu.VMEM((8, 128), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2 * halo - 2) * wd), xp.dtype),
            pltpu.VMEM((8 * cp, (th + 2 * halo) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2 * halo - 4) * wd), xp.dtype),
            pltpu.VMEM((8 * cp, (th + 2 * halo - 4) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, n_r), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xf, prep["hc"], prep["fc"], prep["bc"], prep["h0"], prep["f0"],
      prep["b0"], prep["h1"], prep["f1"], prep["b1"], prep["hh"],
      prep["fh"], prep["bh"], sft, planes)
    return out.reshape(64, hc, wd)


def r(*shape, s=0.1):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


def make_inputs(c, hc, wd):
    cp = _round16(c)
    x = r(4 * cp, hc, wd).astype(jnp.bfloat16)
    prep = pk.prepare_conv_rsft(
        r(3, 3, c, c), r(c), r(3, 3, c, c), r(c), r(3, 3, c, c), r(c),
        c=c, head_k=r(3, 3, c, 3), head_b=r(3))
    sft = pk.sft_planar_vectors(r(c), r(c), r(c), r(c), cp)
    return x, prep, sft


def parity_cpu():
    with jax.default_device(jax.devices("cpu")[0]):
        x, prep, sft = make_inputs(5, 16, 128)
        ref = pk.fused_conv_rsft(x, prep, sft, c=5, wc_real=100, head=True,
                                 th=8, interpret=True)
        got = b_head_var(x, prep, sft, mode="sslot", c=5, wc_real=100,
                         th=8, interpret=True)
        err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                    - got.astype(jnp.float32))))
        print(f"sslot interpret parity maxerr = {err:.2e}", flush=True)
        assert err == 0.0, err
        got2 = b_head_var(x, prep, sft, mode="cur", c=5, wc_real=100,
                          th=8, interpret=True)
        err2 = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                     - got2.astype(jnp.float32))))
        print(f"cur-copy interpret parity maxerr = {err2:.2e}", flush=True)
        assert err2 == 0.0, err2


def timeit(fn, x, *args, tag="", n=30):
    @jax.jit
    def run(x, *a):
        def body(cr, _):
            out = fn(x + (cr * 1e-8).astype(x.dtype), *a)
            return cr + out.astype(jnp.float32).mean() * 1e-12, None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
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
    x, prep, sft = make_inputs(51, 540, 1024)
    timeit(functools.partial(pk.fused_conv_rsft, prep=prep, sft=sft, c=51,
                             wc_real=960, head=True, th=8),
           x, tag="B+head@540 production")
    for mode in ("cur", "sslot", "nodots", "noprolog"):
        timeit(functools.partial(b_head_var, prep=prep, sft=sft, mode=mode,
                                 c=51, wc_real=960, th=8),
               x, tag=f"B+head@540 {mode}")


if __name__ == "__main__" or True:
    import sys
    if "--tpu" in sys.argv:
        tpu_timings()
    else:
        parity_cpu()
