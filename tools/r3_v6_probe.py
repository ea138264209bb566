"""v6 decode-kernel experiment: express the dx=+-1 conv taps as
UNALIGNED (+-1 lane) static windows on the dot rhs instead of VPU-built
rolled/masked K-buffer planes.

Rationale (round-3 measured): the 540-grid stage kernels sit ~2.5x above
their padded-dot floor because the _build_kbuf VPU prologue (f32 cast +
2 rolls + 2 masks + 8*Cp stores per conv) serializes with the MXU, and
chunked overlap (nck) does not hide it (tools/r3_nck_probe.py).  In the
subpixel-planar layout the vm/vp planes are exactly the v=+-1
coarse-column neighbours; because a dot's N dimension is lanes
(output lane n reads only rhs lane n), a lane window at offset
(u+1)*wd + v on the UNSHIFTED source reproduces the masked-roll
semantics for free — provided pad lanes (col >= wc_real) are ZERO, so
row-boundary crossings read zero exactly where the border masks would
have zeroed.  Cost: taps split over 3 windows => ~1.5x MXU K-traffic
(half: 3x K=2Cp vs 1x K=4Cp; full: 3x K=4Cp vs 1x K=8Cp); gain: the
whole K-buffer build disappears (dots read the DMA'd bf16 tile
directly, no f32 cast, no rolls, no kbuf VMEM).

The decisive unknown is Mosaic's cost for a +-1-lane static window on a
dot operand (it must insert a lane rotate / relayout).  This probe
measures it head-to-head vs the production conv_planar at the
B@540-stage single-conv shape.

CPU parity (interpret mode, tiny shapes):
  env -u PYTHONPATH JAX_PLATFORMS=cpu python -c \
      "exec(open('tools/r3_v6_probe.py').read())"
TPU timing (owns the chip):
  python -c "exec(open('tools/r3_v6_probe.py').read())" --tpu
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
from boosting_nerv_tpu.ops.pallas.planar import _round16, VMEM_LIMIT

ON_TPU = "--tpu" in sys.argv


def planar_conv_mats_v6(kernel, cp, cpo):
    """HWIO 3x3 fine-grid kernel -> v6 windowed-dot mats.

    half: (2, 3, 2*Cpo, 2*Cp) [py, v+1] for the u=u_half taps (K covers
    the r1h group's r2*cp + c); full: (3, 4*Cpo, 4*Cp) [v+1], u=0 taps
    merged across py (K = r1*2cp + r2*cp + c = the raw planar sublane
    order, so the dots read the source tile directly)."""
    kh, kw, c, co = kernel.shape
    assert kh == 3 and kw == 3
    k = kernel.astype(jnp.float32)
    half = jnp.zeros((2, 3, 2 * cpo, 2 * cp), jnp.float32)
    full = jnp.zeros((3, 4 * cpo, 4 * cp), jnp.float32)
    for py in (0, 1):
        for ky in (-1, 0, 1):
            u, r1 = divmod(py + ky, 2)
            for px in (0, 1):
                for kx in (-1, 0, 1):
                    v, r2 = divmod(px + kx, 2)
                    tap = k[ky + 1, kx + 1].T  # (Co, C)
                    row0 = py * 2 * cpo + px * cpo
                    col0 = r1 * 2 * cp + r2 * cp
                    if u == 0:
                        full = full.at[
                            v + 1, row0:row0 + co,
                            col0:col0 + c].add(tap)
                    else:
                        half = half.at[
                            py, v + 1, px * cpo:px * cpo + co,
                            r2 * cp:r2 * cp + c].add(tap)
    return half.astype(jnp.bfloat16), full.astype(jnp.bfloat16)


def _conv_v6_kernel(wd, n_in_rows, cp, cpo, act, x_hbm, half_ref,
                    full_ref, b_ref, out_ref, xtile, sem):
    nout = out_ref.shape[1]
    dt = out_ref.dtype
    i = pl.program_id(0)
    th = nout // wd
    lanes = n_in_rows * wd + 256  # +128-lane halo pad each side

    def cp_dma(step, slot):
        src = pl.multiple_of(step * th * wd, th * wd)
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes)],
                                     xtile.at[slot], sem.at[slot])

    slot = lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cp_dma(i, slot).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        cp_dma(i + 1, 1 - slot).start()

    cp_dma(i, slot).wait()

    f = pk._ACTS[act]

    def body(si):
        # si is a python int -> every index below is static (the
        # dynamic-major-index read path is the known Mosaic slow path)
        for py, u_half in ((0, -1), (1, 1)):
            r1h = 1 - py
            acc = None
            for v in (-1, 0, 1):
                off_h = 128 + (u_half + 1) * wd + v
                a = lax.dot(half_ref[py, v + 1],
                            xtile[si, pl.ds(r1h * 2 * cp, 2 * cp),
                                  pl.ds(off_h, nout)],
                            preferred_element_type=jnp.float32)
                a = a + lax.dot(
                    full_ref[v + 1, pl.ds(py * 2 * cpo, 2 * cpo)],
                    xtile[si, :, pl.ds(128 + wd + v, nout)],
                    preferred_element_type=jnp.float32)
                acc = a if acc is None else acc + a
            out_ref[pl.ds(py * 2 * cpo, 2 * cpo), :] = f(
                acc + b_ref[pl.ds(py * 2 * cpo, 2 * cpo)]).astype(dt)

    @pl.when(slot == 0)
    def _():
        body(0)

    @pl.when(slot == 1)
    def _():
        body(1)


@functools.partial(jax.jit, static_argnames=("c_in", "c_out", "wc_real",
                                             "act", "th", "interpret"))
def conv_planar_v6(xp, kernel, bias, *, c_in, c_out, wc_real, act="none",
                   th=8, interpret=False):
    """v6 windowed-dot 3x3 planar conv.  REQUIRES pad lanes
    (col >= wc_real) to be exactly zero (they feed the border taps)."""
    g, hc, wd = xp.shape
    assert wd & (wd - 1) == 0 and wd >= 128, wd
    # the +-1 lane windows cross coarse-row boundaries; >=1 zero pad
    # lane (col >= wc_real) is what makes that read the border zero
    assert wc_real < wd, (wc_real, wd)
    cp = g // 4
    cpo = _round16(c_out)
    grid = pl.cdiv(hc, th)
    n_in_rows = th + 2
    hp = grid * th + 2
    xf = jnp.pad(xp, ((0, 0), (1, hp - hc - 1), (0, 0)))
    xf = xf.reshape(4 * cp, hp * wd)
    xf = jnp.pad(xf, ((0, 0), (128, 128)))
    half, full = planar_conv_mats_v6(kernel, cp, cpo)
    b = pk._planar_bias(bias, cpo)
    fn = functools.partial(_conv_v6_kernel, wd, n_in_rows, cp, cpo, act)
    out = pl.pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((4 * cpo, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * cpo, hc * wd), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4 * cp, n_in_rows * wd + 256), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xf, half, full, b)
    return out.reshape(4 * cpo, hc, wd)


rng = np.random.default_rng(0)


def r(*shape, s=0.1):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


def zero_pads(xp, wc_real):
    g, hc, wd = xp.shape
    col = jnp.arange(wd)[None, None, :]
    return jnp.where(col < wc_real, xp, 0.0).astype(xp.dtype)


def parity(c, hc, wd, wc_real, th):
    cp = _round16(c)
    xp = zero_pads(r(4 * cp, hc, wd).astype(jnp.bfloat16), wc_real)
    k, b = r(3, 3, c, c), r(c)
    ref = pk.conv_planar(xp, k, b, c_in=c, c_out=c, wc_real=wc_real,
                         th=th, interpret=True)
    got = conv_planar_v6(xp, k, b, c_in=c, c_out=c, wc_real=wc_real,
                         th=th, interpret=True)
    # compare real cols only (pad-lane garbage differs by design)
    m = np.asarray(jnp.arange(wd) < wc_real)
    d = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32))
    err = d[:, :, m].max()
    print(f"parity c={c} hc={hc} wd={wd} wc={wc_real} th={th}: "
          f"maxerr={err:.2e}", flush=True)
    assert err < 3e-2 * float(np.abs(np.asarray(ref)).max() + 1), err


def timeit(fn, x, tag="", n=30):
    @jax.jit
    def run(x):
        def body(cr, _):
            out = fn(x + (cr * 1e-8).astype(x.dtype))
            return cr + out.astype(jnp.float32).mean() * 1e-12, None
        acc, _ = lax.scan(body, jnp.float32(0.0), jnp.arange(n))
        return acc

    try:
        t0 = time.perf_counter()
        float(run(x))
        comp = time.perf_counter() - t0
    except Exception as e:
        print(f"{tag:36s} FAILED: {type(e).__name__} {e}"[:180], flush=True)
        return None
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:36s} {best/n*1e3:7.2f} ms  (compile {comp:.0f}s)",
          flush=True)
    return best / n


if not ON_TPU:
    parity(5, 6, 128, 100, 4)
    parity(5, 7, 128, 120, 3)   # grid remainder rows
    parity(12, 8, 256, 200, 4)
    print("PARITY OK", flush=True)
else:
    print("devices:", jax.devices(), flush=True)
    c = 51
    cp = _round16(c)
    xp = zero_pads(r(4 * cp, 540, 1024).astype(jnp.bfloat16), 960)
    k, b = r(3, 3, c, c), r(c)
    timeit(functools.partial(
        pk.conv_planar, kernel=k, bias=b, c_in=c, c_out=c,
        wc_real=960, th=8), xp, tag="conv_planar(prod) @540 th=8")
    for th in (8, 12, 16):
        timeit(functools.partial(
            conv_planar_v6, kernel=k, bias=b, c_in=c, c_out=c,
            wc_real=960, th=th), xp, tag=f"conv_v6(windowed) @540 th={th}")
