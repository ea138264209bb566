"""Per-tile K-stacked convolutions for the HNeRV-Boost decode tail (v2).

Round-1 kernels (conv_chw.py / fused_sft.py) issued one MXU dot per OUTPUT
ROW — (C_out, 9*C_in) @ (9*C_in, W) — and measured ~8 us/row against a
~0.5 us MXU floor: at C_out ~ 61 the dot is M-starved and the per-row VPU
prologue (casts, rolls, masks) dominates. This module reformulates the tail
on a FLATTENED channels-major layout x: (C, H*W) where the whole spatial
extent rides the lane axis:

 - the dy (row-offset) taps of a conv become STATIC LANE SLICES at
   dy*W offsets (multiples of 128 — aligned on the (8/16, 128) tiling);
 - the dx (column-offset) taps become single lane rolls of the whole tile
   region (f32 — Mosaic has no bf16 lane roll); rolls wrap across row
   boundaries, and the frame-edge mask zeroes exactly those pixels;
 - all k*k taps stack into ONE (C_out, k*k*C) @ (k*k*C, TH*W) MXU dot per
   TH-row tile: K ~ 549 and N ~ 15360 at 1080p keep the MXU pipeline fed
   (vs N = 1920, M = 61 before).

Masks use FULL-SHAPE (Cpad, n) int32 row/col index planes passed in as
resident VMEM inputs: no vector div/mod in-kernel, and no sublane
broadcasts of lane-sliced 1-row arrays (Mosaic rejects their offset
layouts — learned from the first version of this kernel). Activations with
transcendentals (sin) stay OUTSIDE the kernels: Mosaic's scalarised f32 sin
measured 5-8x slower than XLA's fused elementwise pass (round-1 numbers in
CLAUDE.md). GELU inside the fused TAT block uses the Abramowitz-Stegun erf
(no erf lowering in Mosaic).

Matches /root/reference/model_blocks.py:74-105 (ResBlock_SFT) and the
decoder stage convs of model_hnerv.py:224-251; layout and fusion are
TPU-native design, not ports.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._util import pallas_call as _precision_safe_pallas_call

TH = 8  # output rows per grid step


def _erf(x):
    """Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7); Mosaic lowers exp."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _round_up(v, m):
    return (v + m - 1) // m * m


def _stack_weights(kernel, cpad, copad):
    """flax HWIO (kh, kw, Cin, Cout) -> (Copad, kh*kw*Cpad) bf16 lhs whose
    K order matches the slab order (dy-major, dx-minor, then channel)."""
    kh, kw, cin, cout = kernel.shape
    w = jnp.zeros((copad, kh * kw * cpad), jnp.float32)
    k = kernel.astype(jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            base = (dy * kw + dx) * cpad
            w = w.at[:cout, base:base + cin].set(k[dy, dx].T)
    return w.astype(jnp.bfloat16)


def _index_planes(cpad, n_rows, w):
    """(2, cpad, n_rows*w) int32 full-shape index planes:
    [0] = row-in-region, [1] = col. Host-built; no in-kernel div/mod."""
    r = np.repeat(np.arange(n_rows, dtype=np.int32), w)
    c = np.tile(np.arange(w, dtype=np.int32), n_rows)
    planes = np.stack([r, c])[:, None, :]
    return jnp.asarray(np.broadcast_to(planes, (2, cpad, n_rows * w)).copy())


def _slab(x32, rowp, colp, row_base, h_real, w_real, dy, dx, k, w, n, dt):
    """One tap slab over the first n output lanes.

    x32: (Cpad, L) f32 tile; rowp/colp: (Cpad, n) int32 OUTPUT row/col
    planes. The slab at output lane l is x32[l + dy*w + sh] (sh = dx -
    centre); it is zeroed when the SOURCE pixel (row_base + row + dy,
    col + sh) falls outside the real frame — which also covers the roll
    wrapping across row boundaries and the zero-padded columns."""
    off = dy * w
    v = lax.slice_in_dim(x32, off, off + n, axis=1)
    sh = dx - (k - 1) // 2
    if sh != 0:
        v = pltpu.roll(v, (-sh) % n, axis=1)
    src_row = rowp + (row_base + dy)
    src_col = colp + sh
    ok = ((src_row >= 0) & (src_row < h_real)
          & (src_col >= 0) & (src_col < w_real))
    return jnp.where(ok, v, 0.0).astype(dt)


def _conv_kernel(k, h_real, w_real, w, n_in_rows, x_hbm, rc_ref, w_ref,
                 b_ref, out_ref, xtile, stacked, sem):
    """Generic kxk conv: ONE (Copad, k*k*Cpad) @ (k*k*Cpad, TH*w) dot.
    x_hbm: (Cpad, Hp*w) with (k-1)//2 halo rows pre-padded on top;
    rc_ref: (2, Cpad, TH*w) output row/col planes."""
    cpad = xtile.shape[0]
    nout = out_ref.shape[1]
    dt = out_ref.dtype
    i = pl.program_id(0)
    lanes = n_in_rows * w
    src = pl.multiple_of(i * TH * w, TH * w)
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes)], xtile, sem)
    cp.start()
    cp.wait()

    halo = (k - 1) // 2
    x32 = xtile[...].astype(jnp.float32)
    rowp = rc_ref[0]
    colp = rc_ref[1]
    # source abs row of tap dy at output row r: i*TH + r + dy - halo
    row_base = i * TH - halo

    for dy in range(k):
        for dx in range(k):
            s = _slab(x32, rowp, colp, row_base, h_real, w_real,
                      dy, dx, k, w, nout, dt)
            stacked[pl.ds((dy * k + dx) * cpad, cpad), :] = s
    acc = lax.dot(w_ref[...], stacked[...],
                  preferred_element_type=jnp.float32)
    out_ref[...] = (acc + b_ref[:, :1]).astype(dt)


@functools.partial(jax.jit, static_argnames=("k", "w_real", "interpret"))
def conv_tile(x, kernel, bias, *, k, w_real=None, interpret=False):
    """kxk same-padded conv on channels-major data via per-tile K-stacked
    MXU dots.

    x: (C, H, W) bf16 with W % 128 == 0 (zero-pad ragged widths and pass
    w_real); kernel: flax HWIO (k, k, C, Cout); bias: (Cout,).
    Returns (Cout, H, W) bf16 (garbage in cols >= w_real — crop or mask
    outside; rows are exact).
    """
    c, h, wd = x.shape
    assert wd % 128 == 0, wd
    w_real = wd if w_real is None else w_real
    cpad = _round_up(c, 16)
    copad = _round_up(kernel.shape[3], 16)
    halo = (k - 1) // 2
    grid = pl.cdiv(h, TH)
    n_in_rows = TH + 2 * halo
    hp = grid * TH + 2 * halo
    xf = jnp.pad(x, ((0, cpad - c), (halo, hp - h - halo), (0, 0)))
    xf = xf.reshape(cpad, hp * wd)
    wstack = _stack_weights(kernel, cpad, copad)
    b = jnp.zeros((copad, 1), jnp.float32).at[:kernel.shape[3], 0].set(
        bias.astype(jnp.float32))
    fn = functools.partial(_conv_kernel, k, h, w_real, wd, n_in_rows)
    out = _precision_safe_pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((copad, TH * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((copad, h * wd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((cpad, n_in_rows * wd), x.dtype),
            pltpu.VMEM((k * k * cpad, TH * wd), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(xf, _index_planes(cpad, TH, wd), wstack, b)
    return out.reshape(copad, h, wd)[:kernel.shape[3]]


# --------------------------------------------------------------------- #
# v3: pre-shifted tiles.  The v2 kernels above pay ~10 VPU ops per element
# per tap (cast, roll, two index adds, four compares, and, select) x 9 taps.
# v3 computes the three dx-shifted copies of the tile ONCE (the lane-roll
# wrap across row boundaries lands exactly on the column-masked lanes, and
# out-of-frame rows are zero because the HBM halo is zero-padded), after
# which every tap (dy, dx) is a STATIC lane slice of shifted[dx] at offset
# dy*W.  Two consumption strategies, selected by `mode`:
#   'stack' — copy the 9 slices into the (9*Cpad, TH*W) scratch (1 VPU op
#             per element) and issue ONE K-stacked MXU dot (K ~ 576);
#   'acc'   — no copies at all: 9 accumulated (Copad, Cpad) @ (Cpad, n)
#             dots on the slices (K = Cpad, ~25% MXU util at C=61).
# --------------------------------------------------------------------- #


_SIN_C = (9.9998458677e-01, -1.6663258204e-01, 8.3123829338e-03,
          -1.9316182196e-04, 2.1732100681e-06)


def _sin_poly(x):
    """sin via round-to-nearest 2*pi range reduction + odd deg-9 minimax
    poly (max err 1.7e-5 on [-pi, pi] -- an order below bf16 output
    resolution); ~12 VPU ops vs Mosaic's scalarised native sin (measured
    5-8x slower than XLA's)."""
    k = jnp.round(x * (1.0 / (2.0 * np.pi)))
    r = x - k * 6.2831854820251465
    r = r - k * (-1.7484556000744883e-07)  # two-step: 2*pi = hi + lo
    r2 = r * r
    acc = _SIN_C[4]
    for c in _SIN_C[3::-1]:
        acc = acc * r2 + c
    return r * acc


def _outimg(x):
    """tanh(x)*0.5 + 0.5 == sigmoid(2x) (OutImg head, ops/losses.py)."""
    return 1.0 / (1.0 + jnp.exp(-2.0 * x))


_ACTS = {"none": lambda v: v, "sin": _sin_poly, "outimg": _outimg,
         "gelu": _gelu}


def _preshift(x32, colp, w_real, dt):
    """(x at dx=-1, dx=0, dx=+1) as dt arrays; colp is the col-index plane
    of the SAME region. Shifted copies are exact at every lane whose source
    column is inside the real frame, zero otherwise."""
    xm = jnp.where(colp > 0, pltpu.roll(x32, 1, axis=1), 0.0)
    xp = jnp.where(colp < w_real - 1,
                   pltpu.roll(x32, x32.shape[1] - 1, axis=1), 0.0)
    return xm.astype(dt), x32.astype(dt), xp.astype(dt)


def _roll_packed_i8(p, shift, mask):
    """+-1 lane-roll of an int8 block via its packed int32 view (4 int8
    sublanes per element): the roll touches 1/4 the sublanes and no
    f32->int8 packing happens.  mask: int32-plane predicate at the packed
    shape — True keeps the rolled value, False zeroes (the column-edge
    semantics of the f32 roll path).  Exact: rolls/masks of quantised
    integer values commute with the representation."""
    v = pltpu.roll(pltpu.bitcast(p, jnp.int32), shift, axis=1)
    return pltpu.bitcast(jnp.where(mask, v, jnp.int32(0)), jnp.int8)


def _preshift_into(buf, x32, colp, w_real, dt, cpad, pack=False, wd=None):
    """Write the dx=-1/0/+1 shifted copies into the contiguous (3*Cpad, L)
    scratch `buf` (dx-major row blocks) so that for every row offset dy the
    K=3*Cpad rhs of the conv dot is ONE static slice buf[:, dy*w:dy*w+n].
    Stores in the buffer's own dtype (int8 buffers receive pre-quantised
    integer-valued f32; `dt` kept for call-site compatibility).  pack:
    int8 buffers only — store the unshifted block first and build the
    shifted copies with packed-int32 lane rolls of the stored int8."""
    lanes = x32.shape[1]  # lane-partial: the scratch may be wider
    if pack:
        assert buf.dtype == jnp.int8 and cpad % 4 == 0, (buf.dtype, cpad)
        assert wd is not None, "pack roll mode needs wd (iota mask must "\
            "be built at the packed row count, not sliced — Mosaic abort"
        buf[pl.ds(cpad, cpad), pl.ds(0, lanes)] = x32.astype(jnp.int8)
        x8 = buf[pl.ds(cpad, cpad), pl.ds(0, lanes)]
        from .planar import _col_plane as _cpl
        c32 = _cpl(cpad // 4, lanes, wd)
        buf[pl.ds(0, cpad), pl.ds(0, lanes)] = _roll_packed_i8(
            x8, 1, c32 > 0)
        buf[pl.ds(2 * cpad, cpad), pl.ds(0, lanes)] = _roll_packed_i8(
            x8, lanes - 1, c32 < w_real - 1)
        return
    xm, x0, xp = _preshift(x32, colp, w_real, buf.dtype)
    buf[pl.ds(0, cpad), pl.ds(0, lanes)] = xm
    buf[pl.ds(cpad, cpad), pl.ds(0, lanes)] = x0
    buf[pl.ds(2 * cpad, cpad), pl.ds(0, lanes)] = xp


def _stack_weights_dy(kernel, cpad, copad, dtype=jnp.bfloat16):
    """flax HWIO (k, k, Cin, Cout) -> (k, Copad, k*Cpad) bf16 per-dy lhs
    blocks whose K order matches _preshift_into's dx-major row blocks."""
    kh, kw, cin, cout = kernel.shape
    w = jnp.zeros((kh, copad, kw * cpad), jnp.float32)
    k32 = kernel.astype(jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            w = w.at[dy, :cout, dx * cpad:dx * cpad + cin].set(k32[dy, dx].T)
    return w.astype(dtype)


def _stack_weights_ody(kernel, cpad, copad):
    """flax HWIO (k, k, Cin, Cout) -> (k, k*Copad, Cpad) bf16 per-dy lhs:
    M-stacked dx blocks, so one dot per row offset emits all k dx partial
    sums at once (output-shift formulation)."""
    kh, kw, cin, cout = kernel.shape
    w = jnp.zeros((kh, kw * copad, cpad), jnp.float32)
    k32 = kernel.astype(jnp.float32)
    for dy in range(kh):
        for dx in range(kw):
            w = w.at[dy, dx * copad:dx * copad + cout, :cin].set(k32[dy, dx].T)
    return w.astype(jnp.bfloat16)


def _ody_combine(acc3, colp, w_real, copad):
    """out[:, n] = A0[:, n] + Am[:, n-1] + Ap[:, n+1] with frame-edge
    masking: Am's contribution is invalid at col 0 (source col -1), Ap's at
    col >= w_real-1 (source col >= w_real). Lane-roll wrap across row
    boundaries lands exactly on those masked lanes."""
    n = acc3.shape[1]
    am = lax.slice_in_dim(acc3, 0, copad, axis=0)
    a0 = lax.slice_in_dim(acc3, copad, 2 * copad, axis=0)
    ap = lax.slice_in_dim(acc3, 2 * copad, 3 * copad, axis=0)
    am = jnp.where(colp > 0, pltpu.roll(am, 1, axis=1), 0.0)
    ap = jnp.where(colp < w_real - 1, pltpu.roll(ap, n - 1, axis=1), 0.0)
    return a0 + am + ap


def _conv_kernel_v3(k, h_real, w_real, w, n_in_rows, mode, act, x_hbm,
                    colp_ref, w_ref, b_ref, out_ref, xtile, shbuf, stacked,
                    sem):
    """k x k conv via pre-shifted tiles.

    x_hbm: (Cpad, Hp*w) bf16 with (k-1)//2 zero halo rows pre-padded top and
    bottom — out-of-frame rows need no masking. colp_ref: (Cpad, lanes)
    int32 column plane of the input region. shbuf: (k, Cpad, lanes) dt
    scratch holding the dx-shifted copies. With mode='acc', `stacked` is a
    1-element dummy."""
    cpad = xtile.shape[1]
    nout = out_ref.shape[1]
    dt = out_ref.dtype
    i = pl.program_id(0)
    lanes = n_in_rows * w
    th = nout // w

    def cp(step, slot):
        src = pl.multiple_of(step * th * w, th * w)
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes)],
                                     xtile.at[slot], sem.at[slot])

    slot = lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cp(i, slot).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        cp(i + 1, 1 - slot).start()

    cp(i, slot).wait()

    if mode == "ody":
        # output-shift: no input prologue at all — dots consume the raw
        # bf16 tile slices; dx resolves as two rolls+masks on the f32
        # accumulator. Wins when Copad <= Cpad (the wrapper enforces it).
        copad = w_ref.shape[1] // k
        acc3 = jnp.zeros((k * copad, nout), jnp.float32)
        for dy in range(k):
            acc3 = acc3 + lax.dot(w_ref[dy],
                                  xtile[slot, :, pl.ds(dy * w, nout)],
                                  preferred_element_type=jnp.float32)
        if k == 3:
            colp = colp_ref[pl.ds(0, copad), pl.ds(0, nout)]
            acc = _ody_combine(acc3, colp, w_real, copad)
        else:
            acc = acc3
        out_ref[...] = _ACTS[act](acc + b_ref[:, :1]).astype(dt)
        return

    x32 = xtile[slot].astype(jnp.float32)
    if mode == "dy3":
        # NOTE a software-pipelined variant (pre-shift of tile i+1 under
        # pl.when, dynamic-slot shbuf) measured STRICTLY SLOWER on v5e
        # (6.8 vs 5.1 ms conv51@1080): dynamic-major-index vector
        # stores/loads defeat Mosaic's addressing. Keep the simple form.
        if k == 3:
            _preshift_into(shbuf, x32, colp_ref[...], w_real, dt, cpad)
        else:
            shbuf[pl.ds(0, cpad), :] = x32.astype(dt)
        acc = jnp.zeros((w_ref.shape[1], nout), jnp.float32)
        for dy in range(k):
            acc = acc + lax.dot(w_ref[dy], shbuf[:, pl.ds(dy * w, nout)],
                                preferred_element_type=jnp.float32)
        out_ref[...] = _ACTS[act](acc + b_ref[:, :1]).astype(dt)
        return
    if k == 3:
        xm, x0, xp = _preshift(x32, colp_ref[...], w_real, dt)
        shbuf[0] = xm
        shbuf[1] = x0
        shbuf[2] = xp
    else:  # k == 1
        shbuf[0] = x32.astype(dt)

    if mode == "stack":
        for dy in range(k):
            for dx in range(k):
                sl = lax.slice_in_dim(shbuf[dx], dy * w, dy * w + nout,
                                      axis=1)
                stacked[pl.ds((dy * k + dx) * cpad, cpad), :] = sl
        acc = lax.dot(w_ref[...], stacked[...],
                      preferred_element_type=jnp.float32)
    else:
        acc = jnp.zeros((w_ref.shape[1], nout), jnp.float32)
        for dy in range(k):
            for dx in range(k):
                sl = lax.slice_in_dim(shbuf[dx], dy * w, dy * w + nout,
                                      axis=1)
                acc = acc + lax.dot(
                    w_ref[dy * k + dx], sl,
                    preferred_element_type=jnp.float32)
    out_ref[...] = _ACTS[act](acc + b_ref[:, :1]).astype(dt)


def _conv_kernel_v3x2(k, h_real, w_real, w, th, act, x_hbm, colp_ref,
                      w_ref, b_ref, out_ref, xtile, shA, shB, sem):
    """Dual-stream dy3 conv (see _rsft_kernel_v3x2): two independent
    th-row sub-tile chains per program, one shared (2*th + 2*halo)-row
    DMA region."""
    cpad = xtile.shape[1]
    copad = w_ref.shape[1]
    t2 = 2 * th
    halo = (k - 1) // 2
    nout = th * w
    dt = out_ref.dtype
    i = pl.program_id(0)
    lanes = (t2 + 2 * halo) * w
    sub = (th + 2 * halo) * w

    def cp(step, slot):
        src = pl.multiple_of(step * t2 * w, t2 * w)
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes)],
                                     xtile.at[slot], sem.at[slot])

    slot = lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cp(i, slot).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        cp(i + 1, 1 - slot).start()

    cp(i, slot).wait()

    x32 = xtile[slot].astype(jnp.float32)
    for j, sh in ((0, shA), (1, shB)):
        part = lax.slice_in_dim(x32, j * th * w, j * th * w + sub, axis=1)
        if k == 3:
            _preshift_into(sh, part, colp_ref[...], w_real, dt, cpad)
        else:
            sh[pl.ds(0, cpad), :] = part.astype(dt)

    accA = jnp.zeros((copad, nout), jnp.float32)
    accB = jnp.zeros((copad, nout), jnp.float32)
    for dy in range(k):
        accA = accA + lax.dot(w_ref[dy], shA[:, pl.ds(dy * w, nout)],
                              preferred_element_type=jnp.float32)
        accB = accB + lax.dot(w_ref[dy], shB[:, pl.ds(dy * w, nout)],
                              preferred_element_type=jnp.float32)
    out_ref[:, pl.ds(0, nout)] = _ACTS[act](
        accA + b_ref[:, :1]).astype(dt)
    out_ref[:, pl.ds(nout, nout)] = _ACTS[act](
        accB + b_ref[:, :1]).astype(dt)


@functools.partial(jax.jit,
                   static_argnames=("k", "w_real", "th", "mode", "act",
                                    "interpret"))
def conv_tile_v3(x, kernel, bias, *, k, w_real=None, th=TH, mode="stack",
                 act="none", interpret=False):
    """k x k same-padded conv, pre-shifted-tile formulation (see header).

    x: (C, H, W) bf16, W % 128 == 0 (zero-pad ragged widths, pass w_real);
    kernel: flax HWIO; bias: (Cout,). Returns (Cout, H, W) bf16 with
    garbage in cols >= w_real.
    """
    c, h, wd = x.shape
    assert wd % 128 == 0, wd
    assert k in (1, 3), k
    w_real = wd if w_real is None else w_real
    cpad = _round_up(c, 16)
    copad = _round_up(kernel.shape[3], 16)
    halo = (k - 1) // 2
    rows_per_prog = 2 * th if mode == "dy3x2" else th
    grid = pl.cdiv(h, rows_per_prog)
    n_in_rows = th + 2 * halo
    hp = grid * rows_per_prog + 2 * halo
    xf = jnp.pad(x, ((0, cpad - c), (halo, hp - h - halo), (0, 0)))
    xf = xf.reshape(cpad, hp * wd)
    b = jnp.zeros((copad, 1), jnp.float32).at[:kernel.shape[3], 0].set(
        bias.astype(jnp.float32))

    if mode == "dy3x2":
        wop = _stack_weights_dy(kernel, cpad, copad)
        sh_shape = ((k if k == 3 else 1) * cpad, n_in_rows * wd)
        fn = functools.partial(_conv_kernel_v3x2, k, h, w_real, wd, th,
                               act)
        out = _precision_safe_pallas_call(
            fn,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((copad, 2 * th * wd), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((copad, h * wd), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, cpad, (2 * th + 2 * halo) * wd), x.dtype),
                pltpu.VMEM(sh_shape, x.dtype),
                pltpu.VMEM(sh_shape, x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=interpret,
        )(xf, _index_planes(cpad, n_in_rows, wd)[1], wop, b)
        return out.reshape(copad, h, wd)[:kernel.shape[3]]

    shbuf_shape = (k if k == 3 else 1, cpad, n_in_rows * wd)
    if mode == "stack":
        wop = _stack_weights(kernel, cpad, copad)
        stacked_shape = (k * k * cpad, th * wd)
    elif mode == "dy3":
        wop = _stack_weights_dy(kernel, cpad, copad)
        stacked_shape = (8, 128)  # dummy
        shbuf_shape = (k * cpad, n_in_rows * wd)
    elif mode == "ody":
        assert copad <= cpad, (copad, cpad)  # else the combine loses
        wop = _stack_weights_ody(kernel, cpad, copad)
        stacked_shape = (8, 128)  # dummy
        shbuf_shape = (8, 128)    # dummy (no prologue buffer)
    else:
        # (k*k, Copad, Cpad) per-tap lhs blocks (tap.T = (Cout, Cin))
        kk = kernel.astype(jnp.float32)
        wop = jnp.zeros((k * k, copad, cpad), jnp.float32)
        for dy in range(k):
            for dx in range(k):
                wop = wop.at[dy * k + dx, :kernel.shape[3], :c].set(
                    kk[dy, dx].T)
        wop = wop.astype(jnp.bfloat16)
        stacked_shape = (8, 128)  # dummy
    colp = _index_planes(cpad, n_in_rows, wd)[1]
    fn = functools.partial(_conv_kernel_v3, k, h, w_real, wd, n_in_rows,
                           mode, act)
    out = _precision_safe_pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((copad, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((copad, h * wd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cpad, n_in_rows * wd), x.dtype),
            pltpu.VMEM(shbuf_shape, x.dtype),
            pltpu.VMEM(stacked_shape, x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(xf, colp, wop, b)
    return out.reshape(copad, h, wd)[:kernel.shape[3]]


def _rsft_kernel_v3(h_real, w_real, w, mode, th, x_hbm, rc_ref, w0_ref,
                    b0_ref, w1_ref, b1_ref, sft_ref, out_ref, xtile, shbuf,
                    mrows, stacked, sem):
    """Fused ResBlock_SFT, pre-shifted-tile formulation.

    x_hbm: (Cpad, Hp*w) bf16, 2 zero halo rows top and bottom. rc_ref:
    (2, Cpad, (th+4)*w) FULL-region row/col planes (region row r is abs row
    i*th - 2 + r). SFT0 shifts out-of-frame zeros to h0, so the region is
    re-masked once before pre-shifting (v2 masked per tap instead)."""
    cpad = xtile.shape[1]
    nmid = (th + 2) * w
    nout = th * w
    dt = out_ref.dtype
    i = pl.program_id(0)
    lanes = (th + 4) * w

    def cp(step, slot):
        src = pl.multiple_of(step * th * w, th * w)
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes)],
                                     xtile.at[slot], sem.at[slot])

    slot = lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cp(i, slot).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        cp(i + 1, 1 - slot).start()

    cp(i, slot).wait()

    s0 = sft_ref[0] + 1.0
    h0 = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1 = sft_ref[3]

    x32 = xtile[slot].astype(jnp.float32)
    rowr = rc_ref[0]            # (Cpad, lanes) region row plane
    colr = rc_ref[1]
    colm = lax.slice_in_dim(colr, 0, nmid, axis=1)
    abs_r = rowr + (i * th - 2)
    in_frame = (abs_r >= 0) & (abs_r < h_real) & (colr < w_real)

    a32 = jnp.where(in_frame, x32 * s0 + h0, 0.0)

    if mode == "ody":
        # output-shift variant: one bf16 cast of the SFT'd tile replaces
        # the 3-buffer pre-shift; dx resolves on the accumulators.
        shbuf[...] = a32.astype(dt)

        def conv_ody(buf, wref, n, colp_n):
            acc3 = jnp.zeros((3 * cpad, n), jnp.float32)
            for dy in range(3):
                acc3 = acc3 + lax.dot(wref[dy], buf[:, pl.ds(dy * w, n)],
                                      preferred_element_type=jnp.float32)
            return _ody_combine(acc3, colp_n, w_real, cpad)

        mid = conv_ody(shbuf, w0_ref, nmid, colm)
        mid = _gelu(mid + b0_ref[:, :1]) * s1 + h1
        in_frame_m = lax.slice_in_dim(in_frame, w, w + nmid, axis=1)
        mrows[...] = jnp.where(in_frame_m, mid, 0.0).astype(dt)
        colo = lax.slice_in_dim(colr, 0, nout, axis=1)
        res = conv_ody(mrows, w1_ref, nout, colo)
        resid = lax.slice_in_dim(x32, 2 * w, 2 * w + nout, axis=1)
        out_ref[...] = (res + b1_ref[:, :1] + resid).astype(dt)
        return

    if mode == "dy3":
        # (a software-pipelined variant measured slower — see
        # _conv_kernel_v3)
        _preshift_into(shbuf, a32, colr, w_real, dt, cpad)

        def convdy(buf, wref, n):
            acc = jnp.zeros((cpad, n), jnp.float32)
            for dy in range(3):
                acc = acc + lax.dot(wref[dy], buf[:, pl.ds(dy * w, n)],
                                    preferred_element_type=jnp.float32)
            return acc

        mid = convdy(shbuf, w0_ref, nmid)
        mid = _gelu(mid + b0_ref[:, :1]) * s1 + h1
        in_frame_m = lax.slice_in_dim(in_frame, w, w + nmid, axis=1)
        m32 = jnp.where(in_frame_m, mid, 0.0)
        _preshift_into(mrows, m32, colm, w_real, dt, cpad)
        res = convdy(mrows, w1_ref, nout)
        resid = lax.slice_in_dim(x32, 2 * w, 2 * w + nout, axis=1)
        out_ref[...] = (res + b1_ref[:, :1] + resid).astype(dt)
        return

    am, a0, ap = _preshift(a32, colr, w_real, dt)
    shbuf[0] = am
    shbuf[1] = a0
    shbuf[2] = ap

    def conv9(src_buf, wref, n):
        if mode == "stack":
            for dy in range(3):
                for dx in range(3):
                    sl = lax.slice_in_dim(src_buf[dx], dy * w, dy * w + n,
                                          axis=1)
                    stacked[pl.ds((dy * 3 + dx) * cpad, cpad), :n] = sl
            return lax.dot(wref[...],
                           lax.slice_in_dim(stacked[...], 0, n, axis=1),
                           preferred_element_type=jnp.float32)
        acc = jnp.zeros((cpad, n), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = lax.slice_in_dim(src_buf[dx], dy * w, dy * w + n, axis=1)
                acc = acc + lax.dot(wref[dy * 3 + dx], sl,
                                    preferred_element_type=jnp.float32)
        return acc

    mid = conv9(shbuf, w0_ref, nmid)
    mid = _gelu(mid + b0_ref[:, :1]) * s1 + h1
    # conv1 must see zero outside the frame (bias/shift pollute pad rows)
    in_frame_m = lax.slice_in_dim(in_frame, w, w + nmid, axis=1)
    m32 = jnp.where(in_frame_m, mid, 0.0)
    mm, m0, mp = _preshift(m32, colm, w_real, dt)
    mrows[0] = mm
    mrows[1] = m0
    mrows[2] = mp

    res = conv9(mrows, w1_ref, nout)
    resid = lax.slice_in_dim(x32, 2 * w, 2 * w + nout, axis=1)
    out_ref[...] = (res + b1_ref[:, :1] + resid).astype(dt)


def _rsft_kernel_v3x2(h_real, w_real, w, th, x_hbm, rc_ref, w0_ref, b0_ref,
                      w1_ref, b1_ref, sft_ref, out_ref, xtile, shA, shB, mA,
                      mB, sem):
    """Dual-stream dy3 ResBlock_SFT: each program owns TWO independent
    th-row sub-tiles whose chains are interleaved stage by stage, giving
    the Mosaic scheduler adjacent independent VPU and MXU work (the
    single-chain kernel strictly serialises prologue -> dot -> epilogue
    per tile; measured ~2x off the VPU+MXU sum floor).  Layout/maths are
    identical to mode='dy3'."""
    cpad = xtile.shape[1]
    t2 = 2 * th
    nmid = (th + 2) * w
    nout = th * w
    dt = out_ref.dtype
    i = pl.program_id(0)
    lanes = (t2 + 4) * w

    def cp(step, slot):
        src = pl.multiple_of(step * t2 * w, t2 * w)
        return pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes)],
                                     xtile.at[slot], sem.at[slot])

    slot = lax.rem(i, 2)

    @pl.when(i == 0)
    def _():
        cp(i, slot).start()

    @pl.when(i + 1 < pl.num_programs(0))
    def _():
        cp(i + 1, 1 - slot).start()

    cp(i, slot).wait()

    s0 = sft_ref[0] + 1.0
    h0 = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1 = sft_ref[3]

    x32 = xtile[slot].astype(jnp.float32)
    rowr = rc_ref[0]                      # (Cpad, lanes) region row plane
    colr = rc_ref[1]
    abs_r = rowr + (i * t2 - 2)
    in_frame = (abs_r >= 0) & (abs_r < h_real) & (colr < w_real)
    # SFT0 once over the whole (2*th+4)-row region (the halo overlap of
    # the two streams is computed once)
    a32 = jnp.where(in_frame, x32 * s0 + h0, 0.0)

    def sl(v, j, n, base):
        return lax.slice_in_dim(v, j * th * w + base, j * th * w + base + n,
                                axis=1)

    _preshift_into(shA, sl(a32, 0, (th + 4) * w, 0),
                   sl(colr, 0, (th + 4) * w, 0), w_real, dt, cpad)
    _preshift_into(shB, sl(a32, 1, (th + 4) * w, 0),
                   sl(colr, 1, (th + 4) * w, 0), w_real, dt, cpad)

    def convdy(buf, wref, n):
        acc = jnp.zeros((cpad, n), jnp.float32)
        for dy in range(3):
            acc = acc + lax.dot(wref[dy], buf[:, pl.ds(dy * w, n)],
                                preferred_element_type=jnp.float32)
        return acc

    midA = convdy(shA, w0_ref, nmid)
    midB = convdy(shB, w0_ref, nmid)

    gA = _gelu(midA + b0_ref[:, :1]) * s1 + h1
    gB = _gelu(midB + b0_ref[:, :1]) * s1 + h1
    okA = sl(in_frame, 0, nmid, w)
    okB = sl(in_frame, 1, nmid, w)
    colm = lax.slice_in_dim(colr, 0, nmid, axis=1)
    _preshift_into(mA, jnp.where(okA, gA, 0.0), colm, w_real, dt, cpad)
    _preshift_into(mB, jnp.where(okB, gB, 0.0), colm, w_real, dt, cpad)

    resA = convdy(mA, w1_ref, nout)
    resB = convdy(mB, w1_ref, nout)

    out_ref[:, pl.ds(0, nout)] = (
        resA + b1_ref[:, :1] + sl(x32, 0, nout, 2 * w)).astype(dt)
    out_ref[:, pl.ds(nout, nout)] = (
        resB + b1_ref[:, :1] + sl(x32, 1, nout, 2 * w)).astype(dt)


@functools.partial(jax.jit, static_argnames=("w_real", "th", "mode",
                                              "interpret"))
def resblock_sft_tile_v3(x, w0, b0, w1, b1, scale0, shift0, scale1, shift1,
                         w_real=None, th=TH, mode="stack", interpret=False):
    """Fused TAT residual block, pre-shifted-tile formulation.

    Same contract as resblock_sft_tile; `mode` picks the MXU strategy
    ('stack' = one K-stacked dot per conv, 'acc' = 9 accumulated dots,
    'dy3' = contiguous dx-major pre-shift buffer, one K=3*Cpad dot per row
    offset, zero slab copies)."""
    c, h, wd = x.shape
    assert wd % 128 == 0, wd
    w_real = wd if w_real is None else w_real
    cpad = _round_up(c, 16)
    rows_per_prog = 2 * th if mode == "dy3x2" else th
    grid = pl.cdiv(h, rows_per_prog)
    hp = grid * rows_per_prog + 4
    xf = jnp.pad(x, ((0, cpad - c), (2, hp - h - 2), (0, 0)))
    xf = xf.reshape(cpad, hp * wd)

    def _wop(kk):
        if mode == "stack":
            return _stack_weights(kk, cpad, cpad)
        if mode in ("dy3", "dy3x2"):
            return _stack_weights_dy(kk, cpad, cpad)
        if mode == "ody":
            return _stack_weights_ody(kk, cpad, cpad)
        k32 = kk.astype(jnp.float32)
        wop = jnp.zeros((9, cpad, cpad), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                # lhs of dot(w, x): (Cout, Cin) = tap.T
                wop = wop.at[dy * 3 + dx, :c, :c].set(k32[dy, dx].T)
        return wop.astype(jnp.bfloat16)

    ws0, ws1 = _wop(w0), _wop(w1)
    bp0 = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(
        b0.astype(jnp.float32))
    bp1 = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(
        b1.astype(jnp.float32))
    sft = jnp.zeros((4, cpad), jnp.float32)
    for j, v in enumerate((scale0, shift0, scale1, shift1)):
        sft = sft.at[j, :c].set(v.astype(jnp.float32))
    sft = sft[:, :, None]
    if mode == "dy3x2":
        fn = functools.partial(_rsft_kernel_v3x2, h, w_real, wd, th)
        out = _precision_safe_pallas_call(
            fn,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec((cpad, 2 * th * wd), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((cpad, h * wd), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, cpad, (2 * th + 4) * wd), x.dtype),
                pltpu.VMEM((3 * cpad, (th + 4) * wd), x.dtype),
                pltpu.VMEM((3 * cpad, (th + 4) * wd), x.dtype),
                pltpu.VMEM((3 * cpad, (th + 2) * wd), x.dtype),
                pltpu.VMEM((3 * cpad, (th + 2) * wd), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024),
            interpret=interpret,
        )(xf, _index_planes(cpad, 2 * th + 4, wd), ws0, bp0, ws1, bp1, sft)
        return out.reshape(cpad, h, wd)[:c]

    stacked_shape = ((9 * cpad, (th + 2) * wd) if mode == "stack"
                     else (8, 128))
    if mode == "dy3":
        shbuf_shape = (3 * cpad, (th + 4) * wd)
        mrows_shape = (3 * cpad, (th + 2) * wd)
    elif mode == "ody":
        shbuf_shape = (cpad, (th + 4) * wd)
        mrows_shape = (cpad, (th + 2) * wd)
    else:
        shbuf_shape = (3, cpad, (th + 4) * wd)
        mrows_shape = (3, cpad, (th + 2) * wd)
    fn = functools.partial(_rsft_kernel_v3, h, w_real, wd, mode, th)
    out = _precision_safe_pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((cpad, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cpad, h * wd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, cpad, (th + 4) * wd), x.dtype),
            pltpu.VMEM(shbuf_shape, x.dtype),
            pltpu.VMEM(mrows_shape, x.dtype),
            pltpu.VMEM(stacked_shape, x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(xf, _index_planes(cpad, th + 4, wd), ws0, bp0, ws1, bp1, sft)
    return out.reshape(cpad, h, wd)[:c]


# --------------------------------------------------------------------- #
def _rsft_kernel(h_real, w_real, w, x_hbm, rc_ref, w0_ref, b0_ref, w1_ref,
                 b1_ref, sft_ref, out_ref, xtile, stacked0, mrows, stacked1,
                 sem):
    """Fused ResBlock_SFT: SFT0 -> conv3x3 -> GELU -> SFT1 -> conv3x3 -> +x.

    x_hbm: (Cpad, Hp*w) bf16, 2 halo rows pre-padded on top; the input is
    the ALREADY-ACTIVATED NeRVBlock output (sin runs in XLA), so the
    residual is the tile itself. rc_ref: (2, Cpad, (TH+2)*w) MID-region
    row/col planes (mid row m is abs row i*TH - 1 + m); sft_ref:
    (4, Cpad, 1) f32.
    """
    cpad = xtile.shape[0]
    nmid = (TH + 2) * w
    nout = TH * w
    dt = out_ref.dtype
    i = pl.program_id(0)
    lanes = (TH + 4) * w
    src = pl.multiple_of(i * TH * w, TH * w)
    cp = pltpu.make_async_copy(x_hbm.at[:, pl.ds(src, lanes)], xtile, sem)
    cp.start()
    cp.wait()

    s0 = sft_ref[0] + 1.0
    h0 = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1 = sft_ref[3]

    x32 = xtile[...].astype(jnp.float32)
    rowm = rc_ref[0]            # (Cpad, nmid): mid-region row index
    colm = rc_ref[1]
    rowo = lax.slice_in_dim(rowm, 0, nout, axis=1)
    colo = lax.slice_in_dim(colm, 0, nout, axis=1)

    a32 = x32 * s0 + h0  # SFT0 over the whole tile; slabs mask the edges
    # conv0 output row m: abs i*TH - 1 + m; source of tap dy: + dy - 1,
    # i.e. row_base = i*TH - 2 relative to the mid row plane
    for dy in range(3):
        for dx in range(3):
            s = _slab(a32, rowm, colm, i * TH - 2, h_real, w_real,
                      dy, dx, 3, w, nmid, dt)
            stacked0[pl.ds((dy * 3 + dx) * cpad, cpad), :] = s
    mid = lax.dot(w0_ref[...], stacked0[...],
                  preferred_element_type=jnp.float32)
    mid = _gelu(mid + b0_ref[:, :1]) * s1 + h1
    # conv1 must see zero outside the frame (bias/shift pollute pad rows)
    abs_m = rowm + (i * TH - 1)
    ok_m = (abs_m >= 0) & (abs_m < h_real) & (colm < w_real)
    mrows[...] = jnp.where(ok_m, mid, 0.0).astype(dt)

    m32 = mrows[...].astype(jnp.float32)
    for dy in range(3):
        for dx in range(3):
            s = _slab(m32, rowo, colo, i * TH - 1, h_real, w_real,
                      dy, dx, 3, w, nout, dt)
            stacked1[pl.ds((dy * 3 + dx) * cpad, cpad), :] = s
    res = lax.dot(w1_ref[...], stacked1[...],
                  preferred_element_type=jnp.float32)
    resid = lax.slice_in_dim(x32, 2 * w, 2 * w + nout, axis=1)
    out_ref[...] = (res + b1_ref[:, :1] + resid).astype(dt)


@functools.partial(jax.jit, static_argnames=("w_real", "interpret"))
def resblock_sft_tile(x, w0, b0, w1, b1, scale0, shift0, scale1, shift1,
                      w_real=None, interpret=False):
    """Fused TAT residual block, flattened K-stacked formulation.

    x: (C, H, W) bf16 (already activated), W % 128 == 0; w0/w1: flax HWIO
    (3, 3, C, C); scale/shift: (C,) f32 vectors from the t-embedding MLPs
    (those stay in XLA). Returns (C, H, W) bf16.
    """
    c, h, wd = x.shape
    assert wd % 128 == 0, wd
    w_real = wd if w_real is None else w_real
    cpad = _round_up(c, 16)
    grid = pl.cdiv(h, TH)
    hp = grid * TH + 4
    xf = jnp.pad(x, ((0, cpad - c), (2, hp - h - 2), (0, 0)))
    xf = xf.reshape(cpad, hp * wd)
    ws0 = _stack_weights(w0, cpad, cpad)
    ws1 = _stack_weights(w1, cpad, cpad)
    bp0 = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(
        b0.astype(jnp.float32))
    bp1 = jnp.zeros((cpad, 1), jnp.float32).at[:c, 0].set(
        b1.astype(jnp.float32))
    sft = jnp.zeros((4, cpad), jnp.float32)
    for j, v in enumerate((scale0, shift0, scale1, shift1)):
        sft = sft.at[j, :c].set(v.astype(jnp.float32))
    sft = sft[:, :, None]
    fn = functools.partial(_rsft_kernel, h, w_real, wd)
    out = _precision_safe_pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((cpad, TH * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cpad, h * wd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((cpad, (TH + 4) * wd), x.dtype),
            pltpu.VMEM((9 * cpad, (TH + 2) * wd), x.dtype),
            pltpu.VMEM((cpad, (TH + 2) * wd), x.dtype),
            pltpu.VMEM((9 * cpad, TH * wd), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(xf, _index_planes(cpad, TH + 2, wd), ws0, bp0, ws1, bp1, sft)
    return out.reshape(cpad, h, wd)[:c]
