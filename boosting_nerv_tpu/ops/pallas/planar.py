"""Subpixel-planar (coarse-grid) kernels for the stride-2 decode tail.

The v3 kernels (tile_conv.py) run each 3x3 conv on the FINE grid the
reference materialises after PixelShuffle (/root/reference/
model_blocks.py:196-207): at 1080p that means 2048-lane rolls, M=64 MXU
dots, and an XLA depth-to-space relayout between every upconv and its TAT
block.  This module instead keeps every stride-2 stage's tensor in
SUBPIXEL-PLANAR layout on the COARSE grid:

    fine (C, 2H, 2W)  <->  planar (4*Cp, H, W),   Cp = round_up(C, 16)
    planar[(2*r1 + r2)*Cp + c, y, x] = fine[c, 2*y + r1, 2*x + r2]

(the (r1, r2, c) plane order is exactly the PixelShuffle channel packing,
so an upconv emits planar output by a pure weight-column reorder).  A 3x3
conv on the fine grid becomes, on planar data, a conv whose taps reach at
most 2x2 coarse cells: for output subpixel row py the row taps collapse to
two dots —

    u = -1 (py=0) / +1 (py=1): the 'half' dot, K = 4*Cp (one r1 group)
    u = 0:                     the 'full' dot, K = 8*Cp (both r1 groups)

over a K-buffer holding, per r1 group, four column-tap blocks
    vb0 = P(r1, 0) unshifted      vb1 = P(r1, 1) unshifted
    vb2 = P(r1, 1) rolled right   vb3 = P(r1, 0) rolled left
(vb0/vb1 are contiguous bf16 copies; only 2*Cp rows per r1 ever get the
f32 cast + lane roll).  Dots are (2*Cpo, 4*Cp) and (2*Cpo, 8*Cp) — M=128
at the 1080p-zone channel counts, vs 64 on the fine grid — and the lane
axis stays at the coarse width (1024 vs 2048), so there is no
depth-to-space, no re-crop, and no fine-grid roll anywhere in the tail.

Costs vs the fine-grid formulation: 2x2 tap support covers 16 fine tap
positions where the 3x3 kernel has 9, so the dots carry ~1.8x the minimal
FLOPs — a deliberate trade of MXU headroom for the VPU prologue and HBM
relayouts that dominate the v3 pipeline (CLAUDE.md round-2 numbers).

Column-edge masks are built in-kernel from a lane iota: the coarse padded
width is always a power of two here, so `col = lane & (Wd - 1)` replaces
the resident int32 index planes of tile_conv.py.

Matches the decoder stages of /root/reference/model_hnerv.py:224-251 and
ResBlock_SFT of model_blocks.py:74-105; the layout and fusion strategy are
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
from .tile_conv import (_ACTS, _gelu, _outimg, _preshift_into,
                        _roll_packed_i8, _sin_poly, _stack_weights_dy)

TH = 8

# scoped-VMEM budget requested from Mosaic; v5e has 128 MiB and ~112 MiB
# is the default compiler cap — raiseable a little for large-tile variants
VMEM_LIMIT = 112 * 1024 * 1024


def _round16(v):
    return (v + 15) // 16 * 16


# --------------------------------------------------------------------- #
# layout converters (XLA; used at tail entry/exit and in tests)
# --------------------------------------------------------------------- #


def to_planar(x, cp=None):
    """fine (C, 2H, 2W) -> planar (4*Cp, H, W)."""
    c, h2, w2 = x.shape
    cp = _round16(c) if cp is None else cp
    x = x.reshape(c, h2 // 2, 2, w2 // 2, 2).transpose(2, 4, 0, 1, 3)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c), (0, 0), (0, 0)))
    return x.reshape(4 * cp, h2 // 2, w2 // 2)


def from_planar(xp, c):
    """planar (4*Cp, H, W) -> fine (C, 2H, 2W)."""
    g, h, w = xp.shape
    cp = g // 4
    x = xp.reshape(2, 2, cp, h, w)[:, :, :c]
    x = x.transpose(2, 3, 0, 4, 1)
    return x.reshape(c, 2 * h, 2 * w)


def upconv_kernel_to_planar(kernel, cp=None):
    """HWIO (kh, kw, Cin, 4*C) upconv kernel -> (kh, kw, Cin, 4*Cp) whose
    output-channel order is the planar row layout (plane-major, per-plane
    zero pad).  PixelShuffle's channel packing is (r1, r2, c) major->minor
    (ops/pixelshuffle.py), so this is a pad-interleave on the O axis."""
    kh, kw, cin, co4 = kernel.shape
    c = co4 // 4
    cp = _round16(c) if cp is None else cp
    k = kernel.reshape(kh, kw, cin, 4, c)
    k = jnp.pad(k, ((0, 0),) * 3 + ((0, 0), (0, cp - c)))
    return k.reshape(kh, kw, cin, 4 * cp)


# --------------------------------------------------------------------- #
# weight matrices
# --------------------------------------------------------------------- #

_VB = {(0, 0): 0, (1, 0): 1, (1, -1): 2, (0, 1): 3}


def planar_conv_mats(kernel, cp, cpo, dtype=jnp.bfloat16):
    """HWIO (kh, kw, C, Co) fine-grid kernel (kh/kw in {1, 3}) -> per-py
    (half, full) lhs: half[py]: (2*Cpo, 4*Cp), full[py]: (2*Cpo, 8*Cp),
    bf16.  A 1x1 kernel lands entirely in the full (u=0) matrices."""
    kh, kw, c, co = kernel.shape
    assert kh in (1, 3) and kw in (1, 3), (kh, kw)
    k = kernel.astype(jnp.float32)
    kys = (-1, 0, 1) if kh == 3 else (0,)
    kxs = (-1, 0, 1) if kw == 3 else (0,)
    half = jnp.zeros((2, 2 * cpo, 4 * cp), jnp.float32)
    # full is merged across py: rows [py*2*Cpo + px*Cpo + c'] feed ONE
    # M=4*Cpo dot over the shared u=0 lane window
    full = jnp.zeros((4 * cpo, 8 * cp), jnp.float32)
    for py in (0, 1):
        for ky in kys:
            u, r1 = divmod(py + ky, 2)
            for px in (0, 1):
                for kx in kxs:
                    v, r2 = divmod(px + kx, 2)
                    vb = _VB[(r2, v)]
                    tap = k[ky + kh // 2, kx + kw // 2].T  # (Co, C)
                    row0 = py * 2 * cpo + px * cpo
                    if u == 0:
                        full = full.at[
                            row0:row0 + co,
                            (r1 * 4 + vb) * cp:(r1 * 4 + vb) * cp + c
                        ].add(tap)
                    else:
                        half = half.at[
                            py, px * cpo:px * cpo + co,
                            vb * cp:vb * cp + c].add(tap)
    return half.astype(dtype), full.astype(dtype)


def _planar_bias(bias, cpo):
    co = bias.shape[0]
    b = jnp.zeros((4 * cpo, 1), jnp.float32)
    for p in range(4):
        b = b.at[p * cpo:p * cpo + co, 0].set(bias.astype(jnp.float32))
    return b


def _planar_vec(v, cp):
    """(C,) per-fine-channel vector -> (4*Cp, 1) planar broadcast."""
    return _planar_bias(v, cp)


# --------------------------------------------------------------------- #
# in-kernel helpers
# --------------------------------------------------------------------- #


def _col_plane(rows, lanes, wd):
    """lane-index -> coarse column plane, (rows, lanes) int32.  wd must be
    a power of two (asserted by the wrappers).  Safe up to 64 sublanes —
    larger iotas (and `>>` on them) SIGABRT the Mosaic compiler; bigger
    masks use the resident planes from _region_planes instead."""
    ln = lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    return ln & (wd - 1)


def _region_planes(rows, nrows, wd):
    """Resident (2, rows, nrows*wd) int32 [region-row, col] planes (the
    tile_conv.py pattern: no big in-kernel iota/shift)."""
    r = np.repeat(np.arange(nrows, dtype=np.int32), wd)
    c = np.tile(np.arange(wd, dtype=np.int32), nrows)
    planes = np.stack([r, c])[:, None, :]
    return jnp.asarray(
        np.broadcast_to(planes, (2, rows, nrows * wd)).copy())


def _quant_act(x32, inv):
    """f32 activations -> integer-valued f32 in [-127, 127] (symmetric
    per-channel int8 quantisation; `inv` broadcasts rows).  Rolling /
    masking quantised values is exact, so callers quantise BEFORE the
    K-buffer shifts and store with .astype(int8)."""
    return jnp.clip(jnp.round(x32 * inv), -127.0, 127.0)


# int8 K-buffer shifted-plane strategy (W8A8 kernels only):
#   "f32"  — roll the quantised integer-valued f32 planes, store
#            .astype(int8) (4 f32->int8 packing stores per r1 group)
#   "pack" — store the unshifted planes int8 FIRST, read them back,
#            bitcast to int32 (4 packed sublanes per element), lane-roll
#            the 32-bit view, mask, bitcast back: the rolls touch 1/4
#            the sublanes and no extra f32->int8 packing happens
# Exact-parity alternatives (rolls/masks of quantised values are exact
# in either representation — bitwise test in tests/test_planar_int8.py).
# Default "pack" since round 5: the round-4 SIGABRT was slicing an
# iota-derived col plane to the packed row count (root-caused offline,
# tools/r5_pack_bisect2.py; masks are now built directly at Cp/4 rows)
# and pack halves the convert volume of every quantising build.
I8_KBUF_ROLL = "pack"


def _build_kbuf(buf, x32, colp, wc_real, cp, dt, wd=None):
    """Fill the (8*Cp, L) K-buffer from the f32 region x32 (4*Cp, L) —
    or from per-r1 (2*Cp, L) groups when x32 is a callable r1 -> block.
    colp: (Cp, L) coarse-col plane of the region.  Stores in the buffer's
    own dtype (int8 K-buffers get integer-valued f32 from a quantising
    getter; `dt` is kept for call-site compatibility).  wd: the coarse
    padded width — REQUIRED for the pack roll mode, whose packed-shape
    mask must be an iota built directly at Cp/4 rows (slicing an iota
    plane aborts Mosaic — tools/r5_pack_bisect2.py)."""
    bt = buf.dtype
    pack = bt == jnp.int8 and I8_KBUF_ROLL == "pack"
    assert not pack or wd is not None, "pack roll mode needs wd"
    get = x32 if callable(x32) else (
        lambda r1: lax.slice_in_dim(x32, r1 * 2 * cp, (r1 + 1) * 2 * cp,
                                    axis=0))
    for r1 in (0, 1):
        g = get(r1)
        lanes = g.shape[1]
        base = r1 * 4 * cp
        # vb0 + vb1: both r2 planes, unshifted — one contiguous copy
        # (lane-partial writes: the scratch may be wider than the region)
        buf[pl.ds(base, 2 * cp), pl.ds(0, lanes)] = g.astype(bt)
        if pack:
            p0 = buf[pl.ds(base, cp), pl.ds(0, lanes)]
            p1 = buf[pl.ds(base + cp, cp), pl.ds(0, lanes)]
            c32 = _col_plane(cp // 4, lanes, wd)
            vm = _roll_packed_i8(p1, 1, c32 > 0)
            vp = _roll_packed_i8(p0, lanes - 1, c32 < wc_real - 1)
            buf[pl.ds(base + 2 * cp, cp), pl.ds(0, lanes)] = vm
            buf[pl.ds(base + 3 * cp, cp), pl.ds(0, lanes)] = vp
            continue
        p0 = lax.slice_in_dim(g, 0, cp, axis=0)
        p1 = lax.slice_in_dim(g, cp, 2 * cp, axis=0)
        vm = jnp.where(colp > 0, pltpu.roll(p1, 1, axis=1), 0.0)
        vp = jnp.where(colp < wc_real - 1,
                       pltpu.roll(p0, lanes - 1, axis=1), 0.0)
        buf[pl.ds(base + 2 * cp, cp), pl.ds(0, lanes)] = vm.astype(bt)
        buf[pl.ds(base + 3 * cp, cp), pl.ds(0, lanes)] = vp.astype(bt)


def _roll_pm1_i8(p8, colp, wc_real, cp, lanes, wd):
    """(vm, vp) +-1 lane-rolls of the int8 (2*Cp, L) group [p0; p1]
    (zero-convert builds).  'pack' rolls the packed-int32 bitcast view
    (touches 1/4 the sublanes, zero converts); the fallback widens to
    f32 for the roll and re-packs — 4*Cp packing stores per build vs the
    8*Cp of a quantising build.  Exact either way: rolls/masks of int8
    codes commute with the representation.

    The packed-shape mask MUST be an iota built directly at Cp/4 rows:
    lax.slice_in_dim of an iota-derived plane down to the packed row
    count aborts the Mosaic compiler (array.h:480 "limits[i] <= dim(i)
    (2 vs. 1)" — the round-4 pack SIGABRT, root-caused offline by
    tools/r5_pack_bisect2.py)."""
    p0 = lax.slice_in_dim(p8, 0, cp, axis=0)
    p1 = lax.slice_in_dim(p8, cp, 2 * cp, axis=0)
    if I8_KBUF_ROLL == "pack":
        c32 = _col_plane(cp // 4, lanes, wd)
        vm = _roll_packed_i8(p1, 1, c32 > 0)
        vp = _roll_packed_i8(p0, lanes - 1, c32 < wc_real - 1)
        return vm, vp
    vm = jnp.where(colp > 0,
                   pltpu.roll(p1.astype(jnp.float32), 1, axis=1), 0.0)
    vp = jnp.where(colp < wc_real - 1,
                   pltpu.roll(p0.astype(jnp.float32), lanes - 1, axis=1),
                   0.0)
    return vm.astype(jnp.int8), vp.astype(jnp.int8)


def _build_kbuf_i8(buf, get8, colp, wc_real, cp, wd):
    """Zero-convert _build_kbuf for an ALREADY-int8 source: the
    unshifted vb0/vb1 planes are int8->int8 copies and the rolled
    vb2/vb3 planes come from _roll_pm1_i8 — no f32->int8 quantisation
    anywhere (the round-4 decomposition showed the quantising builds'
    convert+pack store volume is ~half the i8 kernel time;
    tools/r4_i8_build_probe.py).  get8(r1) -> (2*Cp, L) int8."""
    for r1 in (0, 1):
        g = get8(r1)
        lanes = g.shape[1]
        base = r1 * 4 * cp
        buf[pl.ds(base, 2 * cp), pl.ds(0, lanes)] = g
        vm, vp = _roll_pm1_i8(g, colp, wc_real, cp, lanes, wd)
        buf[pl.ds(base + 2 * cp, cp), pl.ds(0, lanes)] = vm
        buf[pl.ds(base + 3 * cp, cp), pl.ds(0, lanes)] = vp


def _preshift_i8(buf, x8, colp, w_real, cpad, wd):
    """Zero-convert _preshift_into for an already-int8 (Cpad, L) block:
    dx=0 is a copy, dx=+-1 via packed rolls (mask iota built directly
    at the packed row count — see _roll_pm1_i8)."""
    lanes = x8.shape[1]
    buf[pl.ds(cpad, cpad), pl.ds(0, lanes)] = x8
    if I8_KBUF_ROLL == "pack":
        x8r = buf[pl.ds(cpad, cpad), pl.ds(0, lanes)]
        c32 = _col_plane(cpad // 4, lanes, wd)
        xm = _roll_packed_i8(x8r, 1, c32 > 0)
        xp = _roll_packed_i8(x8r, lanes - 1, c32 < w_real - 1)
    else:
        xf = x8.astype(jnp.float32)
        xm = jnp.where(colp > 0, pltpu.roll(xf, 1, axis=1),
                       0.0).astype(jnp.int8)
        xp = jnp.where(colp < w_real - 1,
                       pltpu.roll(xf, lanes - 1, axis=1),
                       0.0).astype(jnp.int8)
    buf[pl.ds(0, cpad), pl.ds(0, lanes)] = xm
    buf[pl.ds(2 * cpad, cpad), pl.ds(0, lanes)] = xp


def _planar_dots(buf, half_ref, full_ref, cp, cpo, wd, nout, merge=True,
                 sc=None):
    """The planar conv dots; returns f32 per-py (2*Cpo, nout) accs.

    Both py's u=0 'full' dots read the SAME lane window, so they merge
    into one M=4*Cpo dot (measured ~10% faster than two M=2*Cpo dots —
    tools/planar_diag3.py); the two M=2*Cpo 'half' dots stay separate
    (different lane offsets and r1 groups).  merge=False keeps the two
    per-py M=2*Cpo full dots — the merged (4*Cpo, nout) f32 temp costs
    ~15 MB at the 540-row head-kernel shapes and tips scoped VMEM over
    the 112 MB limit there.

    sc: (4*Cpo, 1) f32 per-output-row dequant scale — selects the int8
    path (int8 operands, int32 accumulate, 2x MXU on v5e; the scale is
    applied once after the half+full int32 merge)."""
    acc_t = jnp.float32 if sc is None else jnp.int32
    if merge:
        af = lax.dot(full_ref[...], buf[:, pl.ds(wd, nout)],
                     preferred_element_type=acc_t)
    accs = []
    for py, u_half in enumerate((-1, 1)):
        r1h = 1 - py
        off_h = (u_half + 1) * wd
        a = lax.dot(
            half_ref[py],
            buf[pl.ds(r1h * 4 * cp, 4 * cp), pl.ds(off_h, nout)],
            preferred_element_type=acc_t)
        if merge:
            a = a + lax.slice_in_dim(af, py * 2 * cpo, (py + 1) * 2 * cpo,
                                     axis=0)
        else:
            a = a + lax.dot(full_ref[pl.ds(py * 2 * cpo, 2 * cpo)],
                            buf[:, pl.ds(wd, nout)],
                            preferred_element_type=acc_t)
        if sc is not None:
            a = a.astype(jnp.float32) * lax.slice_in_dim(
                sc, py * 2 * cpo, (py + 1) * 2 * cpo, axis=0)
        accs.append(a)
    return accs


def _conv_planar_kernel(wc_real, wd, n_in_rows, cp, cpo, act, x_hbm,
                        half_ref, full_ref, b_ref, out_ref, xtile, kbuf,
                        sem):
    """One planar conv (+act).  x_hbm: (4*Cp, Hp*wd) with one coarse zero
    halo row pre-padded top and bottom."""
    nout = out_ref.shape[1]
    dt = out_ref.dtype
    i = pl.program_id(0)
    th = nout // wd
    lanes = n_in_rows * wd

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

    x32 = xtile[slot].astype(jnp.float32)
    colp = _col_plane(cp, lanes, wd)
    _build_kbuf(kbuf, x32, colp, wc_real, cp, dt)
    a0, a1 = _planar_dots(kbuf, half_ref, full_ref, cp, cpo, wd, nout)
    f = _ACTS[act]
    out_ref[pl.ds(0, 2 * cpo), :] = f(
        a0 + b_ref[pl.ds(0, 2 * cpo)]).astype(dt)
    out_ref[pl.ds(2 * cpo, 2 * cpo), :] = f(
        a1 + b_ref[pl.ds(2 * cpo, 2 * cpo)]).astype(dt)


@functools.partial(jax.jit, static_argnames=("c_in", "c_out", "wc_real",
                                             "act", "th", "interpret"))
def conv_planar(xp, kernel, bias, *, c_in, c_out, wc_real, act="none",
                th=TH, interpret=False):
    """3x3 fine-grid same conv applied to a planar tensor.

    xp: (4*Cp, Hc, Wd) bf16 planar, Wd a power of two >= wc_real, pad
    lanes (col >= wc_real) finite; kernel: flax HWIO (3, 3, C, Co); bias:
    (Co,).  Returns (4*Cpo, Hc, Wd) planar (+act), pad channels zero iff
    act(0) == 0 modulo bias.
    """
    g, hc, wd = xp.shape
    assert wd & (wd - 1) == 0 and wd >= 128, wd
    cp = g // 4
    assert cp == _round16(c_in), (cp, c_in)
    cpo = _round16(c_out)
    grid = pl.cdiv(hc, th)
    n_in_rows = th + 2
    hp = grid * th + 2
    xf = jnp.pad(xp, ((0, 0), (1, hp - hc - 1), (0, 0)))
    xf = xf.reshape(4 * cp, hp * wd)
    half, full = planar_conv_mats(kernel, cp, cpo)
    b = _planar_bias(bias, cpo)
    fn = functools.partial(_conv_planar_kernel, wc_real, wd, n_in_rows, cp,
                           cpo, act)
    out = _precision_safe_pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((4 * cpo, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * cpo, hc * wd), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4 * cp, n_in_rows * wd), xp.dtype),
            pltpu.VMEM((8 * cp, n_in_rows * wd), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xf, half, full, b)
    return out.reshape(4 * cpo, hc, wd)


def _rsft_planar_kernel(hc_real, wc_real, wd, cp, x_hbm, h0_ref, f0_ref,
                        b0_ref, h1_ref, f1_ref, b1_ref, sft_ref,
                        planes_ref, out_ref, xtile, kbuf, mid, kbuf2,
                        sem):
    """Fused planar ResBlock_SFT: SFT0 -> conv -> GELU -> SFT1 -> conv ->
    +x.  x_hbm: (4*Cp, Hp*wd) with two coarse zero halo rows top/bottom.
    Output tile rows [i*th, i*th+th); input region rows i*th-2 .. +th+2;
    mid region rows i*th-1 .. +th+1."""
    nout = out_ref.shape[1]
    dt = out_ref.dtype
    i = pl.program_id(0)
    th = nout // wd
    lanes = (th + 4) * wd
    nmid = (th + 2) * wd

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

    def out_write(py, val):
        out_ref[pl.ds(py * 2 * cp, 2 * cp), :] = val.astype(dt)

    x32 = xtile[slot].astype(jnp.float32)
    _rsft_chain(i * th, th, wd, cp, hc_real, wc_real, dt, x32,
                planes_ref, sft_ref, h0_ref, f0_ref, b0_ref, h1_ref,
                f1_ref, b1_ref, kbuf, mid, kbuf2, out_write)


@functools.partial(jax.jit, static_argnames=("c", "hc_real", "wc_real",
                                             "th", "interpret"))
def rsft_planar(xp, w0, b0, w1, b1, scale0, shift0, scale1, shift1, *,
                c, hc_real, wc_real, th=TH, interpret=False):
    """Fused TAT residual block on a planar tensor.

    xp: (4*Cp, Hc, Wd) bf16 planar; w0/w1: flax HWIO (3, 3, C, C);
    scale/shift: (C,) f32 vectors from the t-embedding MLPs (XLA).
    Returns (4*Cp, Hc, Wd) bf16 planar.
    """
    g, hc, wd = xp.shape
    assert wd & (wd - 1) == 0 and wd >= 128, wd
    cp = g // 4
    assert cp == _round16(c), (cp, c)
    grid = pl.cdiv(hc, th)
    hp = grid * th + 4
    xf = jnp.pad(xp, ((0, 0), (2, hp - hc - 2), (0, 0)))
    xf = xf.reshape(4 * cp, hp * wd)
    h0m, f0m = planar_conv_mats(w0, cp, cp)
    h1m, f1m = planar_conv_mats(w1, cp, cp)
    bp0 = _planar_bias(b0, cp)
    bp1 = _planar_bias(b1, cp)
    sft = jnp.stack([_planar_vec(v, cp) for v in
                     (scale0, shift0, scale1, shift1)])
    planes = _region_planes(2 * cp, th + 4, wd)
    fn = functools.partial(_rsft_planar_kernel, hc_real, wc_real, wd, cp)
    out = _precision_safe_pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((4 * cp, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * cp, hc * wd), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 4 * cp, (th + 4) * wd), xp.dtype),
            pltpu.VMEM((8 * cp, (th + 4) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2) * wd), xp.dtype),
            pltpu.VMEM((8 * cp, (th + 2) * wd), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(xf, h0m, f0m, bp0, h1m, f1m, bp1, sft, planes)
    return out.reshape(4 * cp, hc, wd)


# --------------------------------------------------------------------- #
# Fused stage kernels.
#
# The MXU-parallelism probes (tools/planar_diag3/4.py) show chained
# well-shaped dots inside one kernel run at ~99 TF/s while a lone dot per
# tile sits at ~25-66 TF/s: the per-tile pipeline ramp dominates.  So the
# production decode fuses a WHOLE decoder stage per kernel — 9-12 chained
# MXU dots between HBM round-trips:
#
#   stage kernel A (stride-2 NeRVBlock): upconv (dy3-style, planar-ordered
#     output) -> sin -> fused TAT ResBlock, all on the coarse grid;
#   stage kernel B (stride-1 NeRVBlock [+ head]): planar conv -> sin ->
#     fused TAT ResBlock [-> head conv -> OutImg].
#
# Weight matrices are prepared ONCE at build time (prepare_*); only the
# per-frame SFT scale/shift vectors enter per call.
# --------------------------------------------------------------------- #


def upconv_bias_to_planar(bias, cp):
    """(4*C,) upconv bias (PixelShuffle channel order) -> (4*Cp, 1)."""
    c = bias.shape[0] // 4
    b = bias.astype(jnp.float32).reshape(4, c)
    b = jnp.pad(b, ((0, 0), (0, cp - c)))
    return b.reshape(4 * cp, 1)


def _rsft_mats(w0, b0, w1, b1, cp):
    h0m, f0m = planar_conv_mats(w0, cp, cp)
    h1m, f1m = planar_conv_mats(w1, cp, cp)
    return dict(h0=h0m, f0=f0m, b0=_planar_bias(b0, cp),
                h1=h1m, f1=f1m, b1=_planar_bias(b1, cp),
                f1_r=reorder_full_split(f1m, cp))


def prepare_upconv_rsft(upk, upb, w0, b0, w1, b1, *, c_in, c, cpi=None,
                        cp=None):
    """Build-time weights for stage kernel A.  upk: HWIO (3, 3, C_in,
    4*C) stride-2 pshuffel upconv; w0/w1/b0/b1: the TAT block convs.
    cpi/cp override the default 16-rounded padded channel counts (the
    cp32 int8 mode pads to 32 so misaligned stages stay i8-eligible)."""
    cpi = _round16(c_in) if cpi is None else cpi
    cp = _round16(c) if cp is None else cp
    kp = upconv_kernel_to_planar(upk, cp)
    kp = jnp.pad(kp, ((0, 0), (0, 0), (0, cpi - c_in), (0, 0)))
    wup = _stack_weights_dy(kp, cpi, 4 * cp)
    return dict(wup=wup, wup_r=reorder_wup_split(wup, cpi),
                bup=upconv_bias_to_planar(upb, cp),
                **_rsft_mats(w0, b0, w1, b1, cp))


def prepare_conv_rsft(ck, cb, w0, b0, w1, b1, *, c, head_k=None,
                      head_b=None, cp=None):
    """Build-time weights for stage kernel B.  ck: HWIO (3, 3, C, C)
    stride-1 conv; optional head_k: HWIO (3, 3, C, 3).  cp overrides
    the 16-rounded padded channel count (cp32 int8 mode)."""
    cp = _round16(c) if cp is None else cp
    hm, fm = planar_conv_mats(ck, cp, cp)
    prep = dict(hc=hm, fc=fm, fc_r=reorder_full_split(fm, cp),
                bc=_planar_bias(cb, cp),
                **_rsft_mats(w0, b0, w1, b1, cp))
    if head_k is not None:
        hh, fh = planar_conv_mats(head_k, cp, 16)
        prep.update(hh=hh, fh=fh, fh_r=reorder_full_split(fh, cp),
                    bh=_planar_bias(head_b, 16))
    return prep


def sft_planar_vectors(scale0, shift0, scale1, shift1, cp):
    """Per-frame SFT vectors -> (4, 4*Cp, 1) planar broadcast (XLA)."""
    return jnp.stack([_planar_vec(v, cp) for v in
                      (scale0, shift0, scale1, shift1)])


# --------------------------------------------------------------------- #
# int8 weight preparation (W8A8 serving quantisation).
#
# The round-4 nodots/noprolog split (CLAUDE.md) shows the 540-grid stage
# kernels are DOT-bound; v5e runs int8 MXU dots at 2x the bf16 rate and
# an int8 K-buffer halves its VMEM traffic (hardware-measured: the
# dots+epilogues chain drops 12.78 -> 6.4-6.6 ms at the B+head@540
# shape when the K-bufs are never VPU-written).  The FULL serialized i8
# kernel does NOT realize the 2x at the same tile (13.87 vs 13.69 bf16
# iso, tools/r4_i8_build_probe.py): the f32->int8 convert+pack stores
# of the quantising K-buf builds cost ~7 ms/kernel — it is the
# conversion VOLUME, not buffer-layout poisoning (a 4 KB VPU store
# into an otherwise-unwritten K-buf changes nothing: 8.35 vs 8.33 ms,
# tools/r4_layout_probe.py).  The shipped i8 win is therefore the VMEM
# headroom (int8 K-bufs fit th=12 UN-chunked -> 33.4 vs 32.6 fps E2E);
# I8_KBUF_ROLL="pack" (below) halves the convert volume and is
# bitwise-exact standalone but still SIGABRTs Mosaic inside the full
# stage kernels — candidate for the next round.  Scheme:
# per-fine-channel symmetric activation scales (s_x = bound/127, from
# runtime.fast_decode.calibrate_planar_bounds) fold into the weight
# K-columns BEFORE quantisation, per-output-row weight scales dequant
# the int32 accs with one (4*Cpo, 1) multiply in the existing bias
# epilogue — activations quantise in the K-buffer build (the getter
# emits integer-valued f32; rolls/masks of quantised values are exact).
# Matches the reference's 8-bit serving-quantisation surface
# (/root/reference/train_nerv_all.py quant_model eval) with activations
# quantised too; quality is measured, not assumed (tests + bench).
# --------------------------------------------------------------------- #


def _inv_from_bound(bound):
    """Per-fine-channel |x| bound -> quantisation multiplier 127/bound
    (0 for dead channels, so they quantise to exactly 0)."""
    b = jnp.asarray(bound, jnp.float32)
    return jnp.where(b > 1e-12, 127.0 / jnp.maximum(b, 1e-12), 0.0)


def out_quant_vec(bound, cp):
    """Per-fine-channel |x| bound of the NEXT stage's input -> (4*Cp, 1)
    f32 planar quantisation multiplier: the producing stage's `out_inv`
    (zero-convert chain — it emits exactly the int8 codes the consumer's
    folded weights expect)."""
    return _planar_vec(_inv_from_bound(jnp.asarray(bound, jnp.float32)),
                       cp)


def _quant_rows(half, full):
    """f32 (2, 2*Cpo, 4*Cp) half + (4*Cpo, 8*Cp) full -> int8 mats and
    the (4*Cpo, 1) f32 per-output-row scale, SHARED between the half and
    full mats of each output row so their int32 accs stay additive."""
    cpo2 = half.shape[1]
    hmax = jnp.max(jnp.abs(half), axis=2)          # (2, 2*Cpo)
    fmax = jnp.max(jnp.abs(full), axis=1)          # (4*Cpo,)
    m = jnp.maximum(fmax, jnp.concatenate([hmax[0], hmax[1]]))
    sc = jnp.maximum(m, 1e-12) / 127.0
    qh = jnp.clip(jnp.round(half / sc.reshape(2, cpo2, 1)), -127, 127)
    qf = jnp.clip(jnp.round(full / sc[:, None]), -127, 127)
    return qh.astype(jnp.int8), qf.astype(jnp.int8), sc[:, None]


def _quant_conv(kernel, cp, cpo, bound):
    """Fine-grid HWIO kernel + per-input-channel |x| bound -> int8
    planar (half, full) mats + (4*Cpo, 1) dequant row scale."""
    sx = jnp.asarray(bound, jnp.float32) / 127.0
    kf = kernel.astype(jnp.float32) * sx[None, None, :, None]
    half, full = planar_conv_mats(kf, cp, cpo, dtype=jnp.float32)
    return _quant_rows(half, full)


def prepare_conv_rsft_i8(ck, cb, w0, b0, w1, b1, *, c, bounds,
                         head_k=None, head_b=None, cp=None):
    """int8 build-time weights for stage kernel B.  bounds: per-fine-
    channel |x| maxima at each conv INPUT — "x" (stage input), "t0"/"t1"
    (TAT conv inputs), "h" (head input) — from
    runtime.fast_decode.calibrate_planar_bounds.  cp override: the cp32
    mode passes a 32-rounded pad so cp%32-misaligned fine channel counts
    (e.g. the 80-row 270 zone) stay int8-eligible at a 1.2x row cost."""
    cp = _round16(c) if cp is None else cp
    assert 4 * cp % 32 == 0 and cp % 32 == 0, \
        f"int8 K-buffer sublane offsets need cp % 32 == 0, got {cp}"
    hq, fq, scc = _quant_conv(ck, cp, cp, bounds["x"])
    h0q, f0q, sc0 = _quant_conv(w0, cp, cp, bounds["t0"])
    h1q, f1q, sc1 = _quant_conv(w1, cp, cp, bounds["t1"])
    prep = dict(i8=True, hc=hq, fc=fq, bc=_planar_bias(cb, cp),
                h0=h0q, f0=f0q, b0=_planar_bias(b0, cp),
                h1=h1q, f1=f1q, b1=_planar_bias(b1, cp))
    invs = [_planar_vec(_inv_from_bound(bounds["x"]), cp),
            _planar_vec(_inv_from_bound(bounds["t0"]), cp),
            _planar_vec(_inv_from_bound(bounds["t1"]), cp)]
    scs = [scc, sc0, sc1]
    if head_k is not None:
        hhq, fhq, sch = _quant_conv(head_k, cp, 16, bounds["h"])
        prep.update(hh=hhq, fh=fhq, bh=_planar_bias(head_b, 16))
        invs.append(_planar_vec(_inv_from_bound(bounds["h"]), cp))
        scs.append(jnp.pad(sch, ((0, 4 * cp - 64), (0, 0))))
    else:
        invs.append(jnp.zeros((4 * cp, 1), jnp.float32))
        scs.append(jnp.zeros((4 * cp, 1), jnp.float32))
    prep["invq"] = jnp.stack(invs)
    prep["scq"] = jnp.stack(scs)
    return prep


def prepare_upconv_rsft_i8(upk, upb, w0, b0, w1, b1, *, c_in, c, bounds,
                           cpi=None, cp=None):
    """int8 build-time weights for stage kernel A.  bounds keys: "x"
    (the interleaved upconv input, (C_in,)), "t0"/"t1".  cpi/cp: cp32
    padded-row overrides (see prepare_conv_rsft_i8)."""
    cpi = _round16(c_in) if cpi is None else cpi
    cp = _round16(c) if cp is None else cp
    assert cpi <= 4 * cp, (cpi, cp)
    assert cp % 32 == 0 and cpi % 32 == 0, \
        f"int8 sublane offsets need cp/cpi % 32 == 0, got {cp}/{cpi}"
    sx = jnp.asarray(bounds["x"], jnp.float32) / 127.0
    kf = upk.astype(jnp.float32) * sx[None, None, :, None]
    kp = upconv_kernel_to_planar(kf, cp)
    kp = jnp.pad(kp, ((0, 0), (0, 0), (0, cpi - c_in), (0, 0)))
    wup = _stack_weights_dy(kp, cpi, 4 * cp, dtype=jnp.float32)
    m = jnp.max(jnp.abs(wup), axis=(0, 2))        # (4*cp,)
    scu = jnp.maximum(m, 1e-12) / 127.0
    wq = jnp.clip(jnp.round(wup / scu[None, :, None]),
                  -127, 127).astype(jnp.int8)
    h0q, f0q, sc0 = _quant_conv(w0, cp, cp, bounds["t0"])
    h1q, f1q, sc1 = _quant_conv(w1, cp, cp, bounds["t1"])
    inv_up = jnp.zeros((4 * cp, 1), jnp.float32).at[:c_in, 0].set(
        _inv_from_bound(bounds["x"]))
    return dict(
        i8=True, wup=wq, bup=upconv_bias_to_planar(upb, cp),
        h0=h0q, f0=f0q, b0=_planar_bias(b0, cp),
        h1=h1q, f1=f1q, b1=_planar_bias(b1, cp),
        invq=jnp.stack([inv_up,
                        _planar_vec(_inv_from_bound(bounds["t0"]), cp),
                        _planar_vec(_inv_from_bound(bounds["t1"]), cp)]),
        scq=jnp.stack([scu[:, None], sc0, sc1]))


def _rsft_chain(row0, th, wd, cp, hc_real, wc_real, dt, x32, planes_ref,
                sft_ref, h0_ref, f0_ref, b0_ref, h1_ref, f1_ref, b1_ref,
                kb1, mid, kb2, out_write, merge=True, q=None):
    """The fused TAT block on a VMEM-resident planar region.

    x32: f32 (4*Cp, (th+4)*wd) region value whose lane 0 corresponds to
    coarse row `row0` - 2 (row0 = abs row of output row 0).  planes_ref:
    (2, 2*Cp, >= (th+4)*wd) resident [region-row, col] planes.
    out_write(py, block) stores the (2*Cp, th*wd) result rows.

    q: int8 mode — (inv0, sc0, inv1, sc1) f32 (4*Cp, 1) values; kb1/kb2
    must then be int8 scratch and h0/f0/h1/f1 the int8 mats."""
    lanes = (th + 4) * wd
    nmid = (th + 2) * wd
    nout = th * wd
    s0 = sft_ref[0] + 1.0
    h0v = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1v = sft_ref[3]
    inv0 = sc0 = inv1 = sc1 = None
    if q is not None:
        inv0, sc0, inv1, sc1 = q

    rowp2 = planes_ref[0, :, pl.ds(0, lanes)] + (row0 - 2)
    colp2 = planes_ref[1, :, pl.ds(0, lanes)]
    in_frame = ((rowp2 >= 0) & (rowp2 < hc_real) & (colp2 < wc_real))

    def sft0(r1):
        sl = lax.slice_in_dim(x32, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        sv = lax.slice_in_dim(s0, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        hv = lax.slice_in_dim(h0v, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        v = jnp.where(in_frame, sl * sv + hv, 0.0)
        if q is not None:
            v = _quant_act(v, lax.slice_in_dim(
                inv0, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0))
        return v

    colp = lax.slice_in_dim(colp2, 0, cp, axis=0)
    _build_kbuf(kb1, sft0, colp, wc_real, cp, dt, wd=wd)
    a0, a1 = _planar_dots(kb1, h0_ref, f0_ref, cp, cp, wd, nmid,
                          merge=merge, sc=sc0)
    m0 = _gelu(a0 + b0_ref[pl.ds(0, 2 * cp)]) * \
        lax.slice_in_dim(s1, 0, 2 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 0, 2 * cp, axis=0)
    m1 = _gelu(a1 + b0_ref[pl.ds(2 * cp, 2 * cp)]) * \
        lax.slice_in_dim(s1, 2 * cp, 4 * cp, axis=0) + \
        lax.slice_in_dim(h1v, 2 * cp, 4 * cp, axis=0)
    okm = lax.slice_in_dim(in_frame, wd, wd + nmid, axis=1)
    if q is not None:
        # zero-convert: quantise in THIS epilogue store (the store was
        # happening anyway — same volume, half the bytes) so the conv1
        # K-buf build below is pure int8 copies + rolls
        m0 = _quant_act(jnp.where(okm, m0, 0.0),
                        lax.slice_in_dim(inv1, 0, 2 * cp, axis=0))
        m1 = _quant_act(jnp.where(okm, m1, 0.0),
                        lax.slice_in_dim(inv1, 2 * cp, 4 * cp, axis=0))
        mid[pl.ds(0, 2 * cp), :] = m0.astype(jnp.int8)
        mid[pl.ds(2 * cp, 2 * cp), :] = m1.astype(jnp.int8)
    else:
        mid[pl.ds(0, 2 * cp), :] = jnp.where(okm, m0, 0.0).astype(dt)
        mid[pl.ds(2 * cp, 2 * cp), :] = jnp.where(okm, m1, 0.0).astype(dt)

    colm = lax.slice_in_dim(
        lax.slice_in_dim(colp2, 0, cp, axis=0), 0, nmid, axis=1)
    if q is None:
        _build_kbuf(kb2, mid[...].astype(jnp.float32), colm, wc_real, cp,
                    dt)
    else:
        def src1(r1):
            return mid[pl.ds(r1 * 2 * cp, 2 * cp), :]

        _build_kbuf_i8(kb2, src1, colm, wc_real, cp, wd)
    r0, r1 = _planar_dots(kb2, h1_ref, f1_ref, cp, cp, wd, nout,
                          merge=merge, sc=sc1)
    for py, r in ((0, r0), (1, r1)):
        resid = lax.slice_in_dim(
            lax.slice_in_dim(x32, py * 2 * cp, (py + 1) * 2 * cp, axis=0),
            2 * wd, 2 * wd + nout, axis=1)
        out_write(py, (r + b1_ref[pl.ds(py * 2 * cp, 2 * cp)] + resid))


# --------------------------------------------------------------------- #
# Chunked / software-pipelined variants.
#
# In the kernels above each conv sub-stage is strictly serialized: the
# whole K-buffer (VPU: casts, rolls, masks) is built before the first MXU
# dot reads it, so the VPU prologue and the dots never overlap — measured
# at ~2.5x above the padded-dot floor on the 540-grid stages (CLAUDE.md
# round-3 numbers).  The _ck kernels split every conv's OUTPUT rows into
# `nck` chunks with two alternating chunk-sized K-buffers and emit
#     build(ck) -> dot(ck) -> epilogue(ck-1)
# so the VPU build of chunk ck+1 and the epilogue of chunk ck-1 execute
# while the MXU crunches chunk ck.  All indices are static (the dynamic-
# major-index pitfall that killed the round-2 pipelined dy3 does not
# apply); chunk-boundary lane-roll wraps land only on columns the edge
# masks already zero (col 0 / col >= wc_real-1), so chunked builds are
# exactly as correct as full-region builds.
# --------------------------------------------------------------------- #


def _chunk_plan(rows, nck):
    """Split `rows` output rows into <= nck contiguous chunks."""
    nck = max(1, min(nck, rows))
    q = -(-rows // nck)  # ceil
    plan = []
    i0 = 0
    while i0 < rows:
        plan.append((i0, min(q, rows - i0)))
        i0 += q
    return plan


def _build_sbuf(buf, get, colp, wc_real, cp, dt):
    """Split-dot companion of _build_kbuf: store ONLY the +-1-column
    rolled planes (vm, vp per r1 group — 4*Cp rows total), the unshifted
    planes are read straight from the resident source by
    _planar_dots_split.  get(r1) -> f32 (2*Cp, L)."""
    for r1 in (0, 1):
        g = get(r1)
        lanes = g.shape[1]
        p0 = lax.slice_in_dim(g, 0, cp, axis=0)
        p1 = lax.slice_in_dim(g, cp, 2 * cp, axis=0)
        vm = jnp.where(colp > 0, pltpu.roll(p1, 1, axis=1), 0.0)
        vp = jnp.where(colp < wc_real - 1,
                       pltpu.roll(p0, lanes - 1, axis=1), 0.0)
        buf[pl.ds(r1 * 2 * cp, cp), pl.ds(0, lanes)] = vm.astype(dt)
        buf[pl.ds(r1 * 2 * cp + cp, cp), pl.ds(0, lanes)] = vp.astype(dt)


def reorder_full_split(full, cp):
    """(4*Cpo, 8*Cp) full mats -> column order [unshifted | shifted]:
    [vb0,vb1 r1=0 | vb0,vb1 r1=1 | vm,vp r1=0 | vm,vp r1=1], so the
    split dots read src rows [0:4*Cp] and sbuf rows [0:4*Cp] with
    contiguous K.  Row order (and hence per-py slicing) is untouched."""
    return jnp.concatenate(
        [full[:, 0:2 * cp], full[:, 4 * cp:6 * cp],
         full[:, 2 * cp:4 * cp], full[:, 6 * cp:8 * cp]], axis=1)


def _planar_dots_split(src, l0, sbuf, half_ref, fullr_ref, cp, cpo, wd,
                       nout, merge=True):
    """_planar_dots with the unshifted K-planes read straight from the
    resident source `src` (rows [0:4*Cp] = the planar channel block,
    lane l0 = the conv region's lane 0) and the rolled planes from the
    chunk-local `sbuf` (built by _build_sbuf, lane 0 = region lane 0 of
    the chunk).  fullr_ref must be reorder_full_split(full)."""
    f32 = jnp.float32
    fu = fullr_ref[:, pl.ds(0, 4 * cp)]
    fs = fullr_ref[:, pl.ds(4 * cp, 4 * cp)]
    if merge:
        af = (lax.dot(fu, src[pl.ds(0, 4 * cp), pl.ds(l0 + wd, nout)],
                      preferred_element_type=f32)
              + lax.dot(fs, sbuf[pl.ds(0, 4 * cp), pl.ds(wd, nout)],
                        preferred_element_type=f32))
    accs = []
    for py, u_half in enumerate((-1, 1)):
        r1h = 1 - py
        off_h = (u_half + 1) * wd
        hpy = half_ref[py]
        a = (lax.dot(lax.slice_in_dim(hpy, 0, 2 * cp, axis=1),
                     src[pl.ds(r1h * 2 * cp, 2 * cp),
                         pl.ds(l0 + off_h, nout)],
                     preferred_element_type=f32)
             + lax.dot(lax.slice_in_dim(hpy, 2 * cp, 4 * cp, axis=1),
                       sbuf[pl.ds(r1h * 2 * cp, 2 * cp),
                            pl.ds(off_h, nout)],
                       preferred_element_type=f32))
        if merge:
            a = a + lax.slice_in_dim(af, py * 2 * cpo, (py + 1) * 2 * cpo,
                                     axis=0)
        else:
            a = (a
                 + lax.dot(lax.slice_in_dim(fu, py * 2 * cpo,
                                            (py + 1) * 2 * cpo, axis=0),
                           src[pl.ds(0, 4 * cp), pl.ds(l0 + wd, nout)],
                           preferred_element_type=f32)
                 + lax.dot(lax.slice_in_dim(fs, py * 2 * cpo,
                                            (py + 1) * 2 * cpo, axis=0),
                           sbuf[pl.ds(0, 4 * cp), pl.ds(wd, nout)],
                           preferred_element_type=f32))
        accs.append(a)
    return accs


def _conv_chunked(kbufs, src_get, epi, half_ref, full_ref, cp, cpo, wd,
                  n_out_rows, nck, wc_real, dt, merge=True, src_ref=None):
    """Chunked planar conv.  src_get(r1, i0, nr) -> f32 (2*Cp, nr*wd)
    rows [i0, i0+nr) of the conv input region (one halo row before out
    row 0); epi(o0, a0, a1) consumes the f32 (2*Cpo, q*wd) accs for out
    rows [o0, o0+q).  Emission order pipelines builds/epilogues against
    the dots.

    src_ref (split mode): a resident (>=4*Cp, region lanes) ref holding
    the conv input region VERBATIM in dt — the unshifted dot planes then
    read it directly and the K-bufs hold only the rolled planes (half
    the prologue stores); full_ref must be reorder_full_split(full)."""
    plan = _chunk_plan(n_out_rows, nck)
    colps = {}
    pend = None
    for ck, (i0, q) in enumerate(plan):
        nr = q + 2
        if nr not in colps:
            colps[nr] = _col_plane(cp, nr * wd, wd)
        kb = kbufs[ck & 1]

        def get(r1, _i0=i0, _nr=nr):
            return src_get(r1, _i0, _nr)

        if src_ref is None:
            _build_kbuf(kb, get, colps[nr], wc_real, cp, dt)
            a0, a1 = _planar_dots(kb, half_ref, full_ref, cp, cpo, wd,
                                  q * wd, merge=merge)
        else:
            _build_sbuf(kb, get, colps[nr], wc_real, cp, dt)
            a0, a1 = _planar_dots_split(src_ref, i0 * wd, kb, half_ref,
                                        full_ref, cp, cpo, wd, q * wd,
                                        merge=merge)
        if pend is not None:
            epi(*pend)
        pend = (i0, a0, a1)
    epi(*pend)


def _rsft_chain_ck(row0, th, wd, cp, hc_real, wc_real, dt, src_get,
                   planes_ref, sft_ref, h0_ref, f0_ref, b0_ref, h1_ref,
                   f1_ref, b1_ref, kbufs, mid, out_write, nck, merge=True,
                   split=False):
    """Chunked _rsft_chain.  src_get(r1, i0, nr): f32 rows of the block
    input region ((th+4) rows, lane 0 = abs row `row0` - 2) — also the
    residual source; out_write(py, o0, val) stores out rows [o0, o0+q).

    split: conv1 reads its unshifted planes straight from `mid` (f1_ref
    must then be reorder_full_split(f1)); conv0's input (the SFT
    transform) is not resident, so it always uses the full K-buf path."""
    s0 = sft_ref[0] + 1.0
    h0v = sft_ref[1]
    s1 = sft_ref[2] + 1.0
    h1v = sft_ref[3]

    def src0(r1, i0, nr):
        n = nr * wd
        sl = src_get(r1, i0, nr)
        sv = lax.slice_in_dim(s0, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        hv = lax.slice_in_dim(h0v, r1 * 2 * cp, (r1 + 1) * 2 * cp, axis=0)
        rowp = planes_ref[0, :, pl.ds(0, n)] + (row0 - 2 + i0)
        colp = planes_ref[1, :, pl.ds(0, n)]
        ok = (rowp >= 0) & (rowp < hc_real) & (colp < wc_real)
        return jnp.where(ok, sl * sv + hv, 0.0)

    def epi0(o0, a0, a1):
        n = a0.shape[1]
        rowp = planes_ref[0, :, pl.ds(0, n)] + (row0 - 1 + o0)
        colp = planes_ref[1, :, pl.ds(0, n)]
        ok = (rowp >= 0) & (rowp < hc_real) & (colp < wc_real)
        for py, a in ((0, a0), (1, a1)):
            m = _gelu(a + b0_ref[pl.ds(py * 2 * cp, 2 * cp)]) * \
                lax.slice_in_dim(s1, py * 2 * cp, (py + 1) * 2 * cp,
                                 axis=0) + \
                lax.slice_in_dim(h1v, py * 2 * cp, (py + 1) * 2 * cp,
                                 axis=0)
            mid[pl.ds(py * 2 * cp, 2 * cp), pl.ds(o0 * wd, n)] = jnp.where(
                ok, m, 0.0).astype(dt)

    _conv_chunked(kbufs, src0, epi0, h0_ref, f0_ref, cp, cp, wd, th + 2,
                  nck, wc_real, dt, merge=merge)

    def src1(r1, i0, nr):
        return mid[pl.ds(r1 * 2 * cp, 2 * cp),
                   pl.ds(i0 * wd, nr * wd)].astype(jnp.float32)

    def epi1(o0, a0, a1):
        n = a0.shape[1]
        for py, a in ((0, a0), (1, a1)):
            resid = src_get(py, 2 + o0, n // wd)
            out_write(py, o0,
                      a + b1_ref[pl.ds(py * 2 * cp, 2 * cp)] + resid)

    _conv_chunked(kbufs, src1, epi1, h1_ref, f1_ref, cp, cp, wd, th,
                  nck, wc_real, dt, merge=merge,
                  src_ref=mid if split else None)


def _preshift_sbuf(buf, x32, colp, w_real, dt, cpad):
    """Split-dot companion of tile_conv._preshift_into: store only the
    dx=-1/+1 shifted copies ([xm; xp], 2*Cpad rows) — the dx=0 plane is
    read straight from the resident source by the split upconv dots."""
    lanes = x32.shape[1]
    xm = jnp.where(colp > 0, pltpu.roll(x32, 1, axis=1), 0.0)
    xp = jnp.where(colp < w_real - 1,
                   pltpu.roll(x32, lanes - 1, axis=1), 0.0)
    buf[pl.ds(0, cpad), pl.ds(0, lanes)] = xm.astype(dt)
    buf[pl.ds(cpad, cpad), pl.ds(0, lanes)] = xp.astype(dt)


def reorder_wup_split(wup, cpi):
    """(3, 4*Cp, 3*Cpi) dx-major [xm|x0|xp] upconv lhs -> [xm|xp|x0] so
    the split dots read the shifted pair from _preshift_sbuf rows
    [0:2*Cpi] and the unshifted block from the source with one slice."""
    return jnp.concatenate(
        [wup[:, :, 0:cpi], wup[:, :, 2 * cpi:3 * cpi],
         wup[:, :, cpi:2 * cpi]], axis=2)


def _copy_slot(xcur, xtile, slot):
    """Copy the DMA'd block to a fixed buffer with STATIC major indices
    (xtile[slot] is a dynamic-major-index vector load otherwise)."""
    @pl.when(slot == 0)
    def _():
        xcur[...] = xtile[0]

    @pl.when(slot == 1)
    def _():
        xcur[...] = xtile[1]


def _upconv_rsft_kernel_ck(hc_real, wc_real, wd, cpi, cp, th, nck, split,
                           x_hbm, wup_ref, bup_ref, h0_ref, f0_ref,
                           b0_ref, h1_ref, f1_ref, b1_ref, sft_ref,
                           planes_ref, out_ref, xtile, xcur, shbuf, abuf,
                           kba, kbb, mid, sem):
    """Chunked stage kernel A: stride-2 upconv -> sin -> TAT block.
    split: the dx=0 upconv plane and conv1's unshifted planes read the
    resident source directly (wup_ref/f1_ref must be the reordered
    split mats)."""
    nout = out_ref.shape[1]
    dt = out_ref.dtype
    i = pl.program_id(0)
    lanes_in = (th + 6) * wd
    n_a_rows = th + 4

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
    _copy_slot(xcur, xtile, slot)

    # chunked upconv: 3-tap dy dots on pre-shifted interleaved input.
    # out row j of the (th+4)-row 'a' region reads input rows j..j+2.
    plan = _chunk_plan(n_a_rows, nck)
    colps = {}
    pend = None
    for ck, (i0, q) in enumerate(plan):
        nr = q + 2
        if nr not in colps:
            colps[nr] = _col_plane(cpi, nr * wd, wd)
        sh = shbuf.at[ck & 1]
        x32 = xcur[:, pl.ds(i0 * wd, nr * wd)].astype(jnp.float32)
        acc = jnp.zeros((4 * cp, q * wd), jnp.float32)
        if split:
            _preshift_sbuf(sh, x32, colps[nr], wc_real, dt, cpi)
            for dy in range(3):
                wdy = wup_ref[dy]
                acc = acc + lax.dot(
                    lax.slice_in_dim(wdy, 0, 2 * cpi, axis=1),
                    sh[:, pl.ds(dy * wd, q * wd)],
                    preferred_element_type=jnp.float32)
                acc = acc + lax.dot(
                    lax.slice_in_dim(wdy, 2 * cpi, 3 * cpi, axis=1),
                    xcur[pl.ds(0, cpi), pl.ds((i0 + dy) * wd, q * wd)],
                    preferred_element_type=jnp.float32)
        else:
            _preshift_into(sh, x32, colps[nr], wc_real, dt, cpi)
            for dy in range(3):
                acc = acc + lax.dot(
                    wup_ref[dy], sh[:, pl.ds(dy * wd, q * wd)],
                    preferred_element_type=jnp.float32)
        if pend is not None:
            o0, a = pend
            abuf[:, pl.ds(o0 * wd, a.shape[1])] = _sin_poly(
                a + bup_ref[...])
        pend = (i0, acc)
    o0, a = pend
    abuf[:, pl.ds(o0 * wd, a.shape[1])] = _sin_poly(
        a + bup_ref[...])

    def src_get(r1, i0, nr):
        return abuf[pl.ds(r1 * 2 * cp, 2 * cp),
                    pl.ds(i0 * wd, nr * wd)].astype(jnp.float32)

    def out_write(py, o0, val):
        out_ref[pl.ds(py * 2 * cp, 2 * cp),
                pl.ds(o0 * wd, val.shape[1])] = val.astype(dt)

    _rsft_chain_ck(i * th, th, wd, cp, hc_real, wc_real, dt, src_get,
                   planes_ref, sft_ref, h0_ref, f0_ref, b0_ref, h1_ref,
                   f1_ref, b1_ref, (kba, kbb), mid, out_write, nck,
                   split=split)


def _conv_rsft_kernel_ck(hc_real, wc_real, wd, cp, th, head, nck, split,
                         x_hbm, hc_ref, fc_ref, bc_ref, h0_ref, f0_ref,
                         b0_ref, h1_ref, f1_ref, b1_ref, hh_ref, fh_ref,
                         bh_ref, sft_ref, planes_ref, out_ref, xtile,
                         xcur, cbuf, kba, kbb, mid, rbuf, sem):
    """Chunked stage kernel B: planar conv -> sin -> TAT [-> head].
    split: the pre conv (src xcur), conv1 (src mid) and head (src rbuf)
    read their unshifted planes straight from the resident source
    (fc_ref/f1_ref/fh_ref must be the reordered split mats)."""
    dt = out_ref.dtype
    i = pl.program_id(0)
    halo = 4 if head else 3
    lanes_in = (th + 2 * halo) * wd
    n_c_rows = th + 2 * halo - 2

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
    _copy_slot(xcur, xtile, slot)

    def src_pre(r1, i0, nr):
        return xcur[pl.ds(r1 * 2 * cp, 2 * cp),
                    pl.ds(i0 * wd, nr * wd)].astype(jnp.float32)

    def epi_pre(o0, a0, a1):
        n = a0.shape[1]
        cbuf[pl.ds(0, 2 * cp), pl.ds(o0 * wd, n)] = _sin_poly(
            a0 + bc_ref[pl.ds(0, 2 * cp)]).astype(dt)
        cbuf[pl.ds(2 * cp, 2 * cp), pl.ds(o0 * wd, n)] = _sin_poly(
            a1 + bc_ref[pl.ds(2 * cp, 2 * cp)]).astype(dt)

    _conv_chunked((kba, kbb), src_pre, epi_pre, hc_ref, fc_ref, cp, cp,
                  wd, n_c_rows, nck, wc_real, dt, merge=not head,
                  src_ref=xcur if split else None)

    def src_chain(r1, i0, nr):
        return cbuf[pl.ds(r1 * 2 * cp, 2 * cp),
                    pl.ds(i0 * wd, nr * wd)].astype(jnp.float32)

    if not head:
        def out_write(py, o0, val):
            out_ref[pl.ds(py * 2 * cp, 2 * cp),
                    pl.ds(o0 * wd, val.shape[1])] = val.astype(dt)

        _rsft_chain_ck(i * th, th, wd, cp, hc_real, wc_real, dt,
                       src_chain, planes_ref, sft_ref, h0_ref, f0_ref,
                       b0_ref, h1_ref, f1_ref, b1_ref, (kba, kbb), mid,
                       out_write, nck, split=split)
        return

    thr = th + 2

    def out_write_r(py, o0, val):
        n = val.shape[1]
        rowr = planes_ref[0, :, pl.ds(0, n)] + (i * th - 1 + o0)
        colr = planes_ref[1, :, pl.ds(0, n)]
        ok = (rowr >= 0) & (rowr < hc_real) & (colr < wc_real)
        rbuf[pl.ds(py * 2 * cp, 2 * cp), pl.ds(o0 * wd, n)] = jnp.where(
            ok, val, 0.0).astype(dt)

    _rsft_chain_ck(i * th - 1, thr, wd, cp, hc_real, wc_real, dt,
                   src_chain, planes_ref, sft_ref, h0_ref, f0_ref, b0_ref,
                   h1_ref, f1_ref, b1_ref, (kba, kbb), mid, out_write_r,
                   nck, merge=False, split=split)

    def src_head(r1, i0, nr):
        return rbuf[pl.ds(r1 * 2 * cp, 2 * cp),
                    pl.ds(i0 * wd, nr * wd)].astype(jnp.float32)

    def epi_head(o0, h0o, h1o):
        n = h0o.shape[1]
        out_ref[pl.ds(0, 32), pl.ds(o0 * wd, n)] = _outimg(
            h0o + bh_ref[pl.ds(0, 32)]).astype(dt)
        out_ref[pl.ds(32, 32), pl.ds(o0 * wd, n)] = _outimg(
            h1o + bh_ref[pl.ds(32, 32)]).astype(dt)

    _conv_chunked((kba, kbb), src_head, epi_head, hh_ref, fh_ref, cp, 16,
                  wd, th, nck, wc_real, dt, merge=False,
                  src_ref=rbuf if split else None)


def _upconv_rsft_kernel(hc_real, wc_real, wd, cpi, cp, th, i8, i8_in,
                        out_q, x_hbm, wup_ref, bup_ref, h0_ref, f0_ref,
                        b0_ref, h1_ref, f1_ref, b1_ref, sft_ref,
                        planes_ref, invq_ref, scq_ref, outq_ref, out_ref,
                        xtile, shbuf, kb1, mid, kb2, sem):
    """Stage kernel A: stride-2 upconv -> sin -> TAT block, all fused.
    x_hbm: (Cpi, Hp*wd) interleaved input with THREE zero halo rows.
    i8: W8A8 mode — wup/h0/f0/h1/f1 hold int8 mats, shbuf/kb1/kb2 are
    int8 scratch, invq_ref (3, 4*Cp, 1) = [x (rows 0..Cpi), t0, t1]
    quantisation multipliers, scq_ref (3, 4*Cp, 1) = [up, conv0, conv1]
    dequant row scales.  i8_in: x_hbm already holds int8 codes at the
    "x" bound — the upconv staging build is zero-convert.  out_q:
    quantise the block output with outq_ref (4*Cp, 1) and emit int8."""
    nout = out_ref.shape[1]
    dt = jnp.int8 if out_q else out_ref.dtype
    # compute/mid store dtype (mid is int8 only in W8A8 mode, where the
    # q-branch of _rsft_chain quantises its own stores)
    bdt = jnp.bfloat16 if mid.dtype == jnp.int8 else mid.dtype
    i = pl.program_id(0)
    lanes_in = (th + 6) * wd
    n_a = (th + 4) * wd

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

    colp_i = _col_plane(cpi, lanes_in, wd)
    if i8_in:
        _preshift_i8(shbuf, xtile[slot], colp_i, wc_real, cpi, wd)
    else:
        x32 = xtile[slot].astype(jnp.float32)
        if i8:
            x32 = _quant_act(x32, lax.slice_in_dim(invq_ref[0], 0, cpi,
                                                   axis=0))
        _preshift_into(shbuf, x32, colp_i, wc_real, bdt, cpi,
                       pack=i8 and I8_KBUF_ROLL == "pack", wd=wd)
    acc_t = jnp.int32 if i8 else jnp.float32
    acc = jnp.zeros((4 * cp, n_a), acc_t)
    for dy in range(3):
        acc = acc + lax.dot(wup_ref[dy], shbuf[:, pl.ds(dy * wd, n_a)],
                            preferred_element_type=acc_t)
    if i8:
        a32 = _sin_poly(acc.astype(jnp.float32) * scq_ref[0]
                        + bup_ref[...])
        q = (invq_ref[1], scq_ref[1], invq_ref[2], scq_ref[2])
    else:
        a32 = _sin_poly(acc + bup_ref[...])
        q = None

    def out_write(py, val):
        if out_q:
            val = _quant_act(val, lax.slice_in_dim(
                outq_ref[...], py * 2 * cp, (py + 1) * 2 * cp, axis=0))
        out_ref[pl.ds(py * 2 * cp, 2 * cp), :] = val.astype(dt)

    _rsft_chain(i * th, th, wd, cp, hc_real, wc_real, bdt, a32,
                planes_ref, sft_ref, h0_ref, f0_ref, b0_ref, h1_ref,
                f1_ref, b1_ref, kb1, mid, kb2, out_write, q=q)


def fused_upconv_rsft(x, prep, sft, *, c_in, c, wc_real, th=TH, nck=0,
                      split=False, i8_in=False, out_inv=None,
                      cpi=None, cp=None, interpret=False):
    """Stage kernel A wrapper.  x: (C_in, Hc, Wd) interleaved bf16 on the
    coarse grid (Wd a power of two); prep: prepare_upconv_rsft output;
    sft: (4, 4*Cp, 1) planar SFT vectors.  Returns (4*Cp, Hc, Wd) planar
    — the stage's fine (C, 2*Hc, 2*Wc) output.  nck>0 selects the
    chunked/software-pipelined kernel with nck chunks per conv; split
    additionally reads unshifted dot planes straight from the resident
    sources (half the prologue stores; requires nck >= 1).

    Zero-convert W8A8 plumbing (serialized kernels only): i8_in=True
    declares x an int8 tensor already quantised at this stage's "x"
    bound (the producer emitted it via ITS out_inv); out_inv, a (4*Cp,)
    or (4*Cp, 1) f32 quantisation multiplier, makes THIS stage emit its
    output as int8 codes for the next stage's i8_in."""
    ci, hc, wd = x.shape
    assert wd & (wd - 1) == 0 and wd >= 128, wd
    cpi = _round16(c_in) if cpi is None else cpi
    cp = _round16(c) if cp is None else cp
    i8 = bool(prep.get("i8"))
    assert not (i8 and (nck > 0 or split)), \
        "int8 stage kernels are serialized-only (nck=0, no split)"
    assert not ((i8_in or out_inv is not None) and nck > 0), \
        "zero-convert i8 plumbing is serialized-only (nck=0)"
    assert not i8_in or (i8 and x.dtype == jnp.int8), (i8, x.dtype)
    kdt = jnp.int8 if i8 else x.dtype
    out_dt = (jnp.int8 if out_inv is not None
              else (jnp.bfloat16 if x.dtype == jnp.int8 else x.dtype))
    grid = pl.cdiv(hc, th)
    hp = grid * th + 6
    xf = jnp.pad(x, ((0, cpi - ci), (3, hp - hc - 3), (0, 0)))
    xf = xf.reshape(cpi, hp * wd)
    planes = _region_planes(2 * cp, th + 4, wd)
    dq = jnp.zeros((2, 8, 1), jnp.float32)
    invq = prep.get("invq", dq)
    scq = prep.get("scq", dq)
    outq = (jnp.zeros((8, 1), jnp.float32) if out_inv is None
            else jnp.asarray(out_inv, jnp.float32).reshape(4 * cp, 1))
    assert not (split and nck == 0), "split mode requires nck >= 1"
    if nck > 0:
        q_up = _chunk_plan(th + 4, nck)[0][1]
        q_kb = _chunk_plan(th + 2, nck)[0][1]
        fn = functools.partial(_upconv_rsft_kernel_ck, hc, wc_real, wd,
                               cpi, cp, th, nck, split)
        scratch = [
            pltpu.VMEM((2, cpi, (th + 6) * wd), x.dtype),
            pltpu.VMEM((cpi, (th + 6) * wd), x.dtype),
            pltpu.VMEM((2, (2 if split else 3) * cpi, (q_up + 2) * wd),
                       x.dtype),
            # f32: keeps the 'a' region unrounded like the non-chunked
            # kernel (bit-exact parity; bf16 here costs one ulp e2e)
            pltpu.VMEM((4 * cp, (th + 4) * wd), jnp.float32),
            pltpu.VMEM((8 * cp, (q_kb + 2) * wd), x.dtype),
            pltpu.VMEM((8 * cp, (q_kb + 2) * wd), x.dtype),
            pltpu.VMEM((4 * cp, (th + 2) * wd), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        fn = functools.partial(_upconv_rsft_kernel, hc, wc_real, wd, cpi,
                               cp, th, i8, i8_in, out_inv is not None)
        scratch = [
            pltpu.VMEM((2, cpi, (th + 6) * wd), x.dtype),
            pltpu.VMEM((3 * cpi, (th + 6) * wd), kdt),
            pltpu.VMEM((8 * cp, (th + 4) * wd), kdt),
            pltpu.VMEM((4 * cp, (th + 2) * wd), kdt),
            pltpu.VMEM((8 * cp, (th + 2) * wd), kdt),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if nck > 0:
        inputs = (xf, prep["wup_r" if split else "wup"], prep["bup"],
                  prep["h0"], prep["f0"], prep["b0"], prep["h1"],
                  prep["f1_r" if split else "f1"], prep["b1"], sft,
                  planes)
    else:
        inputs = (xf, prep["wup"], prep["bup"], prep["h0"], prep["f0"],
                  prep["b0"], prep["h1"], prep["f1"], prep["b1"], sft,
                  planes, invq, scq, outq)
    out = _precision_safe_pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(inputs) - 1),
        out_specs=pl.BlockSpec((4 * cp, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * cp, hc * wd), out_dt),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return out.reshape(4 * cp, hc, wd)


def _conv_rsft_kernel(hc_real, wc_real, wd, cp, th, head, i8, i8_in,
                      out_q, x_hbm, hc_ref, fc_ref, bc_ref, h0_ref,
                      f0_ref, b0_ref, h1_ref, f1_ref, b1_ref, hh_ref,
                      fh_ref, bh_ref, sft_ref, planes_ref, invq_ref,
                      scq_ref, outq_ref, out_ref, xtile, cbuf, kb1, mid,
                      kb2, rbuf, sem):
    """Stage kernel B: planar conv -> sin -> TAT block [-> head+OutImg].
    x_hbm: planar with `halo` zero coarse rows (4 with head, 3 without).
    i8: W8A8 mode — conv/TAT/head weight refs hold the int8 mats, kb1/kb2
    are int8 scratch, invq_ref (4, 4*Cp, 1) holds the per-conv-input
    quantisation multipliers [x, t0, t1, h] and scq_ref (4, 4*Cp, 1) the
    per-output-row dequant scales [conv, conv0, conv1, head(pad)].
    i8_in: x_hbm already holds int8 codes at the "x" bound (the
    producing stage quantised in ITS epilogue) — the pre-conv K-buf
    build is zero-convert.  out_q: quantise the block output with
    outq_ref (4*Cp, 1) and emit int8 (the next stage's i8_in input)."""
    dt = jnp.int8 if out_q else out_ref.dtype
    bdt = cbuf.dtype
    i = pl.program_id(0)
    halo = 4 if head else 3
    lanes_in = (th + 2 * halo) * wd
    n_c = (th + 2 * halo - 2) * wd       # conv output region
    n_r = (th + 2) * wd if head else th * wd

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

    # planar conv + sin -> cbuf (region rows i*th - halo + 1 ..)
    colp = _col_plane(cp, lanes_in, wd)
    if i8_in:
        x8 = xtile[slot]

        def src_x8(r1):
            return lax.slice_in_dim(x8, r1 * 2 * cp, (r1 + 1) * 2 * cp,
                                    axis=0)

        _build_kbuf_i8(kb1, src_x8, colp, wc_real, cp, wd)
        scc = scq_ref[0]
        q = (invq_ref[1], scq_ref[1], invq_ref[2], scq_ref[2])
    elif i8:
        x32 = xtile[slot].astype(jnp.float32)
        invx = invq_ref[0]

        def src_x(r1):
            return _quant_act(
                lax.slice_in_dim(x32, r1 * 2 * cp, (r1 + 1) * 2 * cp,
                                 axis=0),
                lax.slice_in_dim(invx, r1 * 2 * cp, (r1 + 1) * 2 * cp,
                                 axis=0))

        _build_kbuf(kb1, src_x, colp, wc_real, cp, bdt, wd=wd)
        scc = scq_ref[0]
        q = (invq_ref[1], scq_ref[1], invq_ref[2], scq_ref[2])
    else:
        x32 = xtile[slot].astype(jnp.float32)
        _build_kbuf(kb1, x32, colp, wc_real, cp, bdt)
        scc = q = None
    c0, c1 = _planar_dots(kb1, hc_ref, fc_ref, cp, cp, wd, n_c,
                          merge=not head, sc=scc)
    cbuf[pl.ds(0, 2 * cp), :] = _sin_poly(
        c0 + bc_ref[pl.ds(0, 2 * cp)]).astype(bdt)
    cbuf[pl.ds(2 * cp, 2 * cp), :] = _sin_poly(
        c1 + bc_ref[pl.ds(2 * cp, 2 * cp)]).astype(bdt)

    c32 = cbuf[...].astype(jnp.float32)
    if not head:
        def out_write(py, val):
            if out_q:
                val = _quant_act(val, lax.slice_in_dim(
                    outq_ref[...], py * 2 * cp, (py + 1) * 2 * cp,
                    axis=0))
            out_ref[pl.ds(py * 2 * cp, 2 * cp), :] = val.astype(dt)

        _rsft_chain(i * th, th, wd, cp, hc_real, wc_real, bdt, c32,
                    planes_ref, sft_ref, h0_ref, f0_ref, b0_ref, h1_ref,
                    f1_ref, b1_ref, kb1, mid, kb2, out_write, q=q)
        return

    # with head: TAT emits th+2 rows into rbuf (masked), head eats them.
    # rbuf region rows: i*th - 1 + r.  In i8 mode rbuf holds int8 codes
    # at the "h" bound (quantised here, in the store that was happening
    # anyway) so the head K-buf build is zero-convert.
    thr = th + 2
    rowr = planes_ref[0, :, pl.ds(0, n_r)] + (i * th - 1)
    colr = planes_ref[1, :, pl.ds(0, n_r)]
    ok_r = (rowr >= 0) & (rowr < hc_real) & (colr < wc_real)

    if q is not None:
        invh = invq_ref[3]

        def out_write_r(py, val):
            val = _quant_act(
                jnp.where(ok_r, val, 0.0),
                lax.slice_in_dim(invh, py * 2 * cp, (py + 1) * 2 * cp,
                                 axis=0))
            rbuf[pl.ds(py * 2 * cp, 2 * cp), :] = val.astype(jnp.int8)
    else:
        def out_write_r(py, val):
            rbuf[pl.ds(py * 2 * cp, 2 * cp), :] = jnp.where(
                ok_r, val, 0.0).astype(bdt)

    _rsft_chain(i * th - 1, thr, wd, cp, hc_real, wc_real, bdt, c32,
                planes_ref, sft_ref, h0_ref, f0_ref, b0_ref, h1_ref,
                f1_ref, b1_ref, kb1, mid, kb2, out_write_r, merge=False,
                q=q)

    colh = _col_plane(cp, n_r, wd)
    if i8:
        def src_h8(r1):
            return rbuf[pl.ds(r1 * 2 * cp, 2 * cp), :]

        _build_kbuf_i8(kb1, src_h8, colh, wc_real, cp, wd)
        sch = lax.slice_in_dim(scq_ref[3], 0, 64, axis=0)
    else:
        _build_kbuf(kb1, rbuf[...].astype(jnp.float32), colh, wc_real,
                    cp, bdt)
        sch = None
    h0o, h1o = _planar_dots(kb1, hh_ref, fh_ref, cp, 16, wd, th * wd,
                            merge=False, sc=sch)
    out_ref[pl.ds(0, 32), :] = _outimg(
        h0o + bh_ref[pl.ds(0, 32)]).astype(out_ref.dtype)
    out_ref[pl.ds(32, 32), :] = _outimg(
        h1o + bh_ref[pl.ds(32, 32)]).astype(out_ref.dtype)


def fused_conv_rsft(xp, prep, sft, *, c, wc_real, head=False, th=TH,
                    nck=0, split=False, i8_in=False, out_inv=None,
                    interpret=False):
    """Stage kernel B wrapper.  xp: (4*Cp, Hc, Wd) planar bf16; prep:
    prepare_conv_rsft output; sft: (4, 4*Cp, 1).  Returns (4*Cp, Hc, Wd)
    planar, or with head=True the (64, Hc, Wd) planar RGB (plane p rows
    [16p, 16p+3)).  nck>0 selects the chunked/software-pipelined kernel
    with nck chunks per conv; split additionally reads unshifted dot
    planes straight from the resident sources (requires nck >= 1).

    Zero-convert W8A8 plumbing (serialized kernels only): i8_in=True
    declares xp an int8 tensor already quantised at this stage's "x"
    bound; out_inv (4*Cp,) / (4*Cp, 1) f32 makes this stage emit int8
    codes (mutually exclusive with head — the RGB output stays bf16)."""
    g, hc, wd = xp.shape
    assert wd & (wd - 1) == 0 and wd >= 128, wd
    cp = g // 4
    # cp32 mode pads beyond the 16-rounding so int8 sublane alignment
    # holds at any fine channel count; cp is carried by the input shape
    assert cp >= _round16(c) and cp % 16 == 0, (cp, c)
    i8 = bool(prep.get("i8"))
    assert not (i8 and (nck > 0 or split)), \
        "int8 stage kernels are serialized-only (nck=0, no split)"
    assert not ((i8_in or out_inv is not None) and nck > 0), \
        "zero-convert i8 plumbing is serialized-only (nck=0)"
    assert not i8_in or (i8 and xp.dtype == jnp.int8), (i8, xp.dtype)
    assert not (head and out_inv is not None), "head output stays bf16"
    kdt = jnp.int8 if i8 else xp.dtype
    cdt = jnp.bfloat16 if xp.dtype == jnp.int8 else xp.dtype
    out_dt = jnp.int8 if out_inv is not None else cdt
    halo = 4 if head else 3
    grid = pl.cdiv(hc, th)
    hp = grid * th + 2 * halo
    xf = jnp.pad(xp, ((0, 0), (halo, hp - hc - halo), (0, 0)))
    xf = xf.reshape(4 * cp, hp * wd)
    gout = 64 if head else 4 * cp
    n_r = (th + 2) * wd if head else th * wd
    dummy = jnp.zeros((2, 8, 128), jnp.int8 if i8 else jnp.bfloat16)
    hh = prep.get("hh", dummy)
    fh = prep.get("fh", dummy)
    bh = prep.get("bh", jnp.zeros((64, 1), jnp.float32))
    dq = jnp.zeros((2, 8, 1), jnp.float32)
    invq = prep.get("invq", dq)
    scq = prep.get("scq", dq)
    outq = (jnp.zeros((8, 1), jnp.float32) if out_inv is None
            else jnp.asarray(out_inv, jnp.float32).reshape(4 * cp, 1))
    planes = _region_planes(2 * cp, th + 2 * halo - 2, wd)
    assert not (split and nck == 0), "split mode requires nck >= 1"
    if nck > 0:
        q_kb = _chunk_plan(th + 2 * halo - 2, nck)[0][1]
        fn = functools.partial(_conv_rsft_kernel_ck, hc, wc_real, wd, cp,
                               th, head, nck, split)
        scratch = [
            pltpu.VMEM((2, 4 * cp, (th + 2 * halo) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2 * halo) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2 * halo - 2) * wd), xp.dtype),
            pltpu.VMEM((8 * cp, (q_kb + 2) * wd), xp.dtype),
            pltpu.VMEM((8 * cp, (q_kb + 2) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2 * halo - 4) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, n_r) if head else (8, 128), xp.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        fn = functools.partial(_conv_rsft_kernel, hc, wc_real, wd, cp, th,
                               head, i8, i8_in, out_inv is not None)
        scratch = [
            pltpu.VMEM((2, 4 * cp, (th + 2 * halo) * wd), xp.dtype),
            pltpu.VMEM((4 * cp, (th + 2 * halo - 2) * wd), cdt),
            pltpu.VMEM((8 * cp, (th + 2 * halo) * wd), kdt),
            pltpu.VMEM((4 * cp, (th + 2 * halo - 4) * wd), kdt),
            pltpu.VMEM((8 * cp, (th + 2 * halo - 4) * wd), kdt),
            pltpu.VMEM((4 * cp, n_r) if head else (8, 128), kdt),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    if nck > 0:
        inputs = (xf, prep["hc"], prep["fc_r" if split else "fc"],
                  prep["bc"], prep["h0"], prep["f0"], prep["b0"],
                  prep["h1"], prep["f1_r" if split else "f1"],
                  prep["b1"], hh,
                  (prep.get("fh_r", dummy) if split else fh), bh, sft,
                  planes)
    else:
        inputs = (xf, prep["hc"], prep["fc"], prep["bc"], prep["h0"],
                  prep["f0"], prep["b0"], prep["h1"], prep["f1"],
                  prep["b1"], hh, fh, bh, sft, planes, invq, scq, outq)
    out = _precision_safe_pallas_call(
        fn,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (len(inputs) - 1),
        out_specs=pl.BlockSpec((gout, th * wd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gout, hc * wd), out_dt),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*inputs)
    return out.reshape(gout, hc, wd)


def rgb_planar_to_nhwc(out_planar, hc, wc_real):
    """(64, Hc, Wd) planar RGB -> (1, 2*Hc, 2*Wc, 3) in [0,1] (XLA)."""
    x = out_planar.reshape(2, 2, 16, hc, -1)[:, :, :3, :, :wc_real]
    x = x.transpose(3, 0, 4, 1, 2)  # (Hc, r1, Wc, r2, 3)
    return x.reshape(1, 2 * hc, 2 * wc_real, 3)
