"""Interpret-mode parity of the chunked (nck>0) stage kernels vs the
production (nck=0) ones.  Same math, different emission order -> exact
equality expected.  Run: JAX_PLATFORMS=cpu python tools/r3_ck_parity.py
"""
import numpy as np
import jax
import jax.numpy as jnp

import boosting_nerv_tpu.ops.pallas.planar as pk

rng = np.random.default_rng(1)


def r(*shape, s=0.2):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * s)


def check(tag, ref, got):
    d = jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))
    err = float(jnp.max(d))
    nbad = int((d > 0).sum())
    print(f"{tag:44s} maxerr = {err:.2e} nbad = {nbad}", flush=True)
    # rare 1-ulp bf16 tie flips allowed (XLA-CPU dot summation order
    # varies with the dot's N/K split); indexing bugs are O(1) errors
    tol = jnp.maximum(jnp.abs(ref.astype(jnp.float32)),
                      jnp.abs(got.astype(jnp.float32))) * 2.0 ** -7 + 1e-30
    assert nbad <= 8 and bool((d <= tol).all()), (tag, err, nbad)


def main():
    c_in, c, hc, wc, wd = 6, 5, 11, 50, 128
    x = r(c_in, hc, wd).astype(jnp.bfloat16)
    prep_a = pk.prepare_upconv_rsft(
        r(3, 3, c_in, 4 * c), r(4 * c, s=0.1), r(3, 3, c, c), r(c, s=0.1),
        r(3, 3, c, c), r(c, s=0.1), c_in=c_in, c=c)
    sft = pk.sft_planar_vectors(r(c, s=0.3), r(c, s=0.3), r(c, s=0.3),
                                r(c, s=0.3), 16)
    ref = pk.fused_upconv_rsft(x, prep_a, sft, c_in=c_in, c=c, wc_real=wc,
                               th=4, interpret=True)
    for nck in (2, 3, 6):
        got = pk.fused_upconv_rsft(x, prep_a, sft, c_in=c_in, c=c,
                                   wc_real=wc, th=4, nck=nck,
                                   interpret=True)
        check(f"fused_upconv_rsft nck={nck}", ref, got)
    for nck in (1, 3):
        got = pk.fused_upconv_rsft(x, prep_a, sft, c_in=c_in, c=c,
                                   wc_real=wc, th=4, nck=nck, split=True,
                                   interpret=True)
        check(f"fused_upconv_rsft nck={nck} split", ref, got)

    xp = r(4 * 16, hc, wd).astype(jnp.bfloat16)
    for head in (False, True):
        prep_b = pk.prepare_conv_rsft(
            r(3, 3, c, c), r(c, s=0.1), r(3, 3, c, c), r(c, s=0.1),
            r(3, 3, c, c), r(c, s=0.1), c=c,
            head_k=r(3, 3, c, 3) if head else None,
            head_b=r(3, s=0.1) if head else None)
        ref = pk.fused_conv_rsft(xp, prep_b, sft, c=c, wc_real=wc,
                                 head=head, th=4, interpret=True)
        for nck in (2, 3, 6):
            got = pk.fused_conv_rsft(xp, prep_b, sft, c=c, wc_real=wc,
                                     head=head, th=4, nck=nck,
                                     interpret=True)
            check(f"fused_conv_rsft head={head} nck={nck}", ref, got)
        for nck in (1, 3):
            got = pk.fused_conv_rsft(xp, prep_b, sft, c=c, wc_real=wc,
                                     head=head, th=4, nck=nck, split=True,
                                     interpret=True)
            check(f"fused_conv_rsft head={head} nck={nck} split",
                  ref, got)
    print("ALL OK", flush=True)


main()
