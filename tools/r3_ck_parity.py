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
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                - got.astype(jnp.float32))))
    print(f"{tag:40s} maxerr = {err:.2e}", flush=True)
    assert err == 0.0, (tag, err)


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
    print("ALL OK", flush=True)


main()
