"""The deviceless AOT policy gate in build_serving_decode.

A VMEM-overflowing tile policy must degrade to the safe th=8/nck=0
policy at BUILD time (round-4 verdict weak #4: aggressive policies on
unverified shapes used to surface as remote-compile failures at the
caller's first jit).  The Mosaic compile itself is exercised by
tools/aot_compile_check.py on the deviceless v5e target; here the
subprocess gate is stubbed so the fallback logic runs on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_nerv_tpu.config import BoostConfig
from boosting_nerv_tpu.models import build_model
from boosting_nerv_tpu.runtime import fast_decode as fd


@pytest.fixture(scope="module")
def tiny():
    cfg = BoostConfig(
        model="HNeRV_Boost", embed="pe_1.25_20", fc_dim=12, fc_hw="64_64",
        dec_strds=[2, 2], dec_blks=[1, 2], ks="0_1_5",
        conv_type=["convnext", "pshuffel_3x3"], act="sin", norm="none",
        sft_block="res_sft", ch_t=8, reduce=1.2, lower_width=4,
        enc_strds=[2, 2], enc_dim="8_4", crop_list="256_256")
    model = build_model(cfg)
    img = jnp.asarray(np.random.default_rng(0).uniform(
        size=(1, 256, 256, 3)).astype(np.float32))
    t = jnp.array([0.4])
    params = model.init(jax.random.key(0), img, t)
    return cfg, params


def test_gate_fallback_to_safe_policy(tiny, monkeypatch):
    cfg, params = tiny
    calls = []
    monkeypatch.setattr("boosting_nerv_tpu.runtime.aot_gate.gate_policy",
                        lambda *a, **k: (calls.append(a), False)[1])
    monkeypatch.setenv("BNT_DECODE_TH", '{"128": 32}')
    monkeypatch.setenv("BNT_AOT_GATE", "1")
    dec = fd.build_serving_decode(cfg, params)
    assert len(calls) == 1
    assert dec.serving_policy["gate_fallback"] is True
    assert dec.serving_policy["th"] == 8
    assert dec.serving_policy["nck"] == 0


def test_gate_pass_keeps_policy(tiny, monkeypatch):
    cfg, params = tiny
    monkeypatch.setattr("boosting_nerv_tpu.runtime.aot_gate.gate_policy",
                        lambda *a, **k: True)
    monkeypatch.setenv("BNT_DECODE_TH", '{"128": 32}')
    monkeypatch.setenv("BNT_AOT_GATE", "1")
    dec = fd.build_serving_decode(cfg, params)
    assert dec.serving_policy["gate_fallback"] is False
    assert dec.serving_policy["th"] == {128: 32}


def test_safe_default_skips_gate(tiny, monkeypatch):
    cfg, params = tiny

    def boom(*a, **k):  # the gate must not run for the safe default
        raise AssertionError("gate_policy called for a safe policy")

    monkeypatch.setattr("boosting_nerv_tpu.runtime.aot_gate.gate_policy",
                        boom)
    monkeypatch.delenv("BNT_DECODE_TH", raising=False)
    monkeypatch.delenv("BNT_DECODE_NCK", raising=False)
    monkeypatch.delenv("BNT_DECODE_SPLIT", raising=False)
    dec = fd.build_serving_decode(cfg, params)
    assert dec.serving_policy["gate_fallback"] is False
    assert dec.serving_policy["th"] == 8
