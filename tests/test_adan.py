"""Adan optimizer: golden comparison against an independent torch/numpy
re-derivation of the published update rule (arXiv 2208.06677), using the same
conventions as the reference optimizer (/root/reference/optimizer.py):
first-step zero gradient-difference, bias corrections, proximal decay."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boosting_nerv_tpu.training import adan, lr_multiplier


def _numpy_adan_run(grads_seq, p0, lr, b1=0.98, b2=0.92, b3=0.99, eps=1e-8,
                    wd=0.0):
    p = p0.copy()
    m = np.zeros_like(p)
    d = np.zeros_like(p)
    n = np.zeros_like(p)
    pg = None
    for step, g in enumerate(grads_seq, start=1):
        gp = g if pg is None else pg
        diff = g - gp
        m = b1 * m + (1 - b1) * g
        d = b2 * d + (1 - b2) * diff
        u = g + b2 * diff
        n = b3 * n + (1 - b3) * u * u
        bc1 = 1 - b1 ** step
        bc2 = 1 - b2 ** step
        bc3s = np.sqrt(1 - b3 ** step)
        denom = np.sqrt(n) / bc3s + eps
        p = p - (lr / bc1) * m / denom - (lr * b2 / bc2) * d / denom
        p = p / (1 + lr * wd)
        pg = g
    return p


class TestAdan:
    @pytest.mark.parametrize("wd", [0.0, 0.01])
    def test_matches_reference_math(self, wd):
        rng = np.random.default_rng(0)
        p0 = rng.normal(size=(7,)).astype(np.float32)
        grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(5)]
        lr = 1e-2

        opt = adan(learning_rate=lr, weight_decay=wd)
        params = {"w": jnp.asarray(p0)}
        state = opt.init(params)
        for g in grads:
            updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        ref = _numpy_adan_run(grads, p0, lr, wd=wd)
        np.testing.assert_allclose(np.asarray(params["w"]), ref, rtol=1e-5, atol=1e-6)

    def test_lr_injection(self):
        opt = adan(learning_rate=1.0)
        params = {"w": jnp.zeros(3)}
        state = opt.init(params)
        g = {"w": jnp.ones(3)}
        u_big, _ = opt.update(g, state, params, lr=1e-1)
        u_small, _ = opt.update(g, state, params, lr=1e-3)
        assert float(jnp.abs(u_big["w"]).sum()) > float(jnp.abs(u_small["w"]).sum())

    def test_converges_quadratic(self):
        opt = adan(learning_rate=0.1)
        params = jnp.array([3.0, -2.0])
        state = opt.init(params)
        for _ in range(800):
            g = 2 * params  # d/dp ||p||^2
            updates, state = opt.update(g, state, params)
            params = params + updates
        assert float(jnp.abs(params).max()) < 1e-2


class TestSchedules:
    def test_cosine_default(self):
        # cosine_0.1_1_0.1: warmup from 0.1 to 1 over first 10%, then cosine
        assert lr_multiplier("cosine_0.1_1_0.1", 0.0) == pytest.approx(0.1)
        assert lr_multiplier("cosine_0.1_1_0.1", 0.05) == pytest.approx(0.55)
        assert lr_multiplier("cosine_0.1_1_0.1", 0.1) == pytest.approx(1.0)
        assert lr_multiplier("cosine_0.1_1_0.1", 0.55) == pytest.approx(0.5)
        assert lr_multiplier("cosine_0.1_1_0.1", 0.9999) == pytest.approx(0.0, abs=1e-6)

    def test_cosine_no_warmup(self):
        assert lr_multiplier("cosine_0_1_0.1", 0.0) == pytest.approx(1.0)

    def test_hybrid(self):
        v = lr_multiplier("hybrid_0.2_1_1_0.1_0.05", 0.6)
        assert 0.05 < v < 1.0

    def test_enerv_sch(self):
        v0 = lr_multiplier("enerv_sch", 0.0, cur_iter=0, epochs=10,
                           full_data_length=100, cur_epoch=0)
        assert v0 == pytest.approx(0.1)
        vmid = lr_multiplier("enerv_sch", 0.0, cur_iter=0, epochs=10,
                             full_data_length=100, cur_epoch=2)
        assert vmid == pytest.approx(1.0)
