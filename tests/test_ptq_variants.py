"""Tests for the per-tensor/axis PTQ variant with zero-exclusion."""

import numpy as np

from boosting_nerv_tpu.ops.ptq import quantize_per_tensor


class TestQuantizePerTensor:
    def test_whole_tensor(self):
        t = np.random.default_rng(0).normal(size=(32, 16)).astype(np.float32)
        quant, new_t, t_min, scale = quantize_per_tensor(t, 8, axis=-1)
        assert t_min.dtype == np.float16 and scale.dtype == np.float16
        assert np.abs(new_t - t).mean() < 0.02

    def test_axis0(self):
        rng = np.random.default_rng(1)
        t = np.stack([rng.normal(scale=s, size=(64,))
                      for s in (0.01, 1.0, 100.0)]).astype(np.float32)
        quant, new_t, t_min, scale = quantize_per_tensor(t, 8, axis=0)
        assert scale.shape == (3, 1)
        # per-row scaling keeps relative error bounded across magnitudes
        for r in range(3):
            rel = np.abs(new_t[r] - t[r]).mean() / (np.abs(t[r]).mean() + 1e-9)
            assert rel < 0.02, (r, rel)

    def test_zeros_excluded_from_range(self):
        t = np.zeros((4, 64), dtype=np.float32)
        t[0, :8] = np.linspace(5.0, 6.0, 8)
        quant, new_t, t_min, scale = quantize_per_tensor(t, 8, axis=0)
        # row 0's grid is fit to [5, 6], not [0, 6]
        assert abs(float(t_min[0, 0]) - 5.0) < 0.01
        # all-zero rows get a degenerate (0, 0) grid without NaNs
        assert np.isfinite(new_t).all()
