"""Dataset layer tests: directory loading, crop/resize, splits, masks,
interpolation neighbours."""

import numpy as np
import pytest
from PIL import Image

from boosting_nerv_tpu.data import (VideoData, data_split, make_inpaint_mask,
                                    synthetic_video)


def _write_frames(tmp, frames):
    for i, f in enumerate(frames):
        Image.fromarray(f).save(tmp / f"f{i:05d}.png")


class TestVideoData:
    def test_from_dir_center_crop(self, tmp_path):
        frames = synthetic_video(5, 32, 48)
        _write_frames(tmp_path, frames)
        v = VideoData.from_dir(str(tmp_path), "16_32")
        assert v.frames.shape == (5, 16, 32, 3)
        # centre crop: rows 8..24, cols 8..40
        np.testing.assert_array_equal(v.frames[0], frames[0][8:24, 8:40])

    def test_from_dir_resize_fallback(self, tmp_path):
        frames = synthetic_video(3, 16, 16)
        _write_frames(tmp_path, frames)
        v = VideoData.from_dir(str(tmp_path), "32_32")
        assert v.frames.shape == (3, 32, 32, 3)

    def test_interpolation_drops_even_tail(self):
        v = VideoData(synthetic_video(6, 8, 8), interpolation=True)
        assert v.n == 5

    def test_norm_idx(self):
        v = VideoData(synthetic_video(4, 8, 8))
        np.testing.assert_allclose(v.norm_idx(np.array([0, 3])),
                                   [0.25, 1.0])

    def test_embed_inter_neighbours(self):
        v = VideoData(synthetic_video(5, 8, 8), interpolation=True,
                      embed_inter=True)
        b = v.get_batch([1, 2])
        # odd frame 1: neighbours 0 and 2; even frame 2: itself
        np.testing.assert_array_equal(b["pre_img"][0] * 255, v.frames[0])
        np.testing.assert_array_equal(b["post_img"][0] * 255, v.frames[2])
        np.testing.assert_array_equal(b["pre_img"][1] * 255, v.frames[2])

    def test_epoch_batches_drop_last(self):
        v = VideoData(synthetic_video(5, 8, 8))
        batches = list(v.epoch_batches(range(5), 2, shuffle=False, seed=0))
        assert len(batches) == 2
        batches = list(v.epoch_batches(range(5), 2, False, 0,
                                       drop_last=False))
        assert len(batches) == 3 and len(batches[-1]["idx"]) == 1


class TestSplitsAndMasks:
    def test_data_split_even_odd(self):
        train, val = data_split(list(range(6)), [1, 1, 2])
        assert train == [0, 2, 4] and val == [1, 3, 5]

    def test_data_split_18_19_20(self):
        train, val = data_split(list(range(40)), [18, 19, 20])
        assert len(train) == 36 and len(val) == 2
        assert val == [19, 39]

    def test_center_mask(self):
        m = make_inpaint_mask(64, 64, "inpanting_center")
        assert m.shape == (64, 64)
        assert m[32, 32] == 0 and m[0, 0] == 1
        # h/4 x w/4 hole
        assert (m == 0).sum() == 16 * 16

    def test_fixed_mask_five_boxes(self):
        m = make_inpaint_mask(200, 200, "inpanting_fixed_50")
        assert (m == 0).sum() == 5 * 50 * 50

    def test_no_mask(self):
        assert make_inpaint_mask(8, 8, "none") is None
