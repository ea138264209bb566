import numpy as np
import torch

from . import functional  # noqa: F401


class ToTensor:
    def __call__(self, pic):
        arr = np.asarray(pic, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        return torch.from_numpy(arr).permute(2, 0, 1).contiguous()
