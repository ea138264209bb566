import numpy as np
from PIL import Image


def save_image(tensor, path, **_):
    t = tensor.detach().float().cpu().clamp(0, 1)
    if t.dim() == 4:
        t = t[0] if t.shape[0] == 1 else _grid(t)
    arr = (t.permute(1, 2, 0).numpy() * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def _grid(t):
    import torch

    return torch.cat(list(t), dim=2)
