"""center_crop / resize for PIL images and CHW tensors (the two input kinds
the reference dataset passes)."""

import numpy as np
import torch
from PIL import Image


def _hw(img):
    if isinstance(img, Image.Image):
        return img.height, img.width
    return img.shape[-2], img.shape[-1]


def center_crop(img, output_size):
    th, tw = output_size
    h, w = _hw(img)
    # torchvision pads when the crop is larger than the image
    pl = max((tw - w) // 2, 0)
    pt = max((th - h) // 2, 0)
    pr = max(tw - w - pl, 0)
    pb = max(th - h - pt, 0)
    if pl or pt or pr or pb:
        if isinstance(img, Image.Image):
            arr = np.asarray(img)
            arr = np.pad(arr, ((pt, pb), (pl, pr)) + ((0, 0),) * (arr.ndim - 2))
            img = Image.fromarray(arr)
        else:
            img = torch.nn.functional.pad(img, (pl, pr, pt, pb))
        h, w = _hw(img)
    i = (h - th) // 2
    j = (w - tw) // 2
    if isinstance(img, Image.Image):
        return img.crop((j, i, j + tw, i + th))
    return img[..., i:i + th, j:j + tw]


def resize(img, size, interpolation=None, antialias=None):
    if isinstance(size, int):
        h, w = _hw(img)
        if h < w:
            size = (size, int(size * w / h))
        else:
            size = (int(size * h / w), size)
    th, tw = size
    if isinstance(img, Image.Image):
        return img.resize((tw, th), Image.BICUBIC)
    out = torch.nn.functional.interpolate(
        img[None].float(), size=(th, tw), mode="bicubic",
        align_corners=False, antialias=True)
    return out[0].clamp(0, 1)
