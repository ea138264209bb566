"""Minimal torchvision shim (only the surface the reference repo touches:
transforms.ToTensor, transforms.functional.center_crop/resize,
utils.save_image). torchvision is not installed in this environment."""

from . import transforms, utils  # noqa: F401
