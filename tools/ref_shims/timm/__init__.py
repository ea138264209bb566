"""Minimal timm shim (only trunc_normal_ / DropPath, the two symbols the
reference repo imports). timm is not installed in this environment."""

from . import models  # noqa: F401
