"""Minimal torchvision shim: to_tensor/to_pil_image/make_grid as used by the reference."""

from torchvision import transforms, utils  # noqa: F401
