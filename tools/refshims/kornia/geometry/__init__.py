from kornia.geometry import conversions  # noqa: F401
