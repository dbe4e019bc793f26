"""Minimal kornia shim: only geometry.conversions.normalize_homography."""

from kornia import geometry  # noqa: F401
