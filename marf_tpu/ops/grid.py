"""Normalized pixel-grid generation.

Capability parity with `Warp.get_normalized_pixel_grid` (reference
warp.py:33-68): pixel centers (+0.5) mapped to [-1, 1] per axis and scaled by
the aspect-preserving factors norm_h = H/max(H,W), norm_w = W/max(H,W); the
crop variant spans the centered patch_H x patch_W window of the full canvas.

TPU-native design: grids are pure functions of *static* shape config, so they
are computed once at trace time and constant-folded by XLA — the reference
rebuilds the grid from scratch every iteration (reference model/planar.py:331).
We return a single [HW, 2] grid; per-image batching happens by broadcast in
`warp_grid`, never by materializing B copies (the reference `.repeat`s,
warp.py:52).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Static canvas/patch geometry (reference Warp.__init__, warp.py:9-25)."""

    H: int
    W: int
    patch_H: int
    patch_W: int

    @property
    def y_crop(self) -> tuple[int, int]:
        return (self.H // 2 - self.patch_H // 2, self.H // 2 + self.patch_H // 2)

    @property
    def x_crop(self) -> tuple[int, int]:
        return (self.W // 2 - self.patch_W // 2, self.W // 2 + self.patch_W // 2)

    @property
    def norm_h(self) -> float:
        return self.H / max(self.H, self.W)

    @property
    def norm_w(self) -> float:
        return self.W / max(self.H, self.W)


def normalized_pixel_grid(spec: GridSpec, crop: bool = False, dtype=jnp.float32) -> jax.Array:
    """Build the normalized pixel-center grid.

    Args:
      spec: static geometry.
      crop: if True, the grid spans the centered patch window of the canvas
        (reference warp.py:37-53); else the full canvas (warp.py:54-68).

    Returns:
      [HW, 2] grid of (x, y) normalized coordinates.
    """
    if crop:
        y0, y1 = spec.y_crop
        x0, x1 = spec.x_crop
        ys = jnp.arange(y0, y1, dtype=dtype)
        xs = jnp.arange(x0, x1, dtype=dtype)
    else:
        ys = jnp.arange(spec.H, dtype=dtype)
        xs = jnp.arange(spec.W, dtype=dtype)
    y_range = ((ys + 0.5) / spec.H * 2 - 1) * spec.norm_h
    x_range = ((xs + 0.5) / spec.W * 2 - 1) * spec.norm_w
    Y, X = jnp.meshgrid(y_range, x_range, indexing="ij")  # [h, w]
    return jnp.stack([X, Y], axis=-1).reshape(-1, 2)  # [HW, 2]


def crop_corners(spec: GridSpec, dtype=jnp.float32) -> jax.Array:
    """Normalized coordinates of the 4 patch-window corners
    (reference `Warp.warp_corners` corner construction, warp.py:86-91)."""
    Y = [((y + 0.5) / spec.H * 2 - 1) * spec.norm_h for y in spec.y_crop]
    X = [((x + 0.5) / spec.W * 2 - 1) * spec.norm_w for x in spec.x_crop]
    corners = [(X[0], Y[0]), (X[0], Y[1]), (X[1], Y[1]), (X[1], Y[0])]
    return jnp.asarray(corners, dtype=dtype)  # [4, 2]
