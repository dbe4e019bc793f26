"""Homography warps on normalized grids.

Capability parity with `Warp.warp_grid` / `warp_corners` (reference
warp.py:70-93): homogenize, map the 8-vector warp through sl3_to_SL3, apply
x @ H^T, perspective-divide with +1e-8.

TPU-native design: one einsum over a broadcast [HW, 3] grid and [B, 3, 3]
homographies — the grid is shared across the batch (never tiled B times), and
the einsum lowers to a single MXU-friendly contraction inside the jitted step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from marf_tpu.ops.lie import sl3_to_SL3


def to_hom(points: jax.Array) -> jax.Array:
    """Append a homogeneous 1-coordinate (reference warp.py:27-31)."""
    return jnp.concatenate([points, jnp.ones_like(points[..., :1])], axis=-1)


def warp_grid(xy_grid: jax.Array, warp: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Warp a normalized grid by per-image sl(3) homographies.

    Args:
      xy_grid: [HW, 2] or [B, HW, 2] normalized coordinates.
      warp: [B, 8] sl(3) coordinates.
      eps: perspective-divide guard (reference warp.py:78).

    Returns:
      [B, HW, 2] warped coordinates.
    """
    grid_hom = to_hom(xy_grid)  # [..., HW, 3]
    H = sl3_to_SL3(warp)  # [B, 3, 3]
    if grid_hom.ndim == 2:
        warped_hom = jnp.einsum("nk,bjk->bnj", grid_hom, H)
    else:
        warped_hom = jnp.einsum("bnk,bjk->bnj", grid_hom, H)
    return warped_hom[..., :2] / (warped_hom[..., 2:] + eps)


def warp_grid_cf(xy_grid: jax.Array, warp: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Channels-first warp: the TPU-fast layout of `warp_grid`.

    Keeping the huge pixel axis last (lanes) avoids the 2-lane [HW, 2]
    tensors that force vector-register relayouts; the output [B, 2, N]
    feeds the channels-first MLP and reshapes straight to NCHW maps.

    Args:
      xy_grid: [HW, 2] normalized coordinates (row-major, as produced by
        `normalized_pixel_grid` — transposed once here at trace time since
        the grid is a constant).
      warp: [B, 8] sl(3) coordinates.

    Returns:
      [B, 2, HW] warped coordinates, channels-first.
    """
    grid_hom_T = to_hom(xy_grid).T  # [3, HW] — constant, folded by XLA
    H = sl3_to_SL3(warp)  # [B, 3, 3]
    warped_hom = jnp.einsum("bjk,kn->bjn", H, grid_hom_T)  # [B, 3, HW]
    return warped_hom[:, :2, :] / (warped_hom[:, 2:3, :] + eps)


def warp_grid_cf_flat(xy_grid: jax.Array, warp: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Fully-flattened channels-first warp: [2, B*HW].

    The batch axis is folded into the pixel (lane) axis — the MLP treats all
    B*HW points identically, and with a pure 2-D [C, N] layout the backward's
    dW contractions reduce over the last axis of both operands (MXU-native,
    no transposes; a [B, C, N] layout forces XLA to transpose every [B, 256,
    HW] activation gradient to make {B, N} adjacent).

    Args:
      xy_grid: [HW, 2] normalized coordinates.
      warp: [B, 8] sl(3) coordinates.

    Returns:
      [2, B*HW] warped coordinates; pixel order is image-major (b, then hw),
      so `out.reshape(2, B, HW)` recovers the per-image view.
    """
    grid_hom_T = to_hom(xy_grid).T  # [3, HW]
    H = sl3_to_SL3(warp)  # [B, 3, 3]
    warped_hom = jnp.einsum("bjk,kn->jbn", H, grid_hom_T)  # [3, B, HW]; b,n adjacent
    warped_hom = warped_hom.reshape(3, -1)  # [3, B*HW] — free reshape
    return warped_hom[:2, :] / (warped_hom[2:3, :] + eps)


def warp_corners(corners: jax.Array, warp: jax.Array) -> jax.Array:
    """Warp patch-corner points for homography visualization
    (reference warp.py:83-93).

    Args:
      corners: [4, 2] normalized corner coordinates (see `grid.crop_corners`).
      warp: [B, 8] sl(3) coordinates.

    Returns:
      [B, 4, 2] warped corners.
    """
    return warp_grid(corners, warp)
