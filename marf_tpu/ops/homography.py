"""Homography normalization (kornia-parity, dependency-free).

The reference normalizes ground-truth pixel-space homographies with
`kornia.geometry.conversions.normalize_homography(gt, (W, H), (W, H))`
(reference inputs.py:104) — note it passes (W, H) where kornia expects
(H, W); we reproduce that argument order faithfully at the call site
(SURVEY.md §2.4(5)) by exposing the kornia signature here and letting the
data layer pass the swapped sizes.

kornia math reproduced:
  normal_transform_pixel(h, w) = [[2/(w-1), 0, -1], [0, 2/(h-1), -1], [0,0,1]]
  normalize_homography(M, (hs, ws), (hd, wd)) =
      N(hd, wd) @ M @ inv(N(hs, ws))
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normal_transform_pixel(height: int, width: int, eps: float = 1e-14, dtype=jnp.float32) -> jax.Array:
    """Pixel-to-[-1,1] normalization matrix (kornia's normal_transform_pixel)."""
    w_denom = eps if width == 1 else width - 1.0
    h_denom = eps if height == 1 else height - 1.0
    return jnp.array(
        [[2.0 / w_denom, 0.0, -1.0], [0.0, 2.0 / h_denom, -1.0], [0.0, 0.0, 1.0]],
        dtype=dtype,
    )


def normalize_homography(
    dst_pix_trans_src_pix: jax.Array,
    dsize_src: tuple[int, int],
    dsize_dst: tuple[int, int],
) -> jax.Array:
    """Normalize a pixel-space homography to the [-1, 1] coordinate frame.

    Args:
      dst_pix_trans_src_pix: [..., 3, 3] pixel-space homographies.
      dsize_src: (height, width) of the source frame.
      dsize_dst: (height, width) of the destination frame.

    Returns:
      [..., 3, 3] normalized homographies N_dst @ M @ N_src^{-1}.
    """
    src_h, src_w = dsize_src
    dst_h, dst_w = dsize_dst
    dtype = dst_pix_trans_src_pix.dtype
    src_norm = normal_transform_pixel(src_h, src_w, dtype=dtype)
    dst_norm = normal_transform_pixel(dst_h, dst_w, dtype=dtype)
    src_pix_trans_src_norm = jnp.linalg.inv(src_norm)
    return dst_norm @ (dst_pix_trans_src_pix @ src_pix_trans_src_norm)
