"""Image filters: Sobel edges, Gaussian blur, erosion — in-graph, cv2-parity.

The reference ships every prediction to the host each iteration to run
OpenCV Sobel/GaussianBlur (reference inputs.py:50-69 called from
model/planar.py:336) — a GPU->CPU->GPU round-trip in the hot loop whose
result is gradient-blocked (`.detach()`, inputs.py:57). Here the identical
math runs on-device as depthwise convolutions that XLA fuses into the step;
`compute_edges` applies `stop_gradient` by default to match the reference's
effective gradients exactly (SURVEY.md §2.4(1)), with `differentiable=True`
as the improvement mode.

cv2 numerics reproduced:
  * Sobel ksize=3, correlation kernels [[-1,0,1],[-2,0,2],[-1,0,1]] (x) and
    its transpose (y), border BORDER_REFLECT_101 (np.pad mode='reflect').
  * GaussianBlur((5,5), sigma=0): cv2's fixed small-kernel table
    [1,4,6,4,1]/16, separable, same border.
  * erode 5x5 rect: min-filter; cv2 pads with +inf for erosion so borders
    take the min over the valid window only.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
_SOBEL_Y = _SOBEL_X.T
# cv2.getGaussianKernel(5, 0) uses the fixed small_gaussian_tab for ksize<=7.
_GAUSS_1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
_GAUSS_5X5 = np.outer(_GAUSS_1D, _GAUSS_1D)


def _depthwise_conv2d(images: jax.Array, kernel2d: np.ndarray) -> jax.Array:
    """Depthwise 2D correlation with reflect-101 padding.

    Args:
      images: [B, C, H, W].
      kernel2d: [kh, kw] filter applied to every channel independently.

    Returns:
      [B, C, H, W] filtered images.
    """
    B, C, H, W = images.shape
    kh, kw = kernel2d.shape
    pad_h, pad_w = kh // 2, kw // 2
    padded = jnp.pad(images, ((0, 0), (0, 0), (pad_h, pad_h), (pad_w, pad_w)), mode="reflect")
    kernel = jnp.asarray(kernel2d, dtype=images.dtype)
    kernel = jnp.broadcast_to(kernel, (C, 1, kh, kw))
    return lax.conv_general_dilated(
        padded,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=C,
    )


def sobel_edges(images: jax.Array, eps: float = 0.0) -> jax.Array:
    """Sobel gradient magnitude per channel (cv2.Sobel ksize=3 semantics,
    reference inputs.py:62-64).

    Args:
      images: [B, C, H, W].
      eps: added under the sqrt for a finite gradient at 0 (use > 0 only in
        differentiable mode; the reference path is gradient-blocked anyway).

    Returns:
      [B, C, H, W] gradient magnitudes.
    """
    gx = _depthwise_conv2d(images, _SOBEL_X)
    gy = _depthwise_conv2d(images, _SOBEL_Y)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def gaussian_blur_5x5(images: jax.Array) -> jax.Array:
    """cv2.GaussianBlur(img, (5,5), 0) equivalent (reference inputs.py:66)."""
    return _depthwise_conv2d(images, _GAUSS_5X5)


def compute_edges(images: jax.Array, differentiable: bool = False) -> jax.Array:
    """Edge maps: Sobel magnitude then 5x5 Gaussian blur (reference
    inputs.py:50-69), in-graph.

    Args:
      images: [B, C, H, W] in [0, 1].
      differentiable: False reproduces the reference's `.detach()` (the edge
        loss carries no gradient, SURVEY.md §2.4(1)); True enables gradients
        with an eps-guarded sqrt.

    Returns:
      [B, C, H, W] blurred edge magnitudes.
    """
    if differentiable:
        edges = gaussian_blur_5x5(sobel_edges(images, eps=1e-12))
    else:
        edges = gaussian_blur_5x5(sobel_edges(lax.stop_gradient(images)))
        edges = lax.stop_gradient(edges)
    return edges


def erode(images: jax.Array, kernel: tuple[int, int] = (5, 5)) -> jax.Array:
    """Rectangular-kernel erosion (cv2.erode MORPH_RECT, reference
    inputs.py:71-85): min over the window, borders clipped to the valid
    region (cv2 pads with +inf for erode).

    Args:
      images: [B, C, H, W].

    Returns:
      [B, C, H, W] eroded images.
    """
    kh, kw = kernel
    return -lax.reduce_window(
        -images,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 1, kh, kw),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (0, 0), (kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)),
    )
