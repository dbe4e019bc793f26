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

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# Separable factors (correlation taps): SOBEL_X = outer(_SMOOTH_121 along H,
# _DERIV_101 along W), SOBEL_Y its transpose. cv2.getGaussianKernel(5, 0)
# uses the fixed small_gaussian_tab for ksize<=7.
_SMOOTH_121 = (1.0, 2.0, 1.0)
_DERIV_101 = (-1.0, 0.0, 1.0)
_GAUSS_1D = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


@functools.lru_cache(maxsize=None)
def _reflect101_band(n: int, taps: tuple[float, ...]) -> np.ndarray:
    """[n, n] band matrix M with M @ x == 1-D correlation of x by `taps`
    under reflect-101 (cv2 BORDER_DEFAULT / np.pad mode='reflect') borders:
    out[i] = sum_k taps[k] * x[reflect(i + k - len//2)]. Folding the border
    into the matrix lets the 2-D depthwise filters below run as two MXU
    matmuls instead of XLA's grouped-conv lowering, which executes these
    small-channel depthwise convs as ~100 GFLOP/s loop fusions with layout
    copies (~1 ms/step of the round-4 implicit TPU trace, PERF.md)."""
    pad = len(taps) // 2
    m = np.zeros((n, n), dtype=np.float64)
    for i in range(n):
        for k, t in enumerate(taps):
            j = i + k - pad
            if j < 0:
                j = -j
            elif j >= n:
                j = 2 * n - 2 - j
            m[i, j] += t
    return m.astype(np.float32)


def _sep_conv2d(images: jax.Array, taps_h: tuple[float, ...], taps_w: tuple[float, ...]) -> jax.Array:
    """Separable depthwise 2-D correlation with reflect-101 padding, as two
    band-matrix contractions on the MXU (HIGHEST precision: parity with the
    f32 conv the CPU/interpret tests check against cv2).

    Args:
      images: [B, C, H, W].
      taps_h / taps_w: 1-D correlation taps along H / W.

    Returns:
      [B, C, H, W] filtered images, input dtype.
    """
    H, W = images.shape[-2], images.shape[-1]
    mh = jnp.asarray(_reflect101_band(H, taps_h))
    mw = jnp.asarray(_reflect101_band(W, taps_w))
    x = images.astype(jnp.float32)
    y = jnp.einsum("gh,bchw->bcgw", mh, x, precision=lax.Precision.HIGHEST)
    y = jnp.einsum("kw,bchw->bchk", mw, y, precision=lax.Precision.HIGHEST)
    return y.astype(images.dtype)


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
    gx = _sep_conv2d(images, _SMOOTH_121, _DERIV_101)
    gy = _sep_conv2d(images, _DERIV_101, _SMOOTH_121)
    return jnp.sqrt(gx * gx + gy * gy + eps)


def gaussian_blur_5x5(images: jax.Array) -> jax.Array:
    """cv2.GaussianBlur(img, (5,5), 0) equivalent (reference inputs.py:66)."""
    return _sep_conv2d(images, _GAUSS_1D, _GAUSS_1D)


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
