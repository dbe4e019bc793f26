"""In-graph filter tests against OpenCV (the reference's host-side implementation)."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from marf_tpu.ops.filters import compute_edges, erode, gaussian_blur_5x5, sobel_edges


def _cv2_edges(images: np.ndarray) -> np.ndarray:
    """Reference inputs.py:50-69 oracle."""
    out = []
    for image in images:
        i = np.transpose(image, (1, 2, 0)).astype(np.float64)
        sx = cv2.Sobel(i, cv2.CV_64F, 1, 0, ksize=3)
        sy = cv2.Sobel(i, cv2.CV_64F, 0, 1, ksize=3)
        i = np.sqrt(sx**2 + sy**2)
        i = cv2.GaussianBlur(i, (5, 5), 0)
        if i.ndim == 2:
            i = i[:, :, None]
        out.append(i.transpose(2, 0, 1))
    return np.stack(out)


def test_sobel_magnitude_matches_cv2(rng):
    images = rng.rand(2, 3, 24, 32).astype(np.float32)
    ours = np.asarray(sobel_edges(jnp.asarray(images)))
    for b in range(2):
        i = np.transpose(images[b], (1, 2, 0)).astype(np.float64)
        sx = cv2.Sobel(i, cv2.CV_64F, 1, 0, ksize=3)
        sy = cv2.Sobel(i, cv2.CV_64F, 0, 1, ksize=3)
        expected = np.sqrt(sx**2 + sy**2).transpose(2, 0, 1)
        np.testing.assert_allclose(ours[b], expected, rtol=1e-4, atol=1e-5)


def test_gaussian_blur_matches_cv2(rng):
    images = rng.rand(2, 1, 16, 20).astype(np.float32)
    ours = np.asarray(gaussian_blur_5x5(jnp.asarray(images)))
    for b in range(2):
        i = np.transpose(images[b], (1, 2, 0)).astype(np.float64)
        expected = cv2.GaussianBlur(i, (5, 5), 0)[None]
        np.testing.assert_allclose(ours[b], expected, rtol=1e-4, atol=1e-5)


def test_compute_edges_matches_reference_pipeline(rng):
    images = rng.rand(3, 3, 20, 28).astype(np.float32)
    ours = np.asarray(compute_edges(jnp.asarray(images)))
    expected = _cv2_edges(images)
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


def test_compute_edges_is_gradient_blocked(rng):
    """The reference's edge term carries no gradient (SURVEY.md §2.4(1))."""
    images = jnp.asarray(rng.rand(1, 3, 12, 12).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(compute_edges(x)))(images)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_compute_edges_differentiable_mode(rng):
    images = jnp.asarray(rng.rand(1, 3, 12, 12).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(compute_edges(x, differentiable=True)))(images)
    arr = np.asarray(g)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() > 0


def test_erode_matches_cv2(rng):
    masks = (rng.rand(3, 1, 30, 40) > 0.4).astype(np.float32)
    ours = np.asarray(erode(jnp.asarray(masks), kernel=(5, 5)))
    element = cv2.getStructuringElement(cv2.MORPH_RECT, (5, 5))
    for b in range(3):
        expected = cv2.erode(masks[b, 0], element)
        np.testing.assert_allclose(ours[b, 0], expected, atol=1e-6)


def test_erode_smaller_kernel(rng):
    masks = (rng.rand(1, 1, 15, 17) > 0.5).astype(np.float32)
    ours = np.asarray(erode(jnp.asarray(masks), kernel=(3, 3)))
    element = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
    expected = cv2.erode(masks[0, 0], element)
    np.testing.assert_allclose(ours[0, 0], expected, atol=1e-6)
