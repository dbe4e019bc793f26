"""Grid generation + homography warp tests against hand-computed formulas."""

import jax.numpy as jnp
import numpy as np

from marf_tpu.ops.grid import GridSpec, crop_corners, normalized_pixel_grid
from marf_tpu.ops.lie import sl3_to_SL3
from marf_tpu.ops.warp import to_hom, warp_corners, warp_grid

SPEC = GridSpec(H=360, W=480, patch_H=180, patch_W=240)


def _oracle_grid(spec: GridSpec, crop: bool) -> np.ndarray:
    """Independent numpy implementation of the reference formula
    (warp.py:33-68): pixel centers +0.5 -> [-1,1] * aspect norm."""
    norm_h = spec.H / max(spec.H, spec.W)
    norm_w = spec.W / max(spec.H, spec.W)
    if crop:
        ys = np.arange(spec.H // 2 - spec.patch_H // 2, spec.H // 2 + spec.patch_H // 2)
        xs = np.arange(spec.W // 2 - spec.patch_W // 2, spec.W // 2 + spec.patch_W // 2)
    else:
        ys, xs = np.arange(spec.H), np.arange(spec.W)
    y = ((ys + 0.5) / spec.H * 2 - 1) * norm_h
    x = ((xs + 0.5) / spec.W * 2 - 1) * norm_w
    Y, X = np.meshgrid(y, x, indexing="ij")
    return np.stack([X, Y], axis=-1).reshape(-1, 2).astype(np.float32)


def test_full_grid_matches_oracle():
    grid = np.asarray(normalized_pixel_grid(SPEC, crop=False))
    np.testing.assert_allclose(grid, _oracle_grid(SPEC, False), atol=1e-6)
    assert grid.shape == (360 * 480, 2)


def test_crop_grid_matches_oracle():
    grid = np.asarray(normalized_pixel_grid(SPEC, crop=True))
    np.testing.assert_allclose(grid, _oracle_grid(SPEC, True), atol=1e-6)
    assert grid.shape == (180 * 240, 2)


def test_grid_aspect_normalization():
    # H=360, W=480 -> norm_h = 0.75, norm_w = 1.0; extreme pixel centers
    grid = np.asarray(normalized_pixel_grid(SPEC, crop=False))
    assert abs(grid[:, 0].max() - (1.0 - 1.0 / 480)) < 1e-6  # x: ((W-0.5)/W*2-1)*1
    assert abs(grid[:, 1].max() - 0.75 * (1.0 - 1.0 / 360)) < 1e-6


def test_to_hom():
    pts = jnp.asarray(np.random.RandomState(0).randn(4, 7, 2).astype(np.float32))
    hom = np.asarray(to_hom(pts))
    assert hom.shape == (4, 7, 3)
    np.testing.assert_array_equal(hom[..., 2], 1.0)


def test_identity_warp_is_noop():
    grid = normalized_pixel_grid(SPEC, crop=True)
    warped = warp_grid(grid, jnp.zeros((5, 8)))
    assert warped.shape == (5, 180 * 240, 2)
    # expm(0) = I; perspective divide by 1 + 1e-8
    np.testing.assert_allclose(np.asarray(warped), np.broadcast_to(np.asarray(grid), (5,) + grid.shape), atol=1e-5)


def test_warp_matches_manual_homography(rng):
    grid = np.asarray(normalized_pixel_grid(SPEC, crop=True))
    w = rng.randn(3, 8).astype(np.float32) * 0.2
    H = np.asarray(sl3_to_SL3(jnp.asarray(w)))
    warped = np.asarray(warp_grid(jnp.asarray(grid), jnp.asarray(w)))
    hom = np.concatenate([grid, np.ones_like(grid[:, :1])], axis=-1)
    for b in range(3):
        mapped = hom @ H[b].T
        expected = mapped[:, :2] / (mapped[:, 2:] + 1e-8)
        np.testing.assert_allclose(warped[b], expected, rtol=1e-4, atol=1e-5)


def test_batched_grid_input(rng):
    grid = normalized_pixel_grid(SPEC, crop=True)
    w = jnp.asarray(rng.randn(2, 8).astype(np.float32) * 0.1)
    batched = jnp.stack([grid, grid])
    np.testing.assert_allclose(
        np.asarray(warp_grid(batched, w)), np.asarray(warp_grid(grid, w)), atol=1e-6
    )


def test_warp_corners():
    corners = crop_corners(SPEC)
    assert corners.shape == (4, 2)
    warped = warp_corners(corners, jnp.zeros((5, 8)))
    assert warped.shape == (5, 4, 2)
    np.testing.assert_allclose(np.asarray(warped), np.broadcast_to(np.asarray(corners), (5, 4, 2)), atol=1e-6)
