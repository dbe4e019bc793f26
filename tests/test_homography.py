"""kornia-parity normalize_homography tests (reference inputs.py:87-105)."""

import jax.numpy as jnp
import numpy as np

from marf_tpu.ops.homography import normal_transform_pixel, normalize_homography


def test_normal_transform_pixel_values():
    N = np.asarray(normal_transform_pixel(480, 360))  # (h=480, w=360)
    expected = np.array([[2.0 / 359, 0, -1], [0, 2.0 / 479, -1], [0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(N, expected, rtol=1e-6)


def test_normalize_identity_is_identity():
    H = jnp.eye(3)[None]
    out = np.asarray(normalize_homography(H, (360, 480), (360, 480)))
    np.testing.assert_allclose(out[0], np.eye(3), atol=1e-6)


def test_normalize_matches_manual_conjugation(rng):
    H = rng.randn(4, 3, 3).astype(np.float32) * 0.5 + np.eye(3, dtype=np.float32)
    out = np.asarray(normalize_homography(jnp.asarray(H), (480, 360), (480, 360)))
    N = np.asarray(normal_transform_pixel(480, 360))
    for b in range(4):
        expected = N @ H[b] @ np.linalg.inv(N)
        np.testing.assert_allclose(out[b], expected, rtol=1e-4, atol=1e-5)


def test_normalize_maps_corners():
    """A pixel-space translation by (w-1, h-1)/2 maps the normalized origin
    correctly: x_norm' = N @ T @ N^-1 @ x_norm."""
    h, w = 100, 200
    T = np.eye(3, dtype=np.float32)
    T[0, 2] = (w - 1) / 2.0  # translate half the width in pixels
    out = np.asarray(normalize_homography(jnp.asarray(T[None]), (h, w), (h, w)))[0]
    # normalized point (-1,-1) (pixel 0,0) -> pixel ((w-1)/2, 0) -> normalized (0,-1)
    p = out @ np.array([-1.0, -1.0, 1.0])
    np.testing.assert_allclose(p / p[2], [0.0, -1.0, 1.0], atol=1e-5)


def test_reference_swapped_argument_order():
    """The reference calls normalize_homography(gt, (W,H), (W,H))
    (inputs.py:104) — verify the data layer reproduces the swap."""
    from marf_tpu.data.planar import load_homography
    import tempfile, os

    Hmat = np.eye(3)
    Hmat[0, 2] = 10.0
    with tempfile.TemporaryDirectory() as d:
        fp = os.path.join(d, "H_0_1.mat")
        np.savetxt(fp, Hmat)
        out = load_homography([fp], width=480, height=360)
    assert out.shape == (2, 3, 3)
    np.testing.assert_allclose(out[0], np.eye(3), atol=1e-6)  # prepended identity
    # swapped call: dsize=(480,360) as (h,w) -> x scale uses w=360
    N = np.asarray(normal_transform_pixel(480, 360))
    expected = N @ Hmat @ np.linalg.inv(N)
    np.testing.assert_allclose(out[1], expected, rtol=1e-5, atol=1e-5)
