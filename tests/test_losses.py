"""Loss/metric tests: masked MSE normalization, alpha schedule, weights, PSNR,
homography-error quirk (reference model/planar.py:172-254, 355-391)."""

import jax.numpy as jnp
import numpy as np
import pytest

from marf_tpu.ops import losses


def test_unmasked_mse(rng):
    pred = rng.rand(2, 3, 4, 5).astype(np.float32)
    labels = rng.rand(2, 3, 4, 5).astype(np.float32)
    out = float(losses.mse(jnp.asarray(pred), jnp.asarray(labels)))
    assert abs(out - np.mean((pred - labels) ** 2)) < 1e-6


def test_masked_mse_normalization(rng):
    """Reference normalization: sum((diff*mask)^2) / (mask.sum() * 3) with a
    [B,1,H,W] mask broadcast over 3 channels (model/planar.py:388-390)."""
    pred = rng.rand(2, 3, 4, 5).astype(np.float32)
    labels = rng.rand(2, 3, 4, 5).astype(np.float32)
    masks = (rng.rand(2, 1, 4, 5) > 0.5).astype(np.float32)
    out = float(losses.mse(jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(masks)))
    expected = np.sum(((pred - labels) * masks) ** 2) / (masks.sum() * 3)
    assert abs(out - expected) < 1e-6


def test_masked_mse_broadcast_labels(rng):
    # edge loss: pred [B,3,H,W] vs labels [B,1,H,W] broadcast
    pred = rng.rand(2, 3, 4, 5).astype(np.float32)
    labels = rng.rand(2, 1, 4, 5).astype(np.float32)
    masks = np.ones((2, 1, 4, 5), dtype=np.float32)
    out = float(losses.mse(jnp.asarray(pred), jnp.asarray(labels), jnp.asarray(masks)))
    expected = np.sum((pred - labels) ** 2) / (masks.sum() * 3)
    assert abs(out - expected) < 1e-5


def test_alpha_schedule():
    a = losses.alpha_schedule(jnp.int32(0), 3000, 0.0, 1.0)
    assert float(a) == 0.0
    a = losses.alpha_schedule(jnp.int32(1500), 3000, 0.0, 1.0)
    assert abs(float(a) - 0.5) < 1e-6
    a = losses.alpha_schedule(jnp.int32(3000), 3000, 0.2, 0.8)
    assert abs(float(a) - 0.8) < 1e-6


def test_render_loss_composition():
    out = float(losses.render_loss(jnp.float32(2.0), jnp.float32(4.0), jnp.float32(6.0), jnp.float32(0.25)))
    # (1-0.25)*2 + 0.5*6 + 0.25*4 = 1.5 + 3 + 1 = 5.5
    assert abs(out - 5.5) < 1e-6


def test_summarize_loss_log10_weights():
    loss = {"render": jnp.float32(1.0), "rgb": jnp.float32(2.0)}
    total = float(losses.summarize_loss(loss, {"render": 0, "rgb": 1}))
    assert abs(total - (1.0 + 10 * 2.0)) < 1e-5


def test_summarize_loss_none_disables():
    loss = {"render": jnp.float32(1.0), "rgb": jnp.float32(5.0)}
    total = float(losses.summarize_loss(loss, {"render": 0, "rgb": None}))
    assert abs(total - 1.0) < 1e-6


def test_summarize_loss_missing_weight_asserts():
    with pytest.raises(AssertionError):
        losses.summarize_loss({"bogus": jnp.float32(1.0)}, {"render": 0})


def test_psnr():
    assert abs(float(losses.psnr_from_rgb_loss(jnp.float32(0.01))) - 20.0) < 1e-4


def test_homography_error_quirk(rng):
    """torch.norm((pred-gt)**2) = sqrt(sum(residual^4)) — the Frobenius norm
    of the elementwise-squared residual (model/planar.py:219-223)."""
    pred = rng.randn(5, 3, 3).astype(np.float32)
    gt = rng.randn(5, 3, 3).astype(np.float32)
    out = float(losses.homography_error(jnp.asarray(pred), jnp.asarray(gt)))
    expected = np.sqrt(np.sum((pred - gt) ** 4))
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_mask_counterweight(rng):
    m = rng.rand(2, 1, 4, 4).astype(np.float32)
    out = float(losses.mask_counterweight(jnp.asarray(m)))
    assert abs(out - np.mean((1 - m) ** 2)) < 1e-6


def test_check_finite():
    assert bool(losses.check_finite({"a": jnp.float32(1.0), "b": jnp.float32(2.0)}))
    assert not bool(losses.check_finite({"a": jnp.float32(np.nan)}))
    assert not bool(losses.check_finite({"a": jnp.float32(1.0), "b": jnp.float32(np.inf)}))
