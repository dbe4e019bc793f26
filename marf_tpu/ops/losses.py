"""Losses and metrics.

Capability parity with `Graph.compute_loss` / `Graph.mse_loss` / the Model's
metrics (reference model/planar.py:355-391, 219-254). All are pure scalar
functions suitable for jit; the alpha schedule and loss weighting are traced
functions of the step so one compiled program covers the whole run.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax


def mse(pred: jax.Array, labels: jax.Array, masks: jax.Array | None = None) -> jax.Array:
    """(Masked) MSE exactly as the reference computes it
    (reference model/planar.py:382-391).

    Unmasked: mean((pred - labels)^2).
    Masked:   sum(((pred - labels) * masks)^2) / (sum(masks) * 3)
    — note the reference's normalization: masks are [B,1,H,W] broadcast over 3
    channels, and the denominator multiplies the 1-channel mask sum by 3.
    """
    if masks is None:
        return jnp.mean((pred - labels) ** 2)
    masked_diff = (pred - labels) * masks
    return jnp.sum(masked_diff**2) / (jnp.sum(masks) * 3)


def alpha_schedule(step: jax.Array, max_iter: int, alpha_initial: float, alpha_final: float) -> jax.Array:
    """Linear edge/rgb mixing factor (reference model/planar.py:359):
    alpha = a0 + (a1 - a0) * (it / max_iter), it being the 0-based loss-eval
    counter (Graph.it; SURVEY.md §2.4(10))."""
    return alpha_initial + (alpha_final - alpha_initial) * (step.astype(jnp.float32) / max_iter)


def render_loss(
    rgb_loss: jax.Array,
    edge_loss: jax.Array,
    mask_loss: jax.Array,
    alpha: jax.Array,
) -> jax.Array:
    """loss.render = (1 - alpha) * rgb + 0.5 * mask + alpha * edge
    (reference model/planar.py:371-374)."""
    return (1 - alpha) * rgb_loss + 0.5 * mask_loss + alpha * edge_loss


def mask_counterweight(mask_prediction_map: jax.Array) -> jax.Array:
    """mean((1 - m)^2): keeps the learned mask from masking everything
    (reference model/planar.py:370)."""
    return jnp.mean((1 - mask_prediction_map) ** 2)


def summarize_loss(loss: dict, loss_weight: dict) -> jax.Array:
    """Weighted total: sum_k 10^w_k * loss_k; weights are log10 exponents and
    `None` disables a term (reference model/planar.py:172-185). Static config
    (the weights) is resolved at trace time."""
    total = jnp.asarray(0.0, dtype=jnp.float32)
    for key, value in loss.items():
        if key == "all":
            continue
        assert key in loss_weight, f"loss term {key!r} has no weight entry"
        weight = loss_weight[key]
        if weight is not None:
            total = total + (10.0 ** float(weight)) * value
    return total


def psnr_from_rgb_loss(rgb_loss: jax.Array) -> jax.Array:
    """PSNR = -10 * log10(masked rgb MSE) (reference model/planar.py:252-253).
    The reference derives PSNR from the *masked* rgb loss, not a full-image
    MSE (SURVEY.md §2.4(6))."""
    return -10.0 * jnp.log(rgb_loss) / math.log(10.0)


def homography_error(pred_warp_H: jax.Array, gt_hom_norm: jax.Array) -> jax.Array:
    """Reference metric: ||(H_pred - H_gt)^2||_F — the Frobenius norm of the
    *elementwise-squared* residual (reference model/planar.py:219-223; the
    trailing `.mean()` is a no-op on the scalar norm). Reproduced exactly for
    curve parity (SURVEY.md §2.4(5)).

    Args:
      pred_warp_H: [B, 3, 3] predicted homographies (expm of warp params).
      gt_hom_norm: [B, 3, 3] kornia-normalized ground truth.
    """
    r2 = (pred_warp_H - gt_hom_norm) ** 2
    return jnp.sqrt(jnp.sum(r2**2))


def check_finite(loss: dict) -> jax.Array:
    """NaN/Inf guard: the reference asserts per-term finiteness on the host
    every iteration (reference model/planar.py:181-182). In-graph equivalent:
    an all-finite flag the engine checks whenever it syncs metrics."""
    flags = [jnp.isfinite(v) for v in loss.values()]
    return lax.reduce(jnp.stack(flags), jnp.array(True), jnp.logical_and, (0,))
