"""Dense-layer init/apply with PyTorch nn.Linear distribution parity.

Convergence-curve parity with the reference requires matching the *init
distribution* of `torch.nn.Linear` (SURVEY.md §7 step 2): kaiming-uniform
with a=sqrt(5) reduces to W ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)), and
b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

Weights are stored as [in, out] so `x @ W + b` maps straight onto the MXU
(PyTorch stores [out, in] and transposes; same distribution either way).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_linear(key: jax.Array, fan_in: int, fan_out: int, dtype=jnp.float32) -> dict:
    """Initialize one dense layer with torch.nn.Linear's default distribution."""
    wkey, bkey = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(wkey, (fan_in, fan_out), dtype=dtype, minval=-bound, maxval=bound),
        "b": jax.random.uniform(bkey, (fan_out,), dtype=dtype, minval=-bound, maxval=bound),
    }


def apply_linear(params: dict, x: jax.Array) -> jax.Array:
    """x @ W + b with f32 MXU accumulation."""
    return jnp.dot(x, params["w"], preferred_element_type=jnp.float32) + params["b"]
