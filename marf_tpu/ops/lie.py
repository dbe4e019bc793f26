"""Lie-algebra ops: sl(3) -> SL(3) via matrix exponential.

Capability parity with the reference's `Lie.sl3_to_SL3` (reference
warp.py:98-106): an 8-vector h parametrizes the traceless 3x3 generator

    A = [[h5,     h3,  h1],
         [h4, -h5-h6,  h2],
         [h7,     h8,  h6]]     (1-indexed as in the reference)

and H = expm(A) is the homography. TPU-native design: `jax.scipy.linalg.expm`
(Pade + scaling-and-squaring) is differentiable, vmaps over the image batch,
and compiles to dense 3x3 matmuls that XLA fuses into the surrounding step —
no host round-trip, no custom CUDA op.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.linalg import expm as _expm


def sl3_generator(h: jax.Array) -> jax.Array:
    """Build the traceless sl(3) generator from an 8-vector.

    Args:
      h: [..., 8] Lie-algebra coordinates (reference warp.py:101 order).

    Returns:
      [..., 3, 3] generator A with tr(A) = 0.
    """
    h1, h2, h3, h4, h5, h6, h7, h8 = jnp.moveaxis(h, -1, 0)
    row0 = jnp.stack([h5, h3, h1], axis=-1)
    row1 = jnp.stack([h4, -h5 - h6, h2], axis=-1)
    row2 = jnp.stack([h7, h8, h6], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


_TAYLOR_ORDER = 10
_SQUARINGS = 4
# 1/k! for k = _TAYLOR_ORDER..1 (Horner order)
_INV_FACT = [1.0 / math.factorial(k) for k in range(_TAYLOR_ORDER, 0, -1)]


def expm3x3(A: jax.Array) -> jax.Array:
    """Batched 3x3 matrix exponential: fixed-unroll scaling-and-squaring
    Taylor (order 10, 4 squarings).

    TPU-native replacement for the Pade/LU expm: no data-dependent control
    flow, no triangular solves — just ~14 batched 3x3 matmuls that XLA fuses
    into the step, and a trivially differentiable graph. For the warp
    magnitudes of this workload (||A|| < 4 after the 2^-4 scaling brings it
    under 0.25) the truncation error is ~1e-14, below f32 resolution;
    verified against scipy in tests/test_lie.py.

    Args:
      A: [..., 3, 3].

    Returns:
      [..., 3, 3] expm(A).
    """
    eye = jnp.broadcast_to(jnp.eye(3, dtype=A.dtype), A.shape)
    As = A * (2.0**-_SQUARINGS)
    # Horner: M = I + As(c1·I + As(c2·I + ...)) with ck = 1/k!
    M = eye * _INV_FACT[0]
    for coeff in _INV_FACT[1:]:
        M = eye * coeff + As @ M
    M = eye + As @ M
    for _ in range(_SQUARINGS):
        M = M @ M
    return M


def sl3_to_SL3(h: jax.Array, method: str = "pade") -> jax.Array:
    """Map sl(3) coordinates to an SL(3) homography via expm.

    Args:
      h: [..., 8] Lie-algebra coordinates.
      method: 'pade' (default: jax.scipy.linalg.expm — empirically ~3 dB
        better final PSNR than the Taylor kernel at f32; the joint
        optimization is sensitive to the expm's f32 rounding profile) or
        'taylor' (see `expm3x3` — control-flow-free, use when expm cost
        matters more than the last dB).

    Returns:
      [..., 3, 3] homography with det = 1 (reference warp.py:98-106).
    """
    A = sl3_generator(h)
    if method == "taylor":
        return expm3x3(A)
    batch_shape = A.shape[:-2]
    if batch_shape:
        flat = A.reshape((-1, 3, 3))
        H = jax.vmap(_expm)(flat)
        return H.reshape(batch_shape + (3, 3))
    return _expm(A)
