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


def sl3_to_SL3(h: jax.Array) -> jax.Array:
    """Map sl(3) coordinates to an SL(3) homography via expm.

    Args:
      h: [..., 8] Lie-algebra coordinates.

    Returns:
      [..., 3, 3] homography with det = 1 (reference warp.py:98-106).
    """
    A = sl3_generator(h)
    batch_shape = A.shape[:-2]
    if batch_shape:
        flat = A.reshape((-1, 3, 3))
        H = jax.vmap(_expm)(flat)
        return H.reshape(batch_shape + (3, 3))
    return _expm(A)
