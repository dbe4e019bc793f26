"""Positional encodings: BARF coarse-to-fine posenc + Ha-NeRF PosEmbedding.

Capability parity with `NeuralImageFunction.positional_encoding` (reference
model/planar.py:451-471) and `PosEmbedding` (model/planar.py:491-517).

TPU-native design: the c2f band weights are a *traced* function of the scalar
training progress, so a single compiled program serves the entire schedule
(the reference mutates an `nn.Parameter` from the host every iteration,
model/planar.py:208). Frequencies are trace-time constants.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def barf_posenc(coord: jax.Array, L: int) -> jax.Array:
    """BARF positional encoding.

    freq_k = 2^k * pi for k = 0..L-1; layout per input channel n:
    [sin(x_n f_0..f_{L-1}), cos(x_n f_0..f_{L-1})] — i.e. flattening of a
    [..., N, 2, L] tensor (reference model/planar.py:456-460).

    Args:
      coord: [..., N] input coordinates.
      L: number of frequency bands.

    Returns:
      [..., 2*N*L] encoding.
    """
    freq = (2.0 ** jnp.arange(L, dtype=coord.dtype)) * np.pi  # [L]
    spectrum = coord[..., None] * freq  # [..., N, L]
    enc = jnp.stack([jnp.sin(spectrum), jnp.cos(spectrum)], axis=-2)  # [..., N, 2, L]
    return enc.reshape(coord.shape[:-1] + (-1,))


def barf_c2f_weights(progress: jax.Array, c2f: tuple[float, float], L: int, dtype=jnp.float32) -> jax.Array:
    """Coarse-to-fine per-band weights.

    alpha = (progress - start) / (end - start) * L;
    w_k = (1 - cos(clamp(alpha - k, 0, 1) * pi)) / 2
    (reference model/planar.py:462-470).

    Args:
      progress: scalar in [0, 1] (traced; derived from the step counter).
      c2f: (start, end) schedule bounds.
      L: number of frequency bands.

    Returns:
      [L] band weights in [0, 1].
    """
    start, end = c2f
    alpha = (progress - start) / (end - start) * L
    k = jnp.arange(L, dtype=dtype)
    return (1 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * np.pi)) / 2


def apply_c2f(enc: jax.Array, weights: jax.Array) -> jax.Array:
    """Apply [L] band weights over the trailing-L layout of `barf_posenc`
    (reference model/planar.py:469-470: `enc.view(-1, L) * weight`)."""
    L = weights.shape[-1]
    shape = enc.shape
    return (enc.reshape(-1, L) * weights).reshape(shape)


def hanerf_pos_embedding(x: jax.Array, max_logscale: int = 9, n_freqs: int = 10, logscale: bool = True) -> jax.Array:
    """Ha-NeRF style embedding: concat([x] + [sin(f x), cos(f x)] per freq)
    with f = 2^linspace(0, max_logscale, n_freqs) (reference
    model/planar.py:491-517). For a 2-vector uv input this yields
    2 + 2*2*n_freqs = 42 features.

    Args:
      x: [..., N] input.

    Returns:
      [..., N * (1 + 2*n_freqs)] embedding, ordered [x, sin(f0 x), cos(f0 x),
      sin(f1 x), ...].
    """
    if logscale:
        freqs = 2.0 ** np.linspace(0, max_logscale, n_freqs)
    else:
        freqs = np.linspace(1, 2.0**max_logscale, n_freqs)
    parts = [x]
    for f in freqs:
        parts.append(jnp.sin(f * x))
        parts.append(jnp.cos(f * x))
    return jnp.concatenate(parts, axis=-1)
