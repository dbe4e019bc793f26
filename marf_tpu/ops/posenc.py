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
    [sin(x_n f_0..f_{L-1}), cos(x_n f_0..f_{L-1})] — the flattening of a
    [..., N, 2, L] tensor (reference model/planar.py:456-460).

    TPU-native implementation detail: the encoding is built directly in the
    flat [..., 2NL] layout via lane-broadcasts — materializing the
    [..., N, 2, L] intermediate puts an L(=8)-lane tensor in the hot path,
    which costs a full relayout on TPU (~4 ms/step at N=216k, measured).
    Both sin and cos are evaluated on the tiled spectrum and selected by a
    constant mask; transcendentals are cheap, relayouts are not.

    Args:
      coord: [..., N] input coordinates.
      L: number of frequency bands.

    Returns:
      [..., 2*N*L] encoding.
    """
    n_chan = coord.shape[-1]
    freq = (2.0 ** np.arange(L)).astype(np.float32) * np.pi  # [L]
    # per output slot: channel index repeats each 2L block; freq pattern tiles
    freq_tiled = jnp.asarray(np.tile(freq, 2 * n_chan), dtype=coord.dtype)  # [2NL]
    chan_blocks = [
        jnp.broadcast_to(coord[..., n : n + 1], coord.shape[:-1] + (2 * L,)) for n in range(n_chan)
    ]
    c_exp = jnp.concatenate(chan_blocks, axis=-1)  # [..., 2NL]
    spec = c_exp * freq_tiled
    # slots [0:L] of each 2L block are sin, [L:2L] are cos
    is_sin = jnp.asarray(np.tile(np.arange(2 * L) < L, n_chan))
    return jnp.where(is_sin, jnp.sin(spec), jnp.cos(spec))


def barf_posenc_cf(coord_cf: jax.Array, L: int) -> jax.Array:
    """Channels-first BARF posenc: [..., N_chan, P] -> [..., 2*N_chan*L, P].

    Same values/band-ordering as `barf_posenc` but with the (huge) pixel axis
    last, so every op is lane-aligned and no relayout occurs. Feature
    channels live on the sublane axis.
    """
    n_chan = coord_cf.shape[-2]
    freq = (2.0 ** np.arange(L)).astype(np.float32) * np.pi
    freq_col = jnp.asarray(np.tile(freq, 2 * n_chan), dtype=coord_cf.dtype)[:, None]  # [2NL, 1]
    blocks = [
        jnp.broadcast_to(
            coord_cf[..., n : n + 1, :], coord_cf.shape[:-2] + (2 * L,) + coord_cf.shape[-1:]
        )
        for n in range(n_chan)
    ]
    c_exp = jnp.concatenate(blocks, axis=-2)  # [..., 2NL, P]
    spec = c_exp * freq_col
    is_sin = jnp.asarray(np.tile(np.arange(2 * L) < L, n_chan))[:, None]
    return jnp.where(is_sin, jnp.sin(spec), jnp.cos(spec))


def apply_c2f_cf(enc_cf: jax.Array, weights: jax.Array) -> jax.Array:
    """Channels-first variant of `apply_c2f`: band weights along the channel
    (sublane) axis of [..., 4L, P]."""
    L = weights.shape[-1]
    feat = enc_cf.shape[-2]
    assert feat % L == 0
    return enc_cf * jnp.tile(weights, feat // L)[:, None]


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
    """Apply [L] band weights over the trailing-L layout of `barf_posenc`.

    Mathematically the reference's `enc.view(-1, L) * weight`
    (model/planar.py:469-470), but implemented by tiling the weight vector to
    the full feature width instead of reshaping the [N, 4L] tensor to an
    L-lane layout — an L=8-lane view forces a full relayout on TPU (measured
    ~4 ms/step, half the train step)."""
    L = weights.shape[-1]
    feat = enc.shape[-1]
    assert feat % L == 0
    tiled = jnp.tile(weights, feat // L)  # [feat], repeating the L-band pattern
    return enc * tiled


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
