"""Positional-encoding tests: layout, values, c2f schedule, Ha-NeRF embedding."""

import jax.numpy as jnp
import numpy as np

from marf_tpu.ops.posenc import apply_c2f, barf_c2f_weights, barf_posenc, hanerf_pos_embedding


def _oracle_posenc(coord: np.ndarray, L: int) -> np.ndarray:
    """Independent oracle of reference model/planar.py:451-460: per channel n,
    [sin(x_n * 2^k pi) for k] then [cos(...) for k], flattened [N,2,L]."""
    freq = 2.0 ** np.arange(L) * np.pi
    out = []
    for n in range(coord.shape[-1]):
        spec = coord[..., n : n + 1] * freq  # [..., L]
        out.append(np.sin(spec))
        out.append(np.cos(spec))
    return np.concatenate(out, axis=-1)


def test_posenc_matches_oracle(rng):
    # coords in the grid's [-1, 1] range; f32 sin at args up to 2^7*pi has
    # ~1e-4 argument-reduction error vs the f64 oracle
    coord = (rng.rand(7, 13, 2) * 2 - 1).astype(np.float32)
    enc = np.asarray(barf_posenc(jnp.asarray(coord), L=8))
    assert enc.shape == (7, 13, 32)
    np.testing.assert_allclose(enc, _oracle_posenc(coord, 8), atol=2e-4)


def test_c2f_weights_schedule():
    # reference model/planar.py:462-470 with c2f=(0, 0.4), L=8:
    # alpha = progress/0.4*8; w_k = (1-cos(clamp(alpha-k,0,1)*pi))/2
    L, c2f = 8, (0.0, 0.4)
    w0 = np.asarray(barf_c2f_weights(jnp.float32(0.0), c2f, L))
    np.testing.assert_allclose(w0, np.zeros(L), atol=1e-7)
    w_end = np.asarray(barf_c2f_weights(jnp.float32(0.4), c2f, L))
    np.testing.assert_allclose(w_end, np.ones(L), atol=1e-7)
    w_mid = np.asarray(barf_c2f_weights(jnp.float32(0.2), c2f, L))  # alpha = 4
    np.testing.assert_allclose(w_mid[:4], np.ones(4), atol=1e-6)
    np.testing.assert_allclose(w_mid[4:], np.zeros(4), atol=1e-6)
    w_frac = np.asarray(barf_c2f_weights(jnp.float32(0.225), c2f, L))  # alpha = 4.5
    assert abs(w_frac[4] - 0.5) < 1e-6  # (1-cos(0.5 pi))/2 = 0.5


def test_apply_c2f_band_layout(rng):
    # weight k must multiply exactly the k-th frequency of every sin/cos block
    coord = rng.randn(5, 2).astype(np.float32)
    L = 4
    enc = barf_posenc(jnp.asarray(coord), L)
    weights = jnp.asarray([1.0, 0.0, 2.0, 0.0])
    out = np.asarray(apply_c2f(enc, weights))
    oracle = _oracle_posenc(coord, L).reshape(5, 4, L) * np.asarray(weights)
    np.testing.assert_allclose(out, oracle.reshape(5, -1), rtol=1e-5, atol=1e-6)


def test_hanerf_embedding_layout(rng):
    # reference model/planar.py:505-517: [x, sin(f0 x), cos(f0 x), sin(f1 x), ...]
    x = rng.randn(11, 2).astype(np.float32)
    out = np.asarray(hanerf_pos_embedding(jnp.asarray(x)))
    assert out.shape == (11, 42)  # 2 + 2*2*10
    freqs = 2.0 ** np.linspace(0, 9, 10)
    np.testing.assert_allclose(out[:, :2], x, atol=1e-6)
    np.testing.assert_allclose(out[:, 2:4], np.sin(freqs[0] * x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 4:6], np.cos(freqs[0] * x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[:, 6:8], np.sin(freqs[1] * x), rtol=1e-5, atol=1e-5)


def test_hanerf_freqs_are_powers_of_two():
    x = jnp.ones((1, 1))
    out = np.asarray(hanerf_pos_embedding(x, max_logscale=9, n_freqs=10))
    # sin(2^k * 1) for k = 0..9
    expected = [np.sin(2.0**k) for k in range(10)]
    np.testing.assert_allclose(out[0, 1::2][:10], expected, rtol=1e-4)
