"""sl(3) -> SL(3) tests: generator layout, expm correctness, grad, vmap, det."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from marf_tpu.ops.lie import expm3x3, expm_pade_static, sl3_generator, sl3_to_SL3


def test_taylor_matches_pade_and_scipy(rng):
    """The fixed-unroll Taylor expm must agree with scipy across the warp
    magnitudes this workload produces (and beyond)."""
    for scale in (0.01, 0.3, 1.0, 2.0):
        h = rng.randn(8, 8).astype(np.float32) * scale
        A = np.asarray(sl3_generator(jnp.asarray(h)))
        ours = np.asarray(expm3x3(jnp.asarray(A)))
        for i in range(8):
            expected = scipy.linalg.expm(A[i].astype(np.float64))
            np.testing.assert_allclose(ours[i], expected, rtol=5e-5, atol=1e-5)


def test_taylor_matches_default_pade(rng):
    h = jnp.asarray(rng.randn(4, 8).astype(np.float32) * 0.5)
    np.testing.assert_allclose(
        np.asarray(sl3_to_SL3(h, method="taylor")), np.asarray(sl3_to_SL3(h)), rtol=2e-5, atol=2e-6
    )


def test_pade_static_bitwise_equals_jax_scipy(rng):
    """The control-flow-free Pade replica must be BITWISE equal to
    jax.scipy.linalg.expm — value and VJP — across the f32 Pade orders
    (norm bands split at 0.426 / 1.88) and squaring counts (norm > 3.93):
    the default method's f32 rounding profile is a measured-quality
    invariant (ops/lie.py method note).

    Both sides are compared under jit, which is how the train step always
    runs them: unjitted, jax.scipy's @jit-decorated _calc_P_Q gets XLA's
    FMA contraction while an op-by-op caller does not, so eager bit
    equality is not even well-defined for the reference itself."""
    import jax.scipy.linalg as jsl

    @jax.jit
    def f_mine(A, ct):
        out, vjp = jax.vjp(expm_pade_static, A)
        return out, vjp(ct)[0]

    @jax.jit
    def f_ref(A, ct):
        out, vjp = jax.vjp(lambda a: jax.vmap(jsl.expm)(a), A)
        return out, vjp(ct)[0]

    for scale in (1e-3, 0.05, 0.3, 1.0, 3.0, 10.0, 60.0):
        h = rng.randn(6, 8).astype(np.float32) * scale
        A = sl3_generator(jnp.asarray(h))
        ct = jnp.asarray(rng.randn(6, 3, 3).astype(np.float32))
        ours, g_ours = f_mine(A, ct)
        ref, g_ref = f_ref(A, ct)
        # NaN-aware array_equal: at scale 60 the squarings legitimately
        # overflow f32 in BOTH implementations (identical NaN pattern)
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
        if scale <= 10.0:  # finite range: VJPs must match bit-for-bit
            assert np.isfinite(np.asarray(ours)).all()
            np.testing.assert_array_equal(np.asarray(g_ours), np.asarray(g_ref))


def test_pade_static_nan_guard():
    """n_squarings > 16 (norm > ~3.9e5) must produce NaN, matching the
    reference implementation's lax.cond guard."""
    A = jnp.eye(3, dtype=jnp.float32)[None] * 1e7
    out = np.asarray(expm_pade_static(A))
    assert np.isnan(out).all()


def test_generator_layout():
    # reference warp.py:101-104: A = [[h5,h3,h1],[h4,-h5-h6,h2],[h7,h8,h6]]
    h = np.arange(1, 9, dtype=np.float32)  # h1..h8 = 1..8
    A = np.asarray(sl3_generator(jnp.asarray(h)))
    expected = np.array([[5, 3, 1], [4, -5 - 6, 2], [7, 8, 6]], dtype=np.float32)
    np.testing.assert_array_equal(A, expected)


def test_generator_traceless(rng):
    h = jnp.asarray(rng.randn(10, 8).astype(np.float32))
    A = sl3_generator(h)
    np.testing.assert_allclose(np.trace(np.asarray(A), axis1=-2, axis2=-1), 0.0, atol=1e-6)


def test_expm_matches_scipy(rng):
    h = rng.randn(16, 8).astype(np.float32) * 0.3
    H = np.asarray(sl3_to_SL3(jnp.asarray(h)))
    for i in range(16):
        expected = scipy.linalg.expm(np.asarray(sl3_generator(jnp.asarray(h[i]))))
        np.testing.assert_allclose(H[i], expected, rtol=1e-5, atol=1e-6)


def test_det_one(rng):
    # det(expm(A)) = exp(tr(A)) = 1 for traceless A
    h = rng.randn(8, 8).astype(np.float32) * 0.5
    H = sl3_to_SL3(jnp.asarray(h))
    np.testing.assert_allclose(np.linalg.det(np.asarray(H)), 1.0, rtol=1e-4)


def test_zero_maps_to_identity():
    H = sl3_to_SL3(jnp.zeros((3, 8)))
    np.testing.assert_allclose(np.asarray(H), np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-7)


def test_grad_finite_and_nonzero(rng):
    h = jnp.asarray(rng.randn(4, 8).astype(np.float32) * 0.2)

    def f(h):
        return jnp.sum(sl3_to_SL3(h) ** 2)

    g = jax.grad(f)(h)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_grad_matches_finite_differences(rng):
    jax.config.update("jax_enable_x64", True)
    try:
        h = rng.randn(8).astype(np.float64) * 0.1

        def f(hv):
            return float(jnp.sum(sl3_to_SL3(jnp.asarray(hv, dtype=jnp.float64)) * jnp.arange(9.0).reshape(3, 3)))

        g = np.asarray(
            jax.grad(lambda hv: jnp.sum(sl3_to_SL3(hv) * jnp.arange(9.0).reshape(3, 3)))(jnp.asarray(h))
        )
        eps = 1e-6
        for i in range(8):
            hp, hm = h.copy(), h.copy()
            hp[i] += eps
            hm[i] -= eps
            fd = (f(hp) - f(hm)) / (2 * eps)
            assert abs(fd - g[i]) < 1e-6, (i, fd, g[i])
    finally:
        jax.config.update("jax_enable_x64", False)


def test_jit_vmap_batch_shapes(rng):
    h = jnp.asarray(rng.randn(2, 5, 8).astype(np.float32))
    H = jax.jit(sl3_to_SL3)(h)
    assert H.shape == (2, 5, 3, 3)


@pytest.mark.filterwarnings("ignore")
def test_float64_path(rng):
    jax.config.update("jax_enable_x64", True)
    try:
        h = jnp.asarray(rng.randn(3, 8) * 0.3)
        H = sl3_to_SL3(h)
        expected = np.stack([scipy.linalg.expm(np.asarray(sl3_generator(jnp.asarray(hi)))) for hi in np.asarray(h)])
        np.testing.assert_allclose(np.asarray(H), expected, rtol=1e-10, atol=1e-12)
    finally:
        jax.config.update("jax_enable_x64", False)
