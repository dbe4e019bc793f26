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

# ---------------------------------------------------------------------------
# Static-structure Pade expm: a computation-for-computation replica of
# jax.scipy.linalg.expm's float32 path (scaling-and-squaring, Pade 3/5/7,
# jax/_src/scipy/linalg.py _calc_P_Q/_solve_P_Q/_squaring) with every piece
# of data-dependent control flow replaced by compute-all + select:
#
#   - lax.switch over the Pade order -> all three (U, V) pairs + jnp.where
#     (vmap already lowers the switch this way, so this changes nothing),
#   - the 16-iteration lax.scan of lax.cond squarings -> 16 UNROLLED
#     where(i < n_squarings, R@R, R) steps. The selected branch performs the
#     identical HIGHEST-precision 3x3 matmul, so the f32 value (and its VJP)
#     is unchanged — but the scan/cond pair lowered to two sequential device
#     while-loops costing ~75 us/step on TPU v5e (fwd + transposed VJP scan,
#     round-4 trace), ~2.5% of the fused implicit step, vs ~free for the
#     unrolled selects, which XLA folds into the step's fusions.
#
# The exact f32 rounding profile matters here: the joint warp/MLP
# optimization measured ~3 dB final-PSNR sensitivity to the expm
# implementation (see sl3_to_SL3's method note), so this must be the SAME
# numerics, not merely the same math — tests/test_lie.py asserts bitwise
# equality of H and the VJP against jax.scipy.linalg.expm across the Pade
# orders and squaring counts.
# ---------------------------------------------------------------------------

_F32_MAXNORM = 3.925724783138660
_F32_CONDS = (4.258730016922831e-01, 1.880152677804762e+00)
_MAX_SQUARINGS = 16


def _pdot(a: jax.Array, b: jax.Array) -> jax.Array:
    """HIGHEST-precision batched matmul (jax.scipy's _precise_dot)."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _pade3(A, ident):
    b = (120.0, 60.0, 12.0, 1.0)
    A2 = _pdot(A, A)
    U = _pdot(A, b[3] * A2 + b[1] * ident)
    V = b[2] * A2 + b[0] * ident
    return U, V


def _pade5(A, ident):
    b = (30240.0, 15120.0, 3360.0, 420.0, 30.0, 1.0)
    A2 = _pdot(A, A)
    A4 = _pdot(A2, A2)
    U = _pdot(A, b[5] * A4 + b[3] * A2 + b[1] * ident)
    V = b[4] * A4 + b[2] * A2 + b[0] * ident
    return U, V


def _pade7(A, ident):
    b = (17297280.0, 8648640.0, 1995840.0, 277200.0, 25200.0, 1512.0, 56.0, 1.0)
    A2 = _pdot(A, A)
    A4 = _pdot(A2, A2)
    A6 = _pdot(A4, A2)
    U = _pdot(A, b[7] * A6 + b[5] * A4 + b[3] * A2 + b[1] * ident)
    V = b[6] * A6 + b[4] * A4 + b[2] * A2 + b[0] * ident
    return U, V


def expm_pade_static(A: jax.Array) -> jax.Array:
    """Batched f32 Pade expm with NO data-dependent control flow — bitwise
    equal (value and VJP) to `jax.scipy.linalg.expm` on float32 inputs.

    Args:
      A: [..., 3, 3] float32 (any square size works, but the all-branches
        trade is sized for tiny matrices).

    Returns:
      [..., 3, 3] expm(A); NaN where n_squarings would exceed the reference
      implementation's max_squarings=16 (matching its lax.cond guard).
    """
    ident = jnp.broadcast_to(jnp.eye(A.shape[-1], dtype=A.dtype), A.shape)
    A_L1 = jnp.max(jnp.sum(jnp.abs(A), axis=-2), axis=-1)  # [...] 1-norm
    n_sq = jnp.maximum(0.0, jnp.floor(jnp.log2(A_L1 / _F32_MAXNORM)))
    As = A / (2 ** n_sq.astype(A.dtype))[..., None, None]
    idx = jnp.digitize(A_L1, jnp.asarray(_F32_CONDS, dtype=A_L1.dtype))[..., None, None]
    U3, V3 = _pade3(As, ident)
    U5, V5 = _pade5(As, ident)
    U7, V7 = _pade7(As, ident)
    U = jnp.where(idx == 0, U3, jnp.where(idx == 1, U5, U7))
    V = jnp.where(idx == 0, V3, jnp.where(idx == 1, V5, V7))
    R = jnp.linalg.solve(-U + V, U + V)  # solve(Q, P)
    for i in range(_MAX_SQUARINGS):
        R = jnp.where((i < n_sq)[..., None, None], _pdot(R, R), R)
    return jnp.where((n_sq > _MAX_SQUARINGS)[..., None, None], jnp.nan, R)


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
      method: 'pade' (default — empirically ~3 dB better final PSNR than
        the Taylor kernel at f32; the joint optimization is sensitive to
        the expm's f32 rounding profile. Runs `expm_pade_static`, the
        control-flow-free bitwise replica of jax.scipy.linalg.expm),
        'pade_scan' (the original jax.scipy.linalg.expm — same values,
        ~75 us/step slower on TPU from its scan/cond squaring loop; kept
        as the equality oracle) or 'taylor' (see `expm3x3` — cheapest,
        use when expm cost matters more than the last dB).

    Returns:
      [..., 3, 3] homography with det = 1 (reference warp.py:98-106).
    """
    A = sl3_generator(h)
    if method == "taylor":
        return expm3x3(A)
    if method == "pade" and A.dtype == jnp.float32:
        # the static replica implements the f32 constants (maxnorm / Pade
        # order thresholds); f64 falls through to jax.scipy's expm below
        return expm_pade_static(A)
    batch_shape = A.shape[:-2]
    if batch_shape:
        flat = A.reshape((-1, 3, 3))
        H = jax.vmap(_expm)(flat)
        return H.reshape(batch_shape + (3, 3))
    return _expm(A)
