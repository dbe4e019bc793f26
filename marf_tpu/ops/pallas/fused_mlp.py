"""Fused posenc + MLP Pallas TPU kernel (forward + custom-VJP backward).

Why: the neural-image MLP over N = B*HW = 216,000 points is the step's hot
loop (reference model/planar.py:334). Under plain XLA each dense layer writes
its [N, 256] activation to HBM (~220 MB each) and the backward re-reads them,
making the step HBM-bandwidth-bound. This kernel tiles the N axis, keeps the
entire layer chain for a tile resident in VMEM, and the backward *recomputes*
activations per tile instead of reloading them — HBM traffic drops to the
[N,2] coords, [N,3] outputs/grads and the weights, and the MXU runs back to
back.

Scope: the reference's architecture family — posenc (optional, with BARF c2f
band weights as a runtime input) + dense stack with ReLU inner / sigmoid
output, no skip connections (`fused_mlp_supported` gates; the XLA path in
models/neural_image.py covers the rest). Weight gradients are accumulated
across the sequential TPU grid in f32 VMEM-resident output blocks.

Matmul inputs can run in bfloat16 (f32 accumulation; posenc, c2f weights and
the sigmoid stay f32) — set compute_dtype='bfloat16'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # rows of points per grid step
_VMEM_LIMIT = 100 * 1024 * 1024  # raise the scoped-vmem cap (v5e has 128 MiB)


def _interpret() -> bool:
    """Run the kernels in interpreter mode off-TPU (CI / CPU tests)."""
    return jax.default_backend() != "tpu"


def fused_mlp_supported(cfg) -> bool:
    """The kernel covers the no-skip dense stack (any depth/width)."""
    return not cfg.skip


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) * 1 // m * m


# ---------------------------------------------------------------------------
# In-kernel posenc
# ---------------------------------------------------------------------------


def _freq_row(L: int):
    """[1, L] band frequencies 2^k * pi, built in-kernel (broadcasted_iota —
    captured array constants are not allowed in Pallas kernels)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1).astype(jnp.float32)
    return jnp.exp2(k) * np.pi


def _trig_blocks(coords, L: int):
    """Raw sin/cos band blocks per channel: ([T, L] sin, [T, L] cos) x 2."""
    freq = _freq_row(L)
    blocks = []
    for n in range(2):
        spec = coords[:, n : n + 1] * freq  # [T, L]
        blocks.append((jnp.sin(spec), jnp.cos(spec)))
    return blocks


def _posenc_tile(coords, cw, L: int):
    """BARF posenc of a [T, 2] tile -> [T, 2 + 4L] f32, with c2f band weights
    `cw` ([1, L]) applied. Matches ops.posenc layout: per channel
    [sin(x f_0..f_{L-1}), cos(x f_0..f_{L-1})]."""
    if L == 0:
        return coords
    parts = [coords]
    for sin_b, cos_b in _trig_blocks(coords, L):
        parts.append(sin_b * cw)
        parts.append(cos_b * cw)
    return jnp.concatenate(parts, axis=-1)  # [T, 2+4L]


def _posenc_tile_bwd(coords, cwf, L: int, denc):
    """VJP of `_posenc_tile` w.r.t. coords. `cwf` = cw * freq ([1, L],
    precomputed outside the kernel). denc: [T, 2+4L] -> [T, 2]."""
    if L == 0:
        return denc
    dcoords = denc[:, :2]
    cols = 2
    out = [None, None]
    for n, (sin_b, cos_b) in enumerate(_trig_blocks(coords, L)):
        dsin = denc[:, cols : cols + L]
        dcos = denc[:, cols + L : cols + 2 * L]
        cols += 2 * L
        # d/dc [sin(c f) * w] = f w cos(c f); d/dc [cos(c f) * w] = -f w sin(c f)
        out[n] = jnp.sum(dsin * cos_b * cwf, axis=-1) - jnp.sum(dcos * sin_b * cwf, axis=-1)
    return dcoords + jnp.stack([out[0], out[1]], axis=-1)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(L, n_layers, cdtype, cw_ref, coords_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    out_ref = refs[2 * n_layers]
    coords = coords_ref[:]
    enc = _posenc_tile(coords, cw_ref[:], L).astype(cdtype)
    x = enc
    for li in range(n_layers):
        z = (
            jnp.dot(x, w_refs[li][:].astype(cdtype), preferred_element_type=jnp.float32)
            + b_refs[li][:]
        )
        x = jax.nn.relu(z).astype(cdtype) if li != n_layers - 1 else z
    out_ref[:] = jax.nn.sigmoid(x.astype(jnp.float32))


def _bwd_kernel(L, n_layers, cdtype, cw_ref, cwf_ref, coords_ref, g_ref, *refs):
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    dcoords_ref = refs[2 * n_layers]
    out_dw_refs = refs[2 * n_layers + 1 : 3 * n_layers + 1]
    out_db_refs = refs[3 * n_layers + 1 : 4 * n_layers + 1]
    # VMEM scratch accumulators: persist across the sequential grid without
    # round-tripping the [256,256] blocks through the output pipeline each step
    dw_refs = refs[4 * n_layers + 1 : 5 * n_layers + 1]
    db_refs = refs[5 * n_layers + 1 : 6 * n_layers + 1]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for li in range(n_layers):
            dw_refs[li][:] = jnp.zeros_like(dw_refs[li])
            db_refs[li][:] = jnp.zeros_like(db_refs[li])

    coords = coords_ref[:]
    enc_f32 = _posenc_tile(coords, cw_ref[:], L)
    # recompute forward chain, stashing activations in VMEM values
    acts = [enc_f32.astype(cdtype)]
    x = acts[0]
    for li in range(n_layers):
        z = (
            jnp.dot(x, w_refs[li][:].astype(cdtype), preferred_element_type=jnp.float32)
            + b_refs[li][:]
        )
        if li != n_layers - 1:
            x = jax.nn.relu(z).astype(cdtype)
            acts.append(x)
        else:
            out = jax.nn.sigmoid(z)
    # backward
    g = g_ref[:]
    d = (g * out * (1.0 - out)).astype(cdtype)  # sigmoid VJP, [T, out_dim]
    for li in range(n_layers - 1, -1, -1):
        a = acts[li]  # input to layer li, [T, k_in]
        # dW = a^T @ d, contracting the row (point) axis — no explicit transpose
        dw_refs[li][:] += jax.lax.dot_general(
            a, d, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        db_refs[li][:] += jnp.sum(d.astype(jnp.float32), axis=0, keepdims=True)
        if li > 0:
            # da = d @ W^T, contracting the k_out axis
            da = jax.lax.dot_general(
                d, w_refs[li][:].astype(cdtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            d = (da * (acts[li].astype(jnp.float32) > 0.0)).astype(cdtype)
        else:
            denc = jax.lax.dot_general(
                d, w_refs[0][:].astype(cdtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dcoords_ref[:] = _posenc_tile_bwd(coords, cwf_ref[:], L, denc)

    @pl.when(step == pl.num_programs(0) - 1)
    def _writeout():
        for li in range(n_layers):
            out_dw_refs[li][:] = dw_refs[li][:]
            out_db_refs[li][:] = db_refs[li][:]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _layer_dims(cfg):
    return cfg.layer_dims  # [(k_in, k_out)] from NeuralImageConfig


def _pad_rows(x, n_padded):
    n = x.shape[0]
    if n == n_padded:
        return x
    return jnp.pad(x, ((0, n_padded - n),) + ((0, 0),) * (x.ndim - 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_neural_image(params, coords, cw, cfg):
    """Fused forward: [N, 2] coords -> [N, out] rgb.

    Args:
      params: {'mlp': [{'w': [k_in, k_out], 'b': [k_out]}, ...]} (f32 master).
      coords: [N, 2] warped coordinates.
      cw: [L] c2f band weights (pass ones when barf_c2f is off).
      cfg: NeuralImageConfig (static).
    """
    out, _ = _fwd_impl(params, coords, cw, cfg)
    return out


def _specs_weights(n_layers):
    # full-array blocks, constant across the grid -> stay VMEM-resident
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2 * n_layers)]


def _fwd_impl(params, coords, cw, cfg):
    dims = _layer_dims(cfg)
    n_layers = len(dims)
    L = cfg.posenc_L or 0
    cdtype = jnp.dtype(cfg.compute_dtype)
    N = coords.shape[0]
    n_padded = _round_up(max(N, TILE), TILE)
    coords_p = _pad_rows(coords, n_padded)
    grid = n_padded // TILE

    # pre-cast weights ONCE per step (casting inside the kernel re-converts on
    # every grid step); biases stay f32 (added to the f32 accumulator)
    weights = [params["mlp"][i]["w"].astype(cdtype) for i in range(n_layers)]
    biases = [params["mlp"][i]["b"].reshape(1, -1) for i in range(n_layers)]
    out_dim = dims[-1][1]

    kernel = functools.partial(_fwd_kernel, L, n_layers, cdtype)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, max(L, 1)), lambda i: (0, 0), memory_space=pltpu.VMEM),  # cw
            pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),  # coords
            *_specs_weights(n_layers),
        ],
        out_specs=pl.BlockSpec((TILE, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, out_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(cw.reshape(1, -1) if L else jnp.ones((1, 1), jnp.float32), coords_p, *weights, *biases)
    return out[:N], (params, coords, cw)


def _fwd_rule(params, coords, cw, cfg):
    return _fwd_impl(params, coords, cw, cfg)


def _bwd_rule(cfg, residuals, g):
    params, coords, cw = residuals
    dims = _layer_dims(cfg)
    n_layers = len(dims)
    L = cfg.posenc_L or 0
    cdtype = jnp.dtype(cfg.compute_dtype)
    N = coords.shape[0]
    n_padded = _round_up(max(N, TILE), TILE)
    coords_p = _pad_rows(coords, n_padded)
    g_p = _pad_rows(g, n_padded)  # zero grads on padded rows -> no dW pollution
    grid = n_padded // TILE

    weights = [params["mlp"][i]["w"].astype(cdtype) for i in range(n_layers)]
    biases = [params["mlp"][i]["b"].reshape(1, -1) for i in range(n_layers)]
    out_dim = dims[-1][1]

    freq = (2.0 ** np.arange(max(L, 1), dtype=np.float32)) * np.pi
    cw_in = cw.reshape(1, -1) if L else jnp.ones((1, 1), jnp.float32)
    cwf_in = cw_in * freq[None, :]

    kernel = functools.partial(_bwd_kernel, L, n_layers, cdtype)
    out_shapes = (
        [jax.ShapeDtypeStruct((n_padded, 2), jnp.float32)]  # dcoords
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
        + [jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32) for b in biases]
    )
    out_specs = (
        [pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in weights]
        + [pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM) for b in biases]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, max(L, 1)), lambda i: (0, 0), memory_space=pltpu.VMEM),  # cw
            pl.BlockSpec((1, max(L, 1)), lambda i: (0, 0), memory_space=pltpu.VMEM),  # cw*freq
            pl.BlockSpec((TILE, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *_specs_weights(n_layers),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM(w.shape, jnp.float32) for w in weights]
            + [pltpu.VMEM((1, b.shape[-1]), jnp.float32) for b in biases]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(cw_in, cwf_in, coords_p, g_p, *weights, *biases)

    dcoords = outs[0][:N]
    dws = outs[1 : 1 + n_layers]
    dbs = [b.reshape(-1) for b in outs[1 + n_layers :]]
    dparams = {"mlp": [{"w": dws[i], "b": dbs[i]} for i in range(n_layers)]}
    # cw is a function of `progress` only (non-differentiated schedule in the
    # reference: c2f uses progress.data, model/planar.py:465); return zeros.
    return dparams, dcoords, jnp.zeros_like(cw)


fused_neural_image.defvjp(_fwd_rule, _bwd_rule)
