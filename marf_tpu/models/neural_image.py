"""The coordinate-MLP "neural image" with BARF coarse-to-fine posenc.

Capability parity with `NeuralImageFunction` (reference model/planar.py:
395-471): 2 + 4*L input features (xy concat posenc), hidden stack from
`arch.layers` with optional skip re-concats, ReLU inner activations, sigmoid
output; under barf_c2f the first layer's init is rescaled by
sqrt(input_dim/2) (model/planar.py:421-426) and the posenc bands are
cosine-annealed by training progress (model/planar.py:462-470).

TPU-native design: `progress` is a traced scalar input (derived from the step
counter inside the jitted step) rather than a host-mutated parameter, so one
compiled program serves the whole schedule; the forward is pure and shape-
static, so XLA tiles the [B*HW, 256] matmuls onto the MXU. The hot training
path fuses this whole forward (and its backward) into one Pallas kernel,
`marf_tpu.ops.pallas.fused_step`.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from marf_tpu.models.linear import init_linear, apply_linear
from marf_tpu.ops.posenc import (
    apply_c2f,
    apply_c2f_cf,
    barf_c2f_weights,
    barf_posenc,
    barf_posenc_cf,
)


@dataclasses.dataclass(frozen=True)
class NeuralImageConfig:
    """Static architecture config (reference options/planar.yaml:33-39)."""

    layers: tuple = (None, 256, 256, 256, 256, 3)
    skip: tuple = ()
    posenc_L: int | None = 8  # None -> raw-coordinate MLP (--arch.posenc!)
    barf_c2f: tuple | None = None  # (start, end) or None
    # MXU input dtype for the dense layers ('float32' | 'bfloat16').
    # Accumulation is always f32 (preferred_element_type); posenc, c2f
    # weights, sigmoid output and the master params stay f32. bfloat16 halves
    # the HBM activation traffic that bounds the backward pass.
    compute_dtype: str = "float32"
    # independent SUB-lane column streams per kernel grid step (the
    # dependent-chain lever — PERF.md "Independent column streams").
    # 0 = fall back to the MARF_FUSED_STREAMS env default (1).
    fused_streams: int = 0

    @property
    def input_dim(self) -> int:
        return 2 + 4 * self.posenc_L if self.posenc_L else 2

    @property
    def layer_dims(self) -> list:
        """[(k_in, k_out)] with skip-widened inputs resolved
        (reference model/planar.py:410-427 + util.get_layer_dims)."""
        dims = list(zip(self.layers[:-1], self.layers[1:]))
        resolved = []
        for li, (k_in, k_out) in enumerate(dims):
            if li == 0:
                k_in = self.input_dim
            if li in self.skip:
                k_in += self.input_dim
            resolved.append((k_in, k_out))
        return resolved


def _mxu_operands(a: jax.Array, b: jax.Array):
    """bf16 x bf16 -> f32 is the native TPU MXU mode, but XLA:CPU's DotThunk
    doesn't implement it — upcast the operands off-TPU. Numerically identical
    (every bf16 product is exact in f32; accumulation is f32 either way); see
    ops/pallas/fused_step.mxu_dot for the kernel-side twin."""
    if a.dtype == jnp.bfloat16 and jax.default_backend() != "tpu":
        return a.astype(jnp.float32), b.astype(jnp.float32)
    return a, b


def init_neural_image(key: jax.Array, cfg: NeuralImageConfig, dtype=jnp.float32) -> dict:
    """Init the MLP params; first-layer sqrt(input_dim/2) rescale under c2f
    (reference model/planar.py:421-426 — the init distribution was tuned for
    posenc inputs but only the raw xy passes through at progress=0)."""
    params = {"mlp": []}
    keys = jax.random.split(key, len(cfg.layer_dims))
    for li, (k_in, k_out) in enumerate(cfg.layer_dims):
        layer = init_linear(keys[li], k_in, k_out, dtype=dtype)
        if cfg.barf_c2f is not None and li == 0:
            scale = math.sqrt(cfg.input_dim / 2.0)
            layer = {"w": layer["w"] * scale, "b": layer["b"] * scale}
        params["mlp"].append(layer)
    return params


def encode_coords(coord: jax.Array, cfg: NeuralImageConfig, progress: jax.Array | None) -> jax.Array:
    """Posenc + c2f banding + concat with raw coords
    (reference model/planar.py:432-436, 451-471)."""
    if not cfg.posenc_L:
        return coord
    enc = barf_posenc(coord, cfg.posenc_L)
    if cfg.barf_c2f is not None:
        assert progress is not None
        weights = barf_c2f_weights(progress, tuple(cfg.barf_c2f), cfg.posenc_L, dtype=coord.dtype)
        enc = apply_c2f(enc, weights)
    return jnp.concatenate([coord, enc], axis=-1)


def encode_coords_cf(coord_cf: jax.Array, cfg: NeuralImageConfig, progress: jax.Array | None) -> jax.Array:
    """Channels-first posenc + c2f + concat: [..., 2, P] -> [..., input_dim, P]."""
    if not cfg.posenc_L:
        return coord_cf
    enc = barf_posenc_cf(coord_cf, cfg.posenc_L)
    if cfg.barf_c2f is not None:
        assert progress is not None
        weights = barf_c2f_weights(progress, tuple(cfg.barf_c2f), cfg.posenc_L, dtype=coord_cf.dtype)
        enc = apply_c2f_cf(enc, weights)
    return jnp.concatenate([coord_cf, enc], axis=-2)


def apply_neural_image_cf(
    params: dict,
    coord_cf: jax.Array,
    cfg: NeuralImageConfig,
    progress: jax.Array | None = None,
) -> jax.Array:
    """Channels-first forward: [..., 2, P] coords -> [..., 3, P] rgb.

    Numerically identical to `apply_neural_image` but with the pixel axis in
    lanes throughout — no small-lane tensors, no output transpose (the
    [B, 3, HW] result reshapes directly to the [B, 3, h, w] map the losses
    consume). This is the default single-chip hot path.
    """
    points_enc = encode_coords_cf(coord_cf, cfg, progress)
    dtype = jnp.dtype(cfg.compute_dtype)
    points_enc = points_enc.astype(dtype)
    feat = points_enc
    n_layers = len(params["mlp"])
    for li, layer in enumerate(params["mlp"]):
        if li in cfg.skip:
            feat = jnp.concatenate([feat, points_enc], axis=-2)
        w = layer["w"].astype(dtype)  # [k_in, k_out]
        b = layer["b"][:, None]  # [k_out, 1]
        w, f = _mxu_operands(w, feat)
        feat = (
            jnp.einsum("ko,...kn->...on", w, f, preferred_element_type=jnp.float32) + b
        )
        if li != n_layers - 1:
            feat = jax.nn.relu(feat).astype(dtype)
    return jax.nn.sigmoid(feat.astype(jnp.float32))


def apply_neural_image(
    params: dict,
    coord: jax.Array,
    cfg: NeuralImageConfig,
    progress: jax.Array | None = None,
) -> jax.Array:
    """Forward: [..., 2] coords -> [..., 3] rgb in (0, 1)
    (reference model/planar.py:429-449). Row-major reference path: the
    torch-oracle-tested layout (tests/test_models.py); the hot training path
    is `apply_neural_image_cf` / the fused train kernel."""
    points_enc = encode_coords(coord, cfg, progress)
    dtype = jnp.dtype(cfg.compute_dtype)
    points_enc = points_enc.astype(dtype)
    feat = points_enc
    n_layers = len(params["mlp"])
    for li, layer in enumerate(params["mlp"]):
        if li in cfg.skip:
            feat = jnp.concatenate([feat, points_enc], axis=-1)
        # cast only the weights; add the f32 bias to the f32 MXU accumulator
        # (matches apply_neural_image_cf and both Pallas kernels exactly)
        w = layer["w"].astype(dtype)
        f, w = _mxu_operands(feat, w)
        feat = jnp.dot(f, w, preferred_element_type=jnp.float32) + layer["b"]
        if li != n_layers - 1:
            feat = jax.nn.relu(feat).astype(dtype)
    return jax.nn.sigmoid(feat.astype(jnp.float32))
