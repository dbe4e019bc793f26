"""Ha-NeRF-style learned occlusion mask head.

Capability parity with `ImplicitMask` + `PosEmbedding` + the view embedding
(reference model/planar.py:475-517, 319-327): an MLP
[3*128 + 42 -> 256 x4 -> 1, sigmoid] over (embedded input RGB, embedded
*unwarped* uv grid). The view embedding is an Embedding(N_vocab, 128) indexed
by `image.long()` — which quantizes [0,1] floats to {0,1}, so only rows 0/1
are ever used (SURVEY.md §2.4(4)); reproduced faithfully, with
`quantize_levels` as the documented fix-mode (e.g. 256 for 8-bit indexing).

TPU-native design: the reference loops over images in Python and (in
build_single_masks mode) runs the heads on *CPU* (model/planar.py:340-352) —
here both modes are a single vmap: shared-head mode broadcasts one parameter
set over the batch; single-masks mode vmaps over a stacked [B, ...] parameter
pytree. Either way it is one fused on-device program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from marf_tpu.models.linear import init_linear, apply_linear
from marf_tpu.ops.posenc import hanerf_pos_embedding

MASK_MLP_WIDTH = 256
VIEW_EMBED_DIM = 128
UV_EMBED_DIM = 42  # 2 + 2*2*10 (PosEmbedding(9, 10) on a 2-vector)


def init_implicit_mask(key: jax.Array, latent: int = 3 * VIEW_EMBED_DIM, in_channels_dir: int = UV_EMBED_DIM, dtype=jnp.float32) -> dict:
    """Init the 5-layer mask MLP (reference model/planar.py:477-484)."""
    dims = [latent + in_channels_dir, MASK_MLP_WIDTH, MASK_MLP_WIDTH, MASK_MLP_WIDTH, MASK_MLP_WIDTH, 1]
    keys = jax.random.split(key, len(dims) - 1)
    return {"mlp": [init_linear(k, d_in, d_out, dtype=dtype) for k, (d_in, d_out) in zip(keys, zip(dims[:-1], dims[1:]))]}


def apply_implicit_mask(params: dict, x: jax.Array) -> jax.Array:
    """[..., 426] features -> [..., 1] occlusion probability."""
    feat = x
    n = len(params["mlp"])
    for li, layer in enumerate(params["mlp"]):
        feat = apply_linear(layer, feat)
        feat = jax.nn.relu(feat) if li != n - 1 else jax.nn.sigmoid(feat)
    return feat


def init_view_embedding(key: jax.Array, n_vocab: int, dim: int = VIEW_EMBED_DIM, dtype=jnp.float32) -> jax.Array:
    """Embedding(N_vocab, 128) with torch's default N(0,1) init
    (reference model/planar.py:327)."""
    return jax.random.normal(key, (n_vocab, dim), dtype=dtype)


def embed_image(view_embedding: jax.Array, image: jax.Array, quantize_levels: int = 1) -> jax.Array:
    """Embed an input photo for the mask head (reference model/planar.py:342-345).

    Args:
      view_embedding: [N_vocab, 128] table.
      image: [3, H, W] floats in [0, 1].
      quantize_levels: 1 reproduces the reference's `image.long()` (floor ->
        indices in {0, 1}); >1 is the fix-mode: floor(image * (levels - 1)).

    Returns:
      [HW, 3*128] per-pixel embedded features.
    """
    if quantize_levels > 1:
        indices = jnp.clip((image * (quantize_levels - 1)).astype(jnp.int32), 0, view_embedding.shape[0] - 1)
    else:
        indices = image.astype(jnp.int32)  # floor toward zero on [0,1] -> {0,1}
    flat = indices.reshape(3, -1).T  # [HW, 3]
    embedded = view_embedding[flat]  # [HW, 3, 128]
    return embedded.reshape(flat.shape[0], -1)  # [HW, 384]


def apply_implicit_mask_cf(params: dict, x_cf: jax.Array) -> jax.Array:
    """Channels-first mask head: [..., 426, P] -> [..., 1, P]. Same math as
    `apply_implicit_mask` with the pixel axis kept in lanes (TPU-fast)."""
    feat = x_cf
    n = len(params["mlp"])
    for li, layer in enumerate(params["mlp"]):
        feat = jnp.einsum(
            "ko,...kn->...on", layer["w"], feat, preferred_element_type=jnp.float32
        ) + layer["b"][:, None]
        feat = jax.nn.relu(feat) if li != n - 1 else jax.nn.sigmoid(feat)
    return feat


def mask_head_inputs(view_embedding: jax.Array, images: jax.Array, xy_grid: jax.Array, quantize_levels: int = 1) -> jax.Array:
    """Build the batched mask-head input: concat(embedded RGB, embedded
    *unwarped* uv grid) per image (reference model/planar.py:340-349; the uv
    embedding uses xy_grid[0], i.e. the shared unwarped grid).

    Args:
      view_embedding: [N_vocab, 128].
      images: [B, 3, H, W] input photos.
      xy_grid: [HW, 2] unwarped normalized grid.

    Returns:
      [B, HW, 426] mask-head inputs.
    """
    uv_embedded = hanerf_pos_embedding(xy_grid)  # [HW, 42]
    img_embedded = jax.vmap(lambda im: embed_image(view_embedding, im, quantize_levels))(images)  # [B, HW, 384]
    uv = jnp.broadcast_to(uv_embedded[None], (images.shape[0],) + uv_embedded.shape)
    return jnp.concatenate([img_embedded, uv], axis=-1)


def mask_head_inputs_cf(view_embedding: jax.Array, images: jax.Array, xy_grid: jax.Array, quantize_levels: int = 1) -> jax.Array:
    """Channels-first mask-head inputs: [B, 426, HW].

    When the view embedding is frozen (the reference never optimizes it,
    model/planar.py:89-96), this whole tensor is constant across training —
    the engine precomputes it once at setup and the per-step cost of the
    implicit-mask path collapses to the head MLP itself.
    """
    return mask_head_inputs(view_embedding, images, xy_grid, quantize_levels).transpose(0, 2, 1)
