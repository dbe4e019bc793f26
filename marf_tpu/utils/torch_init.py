"""Transplant a reference (PyTorch) initial state_dict into marf_tpu params.

Parity tool: the refshims' MARF_DUMP_INIT hook saves the reference Graph's
initial `state_dict()` (reference model/planar.py:84 — right after
build_networks, i.e. exactly what its training starts from) as an .npz; this
loader maps those tensors onto the marf_tpu parameter pytree so both
frameworks can be run from the *same* initial point, eliminating the
RNG-stream confound from curve comparisons (PARITY.md).

Key mapping (torch state_dict name -> marf_tpu pytree path):
  neural_image.mlp.{i}.weight [out,in]    -> params.neural_image.mlp[i].w (transposed to [in,out])
  neural_image.mlp.{i}.bias   [out]       -> params.neural_image.mlp[i].b
  warp_param.weight           [B,8]       -> params.warp
  implicit_mask.mask_mapping.{2i}.weight  -> params.implicit_mask.mlp[i].w (transposed)
  implicit_mask.mask_mapping.{2i}.bias    -> params.implicit_mask.mlp[i].b
  embedding_view.weight       [N_vocab,128] -> params.view_embedding
  neural_image.progress       (scalar)    -> ignored (marf passes progress explicitly)

The reference's per-image heads (`build_single_masks`) live in a plain python
dict (reference model/planar.py:322-324), so they never appear in its
state_dict and cannot be transplanted.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from marf_tpu.utils.console import log


def load_torch_init(params: dict, npz_path: str) -> dict:
    """Return a copy of `params` with leaves replaced from a torch-init .npz."""
    d = np.load(npz_path)
    params = jax.tree.map(lambda x: x, params)  # fresh containers, safe to mutate
    used = {"neural_image.progress"}  # marf passes progress explicitly

    def take(name: str, like: jax.Array, transpose: bool = False) -> jax.Array:
        arr = d[name].T if transpose else d[name]
        if arr.shape != like.shape:
            raise ValueError(
                f"torch-init shape mismatch for {name}: npz {arr.shape} vs params {like.shape}"
            )
        used.add(name)
        return jnp.asarray(arr, dtype=like.dtype)

    for i, layer in enumerate(params["neural_image"]["mlp"]):
        layer["w"] = take(f"neural_image.mlp.{i}.weight", layer["w"], transpose=True)
        layer["b"] = take(f"neural_image.mlp.{i}.bias", layer["b"])
    if "warp_param.weight" in d.files:
        params["warp"] = take("warp_param.weight", params["warp"])
    if "implicit_mask" in params and "implicit_mask.mask_mapping.0.weight" in d.files:
        for i, layer in enumerate(params["implicit_mask"]["mlp"]):
            layer["w"] = take(f"implicit_mask.mask_mapping.{2 * i}.weight", layer["w"], transpose=True)
            layer["b"] = take(f"implicit_mask.mask_mapping.{2 * i}.bias", layer["b"])
    if "view_embedding" in params and "embedding_view.weight" in d.files:
        params["view_embedding"] = take("embedding_view.weight", params["view_embedding"])

    unused = sorted(set(d.files) - used)
    if unused:
        log.warn(f"torch-init: {len(unused)} npz tensors not mapped: {unused}")
    log.info(f"torch-init: transplanted {len(used) - 1} tensors from {npz_path}")
    return params
