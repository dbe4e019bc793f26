"""Device mesh + sharding layout for planar bundle adjustment.

Strategy (SURVEY.md §2.3 "TPU-native equivalents to build"): pure data
parallelism over the *pixel* axis — the workload's long axis is HW = 43,200
pixels per image (warp.py:51-52), not the B=5 image batch. A 1-axis
`jax.sharding.Mesh` shards one spatial dimension of every [B, C, h, w] target
array; parameters and optimizer state stay replicated. The train step itself
is unchanged: under `jit` with these input shardings, GSPMD partitions the
per-pixel MLP over devices, inserts halo exchanges for the 3x3/5x5 edge
convolutions at shard boundaries, and all-reduces the scalar loss terms and
(replicated-output) gradients over ICI. No hand-written collectives needed —
this is the annotate-and-let-XLA-partition recipe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
BATCH_AXIS = "batch"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-axis mesh over the first `n_devices` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        assert len(devices) >= n_devices, f"need {n_devices} devices, have {len(devices)}"
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def make_mesh_2d(n_batch: int, n_pixel: int) -> Mesh:
    """2-axis mesh ('batch', 'data'): image batch sharded over one axis,
    pixels over the other. Useful when B and a spatial dim both divide the
    device count (e.g. B=4 x pixel=2 on 8 chips); gradients still all-reduce
    over both axes via XLA-inserted collectives."""
    devices = jax.devices()
    need = n_batch * n_pixel
    assert len(devices) >= need, f"need {need} devices, have {len(devices)}"
    return Mesh(np.asarray(devices[:need]).reshape(n_batch, n_pixel), (BATCH_AXIS, DATA_AXIS))


def choose_pixel_axis(h: int, w: int, n_devices: int) -> int | None:
    """Pick which spatial dim of [B, C, h, w] to shard: the height axis (2) if
    divisible by the mesh, else width (3), else None (replicate — single-chip
    semantics)."""
    if n_devices <= 1:
        return None
    if h % n_devices == 0:
        return 2
    if w % n_devices == 0:
        return 3
    return None


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def _spatial_spec(axis: int | None, batch_sharded: bool = False):
    b = BATCH_AXIS if batch_sharded else None
    if axis == 2:
        return P(b, None, DATA_AXIS, None)
    if axis == 3:
        return P(b, None, None, DATA_AXIS)
    return P(b) if batch_sharded else P()


def shard_planar_data(data: dict, mesh: Mesh, axis: int | None) -> dict:
    """Place the dataset dict: [B, C, h, w] image arrays sharded on the chosen
    spatial axis (and the batch axis too on a 2-axis mesh), everything else
    (gt_hom [B,3,3], gt canvas) replicated."""
    batch_sharded = BATCH_AXIS in mesh.axis_names
    spatial = NamedSharding(mesh, _spatial_spec(axis, batch_sharded))
    repl = replicate(mesh)
    out = {}
    for key, value in data.items():
        if value is None:
            out[key] = None
            continue
        value = jnp.asarray(value, dtype=jnp.float32)
        if key in ("rgb", "masks", "masks_eroded", "gray", "edges") and value.ndim == 4:
            out[key] = jax.device_put(value, spatial)
        else:
            out[key] = jax.device_put(value, repl)
    return out
