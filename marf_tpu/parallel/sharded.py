"""Sharded train-step construction: the single-chip step under a mesh.

The pure step function from `marf_tpu.engine.step` is reused verbatim — the
multi-chip path differs only in data placement (pixel-sharded targets,
replicated state) and in pinning the jitted outputs replicated so GSPMD
all-reduces gradients/metrics over ICI instead of leaving them sharded.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

import optax

from marf_tpu.engine.step import (
    TrainState,
    init_train_state,
    make_train_chunk,
    make_train_step,
)
from marf_tpu.models.planar import PlanarConfig
from marf_tpu.parallel.mesh import choose_pixel_axis, replicate, shard_planar_data


def make_sharded_train_setup(
    cfg: PlanarConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    data: dict,
    params: dict,
    n_steps: int = 1,
    use_homographies: bool = True,
    donate: bool = True,
):
    """Build (state, sharded_data, chunk_fn) for a mesh.

    Args:
      data: host or device dataset dict (numpy/jax arrays).
      params: initialized parameter pytree.

    Returns:
      (TrainState replicated over the mesh, pixel-sharded data dict,
       jitted chunk fn (state, data) -> (state, metrics)).
    """
    h, w = cfg.map_hw
    n_pixel = dict(zip(mesh.axis_names, mesh.devices.shape)).get("data", 1)
    axis = choose_pixel_axis(h, w, n_pixel)
    repl = replicate(mesh)

    sharded_data = shard_planar_data(data, mesh, axis)
    state = init_train_state(jax.device_put(params, repl), tx)
    state = TrainState(
        step=jax.device_put(state.step, repl),
        params=state.params,
        opt_state=jax.device_put(state.opt_state, repl),
    )

    step_fn = make_train_step(cfg, tx, use_homographies=use_homographies)
    chunk = make_train_chunk(step_fn, n_steps, donate=donate)
    return state, sharded_data, chunk
