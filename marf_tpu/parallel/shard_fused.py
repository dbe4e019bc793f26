"""The fused Pallas train kernel under `shard_map`: multi-chip without
giving up the single-chip kernel.

GSPMD cannot partition a `pallas_call`, so the default mesh path
(parallel/sharded.py) falls back to the XLA step. Here the partitioning is
manual — the TPU-native recipe for scaling a custom kernel:

- the flat pixel axis (N = B*HW, column order b*HW + i) is sharded over the
  1-axis mesh; each device runs the UNCHANGED single-chip kernel
  (ops/pallas/fused_step.py, v5 in-kernel warp) on its contiguous column
  block;
- the masked-MSE normalization 1/(3*sum(m)) needs the GLOBAL mask sum, so a
  `psum` precedes the kernel; the kernel's per-shard loss partials and
  dW/db/dH gradients `psum` after it — all over ICI;
- the edge term is a 2-D conv over full [B, 3, h, w] maps; rather than halo
  exchanges at shard boundaries, the [3, N_local] rgb shards are
  `all_gather`ed (tiled) — ~2.6 MB over ICI per step, cheap — and the conv
  runs replicated (it is gradient-blocked, reference inputs.py:50-69, so no
  backward collective is needed);
- params/optimizer state stay replicated; after the gradient psum every
  device applies an identical Adam update (pure data parallelism).

Metric semantics match engine/step.py exactly (pre-update losses/PSNR,
post-update Homography_Error, fix_first after metrics).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import optax

from marf_tpu.engine.step import TrainState, init_train_state
from marf_tpu.models.planar import PlanarConfig
from marf_tpu.ops.filters import compute_edges
from marf_tpu.ops.grid import normalized_pixel_grid
from marf_tpu.ops.lie import sl3_to_SL3
from marf_tpu.ops.losses import (
    alpha_schedule,
    check_finite,
    homography_error,
    mse,
    psnr_from_rgb_loss,
    render_loss,
    summarize_loss,
)
from marf_tpu.ops.pallas.fused_step import fused_train_kernel_warp
from marf_tpu.ops.posenc import barf_c2f_weights
from marf_tpu.parallel.mesh import DATA_AXIS, replicate


def fused_shardable(cfg: PlanarConfig, n_devices: int) -> bool:
    """Whether the fused kernel can run under the pixel-sharded mesh:
    the fixed/no-mask configs (the implicit head keeps the GSPMD path) with
    the flat pixel axis divisible by the mesh and B within the v5 kernel's
    padded image axis (the single-chip gate in engine/step.py falls back to
    v4 for B > PB; this path has no v4 leg, so it must decline instead)."""
    from marf_tpu.models.planar import use_fused_step
    from marf_tpu.ops.pallas.fused_step import PB

    h, w = cfg.map_hw
    return (
        use_fused_step(cfg)
        and cfg.fused_warp != "off"
        and cfg.batch_size <= PB
        and (cfg.batch_size * h * w) % n_devices == 0
    )


def flatten_planar_data(data: dict, cfg: PlanarConfig) -> dict:
    """Build the flat channels-first streams the kernel consumes.

    Returns a dict of [C, N] arrays (rgb_cf/masks_cf/grid_b, shardable on
    axis 1) plus the replicated full-map targets the edge term needs.
    """
    h, w = cfg.map_hw
    B = cfg.batch_size
    N = B * h * w
    grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
    uv = grid.T  # [2, HW]
    grid_b = jnp.concatenate(
        [jnp.tile(uv, (1, B)), jnp.repeat(jnp.arange(B, dtype=jnp.float32), uv.shape[1])[None, :]],
        axis=0,
    )  # [3, N]
    rgb_cf = jnp.asarray(data["rgb"], jnp.float32).transpose(1, 0, 2, 3).reshape(3, N)
    if cfg.use_masks and data.get("masks") is not None:
        masks_cf = jnp.asarray(data["masks"], jnp.float32).transpose(1, 0, 2, 3).reshape(1, N)
    else:
        masks_cf = jnp.ones((1, N), dtype=jnp.float32)
    out = {"rgb_cf": rgb_cf, "masks_cf": masks_cf, "grid_b": grid_b}
    if cfg.use_edges:
        out["edges"] = jnp.asarray(data["edges"], jnp.float32)
        me = data.get("masks_eroded")
        out["masks_eroded"] = None if me is None else jnp.asarray(me, jnp.float32)
    gt = data.get("gt_hom")
    out["gt_hom"] = None if gt is None else jnp.asarray(gt, jnp.float32)
    return out


FLAT_KEYS = ("rgb_cf", "masks_cf", "grid_b")  # sharded on their column axis


def shard_flat_data(flat: dict, mesh: Mesh) -> dict:
    """Place the flat streams column-sharded over the mesh, the rest replicated."""
    col = NamedSharding(mesh, P(None, DATA_AXIS))
    repl = replicate(mesh)
    out = {}
    for key, value in flat.items():
        if value is None:
            out[key] = None
        else:
            out[key] = jax.device_put(value, col if key in FLAT_KEYS else repl)
    return out


def make_fused_sharded_chunk(
    cfg: PlanarConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    data_keys,
    n_steps: int = 1,
    use_homographies: bool = True,
    donate: bool = True,
):
    """Jitted (replicated TrainState, sharded flat data) -> (state, metrics)
    chunk running the fused kernel per shard with psum'd gradients."""
    h, w = cfg.map_hw
    B = cfg.batch_size
    data_specs = {k: (P(None, DATA_AXIS) if k in FLAT_KEYS else P()) for k in data_keys}

    def step_local(state: TrainState, d: dict):
        """Per-device body: local kernel + ICI collectives."""
        params = state.params
        step = state.step
        progress = step.astype(jnp.float32) / cfg.max_iter
        alpha = (
            alpha_schedule(step, cfg.max_iter, cfg.alpha_initial, cfg.alpha_final)
            if cfg.use_edges
            else jnp.asarray(0.0, dtype=jnp.float32)
        )
        g_loss_scale = (10.0 ** float(cfg.w_render)) * (1.0 - alpha)
        if cfg.w_rgb is not None:
            g_loss_scale = g_loss_scale + (10.0 ** float(cfg.w_rgb))
        cw = (
            barf_c2f_weights(progress, tuple(cfg.arch.barf_c2f), cfg.arch.posenc_L)
            if (cfg.arch.posenc_L and cfg.arch.barf_c2f is not None)
            else None
        )

        # global masked-MSE normalization: psum the local mask sum over ICI
        inv_sum3 = 1.0 / (jax.lax.psum(jnp.sum(d["masks_cf"]), DATA_AXIS) * 3.0)

        H, expm_vjp = jax.vjp(sl3_to_SL3, params["warp"])
        rgb_local, loss_local, dmlp, dH = fused_train_kernel_warp(
            params["neural_image"], d["grid_b"], H, cw, d["rgb_cf"], d["masks_cf"],
            g_loss_scale, inv_sum3, cfg.arch,
        )
        # gradients + loss partials all-reduce over ICI
        rgb_loss = jax.lax.psum(loss_local, DATA_AXIS)
        dmlp = jax.lax.psum(dmlp, DATA_AXIS)
        dwarp = expm_vjp(jax.lax.psum(dH, DATA_AXIS))[0]
        grads = {"neural_image": dmlp, "warp": dwarp}

        if cfg.use_edges:
            # gather the rgb shards (tiled -> [3, N]) and run the conv
            # replicated — the edge term is gradient-blocked, so this costs
            # one small all_gather and no backward collective
            rgb_full = jax.lax.all_gather(rgb_local, DATA_AXIS, axis=1, tiled=True)
            rgb_map = rgb_full.reshape(3, B, h, w).transpose(1, 0, 2, 3)
            edge_pred = compute_edges(rgb_map, differentiable=False)
            edge_loss = mse(edge_pred, d["edges"], d.get("masks_eroded"))
        else:
            edge_loss = jnp.asarray(0.0, dtype=jnp.float32)
        mask_loss = jnp.asarray(0.0, dtype=jnp.float32)
        loss = {
            "render": render_loss(rgb_loss, edge_loss, mask_loss, alpha),
            "rgb": rgb_loss,
            "mask": mask_loss,
            "edge": edge_loss,
        }
        total = summarize_loss(loss, cfg.loss_weight)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {f"loss_{k}": v for k, v in loss.items()}
        metrics["all"] = total
        metrics["PSNR"] = psnr_from_rgb_loss(loss["rgb"])
        metrics["finite"] = check_finite(loss)
        if use_homographies and d.get("gt_hom") is not None:
            metrics["Homography_Error"] = homography_error(sl3_to_SL3(new_params["warp"]), d["gt_hom"])
        if cfg.fix_first:
            new_params = dict(new_params, warp=new_params["warp"].at[0].set(0.0))
        return TrainState(step=step + 1, params=new_params, opt_state=opt_state), metrics

    def chunk_local(state: TrainState, d: dict):
        def body(carry, _):
            return step_local(carry, d)

        return jax.lax.scan(body, state, None, length=n_steps)

    sharded_chunk = shard_map(
        chunk_local,
        mesh=mesh,
        in_specs=(P(), data_specs),  # P() prefix: every state leaf replicated
        out_specs=(P(), P()),
        # check_vma must stay off: the body calls pallas_call, whose
        # out_shape ShapeDtypeStructs carry no `vma` (varying-manual-axes)
        # metadata, so the checker rejects the kernel outright ("vma on
        # ShapeDtypeStruct must not be None", jax pallas_call.py) — it is not
        # a spec problem on our side. Numerical equality vs the single-chip
        # fused step is covered by tests/test_parallel.py instead.
        check_vma=False,
    )
    return jax.jit(sharded_chunk, donate_argnums=(0,) if donate else ())


def make_fused_sharded_setup(
    cfg: PlanarConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    data: dict,
    params: dict,
    n_steps: int = 1,
    use_homographies: bool = True,
    donate: bool = True,
):
    """Convenience: (replicated fresh state, sharded flat data, jitted chunk)."""
    sharded = shard_flat_data(flatten_planar_data(data, cfg), mesh)
    state = init_train_state(jax.device_put(params, replicate(mesh)), tx)
    chunk = make_fused_sharded_chunk(
        cfg, tx, mesh, tuple(sharded.keys()), n_steps, use_homographies, donate
    )
    return state, sharded, chunk
