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

from marf_tpu.engine.step import (
    TrainState,
    implicit_loss_coeffs,
    init_train_state,
    mask_cot_scalars,
)
from marf_tpu.models.planar import (
    PlanarConfig,
    lazy_aux_metric,
    use_lazy_edge_metrics,
)
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
from marf_tpu.ops.pallas.fused_step import PB, fused_train_kernel, fused_train_kernel_warp
from marf_tpu.ops.posenc import barf_c2f_weights
from marf_tpu.parallel.mesh import DATA_AXIS, replicate


# Pure-metric lazy gating is shared with the single-chip step:
# models/planar.lazy_aux_metric (uniform-across-devices `heavy`).
_aux_metric = lazy_aux_metric


def fused_shardable(cfg: PlanarConfig, n_devices: int) -> bool:
    """Whether a fused Pallas pipeline can run under the pixel-sharded mesh.

    Fixed/no-mask configs: the flat pixel axis must divide over the mesh
    (the kernel leg mirrors the single-chip gate in engine/step.py — v5
    in-kernel warp for B <= PB, the v4 coords-based kernel otherwise).
    Implicit-mask configs: the two-kernel implicit pipeline shards too
    (round 3) — per-image heads need whole heads per device
    (B % n_devices == 0), the shared head only column divisibility."""
    from marf_tpu.models.planar import use_fused_implicit, use_fused_step

    h, w = cfg.map_hw
    if use_fused_implicit(cfg):
        if cfg.build_single_masks:
            return cfg.batch_size % n_devices == 0
        return (cfg.batch_size * h * w) % n_devices == 0
    return use_fused_step(cfg) and (cfg.batch_size * h * w) % n_devices == 0


def flatten_planar_data(
    data: dict, cfg: PlanarConfig, params: dict | None = None, n_devices: int | None = None
) -> dict:
    """Build the flat channels-first streams the kernel consumes.

    Returns a dict of [C, N] arrays (rgb_cf/masks_cf/grid_b/mask_X, shardable
    on axis 1) plus the replicated full-map targets the edge term needs. For
    implicit-mask configs the factored head inputs come from data["mask_X"]
    (the engine precomputes them, trainer._build_compiled) or are built here
    from `params["view_embedding"]`. Shared-head dedup configs (`n_devices`
    given, models/planar.use_fused_dedup) instead get the per-device
    slot0+extras structures (ops/pallas/fused_mask.slot_dedup_sharded_inputs).
    """
    from marf_tpu.models.planar import use_fused_dedup, use_fused_implicit

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
    dedup_ready = "mask_uv" in data or params is not None  # factors available
    if use_fused_implicit(cfg) and use_fused_dedup(cfg) and n_devices and n_devices > 1 and dedup_ready:
        import numpy as np

        from marf_tpu.ops.pallas.fused_mask import factor_mask_inputs, slot_dedup_sharded_inputs

        if "mask_uv" in data:
            uv_emb, onehot, table = data["mask_uv"], data["mask_onehot"], data["mask_table"]
        else:
            uv_emb, onehot, table = factor_mask_inputs(
                params["view_embedding"], jnp.asarray(data["rgb"], jnp.float32), grid
            )
        X_pad, slot0map_flat, cnt_pad, ext_off, ext_col, ext_val = slot_dedup_sharded_inputs(
            np.asarray(uv_emb), np.asarray(onehot), n_devices
        )
        out["mask_Xall"] = jnp.asarray(X_pad)
        out["mask_slot0map_flat"] = jnp.asarray(slot0map_flat)
        out["mask_cntpad"] = jnp.asarray(cnt_pad)
        out["mask_extoff"] = jnp.asarray(ext_off)
        out["mask_extcol"] = jnp.asarray(ext_col)
        out["mask_extval"] = jnp.asarray(ext_val)
        out["mask_table"] = jnp.asarray(table)
    elif use_fused_implicit(cfg):
        from marf_tpu.ops.pallas.fused_mask import build_mask_x, factor_mask_inputs

        if "mask_X" in data:
            X, table = data["mask_X"], data["mask_table"]
        else:
            uv_emb, onehot, table = factor_mask_inputs(
                params["view_embedding"], jnp.asarray(data["rgb"], jnp.float32), grid
            )
            X = build_mask_x(uv_emb, onehot, cfg.build_single_masks)
        if cfg.build_single_masks:
            X = X.transpose(1, 0, 2).reshape(X.shape[1], N)  # [X_ROWS, B*HW]
        out["mask_X"] = X
        out["mask_table"] = jnp.asarray(table)
    if cfg.use_edges:
        out["edges"] = jnp.asarray(data["edges"], jnp.float32)
        me = data.get("masks_eroded")
        out["masks_eroded"] = None if me is None else jnp.asarray(me, jnp.float32)
    gt = data.get("gt_hom")
    out["gt_hom"] = None if gt is None else jnp.asarray(gt, jnp.float32)
    return out


# sharded on their column axis: position-space streams over N, and the dedup
# column space over K_pad (an independent axis — each is contiguous per device)
FLAT_KEYS = ("rgb_cf", "masks_cf", "grid_b", "mask_X", "mask_Xall", "mask_slot0map_flat")


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


def _warp_cols(grid_b: jax.Array, warp: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-column homography warp for an arbitrary column block: grid_b
    [3, Nl] rows (u, v, image-index) -> [2, Nl] warped coordinates.

    Same math as ops/warp.warp_grid_cf_flat (x @ H^T, perspective divide
    +1e-8, reference warp.py:70-81) but indexed per column, so a device's
    contiguous shard — which may start mid-image — warps locally without
    materializing the full [2, N] stream. Differentiable w.r.t. warp (the
    H-gather VJP is a scatter-add over images)."""
    H = sl3_to_SL3(warp)  # [B, 3, 3]
    hom = jnp.concatenate([grid_b[:2], jnp.ones_like(grid_b[:1])], axis=0)  # [3, Nl]
    Hc = H[grid_b[2].astype(jnp.int32)]  # [Nl, 3, 3]
    warped = jnp.einsum("njk,kn->jn", Hc, hom)  # [3, Nl]
    return warped[:2] / (warped[2:3] + eps)


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
    chunk running the fused kernel per shard with psum'd gradients.

    Dispatches to the implicit-mask pipeline (two kernels + ICI collectives)
    for implicit configs, the single fused train kernel otherwise."""
    from marf_tpu.models.planar import use_fused_implicit

    if use_fused_implicit(cfg):
        if "mask_Xall" in data_keys:
            return _make_implicit_dedup_sharded_chunk(
                cfg, tx, mesh, data_keys, n_steps, use_homographies, donate
            )
        return _make_implicit_sharded_chunk(
            cfg, tx, mesh, data_keys, n_steps, use_homographies, donate
        )
    h, w = cfg.map_hw
    B = cfg.batch_size
    data_specs = {k: (P(None, DATA_AXIS) if k in FLAT_KEYS else P()) for k in data_keys}

    def step_local(state: TrainState, d: dict, heavy=True):
        """Per-device body: local kernel + ICI collectives. `heavy` gates the
        lazy-edge-metrics path (models/planar.use_lazy_edge_metrics)."""
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

        if cfg.fused_warp != "off" and B <= PB:
            # v5: warp + its VJP in-kernel (single-chip gate, engine/step.py)
            H, expm_vjp = jax.vjp(sl3_to_SL3, params["warp"])
            rgb_local, loss_local, dmlp, dH, _sq = fused_train_kernel_warp(
                params["neural_image"], d["grid_b"], H, cw, d["rgb_cf"], d["masks_cf"],
                g_loss_scale, inv_sum3, cfg.arch,
            )
            dwarp = expm_vjp(jax.lax.psum(dH, DATA_AXIS))[0]
        else:
            # v4: per-column warp in XLA (handles any B), kernel on coords
            coords_local, warp_vjp = jax.vjp(
                lambda wp: _warp_cols(d["grid_b"], wp), params["warp"]
            )
            rgb_local, loss_local, dmlp, dcoords, _sq = fused_train_kernel(
                params["neural_image"], coords_local, cw, d["rgb_cf"], d["masks_cf"],
                g_loss_scale, inv_sum3, cfg.arch,
            )
            dwarp = jax.lax.psum(warp_vjp(dcoords)[0], DATA_AXIS)
        # gradients + loss partials all-reduce over ICI
        rgb_loss = jax.lax.psum(loss_local, DATA_AXIS)
        dmlp = jax.lax.psum(dmlp, DATA_AXIS)
        grads = {"neural_image": dmlp, "warp": dwarp}

        if cfg.use_edges:
            # gather the rgb shards (tiled -> [3, N]) and run the conv
            # replicated — the edge term is gradient-blocked, so this costs
            # one small all_gather and no backward collective; channels-first
            # layout (free reshape, no transpose copy — engine/step.py)
            def _edge_loss():
                rgb_full = jax.lax.all_gather(rgb_local, DATA_AXIS, axis=1, tiled=True)
                edge_pred_cf = compute_edges(
                    rgb_full.reshape(3, B, h, w), differentiable=False
                )
                me = d.get("masks_eroded")
                return mse(
                    edge_pred_cf,
                    d["edges"].transpose(1, 0, 2, 3),
                    None if me is None else me.transpose(1, 0, 2, 3),
                )

            if use_lazy_edge_metrics(cfg):
                edge_loss = jax.lax.cond(
                    heavy, _edge_loss, lambda: jnp.asarray(0.0, dtype=jnp.float32)
                )
            else:
                edge_loss = _edge_loss()
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
            metrics["Homography_Error"] = _aux_metric(
                cfg, heavy,
                lambda: homography_error(sl3_to_SL3(new_params["warp"]), d["gt_hom"]),
            )
        if cfg.fix_first:
            new_params = dict(new_params, warp=new_params["warp"].at[0].set(0.0))
        return TrainState(step=step + 1, params=new_params, opt_state=opt_state), metrics

    def chunk_local(state: TrainState, d: dict):
        def body(carry, i):
            return step_local(carry, d, heavy=(i == n_steps - 1))

        return jax.lax.scan(body, state, jnp.arange(n_steps))

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


def _make_implicit_sharded_chunk(
    cfg: PlanarConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    data_keys,
    n_steps: int = 1,
    use_homographies: bool = True,
    donate: bool = True,
):
    """The two-kernel implicit-mask pipeline (ops/pallas/fused_mask.py) under
    shard_map — round-3 extension closing the "best kernels are single-chip
    for implicit configs" gap:

    - kernel A runs per shard on the local column block (mask fwd + rgb
      fwd/bwd, unnormalized cotangent); its per-shard mask-sum / loss
      partials and dW/db `psum` over ICI, after which every device applies
      the global 1/(3*sum(m)) normalization identically (dscale linearity —
      exactly the single-chip recipe, with the sums now global);
    - the gradient-blocked edge conv runs replicated on an all_gather'ed
      rgb (~2.6 MB over ICI), each device then slicing its local esq block;
    - kernel B runs per shard with the globally-derived (a, b, c, k)
      cotangent scalars; shared-head dW/db partials psum, per-image heads
      (whole heads per device, B % n_devices == 0) scatter into the full
      [B, ...] gradient and psum.

    Semantics mirror engine/step.py `_fused_implicit_grads` + `step_fn`
    exactly (pre-update losses/PSNR/Mask_Error, post-update
    Homography_Error, fix_first after metrics).
    """
    from marf_tpu.ops.pallas.fused_mask import (
        fused_implicit_train_kernel,
        fused_mask_backward_g,
        mask_w_stack_batched,
        unfactor_mask_grads,
    )

    h, w = cfg.map_hw
    B = cfg.batch_size
    HW = h * w
    N = B * HW
    D = int(mesh.shape[DATA_AXIS])
    Nl = N // D
    cdtype = cfg.arch.compute_dtype
    single = cfg.build_single_masks
    n_heads = B if single else 1
    Bl = B // D if single else 1
    n_heads_local = Bl if single else 1
    compute_mask_error = cfg.use_implicit_mask and cfg.use_masks
    data_specs = {k: (P(None, DATA_AXIS) if k in FLAT_KEYS else P()) for k in data_keys}

    def step_local(state: TrainState, d: dict, heavy=True):
        params = state.params
        step = state.step
        progress = step.astype(jnp.float32) / cfg.max_iter
        didx = jax.lax.axis_index(DATA_AXIS)
        alpha = (
            alpha_schedule(step, cfg.max_iter, cfg.alpha_initial, cfg.alpha_final)
            if cfg.use_edges
            else jnp.asarray(0.0, dtype=jnp.float32)
        )
        C_r, C_e, C_m = implicit_loss_coeffs(cfg, alpha)

        stacks = mask_w_stack_batched(params["implicit_mask"], d["mask_table"], n_heads)
        if single:
            stacks_local = [
                jax.tree.map(lambda a: jax.lax.dynamic_slice_in_dim(a, didx * Bl, Bl, axis=0), layer)
                for layer in stacks
            ]
        else:
            stacks_local = stacks

        cw = (
            barf_c2f_weights(progress, tuple(cfg.arch.barf_c2f), cfg.arch.posenc_L)
            if (cfg.arch.posenc_L and cfg.arch.barf_c2f is not None)
            else None
        )
        coords_local, warp_vjp = jax.vjp(lambda wp: _warp_cols(d["grid_b"], wp), params["warp"])

        # ---- kernel A on the local shard (unnormalized cotangent)
        rgb_local, m_local, sq_local, dcoords_u, msum_l, loss_l, dmlp_u = (
            fused_implicit_train_kernel(
                params["neural_image"], stacks_local, coords_local, d["mask_X"], cw,
                d["rgb_cf"], 2.0 * C_r, cfg.arch, n_heads_local,
            )
        )
        # global sums over ICI -> identical normalization everywhere
        msum = jax.lax.psum(msum_l, DATA_AXIS)
        inv_sum3 = 1.0 / (msum * 3.0)
        rgb_loss = jax.lax.psum(loss_l, DATA_AXIS) * inv_sum3
        dmlp = jax.tree.map(lambda g: g * inv_sum3, jax.lax.psum(dmlp_u, DATA_AXIS))
        dwarp = jax.tree.map(
            lambda g: g * inv_sum3, jax.lax.psum(warp_vjp(dcoords_u)[0], DATA_AXIS)
        )

        # ---- edge term: conv replicated on the gathered rgb (gradient-
        # blocked, reference inputs.py:50-69), channels-first layout
        # (engine/step.py:350-359)
        if cfg.use_edges:
            rgb_full = jax.lax.all_gather(rgb_local, DATA_AXIS, axis=1, tiled=True)  # [3, N]
            edge_pred_cf = compute_edges(rgb_full.reshape(3, B, h, w), differentiable=False)
            edges_cf = d["edges"].transpose(1, 0, 2, 3)
            esq_full = jnp.sum((edge_pred_cf - edges_cf) ** 2, axis=0).reshape(1, N)
            esq_local = jax.lax.dynamic_slice_in_dim(esq_full, didx * Nl, Nl, axis=1)
            edge_loss = (
                jax.lax.psum(jnp.sum(m_local * m_local * esq_local), DATA_AXIS) * inv_sum3
            )
        else:
            esq_local = None
            edge_loss = jnp.asarray(0.0, dtype=jnp.float32)
        mask_loss = jax.lax.psum(jnp.sum((1.0 - m_local) ** 2), DATA_AXIS) / N
        loss = {
            "render": render_loss(rgb_loss, edge_loss, mask_loss, alpha),
            "rgb": rgb_loss,
            "mask": mask_loss,
            "edge": edge_loss,
        }
        total = summarize_loss(loss, cfg.loss_weight)

        # ---- kernel B: in-kernel cotangent from global scalars
        # (dL/dm derivation in engine/step.py:378-384)
        gscalars = mask_cot_scalars(
            C_r, C_e, C_m, inv_sum3, rgb_loss, edge_loss, N, cfg.use_edges
        )
        dstacks_local = fused_mask_backward_g(
            stacks_local, d["mask_X"], sq_local, esq_local, gscalars, cdtype, n_heads_local,
            n_streams=cfg.arch.fused_streams,
        )
        if single:
            # whole heads per device: scatter local head grads into the full
            # [B, ...] stack and psum (every other device contributes zeros)
            dstacks = [
                jax.tree.map(
                    lambda a: jax.lax.psum(
                        jax.lax.dynamic_update_slice_in_dim(
                            jnp.zeros((B,) + a.shape[1:], a.dtype), a, didx * Bl, axis=0
                        ),
                        DATA_AXIS,
                    ),
                    layer,
                )
                for layer in dstacks_local
            ]
            dmask = jax.vmap(lambda dl: unfactor_mask_grads(dl, d["mask_table"]))(dstacks)
        else:
            dstacks = jax.lax.psum(dstacks_local, DATA_AXIS)
            dmask = unfactor_mask_grads(
                [jax.tree.map(lambda a: a[0], layer) for layer in dstacks], d["mask_table"]
            )
        grads = {
            "neural_image": dmlp,
            "warp": dwarp,
            "implicit_mask": dmask,
            "view_embedding": jnp.zeros_like(params["view_embedding"]),
        }

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {f"loss_{k}": v for k, v in loss.items()}
        metrics["all"] = total
        metrics["PSNR"] = psnr_from_rgb_loss(loss["rgb"])
        metrics["finite"] = check_finite(loss)
        if use_homographies and d.get("gt_hom") is not None:
            metrics["Homography_Error"] = _aux_metric(
                cfg, heavy,
                lambda: homography_error(sl3_to_SL3(new_params["warp"]), d["gt_hom"]),
            )
        if compute_mask_error:
            metrics["Mask_Error"] = _aux_metric(
                cfg, heavy,
                lambda: jax.lax.psum(jnp.sum((m_local - d["masks_cf"]) ** 2), DATA_AXIS) / N,
            )
        if cfg.fix_first:
            new_params = dict(new_params, warp=new_params["warp"].at[0].set(0.0))
        return TrainState(step=step + 1, params=new_params, opt_state=opt_state), metrics

    def chunk_local(state: TrainState, d: dict):
        def body(carry, i):
            return step_local(carry, d, heavy=(i == n_steps - 1))

        return jax.lax.scan(body, state, jnp.arange(n_steps))

    sharded_chunk = shard_map(
        chunk_local,
        mesh=mesh,
        in_specs=(P(), data_specs),
        out_specs=(P(), P()),
        # same rationale as make_fused_sharded_chunk: pallas_call out_shape
        # structs carry no vma metadata, so the checker rejects any kernel-
        # bearing body; equality vs single-chip is test-covered instead
        check_vma=False,
    )
    return jax.jit(sharded_chunk, donate_argnums=(0,) if donate else ())


def _make_implicit_dedup_sharded_chunk(
    cfg: PlanarConfig,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    data_keys,
    n_steps: int = 1,
    use_homographies: bool = True,
    donate: bool = True,
):
    """The shared-head DEDUP implicit pipeline under shard_map — the mesh
    twin of engine/step.py `_fused_implicit_dedup_grads` (round-4 extension
    making the best single-chip pipeline uniform across chip counts):

    - the mask kernels run on the dedup COLUMN axis (K_pad = HW + E padded,
      sharded independently of the position axis): mask fwd per column
      shard, then one ~K_pad*4-byte `all_gather` makes the full m vector
      global (it is needed position-wise everywhere);
    - the slot0 position<->column expansion stays DENSE per device: a
      contiguous position block's pixel indices are affine mod HW, so
      m0-at-positions is a tile + `dynamic_slice` and the backward segment
      sum is a `dynamic_update_slice` into a [T, HW] buffer reduced over T —
      no [N]-scale gathers (the measured round-3 v1 failure mode, PERF.md);
    - the extras (E ~1.5k columns) were grouped by owning device at setup
      (slot_dedup_sharded_inputs), so their gathers/scatter-adds are
      Eloc-sized; zero-valid padding contributes exact zeros;
    - kernel B consumes the globally psum'd per-column segment sums on its
      local column shard (padded columns have cnt = Ssq = 0 -> zero
      gradient), and the dW/db partials psum over ICI.

    Loss/metric semantics identical to the single-chip dedup path.
    """
    from marf_tpu.ops.pallas.fused_mask import (
        fused_mask_backward_g,
        fused_mask_forward,
        mask_w_stack,
        mask_w_stack_batched,
        unfactor_mask_grads,
    )
    from marf_tpu.ops.pallas.fused_step import PB, fused_train_kernel, fused_train_kernel_warp

    h, w = cfg.map_hw
    B = cfg.batch_size
    HW = h * w
    N = B * HW
    D = int(mesh.shape[DATA_AXIS])
    Nl = N // D
    T = -(-Nl // HW) + 1  # tiles covering any start-offset window of Nl
    cdtype = cfg.arch.compute_dtype
    compute_mask_error = cfg.use_implicit_mask and cfg.use_masks
    data_specs = {k: (P(None, DATA_AXIS) if k in FLAT_KEYS else P()) for k in data_keys}

    def step_local(state: TrainState, d: dict, heavy=True):
        params = state.params
        step = state.step
        progress = step.astype(jnp.float32) / cfg.max_iter
        didx = jax.lax.axis_index(DATA_AXIS)
        alpha = (
            alpha_schedule(step, cfg.max_iter, cfg.alpha_initial, cfg.alpha_final)
            if cfg.use_edges
            else jnp.asarray(0.0, dtype=jnp.float32)
        )
        C_r, C_e, C_m = implicit_loss_coeffs(cfg, alpha)
        K_pad = d["mask_cntpad"].shape[1]
        Klp = K_pad // D
        Eloc = d["mask_extoff"].shape[1]

        # ---- mask forward on the local column shard, gathered global
        stack = mask_w_stack(params["implicit_mask"], d["mask_table"])
        m_local_cols = fused_mask_forward(stack, d["mask_Xall"], cdtype)  # [1, Klp]
        m_all = jax.lax.all_gather(m_local_cols, DATA_AXIS, axis=1, tiled=True)  # [1, K_pad]
        msum = jnp.dot(d["mask_cntpad"][0], m_all[0])
        inv_sum3 = 1.0 / (msum * 3.0)

        # ---- dense expansion to the local position block: p = n mod HW is
        # affine over the contiguous block, so a tile + dynamic_slice
        start = (didx * Nl) % HW
        m0_tiled = jnp.tile(m_all[:, :HW], (1, T))  # [1, T*HW]
        m0_pos = jax.lax.dynamic_slice_in_dim(m0_tiled, start, Nl, axis=1)
        m_local = d["mask_slot0map_flat"] * m0_pos  # [1, Nl]
        if Eloc:
            off = jax.lax.dynamic_index_in_dim(d["mask_extoff"], didx, 0, keepdims=False)
            colj = jax.lax.dynamic_index_in_dim(d["mask_extcol"], didx, 0, keepdims=False)
            val = jax.lax.dynamic_index_in_dim(d["mask_extval"], didx, 0, keepdims=False)
            m_local = m_local.at[0, off].add(m_all[0, colj] * val)

        # ---- rgb via the flagship train kernel on the local position shard
        cw = (
            barf_c2f_weights(progress, tuple(cfg.arch.barf_c2f), cfg.arch.posenc_L)
            if (cfg.arch.posenc_L and cfg.arch.barf_c2f is not None)
            else None
        )
        if cfg.fused_warp != "off" and B <= PB:
            H, expm_vjp = jax.vjp(sl3_to_SL3, params["warp"])
            rgb_local, loss_l, dmlp_l, dH, sq_local = fused_train_kernel_warp(
                params["neural_image"], d["grid_b"], H, cw, d["rgb_cf"], m_local,
                C_r, inv_sum3, cfg.arch,
            )
            dwarp = expm_vjp(jax.lax.psum(dH, DATA_AXIS))[0]
        else:
            coords_local, warp_vjp = jax.vjp(
                lambda wp: _warp_cols(d["grid_b"], wp), params["warp"]
            )
            rgb_local, loss_l, dmlp_l, dcoords, sq_local = fused_train_kernel(
                params["neural_image"], coords_local, cw, d["rgb_cf"], m_local,
                C_r, inv_sum3, cfg.arch,
            )
            dwarp = jax.lax.psum(warp_vjp(dcoords)[0], DATA_AXIS)
        rgb_loss = jax.lax.psum(loss_l, DATA_AXIS)
        dmlp = jax.lax.psum(dmlp_l, DATA_AXIS)

        # ---- edge term: conv replicated on the gathered rgb (gradient-
        # blocked), channels-first layout (engine/step.py miscompile dodge)
        if cfg.use_edges:
            rgb_full = jax.lax.all_gather(rgb_local, DATA_AXIS, axis=1, tiled=True)  # [3, N]
            edge_pred_cf = compute_edges(rgb_full.reshape(3, B, h, w), differentiable=False)
            edges_cf = d["edges"].transpose(1, 0, 2, 3)
            esq_full = jnp.sum((edge_pred_cf - edges_cf) ** 2, axis=0).reshape(1, N)
            esq_local = jax.lax.dynamic_slice_in_dim(esq_full, didx * Nl, Nl, axis=1)
            edge_loss = (
                jax.lax.psum(jnp.sum(m_local * m_local * esq_local), DATA_AXIS) * inv_sum3
            )
        else:
            esq_local = None
            edge_loss = jnp.asarray(0.0, dtype=jnp.float32)
        mask_loss = jax.lax.psum(jnp.sum((1.0 - m_local) ** 2), DATA_AXIS) / N
        loss = {
            "render": render_loss(rgb_loss, edge_loss, mask_loss, alpha),
            "rgb": rgb_loss,
            "mask": mask_loss,
            "edge": edge_loss,
        }
        total = summarize_loss(loss, cfg.loss_weight)

        # ---- segment-sum the cotangent streams to column space: dense over
        # slot0 (scatter the weighted local block into pixel space via one
        # dynamic_update_slice, reduce the T tiles), Eloc-sized for extras;
        # one [1, K_pad] psum makes the sums global
        def seg_partial(v_local):  # [1, Nl] -> [1, K_pad] this shard's part
            wv = d["mask_slot0map_flat"] * v_local  # [1, Nl]
            buf = jnp.zeros((1, T * HW), dtype=wv.dtype)
            buf = jax.lax.dynamic_update_slice_in_dim(buf, wv, start, axis=1)
            s0 = jnp.sum(buf.reshape(T, HW), axis=0)  # [HW]
            part = jnp.zeros((K_pad,), dtype=wv.dtype).at[:HW].set(s0)
            if Eloc:
                ve = v_local[0, off] * val  # [Eloc]
                part = part.at[colj].add(ve)  # zero-valid pads add 0 at col 0
            return part[None]

        Ssq = jax.lax.psum(seg_partial(sq_local), DATA_AXIS)
        Sesq = jax.lax.psum(seg_partial(esq_local), DATA_AXIS) if cfg.use_edges else None

        # ---- kernel B on the local column shard with global scalars
        gscalars = mask_cot_scalars(
            C_r, C_e, C_m, inv_sum3, rgb_loss, edge_loss, N, cfg.use_edges
        )
        Ssq_l = jax.lax.dynamic_slice_in_dim(Ssq, didx * Klp, Klp, axis=1)
        Sesq_l = (
            jax.lax.dynamic_slice_in_dim(Sesq, didx * Klp, Klp, axis=1)
            if Sesq is not None
            else None
        )
        cnt_l = jax.lax.dynamic_slice_in_dim(d["mask_cntpad"], didx * Klp, Klp, axis=1)
        stacks1 = mask_w_stack_batched(params["implicit_mask"], d["mask_table"], 1)
        dstacks_local = fused_mask_backward_g(
            stacks1, d["mask_Xall"], Ssq_l, Sesq_l, gscalars, cdtype, 1, cnt_cf=cnt_l,
            n_streams=cfg.arch.fused_streams,
        )
        dstacks = jax.lax.psum(dstacks_local, DATA_AXIS)
        dmask = unfactor_mask_grads(
            [jax.tree.map(lambda a: a[0], layer) for layer in dstacks], d["mask_table"]
        )
        grads = {
            "neural_image": dmlp,
            "warp": dwarp,
            "implicit_mask": dmask,
            "view_embedding": jnp.zeros_like(params["view_embedding"]),
        }

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {f"loss_{k}": v for k, v in loss.items()}
        metrics["all"] = total
        metrics["PSNR"] = psnr_from_rgb_loss(loss["rgb"])
        metrics["finite"] = check_finite(loss)
        if use_homographies and d.get("gt_hom") is not None:
            metrics["Homography_Error"] = _aux_metric(
                cfg, heavy,
                lambda: homography_error(sl3_to_SL3(new_params["warp"]), d["gt_hom"]),
            )
        if compute_mask_error:
            metrics["Mask_Error"] = _aux_metric(
                cfg, heavy,
                lambda: jax.lax.psum(jnp.sum((m_local - d["masks_cf"]) ** 2), DATA_AXIS) / N,
            )
        if cfg.fix_first:
            new_params = dict(new_params, warp=new_params["warp"].at[0].set(0.0))
        return TrainState(step=step + 1, params=new_params, opt_state=opt_state), metrics

    def chunk_local(state: TrainState, d: dict):
        def body(carry, i):
            return step_local(carry, d, heavy=(i == n_steps - 1))

        return jax.lax.scan(body, state, jnp.arange(n_steps))

    sharded_chunk = shard_map(
        chunk_local,
        mesh=mesh,
        in_specs=(P(), data_specs),
        out_specs=(P(), P()),
        # same rationale as make_fused_sharded_chunk: pallas_call out_shape
        # structs carry no vma metadata
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
    sharded = shard_flat_data(
        flatten_planar_data(data, cfg, params, n_devices=mesh.devices.size), mesh
    )
    state = init_train_state(jax.device_put(params, replicate(mesh)), tx)
    chunk = make_fused_sharded_chunk(
        cfg, tx, mesh, tuple(sharded.keys()), n_steps, use_homographies, donate
    )
    return state, sharded, chunk
