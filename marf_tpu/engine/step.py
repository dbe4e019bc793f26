"""The jitted train step and scan-chunked training loop.

This is the TPU replacement for the reference's per-iteration Python loop
(reference model/planar.py:187-209): one pure function
(TrainState, data) -> (TrainState, metrics) compiled once, then `lax.scan`
over a chunk of steps so the host dispatches one XLA program per
`gcd(freq.scalar, freq.vis)` iterations instead of per iteration. The alpha
and c2f schedules are traced functions of `state.step`, so a single
executable serves all 3000 iterations (SURVEY.md §7 design stance).

Optimizer groups mirror the reference (model/planar.py:89-96): the neural
image at optim.lr, warp params at optim.lr_warp, implicit-mask head(s) at
optim.lr_mask — via `optax.multi_transform`. The view embedding is *frozen*,
faithfully: the reference never adds `embedding_view` to any optimizer param
group (model/planar.py:89-96 adds only neural_image / warp_param /
implicit_mask parameters), so it stays at its N(0,1) init; set
optim.train_view_embedding=true for the fix-mode.
"""

from __future__ import annotations

import math
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from marf_tpu.models.planar import (
    PlanarConfig,
    graph_forward,
    graph_loss,
    lazy_aux_metric,
    use_fused_implicit,
    use_fused_step,
    use_lazy_edge_metrics,
)
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


@flax.struct.dataclass
class TrainState:
    """Explicit training state pytree: {step, params, opt_state}."""

    step: jax.Array
    params: Any
    opt_state: Any


def _label_params(params: dict) -> dict:
    """Map top-level param groups to optimizer labels."""
    group_of = {
        "neural_image": "mlp",
        "warp": "warp",
        "implicit_mask": "mask",
        "view_embedding": "frozen",
    }
    return {k: jax.tree.map(lambda _: group_of[k], v) for k, v in params.items()}


def _lr_schedule(base_lr: float, optim_opt: dict, max_iter: int):
    """Build a per-step LR schedule from the reference's `optim.sched` keys.

    The reference constructs a torch scheduler but never calls .step()
    (verified: no sched.step() in model/planar.py), so its schedules are
    INERT. Faithful-by-default: a configured `optim.sched` stays inert unless
    the fix-mode flag `optim.apply_sched` is set, in which case schedules run
    for real (stepped per iteration):
      - StepLR: lr * gamma^(floor(step / steps))
      - ExponentialLR: gamma, or derived from optim.lr_end over max_iter
        (gamma = (lr_end / lr) ** (1 / max_iter), BARF convention).
    """
    sched = optim_opt.get("sched") or {}
    stype = sched.get("type")
    if not stype:
        return base_lr
    if not optim_opt.get("apply_sched"):
        from marf_tpu.utils.console import log

        log.warn(
            "optim.sched is configured but inert (reference-faithful: the "
            "reference never steps its scheduler); set optim.apply_sched=true "
            "to apply it for real"
        )
        return base_lr
    if stype == "StepLR":
        steps, gamma = int(sched["steps"]), float(sched.get("gamma", 0.1))
        return lambda count: base_lr * (gamma ** (count // steps))
    if stype == "ExponentialLR":
        if sched.get("gamma") is not None:
            gamma = float(sched["gamma"])
        else:
            lr_end = float(optim_opt["lr_end"])
            gamma = (lr_end / base_lr) ** (1.0 / max_iter)
        return optax.exponential_decay(base_lr, transition_steps=1, decay_rate=gamma)
    raise ValueError(f"unsupported scheduler type: {stype}")


def _algo(name: str, lr) -> optax.GradientTransformation:
    """Map the reference's `optim.algo` (torch optimizer names,
    options/planar.yaml:78) to optax with torch-default hyperparameters."""
    if name == "Adam":
        return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if name == "AdamW":
        return optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    if name == "SGD":
        return optax.sgd(lr)
    if name == "RMSprop":
        return optax.rmsprop(lr, decay=0.99, eps=1e-8)
    raise ValueError(f"unsupported optimizer: {name}")


def make_optimizer(optim_opt: dict, max_iter: int) -> optax.GradientTransformation:
    """Per-group optimizer (reference model/planar.py:86-104)."""
    algo = optim_opt.get("algo", "Adam")
    train_view = bool(optim_opt.get("train_view_embedding", False))
    transforms = {
        "mlp": _algo(algo, _lr_schedule(float(optim_opt["lr"]), optim_opt, max_iter)),
        "warp": _algo(algo, _lr_schedule(float(optim_opt.get("lr_warp", optim_opt["lr"])), optim_opt, max_iter)),
        "mask": _algo(algo, _lr_schedule(float(optim_opt.get("lr_mask", optim_opt["lr"])), optim_opt, max_iter)),
        "frozen": _algo(algo, float(optim_opt.get("lr_mask", optim_opt["lr"]))) if train_view else optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, _label_params)


def make_flat_optimizer(optim_opt: dict, max_iter: int, params: dict):
    """Flat-space Adam, exactly equal to `make_optimizer` for algo=Adam.

    `optax.multi_transform` keeps per-leaf m/v states and lowers to ~10
    small per-leaf fusions per step (~0.28 ms of the measured TPU step,
    PERF.md); since the groups differ ONLY in learning rate, the whole
    update collapses to ONE fused pass over a single [P] vector with a
    per-element lr built from 4 scalars: update = -lr_vec(count) *
    m_hat / (sqrt(v_hat) + eps). Count semantics copied from optax:
    bias correction uses count+1 (scale_by_adam), the lr schedule is
    evaluated at the PRE-increment count (scale_by_schedule). The frozen
    view-embedding group gets lr 0 (its grads are already exactly zero,
    so m=v=0 and the update is 0 — same as optax.set_to_zero).

    Returns None when the config is out of scope (algo != Adam) — caller
    falls back to `make_optimizer`. Equality is regression-tested
    (tests/test_step.py::test_flat_optimizer_matches_multi_transform).
    """
    if optim_opt.get("algo", "Adam") != "Adam":
        return None
    import jax.flatten_util

    b1, b2, eps = 0.9, 0.999, 1e-8
    train_view = bool(optim_opt.get("train_view_embedding", False))
    flat0, unravel = jax.flatten_util.ravel_pytree(params)
    labels = _label_params(params)
    group_ids = {"mlp": 0, "warp": 1, "mask": 2, "frozen": 3}
    gid = jax.flatten_util.ravel_pytree(
        jax.tree.map(
            lambda p, lbl: jnp.full(jnp.shape(p), group_ids[lbl], dtype=jnp.float32),
            params, labels,
        )
    )[0]
    lrs = [
        _lr_schedule(float(optim_opt["lr"]), optim_opt, max_iter),
        _lr_schedule(float(optim_opt.get("lr_warp", optim_opt["lr"])), optim_opt, max_iter),
        _lr_schedule(float(optim_opt.get("lr_mask", optim_opt["lr"])), optim_opt, max_iter),
        (float(optim_opt.get("lr_mask", optim_opt["lr"])) if train_view else 0.0),
    ]

    def lr_vec(count):
        vals = [lr(count) if callable(lr) else lr for lr in lrs]
        out = jnp.full_like(gid, vals[0])
        for i in range(1, 4):
            out = jnp.where(gid == float(i), vals[i], out)
        return out

    def init_fn(p):
        # two distinct buffers — a shared zeros array would alias mu and nu
        # and break donation ("attempt to donate the same buffer twice")
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jnp.zeros_like(flat0),
            nu=jnp.zeros_like(flat0),
        )

    def update_fn(updates, state, p=None):
        g = jax.flatten_util.ravel_pytree(updates)[0]
        mu = b1 * state.mu + (1.0 - b1) * g
        nu = b2 * state.nu + (1.0 - b2) * (g * g)
        count_inc = state.count + 1
        c = count_inc.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1**c)
        nu_hat = nu / (1.0 - b2**c)
        upd = -lr_vec(state.count) * mu_hat / (jnp.sqrt(nu_hat) + eps)
        return unravel(upd), optax.ScaleByAdamState(count=count_inc, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def init_train_state(params: dict, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), dtype=jnp.int32), params=params, opt_state=tx.init(params))


def stage_fused_constant_streams(cfg: PlanarConfig, data: dict) -> dict:
    """Pre-transpose/pad the fused kernels' loop-invariant input streams.

    XLA does not hoist the per-step transpose/tile/pad of loop-invariant
    operands out of the scan (~19 us/step on canonical, round-4 trace), so
    the engine stages them ONCE at setup as device-resident pre-padded
    arrays. Returns the staged keys — `targets_cf_p` [3, Np] always,
    `masks_cf_p` [1, Np] for fixed-mask configs (the implicit pipelines
    mask by the predicted m, which is dynamic), and `grid_b_p` [3, Np]
    (b = -1 in the padding, per the v5 kernel contract) when the in-kernel
    warp applies. The train step falls back to building the identical
    values in-graph when the keys are absent (hand-built test data);
    tests/test_fused_step.py asserts the two paths match.
    """
    from marf_tpu.ops.grid import normalized_pixel_grid
    from marf_tpu.ops.pallas.fused_step import PB, build_grid_b, fused_cols

    h, w = cfg.map_hw
    N = cfg.batch_size * h * w
    Np = fused_cols(N, cfg.arch)
    pad_p = lambda a: jnp.pad(a, ((0, 0), (0, Np - N)))
    staged = {"targets_cf_p": pad_p(data["rgb"].transpose(1, 0, 2, 3).reshape(3, N))}
    if not cfg.use_implicit_mask:
        if cfg.use_masks and data.get("masks") is not None:
            masks_cf = data["masks"].transpose(1, 0, 2, 3).reshape(1, N)
        else:
            masks_cf = jnp.ones((1, N), dtype=jnp.float32)
        staged["masks_cf_p"] = pad_p(masks_cf)
    if cfg.fused_warp != "off" and cfg.batch_size <= PB:
        grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
        staged["grid_b_p"] = build_grid_b(grid, cfg.batch_size, Np)
    return staged


def implicit_loss_coeffs(cfg: PlanarConfig, alpha):
    """Loss-term coefficients for the implicit-mask pipelines:
    total = sum_k 10^w_k * loss_k with render = (1-alpha)*rgb + 0.5*mask +
    alpha*edge (reference model/planar.py:371-374). Shared by the
    single-chip fused/dedup paths and parallel/shard_fused.py — kernel B's
    in-kernel cotangent depends on these staying in lockstep.
    Returns (C_r, C_e, C_m)."""
    w_render = 10.0 ** float(cfg.w_render)
    C_r = w_render * (1.0 - alpha)
    if cfg.w_rgb is not None:
        C_r = C_r + 10.0 ** float(cfg.w_rgb)
    C_e = w_render * alpha
    if cfg.w_edge is not None:
        C_e = C_e + 10.0 ** float(cfg.w_edge)
    C_m = w_render * 0.5
    if cfg.w_mask is not None:
        C_m = C_m + 10.0 ** float(cfg.w_mask)
    return C_r, C_e, C_m


def mask_cot_scalars(C_r, C_e, C_m, inv_sum3, rgb_loss, edge_loss, N, use_edges):
    """The [4] gscalars of kernel B's in-kernel cotangent
    dL/dm = (a*sq + b*esq + c*cnt)*m + k*cnt, from
    dL/dm_i = C_r*(2 m_i sq_i - 3 rgb_l)/(3 sum m)
            + C_e*(2 m_i esq_i - 3 edge_l)/(3 sum m) + C_m*2(m_i - 1)/N."""
    a_s = 2.0 * C_r * inv_sum3
    b_s = 2.0 * C_e * inv_sum3 if use_edges else jnp.asarray(0.0, jnp.float32)
    c_s = jnp.asarray(2.0 * C_m / N, jnp.float32)
    k_s = -3.0 * inv_sum3 * (C_r * rgb_loss + C_e * edge_loss) - 2.0 * C_m / N
    return jnp.stack([
        jnp.asarray(a_s, jnp.float32),
        jnp.asarray(b_s, jnp.float32),
        c_s,
        jnp.asarray(k_s, jnp.float32),
    ])


def make_train_step(cfg: PlanarConfig, tx: optax.GradientTransformation, use_homographies: bool = True):
    """Build the pure (state, data) -> (state, metrics) step function.

    Metric timing matches the reference's `log_scalars` call site
    (model/planar.py:199-201): loss terms/PSNR from the *pre-update* forward,
    Homography_Error from the *post-update* warp (but before the fix_first
    re-zeroing, which the reference applies after logging,
    model/planar.py:156-158).
    """
    compute_mask_error = cfg.use_implicit_mask and cfg.use_masks
    fused = use_fused_step(cfg)
    fused_implicit = use_fused_implicit(cfg)

    def _autodiff_grads(state, data, progress, step):
        def loss_fn(params):
            outputs = graph_forward(params, data, cfg, progress)
            loss = graph_loss(outputs, data, cfg, step)
            total = summarize_loss(loss, cfg.loss_weight)
            return total, (loss, outputs)

        (total, (loss, outputs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return total, loss, outputs, grads

    def _fused_step_grads(state, data, progress, step, heavy):
        """Single-pass Pallas kernel path (ops/pallas/fused_step.py): the MLP
        gradient is computed in-kernel from the analytically known masked-MSE
        cotangent; only the tiny warp chain goes through jax.vjp. `heavy`
        gates the lazy-edge-metrics path (models/planar.use_lazy_edge_metrics):
        the gradient-blocked edge term runs only at chunk-final steps."""
        from marf_tpu.ops.filters import compute_edges
        from marf_tpu.ops.grid import normalized_pixel_grid
        from marf_tpu.ops.pallas.fused_step import fused_train_kernel
        from marf_tpu.ops.posenc import barf_c2f_weights
        from marf_tpu.ops.warp import warp_grid_cf_flat

        params = state.params
        h, w = cfg.map_hw
        B = cfg.batch_size
        N = B * h * w
        alpha = (
            alpha_schedule(step, cfg.max_iter, cfg.alpha_initial, cfg.alpha_final)
            if cfg.use_edges
            else jnp.asarray(0.0, dtype=jnp.float32)
        )
        # d total / d loss_rgb: the render term's (1 - alpha) plus the direct
        # loss_rgb term (reference model/planar.py:172-185, 371-376)
        g_loss_scale = (10.0 ** float(cfg.w_render)) * (1.0 - alpha)
        if cfg.w_rgb is not None:
            g_loss_scale = g_loss_scale + (10.0 ** float(cfg.w_rgb))

        grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)

        cw = (
            barf_c2f_weights(progress, tuple(cfg.arch.barf_c2f), cfg.arch.posenc_L)
            if (cfg.arch.posenc_L and cfg.arch.barf_c2f is not None)
            else None
        )

        # pre-padded constant streams when the engine staged them at setup
        # (trainer._build_compiled; fused_step.fused_cols) — XLA does not
        # hoist the equivalent per-step transpose/tile/pad out of the scan
        targets_cf = data.get("targets_cf_p")
        if targets_cf is None:
            targets_cf = data["rgb"].transpose(1, 0, 2, 3).reshape(3, N)
        masks_cf = data.get("masks_cf_p")
        if masks_cf is None:
            if cfg.use_masks and data.get("masks") is not None:
                masks_cf = data["masks"].transpose(1, 0, 2, 3).reshape(1, N)
            else:
                masks_cf = jnp.ones((1, N), dtype=jnp.float32)
        inv_sum3 = 1.0 / (jnp.sum(masks_cf) * 3.0)  # padding is zero-mask

        from marf_tpu.ops.pallas.fused_step import PB

        if cfg.fused_warp != "off" and B <= PB:
            # v5: warp + its VJP in-kernel — only the tiny 3x3 expm (and its
            # VJP) stay in XLA; the per-point HBM streams shrink to the
            # constant (u, v, b) grid + targets/masks
            from marf_tpu.ops.pallas.fused_step import build_grid_b, fused_train_kernel_warp

            grid_b = data.get("grid_b_p")
            if grid_b is None:
                grid_b = build_grid_b(grid, B)  # [3, N] constant
            H, expm_vjp = jax.vjp(sl3_to_SL3, params["warp"])
            rgb_cf, rgb_loss, dmlp, dH, _sq = fused_train_kernel_warp(
                params["neural_image"], grid_b, H, cw, targets_cf, masks_cf,
                g_loss_scale, inv_sum3, cfg.arch,
            )
            rgb_cf = rgb_cf[:, :N]  # pre-padded inputs -> padded outputs
            dwarp = expm_vjp(dH)[0]
        else:
            # v4: warp in XLA (tiny [B,8] chain), EVERYTHING else channels-
            # first in the kernel: posenc + c2f + MLP fwd + loss partials +
            # full bwd incl. the analytic posenc VJP. Only [2,N] coords /
            # [3,N] targets / [1,N] masks / [2,N] dcoords cross HBM.
            coords_cf, warp_vjp = jax.vjp(
                lambda wp: warp_grid_cf_flat(grid, wp), params["warp"]
            )  # [2, N]
            rgb_cf, rgb_loss, dmlp, dcoords_cf, _sq = fused_train_kernel(
                params["neural_image"], coords_cf, cw, targets_cf, masks_cf,
                g_loss_scale, inv_sum3, cfg.arch,
            )
            dwarp = warp_vjp(dcoords_cf)[0]
        grads = {"neural_image": dmlp, "warp": dwarp}

        rgb_map = rgb_cf.reshape(3, B, h, w).transpose(1, 0, 2, 3)
        outputs = {
            "rgb_prediction": rgb_map.transpose(0, 2, 3, 1).reshape(B, h * w, 3),
            "rgb_prediction_map": rgb_map,
        }
        if cfg.use_edges:
            # channels-first conv on the [3, B, h, w] view: the image axis
            # rides as conv channels (depthwise filter — equivalent math),
            # rgb_cf reshapes for FREE instead of a [B,3,h,w] transpose copy
            # each step; the target/mask transposes are loop-invariant
            # constants XLA hoists out of the scan. Same layout (and the
            # same miscompile-dodging property) as the implicit pipeline.
            def _edge_loss():
                edge_pred_cf = compute_edges(
                    rgb_cf.reshape(3, B, h, w), differentiable=False
                )
                me = data.get("masks_eroded")
                return mse(
                    edge_pred_cf,
                    data["edges"].transpose(1, 0, 2, 3),
                    None if me is None else me.transpose(1, 0, 2, 3),
                )

            if use_lazy_edge_metrics(cfg):
                # gradient-blocked term, boundary-only consumers: run the
                # conv only at chunk-final steps (heavy); intermediate rows
                # report edge_loss = 0 and feed only the finite check
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
        return total, loss, outputs, grads

    def _fused_implicit_grads(state, data, progress, step):
        """Fused two-kernel pipeline for the implicit-mask configs
        (ops/pallas/fused_mask.py, round-3 design):

        kernel A = mask-head forward + rgb posenc/MLP fwd + loss partials +
        full rgb backward in ONE pass, run with the UNNORMALIZED cotangent
        2*C_rgb*(rgb-t)*m^2 — the masked-MSE normalization 1/(3*sum(m))
        (reference model/planar.py:388-390) needs the global mask sum the
        kernel itself produces, so by dscale linearity it is applied to the
        returned grads/loss afterwards. kernel B = mask-head backward with
        the cotangent dL/dm = (a*sq + b*esq + c)*m + k computed in-kernel
        from per-point squared errors + 4 scalars (derivation below). Both
        kernels are head-blocked, so per-image heads (build_single_masks,
        reference model/planar.py:322-324) run as one B-blocked grid."""
        from marf_tpu.ops.filters import compute_edges
        from marf_tpu.ops.grid import normalized_pixel_grid
        from marf_tpu.ops.pallas.fused_mask import (
            build_mask_x,
            factor_mask_inputs,
            fused_implicit_train_kernel,
            fused_mask_backward_g,
            mask_w_stack_batched,
            unfactor_mask_grads,
        )
        from marf_tpu.ops.posenc import barf_c2f_weights
        from marf_tpu.ops.warp import warp_grid_cf_flat

        params = state.params
        h, w = cfg.map_hw
        B = cfg.batch_size
        HW = h * w
        N = B * HW
        cdtype = cfg.arch.compute_dtype
        n_heads = B if cfg.build_single_masks else 1
        alpha = (
            alpha_schedule(step, cfg.max_iter, cfg.alpha_initial, cfg.alpha_final)
            if cfg.use_edges
            else jnp.asarray(0.0, dtype=jnp.float32)
        )
        grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
        if not cfg.build_single_masks and "mask_Xall" in data:
            return _fused_implicit_dedup_grads(state, data, progress, step, alpha, grid)

        # ---- factored mask inputs (constants: frozen view embedding; the
        # engine precomputes X, with an inline traced fallback)
        if "mask_X" in data:
            X, table = data["mask_X"], data["mask_table"]
        else:
            uv, onehot, table = factor_mask_inputs(params["view_embedding"], data["rgb"], grid)
            X = build_mask_x(uv, onehot, cfg.build_single_masks)
        if cfg.build_single_masks:
            X_flat = X.transpose(1, 0, 2).reshape(X.shape[1], N)  # [X_ROWS, B*HW]
        else:
            X_flat = X
        stacks = mask_w_stack_batched(params["implicit_mask"], table, n_heads)

        C_r, C_e, C_m = implicit_loss_coeffs(cfg, alpha)

        # ---- kernel A
        coords_cf, warp_vjp = jax.vjp(lambda wp: warp_grid_cf_flat(grid, wp), params["warp"])
        cw = (
            barf_c2f_weights(progress, tuple(cfg.arch.barf_c2f), cfg.arch.posenc_L)
            if (cfg.arch.posenc_L and cfg.arch.barf_c2f is not None)
            else None
        )
        targets_cf = data["rgb"].transpose(1, 0, 2, 3).reshape(3, N)
        rgb_cf, m_flat, sq, dcoords_u, msum, loss_unnorm, dmlp_u = fused_implicit_train_kernel(
            params["neural_image"], stacks, coords_cf, X_flat, cw, targets_cf,
            2.0 * C_r, cfg.arch, n_heads,
        )
        inv_sum3 = 1.0 / (msum * 3.0)
        rgb_loss = loss_unnorm * inv_sum3
        dmlp = jax.tree.map(lambda g: g * inv_sum3, dmlp_u)
        dwarp = jax.tree.map(lambda g: g * inv_sum3, warp_vjp(dcoords_u)[0])

        rgb_map = rgb_cf.reshape(3, B, h, w).transpose(1, 0, 2, 3)
        outputs = {
            "rgb_prediction": rgb_cf.reshape(3, B, HW).transpose(1, 2, 0),
            "rgb_prediction_map": rgb_map,
            "mask_prediction": m_flat.reshape(1, B, HW).transpose(1, 2, 0),
            "mask_prediction_map": m_flat.reshape(1, B, h, w).transpose(1, 0, 2, 3),
            # free [1, N] alias for the Mask_Error metric: m_flat is live for
            # the loss anyway, so using it avoids materializing the
            # mask_prediction_map relayout every step as a lax.cond operand
            "mask_prediction_cf": m_flat,
        }

        # ---- remaining loss terms (the edge maps are gradient-blocked,
        # reference inputs.py:50-69 .detach(), so this stays out of kernel A).
        # The conv runs CHANNELS-FIRST on [3, B, h, w] (image axis as conv
        # channels — the depthwise filter makes that equivalent): rgb_cf
        # reshapes for free, with NO transpose copy. Besides being faster,
        # this dodges a measured XLA miscompile: the materialized
        # slice+transpose copy of kernel A's rgb output produced NaN in a
        # layout-periodic column band (cols 109-239 of every row) whenever
        # kernel B consumed the conv-derived esq downstream — fully
        # reproduced and bisected on v5e (round 3). Checked-in repro:
        # tools/xla_miscompile_tripwire.py (run by tools/tpu_sweep.sh) —
        # it fails loudly if a jax/XLA bump re-exposes the bug through
        # this channels-first path.
        if cfg.use_edges:
            edge_pred_cf = compute_edges(rgb_cf.reshape(3, B, h, w), differentiable=False)
            outputs["edge_prediction"] = edge_pred_cf.transpose(1, 0, 2, 3)
            edges_cf = data["edges"].transpose(1, 0, 2, 3)
            esq = jnp.sum((edge_pred_cf - edges_cf) ** 2, axis=0).reshape(1, N)
            edge_loss = jnp.sum(m_flat * m_flat * esq) * inv_sum3
        else:
            esq = None
            edge_loss = jnp.asarray(0.0, dtype=jnp.float32)
        mask_loss = jnp.mean((1.0 - m_flat) ** 2)
        loss = {
            "render": render_loss(rgb_loss, edge_loss, mask_loss, alpha),
            "rgb": rgb_loss,
            "mask": mask_loss,
            "edge": edge_loss,
        }
        total = summarize_loss(loss, cfg.loss_weight)

        # ---- kernel B: dL/dm_i = C_r*(2 m_i sq_i - 3 rgb_l)/(3 sum m)
        #   + C_e*(2 m_i esq_i - 3 edge_l)/(3 sum m) + C_m*2(m_i - 1)/N
        # = (a*sq_i + b*esq_i + c)*m_i + k with the scalars below.
        gscalars = mask_cot_scalars(
            C_r, C_e, C_m, inv_sum3, rgb_loss, edge_loss, N, esq is not None
        )
        dstacks = fused_mask_backward_g(
            stacks, X_flat, sq, esq, gscalars, cdtype, n_heads,
            n_streams=cfg.arch.fused_streams,
        )
        if cfg.build_single_masks:
            dmask = jax.vmap(lambda dl: unfactor_mask_grads(dl, table))(dstacks)
        else:
            dmask = unfactor_mask_grads(
                [jax.tree.map(lambda a: a[0], layer) for layer in dstacks], table
            )
        grads = {
            "neural_image": dmlp,
            "warp": dwarp,
            "implicit_mask": dmask,
            "view_embedding": jnp.zeros_like(params["view_embedding"]),
        }
        return total, loss, outputs, grads

    def _fused_implicit_dedup_grads(state, data, progress, step, alpha, grid):
        """Shared-head implicit pipeline on DEDUPLICATED mask columns
        (round 3 v2, ops/pallas/fused_mask.py `slot_dedup_inputs`):

        The faithful {0,1} quantization leaves only K unique (pixel, combo)
        input columns (K ~ 1.03*HW vs N = B*HW on cat_batch3 — a 4.84x
        exact mask-head FLOP cut). Columns are laid out slot0+extras so the
        position<->column mapping is dense: slot0 (each pixel's majority
        combo) aligns with the per-position [B, HW] streams — its m-scatter
        is a broadcast multiply with the constant {0,1} slot0map and its
        sq/esq segment-sums fold INTO kernel B (round-4
        fused_mask_backward_dedup: [B, tile] loads reduced over sublanes)
        — while the E (~1.5k) extra columns use E-sized scatter-add/gathers.
        The chain: mask fwd kernel on the Kp pre-padded columns
        -> dense expansion of m to positions -> the flagship rgb train
        kernel (v5/v4, ops/pallas/fused_step.py) masked by m ->
        gradient-blocked edge conv -> mask bwd kernel with the in-kernel
        segment-sum and cotangent
        G_k = (a*Ssq + b*Sesq + c*cnt)*m + k*cnt — the exact groupby of
        dL/dm_i over a column's positions (dW = sum_i d_i a_i^T groups by
        identical a_i). Loss semantics identical to the reference
        (model/planar.py:355-390); see _fused_implicit_grads for the
        coefficient derivation."""
        from marf_tpu.ops.filters import compute_edges
        from marf_tpu.ops.pallas.fused_mask import (
            fused_mask_backward_dedup,
            fused_mask_forward,
            mask_w_stack,
            unfactor_mask_grads,
        )
        from marf_tpu.ops.pallas.fused_step import PB, fused_train_kernel
        from marf_tpu.ops.posenc import barf_c2f_weights
        from marf_tpu.ops.warp import warp_grid_cf_flat

        params = state.params
        h, w = cfg.map_hw
        B = cfg.batch_size
        HW = h * w
        N = B * HW
        cdtype = cfg.arch.compute_dtype

        X_all = data["mask_Xall"]  # [X_ROWS, Kp] (pre-padded to the kernel tile)
        slot0map = data["mask_slot0map"]  # [B, HW] {0,1}
        s0map_p = data["mask_slot0map_p"]  # [B, Kp] (zero on extras/padding)
        ext_pix = data["mask_ext_pix"]  # [E] int32
        extmap = data["mask_extmap"]  # [B, E] {0,1}
        cnt_all = data["mask_cntall"]  # [1, Kp]
        table = data["mask_table"]
        E = ext_pix.shape[0]
        Kp = X_all.shape[1]

        C_r, C_e, C_m = implicit_loss_coeffs(cfg, alpha)

        # ---- mask forward on the deduplicated columns, dense expansion to
        # positions: each position (b, p) has exactly one active column, so
        # m[b, p] = slot0map[b,p]*m0[p] + sum_j extmap[b,j]*[p==ext_pix[j]]*m_e[j]
        stack = mask_w_stack(params["implicit_mask"], table)
        m_all = fused_mask_forward(stack, X_all, cdtype)  # [1, Kp]
        m0 = m_all[:, :HW]
        m_pos = slot0map * m0  # [B, HW] broadcast
        if E:
            m_e = m_all[0, HW : HW + E]
            m_pos = m_pos.at[:, ext_pix].add(extmap * m_e[None, :])
        m_flat = m_pos.reshape(1, N)
        msum = jnp.dot(cnt_all[0], m_all[0])
        inv_sum3 = 1.0 / (msum * 3.0)

        # ---- rgb via the flagship train kernel, masked by the predicted m
        # (its cotangent 2C(p-t)m^2*inv_sum3 is exact for any mask values)
        cw = (
            barf_c2f_weights(progress, tuple(cfg.arch.barf_c2f), cfg.arch.posenc_L)
            if (cfg.arch.posenc_L and cfg.arch.barf_c2f is not None)
            else None
        )
        targets_cf = data.get("targets_cf_p")
        if targets_cf is None:
            targets_cf = data["rgb"].transpose(1, 0, 2, 3).reshape(3, N)
        if cfg.fused_warp != "off" and B <= PB:
            from marf_tpu.ops.pallas.fused_step import build_grid_b, fused_train_kernel_warp

            grid_b = data.get("grid_b_p")
            if grid_b is None:
                grid_b = build_grid_b(grid, B)  # [3, N] constant
            H, expm_vjp = jax.vjp(sl3_to_SL3, params["warp"])
            rgb_cf, rgb_loss, dmlp, dH, sq = fused_train_kernel_warp(
                params["neural_image"], grid_b, H, cw, targets_cf, m_flat,
                C_r, inv_sum3, cfg.arch,
            )
            rgb_cf, sq = rgb_cf[:, :N], sq[:, :N]  # pre-padded -> padded outs
            dwarp = expm_vjp(dH)[0]
        else:
            coords_cf, warp_vjp = jax.vjp(
                lambda wp: warp_grid_cf_flat(grid, wp), params["warp"]
            )
            rgb_cf, rgb_loss, dmlp, dcoords_cf, sq = fused_train_kernel(
                params["neural_image"], coords_cf, cw, targets_cf, m_flat,
                C_r, inv_sum3, cfg.arch,
            )
            dwarp = warp_vjp(dcoords_cf)[0]

        rgb_map = rgb_cf.reshape(3, B, h, w).transpose(1, 0, 2, 3)
        outputs = {
            "rgb_prediction": rgb_cf.reshape(3, B, HW).transpose(1, 2, 0),
            "rgb_prediction_map": rgb_map,
            "mask_prediction": m_flat.reshape(1, B, HW).transpose(1, 2, 0),
            "mask_prediction_map": m_flat.reshape(1, B, h, w).transpose(1, 0, 2, 3),
            "mask_prediction_cf": m_flat,  # see _fused_implicit_grads
        }

        # ---- remaining loss terms (sq comes straight from the rgb kernel;
        # edge conv channels-first: no transpose copy, and dodges the XLA
        # slice+transpose miscompile — see _fused_implicit_grads)
        if cfg.use_edges:
            edge_pred_cf = compute_edges(rgb_cf.reshape(3, B, h, w), differentiable=False)
            outputs["edge_prediction"] = edge_pred_cf.transpose(1, 0, 2, 3)
            edges_cf = data["edges"].transpose(1, 0, 2, 3)
            # per-image layout [B, HW]: kernel B consumes it directly, and
            # the edge loss uses m_pos in the same layout — the round-4
            # [B,h,w] -> [1,N] -> [B,HW] relayout pair disappears
            esq_b = jnp.sum((edge_pred_cf - edges_cf) ** 2, axis=0).reshape(B, HW)
            edge_loss = jnp.sum(m_pos * m_pos * esq_b) * inv_sum3
        else:
            esq_b = None
            edge_loss = jnp.asarray(0.0, dtype=jnp.float32)
        mask_loss = jnp.mean((1.0 - m_flat) ** 2)
        loss = {
            "render": render_loss(rgb_loss, edge_loss, mask_loss, alpha),
            "rgb": rgb_loss,
            "mask": mask_loss,
            "edge": edge_loss,
        }
        total = summarize_loss(loss, cfg.loss_weight)

        # ---- kernel B on the Kp unique columns with the slot0 segment-sum
        # folded IN-KERNEL (fused_mask_backward_dedup): XLA only supplies the
        # per-image streams (zero-padded past HW) and `base`, which carries
        # the E extras columns' segment sums (E-sized gathers) + c*cnt
        a_s, b_s, c_s, k_s = mask_cot_scalars(
            C_r, C_e, C_m, inv_sum3, rgb_loss, edge_loss, N, esq_b is not None
        )
        sq_b = sq.reshape(B, HW)
        base = c_s * cnt_all
        if E:
            Ssq_e = jnp.sum(extmap * sq_b[:, ext_pix], axis=0)  # [E]
            tail = a_s * Ssq_e
            if esq_b is not None:
                tail = tail + b_s * jnp.sum(extmap * esq_b[:, ext_pix], axis=0)
            base = base + jnp.pad(tail[None, :], ((0, 0), (HW, Kp - HW - E)))
        pad_b = lambda v: jnp.pad(v, ((0, 0), (0, Kp - HW)))
        dstack = fused_mask_backward_dedup(
            stack, X_all, s0map_p, pad_b(sq_b),
            pad_b(esq_b) if esq_b is not None else None,
            base, cnt_all, jnp.stack([a_s, b_s, k_s]), cdtype,
            n_streams=cfg.arch.fused_streams,
        )
        dmask = unfactor_mask_grads(dstack, table)
        grads = {
            "neural_image": dmlp,
            "warp": dwarp,
            "implicit_mask": dmask,
            "view_embedding": jnp.zeros_like(params["view_embedding"]),
        }
        return total, loss, outputs, grads

    def step_fn(state: TrainState, data: dict, heavy=True):
        step = state.step
        progress = step.astype(jnp.float32) / cfg.max_iter

        if fused:
            total, loss, outputs, grads = _fused_step_grads(state, data, progress, step, heavy)
        elif fused_implicit:
            total, loss, outputs, grads = _fused_implicit_grads(state, data, progress, step)
        else:
            total, loss, outputs, grads = _autodiff_grads(state, data, progress, step)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {f"loss_{k}": v for k, v in loss.items()}
        metrics["all"] = total
        metrics["PSNR"] = psnr_from_rgb_loss(loss["rgb"])
        metrics["finite"] = check_finite(loss)

        def _lazy(fn):
            # pure-metric scalars: only chunk-final rows are consumed,
            # intermediate rows report 0 (models/planar.lazy_aux_metric)
            return lazy_aux_metric(cfg, heavy, fn)

        if use_homographies and data.get("gt_hom") is not None:
            metrics["Homography_Error"] = _lazy(
                lambda: homography_error(sl3_to_SL3(params["warp"]), data["gt_hom"])
            )
        if compute_mask_error:

            def _mask_err():
                mcf = outputs.get("mask_prediction_cf")
                if mcf is None:
                    return mse(outputs["mask_prediction_map"], data["masks"])
                # same element multiset channels-first: identical mean (up to
                # reduction order); m_flat is live for the loss already and
                # the masks relayout is loop-invariant (hoisted out of the
                # scan), so no per-step [B,1,h,w] copy rides as cond operand
                masks_cf = data["masks"].transpose(1, 0, 2, 3).reshape(mcf.shape)
                return mse(mcf, masks_cf)

            metrics["Mask_Error"] = _lazy(_mask_err)

        if cfg.fix_first:
            # Pin the gauge: re-zero the first image's warp after each update
            # (reference model/planar.py:157-158).
            params = dict(params, warp=params["warp"].at[0].set(0.0))

        new_state = TrainState(step=step + 1, params=params, opt_state=opt_state)
        return new_state, metrics

    return step_fn


def make_train_chunk(step_fn, n_steps: int, donate: bool = True):
    """Compile `n_steps` train steps into one `lax.scan` program.

    Returns a jitted (state, data) -> (state, stacked_metrics) with metrics
    stacked [n_steps, ...] so the host can publish the reference's exact
    scalar cadence from one dispatch.
    """

    def chunk(state: TrainState, data: dict):
        def body(carry, i):
            # heavy = chunk-final step: the only row whose metrics are
            # consumed beyond the finite check (trainer logs metrics[k][-1])
            new_state, metrics = step_fn(carry, data, heavy=(i == n_steps - 1))
            return new_state, metrics

        return jax.lax.scan(body, state, jnp.arange(n_steps))

    return jax.jit(chunk, donate_argnums=(0,) if donate else ())


def chunk_schedule(max_iter: int, freq_scalar: int, freq_vis: int, freq_ckpt: int | None = None) -> int:
    """Chunk length: the largest step count whose boundaries hit every
    scalar-log, vis, and (if set) checkpoint cadence point."""
    c = math.gcd(int(freq_scalar), int(freq_vis))
    if freq_ckpt:
        c = math.gcd(c, int(freq_ckpt))
    return max(1, min(c, max_iter))
