"""Tripwire for the v5e XLA miscompile dodged in engine/step.py.

Round 3 bisected a real TPU miscompile: materializing kernel A's rgb output
through a slice+transpose copy ([3,B,h,w] -> [B,3,h,w]) before the edge conv,
with kernel B consuming the conv-derived esq downstream, made XLA emit NaN in
a layout-periodic column band (cols 109-239 of every row of esq; original
repro /tmp/r3dbg/step_repro.py, 2026-08-17, esq_nan=117900 of 129600). The
shipped step dodges it by running the edge conv CHANNELS-FIRST on the
[3, B, h, w] view — a free reshape, no transpose copy (engine/step.py, the
"CHANNELS-FIRST" comment block).

This script re-runs BOTH patterns against the live jax/XLA and:
  * asserts the SHIPPED (channels-first) pattern is NaN-free  -> exit 1 if not
  * reports whether the KNOWN-BAD pattern still miscompiles    (informational:
    nonzero = the XLA bug is still live and the dodge is load-bearing;
    zero = an XLA upgrade fixed it and the dodge is only a perf choice)

Run on TPU (tools/tpu_sweep.sh runs it last):
    python tools/xla_miscompile_tripwire.py
Off-TPU it exits 0 with a skip notice — interpret/CPU paths never miscompiled.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    if jax.default_backend() != "tpu":
        print(f"SKIP: backend={jax.default_backend()} (miscompile is TPU-only)")
        return 0

    from marf_tpu.engine.step import implicit_loss_coeffs, mask_cot_scalars
    from marf_tpu.engine.trainer import Model
    from marf_tpu.ops.filters import compute_edges
    from marf_tpu.ops.grid import normalized_pixel_grid
    from marf_tpu.ops.losses import alpha_schedule
    from marf_tpu.ops.pallas.fused_mask import (
        fused_implicit_train_kernel,
        fused_mask_backward_g,
        mask_w_stack_batched,
    )
    from marf_tpu.ops.posenc import barf_c2f_weights
    from marf_tpu.ops.warp import warp_grid_cf_flat
    from marf_tpu.utils.attrdict import AttrDict
    from marf_tpu.utils.config import load_options, process_options, resolve_yaml_path

    opt = load_options(resolve_yaml_path("planar"))
    opt.update(AttrDict(model="planar", yaml="planar", group="r4trip", name="edge",
                        seed=3, use_masks=False, use_implicit_mask=True, max_iter=20))
    opt.barf_c2f = [0, 0.4]
    opt.tpu.fused_dedup = "off"  # the repro needs the dense [X_ROWS, N] input
    process_options(opt)
    m = Model(opt)
    m.load_dataset()
    m.build_networks()
    m.setup_optimizer()
    m._build_compiled()
    cfg, params, data = m.cfg, m.state.params, m.train_data
    h, w = cfg.map_hw
    B = cfg.batch_size
    N = B * h * w

    def edge_step(params, data, step, bad_pattern):
        """One forward + kernel-B consume, with the edge conv in either layout."""
        progress = step.astype(jnp.float32) / cfg.max_iter
        alpha = alpha_schedule(step, cfg.max_iter, cfg.alpha_initial, cfg.alpha_final)
        C_r, C_e, C_m = implicit_loss_coeffs(cfg, alpha)
        X, table = data["mask_X"], data["mask_table"]
        stacks = mask_w_stack_batched(params["implicit_mask"], table, 1)
        grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
        coords = warp_grid_cf_flat(grid, params["warp"])
        cw = barf_c2f_weights(progress, tuple(cfg.arch.barf_c2f), cfg.arch.posenc_L)
        targets = data["rgb"].transpose(1, 0, 2, 3).reshape(3, N)
        rgb, mm, sq, _dcu, msum, loss_u, _dmlp = fused_implicit_train_kernel(
            params["neural_image"], stacks, coords, X, cw, targets, 2.0 * C_r, cfg.arch, 1
        )
        inv_sum3 = 1.0 / (msum * 3.0)
        if bad_pattern:
            # the round-3 miscompile pattern: materialized transpose copy,
            # conv on [B,3,h,w], reduce over axis 1
            rgb_map = rgb.reshape(3, B, h, w).transpose(1, 0, 2, 3)
            ep = compute_edges(rgb_map, differentiable=False)
            esq = jnp.sum((ep - data["edges"]) ** 2, axis=1).reshape(1, N)
        else:
            # the shipped dodge: channels-first view, no copy
            ep_cf = compute_edges(rgb.reshape(3, B, h, w), differentiable=False)
            edges_cf = data["edges"].transpose(1, 0, 2, 3)
            esq = jnp.sum((ep_cf - edges_cf) ** 2, axis=0).reshape(1, N)
        edge_l = jnp.sum(mm * mm * esq) * inv_sum3
        rgb_l = loss_u * inv_sum3
        gs = mask_cot_scalars(C_r, C_e, C_m, inv_sum3, rgb_l, edge_l, N, cfg.use_edges)
        ds = fused_mask_backward_g(stacks, X, sq, esq, gs, cfg.arch.compute_dtype, 1)
        return dict(
            esq_nan=jnp.isnan(esq).sum(),
            dmask_nan=sum(jnp.isnan(l["w"]).sum() for l in ds),
            edge_l=edge_l,
        )

    shipped = jax.jit(lambda p, d, s: edge_step(p, d, s, bad_pattern=False))
    bad = jax.jit(lambda p, d, s: edge_step(p, d, s, bad_pattern=True))

    out = jax.tree.map(np.asarray, shipped(params, data, jnp.asarray(0)))
    print(f"shipped (channels-first) pattern: esq_nan={int(out['esq_nan'])} "
          f"dmask_nan={int(out['dmask_nan'])} edge_l={float(out['edge_l']):.4f}")
    out_bad = jax.tree.map(np.asarray, bad(params, data, jnp.asarray(0)))
    print(f"known-bad (slice+transpose) pattern: esq_nan={int(out_bad['esq_nan'])} "
          f"dmask_nan={int(out_bad['dmask_nan'])} edge_l={float(out_bad['edge_l']):.4f}")
    if int(out_bad["esq_nan"]) or int(out_bad["dmask_nan"]):
        print("NOTE: the XLA slice+transpose miscompile is still live; the "
              "channels-first dodge in engine/step.py is load-bearing.")
    else:
        print("NOTE: the known-bad pattern is now clean — the XLA bug appears "
              "fixed; the dodge remains as the faster (copy-free) layout.")

    if int(out["esq_nan"]) or int(out["dmask_nan"]):
        print("FAIL: the SHIPPED edge-conv pattern produced NaN — the XLA "
              "miscompile has re-surfaced through the channels-first path. "
              "Re-bisect before trusting implicit training on this jax/XLA.")
        return 1
    print("OK: shipped pattern NaN-free.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
