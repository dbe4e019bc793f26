"""Single-pass fused train kernel: MLP forward + masked-MSE loss + full
backward (dW/db/denc) in one Pallas kernel over pre-encoded points.

This is the north-star kernel (BASELINE.json): the planar step's gradient
structure is known analytically — the edge term is gradient-blocked
(SURVEY.md §2.4(1)) and the masked rgb MSE has cotangent
d loss_rgb / d rgb = 2 * (rgb - target) * mask / (sum(mask) * 3), scaled by
the step-dependent coefficient C = 10^w_render * (1 - alpha) + 10^w_rgb.
So instead of autodiff re-tracing the MLP (which costs a forward recompute in
the backward kernel), ONE kernel pass computes rgb, the loss partials, and
all weight gradients: 267 GFLOP total instead of 356, zero HBM activation
traffic.

Division of labor (v2): posenc and the warp chain stay in XLA — in-kernel
posenc ran on 8-to-34-of-128 lane-padded VPU tiles and dominated the kernel
(~2.5 ms/step measured); XLA computes the [N, 34] encoding in ~0.3 ms and
its VJP via jax.vjp. The kernel is a pure dense stack.

MXU latency hiding: dependent matmul chains run at ~32 TF/s on this chip
(measured); interleaving S independent row-streams per grid step recovers
throughput (2 streams ~2.3x, 4 streams ~3.8x measured). All layer-k matmuls
of the S streams are emitted adjacently.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marf_tpu.ops.pallas.fused_mlp import _interpret, _pad_rows, _round_up

SUB = 512  # rows per stream
N_STREAMS = 4
TILE = SUB * N_STREAMS  # rows per grid step
_VMEM_LIMIT = 110 * 1024 * 1024


def fused_step_supported(arch_cfg) -> bool:
    return not arch_cfg.skip


def _kernel(n_layers, in_dim, cdtype, scalars_ref, enc_ref, tgt_ref, msk_ref, grgb_ref, *refs):
    """One grid step: S independent row-streams through fwd + loss + bwd.

    scalars_ref (SMEM [2]): [0] = d_total/d_rgb scale (2 * C / (sum(m)*3)),
    [1] = loss-partial scale (1 / (sum(m)*3)).
    """
    w_refs = refs[:n_layers]
    b_refs = refs[n_layers : 2 * n_layers]
    rgb_ref = refs[2 * n_layers]
    denc_ref = refs[2 * n_layers + 1]
    loss_ref = refs[2 * n_layers + 2]  # [1, 1]
    out_dw = refs[2 * n_layers + 3 : 3 * n_layers + 3]
    out_db = refs[3 * n_layers + 3 : 4 * n_layers + 3]
    acc_dw = refs[4 * n_layers + 3 : 5 * n_layers + 3]
    acc_db = refs[5 * n_layers + 3 : 6 * n_layers + 3]
    loss_acc = refs[6 * n_layers + 3]  # SMEM [1]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for li in range(n_layers):
            acc_dw[li][:] = jnp.zeros_like(acc_dw[li])
            acc_db[li][:] = jnp.zeros_like(acc_db[li])
        loss_acc[0] = 0.0

    dscale = scalars_ref[0]
    lscale = scalars_ref[1]

    # ---- forward: S streams, layer-major interleave (independent matmuls
    # back to back keep the MXU pipeline full)
    acts = [[enc_ref[pl.ds(s * SUB, SUB), :].astype(cdtype)] for s in range(N_STREAMS)]
    for li in range(n_layers):
        for s in range(N_STREAMS):
            z = (
                jnp.dot(acts[s][li], w_refs[li][:], preferred_element_type=jnp.float32)
                + b_refs[li][:]
            )
            if li != n_layers - 1:
                acts[s].append(jax.nn.relu(z).astype(cdtype))
            else:
                acts[s].append(jax.nn.sigmoid(z))  # f32 rgb [SUB, out]

    # ---- loss partials + output cotangent
    d_s = []
    partial = 0.0
    for s in range(N_STREAMS):
        rgb = acts[s][n_layers]
        sl = pl.ds(s * SUB, SUB)
        rgb_ref[sl, :] = rgb
        diff_m = (rgb - tgt_ref[sl, :]) * msk_ref[sl, :]
        partial += jnp.sum(diff_m * diff_m)
        d_out = dscale * diff_m * msk_ref[sl, :] + grgb_ref[sl, :]
        # chain through sigmoid: d z = d_out * rgb * (1 - rgb)
        d_s.append((d_out * rgb * (1.0 - rgb)).astype(cdtype))
    loss_acc[0] += partial * lscale

    # ---- backward: layer-major interleave down the stack
    for li in range(n_layers - 1, -1, -1):
        for s in range(N_STREAMS):
            a = acts[s][li]
            acc_dw[li][:] += jax.lax.dot_general(
                a, d_s[s], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc_db[li][:] += jnp.sum(d_s[s].astype(jnp.float32), axis=0, keepdims=True)
        new_d = []
        for s in range(N_STREAMS):
            da = jax.lax.dot_general(
                d_s[s], w_refs[li][:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if li > 0:
                new_d.append((da * (acts[s][li].astype(jnp.float32) > 0.0)).astype(cdtype))
            else:
                denc_ref[pl.ds(s * SUB, SUB), :] = da
        d_s = new_d

    @pl.when(step == pl.num_programs(0) - 1)
    def _writeout():
        for li in range(n_layers):
            out_dw[li][:] = acc_dw[li][:]
            out_db[li][:] = acc_db[li][:]
        loss_ref[:] = jnp.full((1, 1), loss_acc[0], dtype=jnp.float32)


def fused_train_kernel(params, enc, targets, masks, g_loss_scale, inv_sum3, arch_cfg):
    """Run the fused fwd+loss+bwd dense-stack kernel.

    Args:
      params: MLP pytree (f32 master weights).
      enc: [N, input_dim] encoded points (posenc+c2f+concat done in XLA).
      targets: [N, 3] flat target rgb.
      masks: [N, 1] flat binary mask (ones when masks are off).
      g_loss_scale: scalar — d total_loss / d rgb_loss (analytic cotangent).
      inv_sum3: scalar — 1 / (sum(mask) * 3) (reference masked-MSE
        normalization, model/planar.py:388-390).
      arch_cfg: NeuralImageConfig (static).

    Returns:
      (rgb [N, 3], rgb_loss scalar, dparams pytree, denc [N, input_dim]).
    """
    dims = arch_cfg.layer_dims
    n_layers = len(dims)
    in_dim = dims[0][0]
    cdtype = jnp.dtype(arch_cfg.compute_dtype)
    N = enc.shape[0]
    n_padded = _round_up(max(N, TILE), TILE)
    grid = n_padded // TILE
    out_dim = dims[-1][1]

    enc_p = _pad_rows(enc, n_padded)
    targets_p = _pad_rows(targets, n_padded)
    masks_p = _pad_rows(masks, n_padded)  # zero mask on padding -> no loss/grad pollution
    grgb = jnp.zeros((n_padded, out_dim), dtype=jnp.float32)

    weights = [params["mlp"][i]["w"].astype(cdtype) for i in range(n_layers)]
    biases = [params["mlp"][i]["b"].reshape(1, -1) for i in range(n_layers)]
    scalars = jnp.stack([2.0 * g_loss_scale * inv_sum3, inv_sum3]).astype(jnp.float32)

    kernel = functools.partial(_kernel, n_layers, in_dim, cdtype)
    out_shapes = (
        [
            jax.ShapeDtypeStruct((n_padded, out_dim), jnp.float32),  # rgb
            jax.ShapeDtypeStruct((n_padded, in_dim), jnp.float32),  # denc
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # rgb_loss
        ]
        + [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
        + [jax.ShapeDtypeStruct((1, b.shape[-1]), jnp.float32) for b in biases]
    )
    out_specs = (
        [
            pl.BlockSpec((TILE, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, in_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for w in weights]
        + [pl.BlockSpec((1, b.shape[-1]), lambda i: (0, 0), memory_space=pltpu.VMEM) for b in biases]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [2]
            pl.BlockSpec((TILE, in_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),  # enc
            pl.BlockSpec((TILE, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),  # targets
            pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),  # masks
            pl.BlockSpec((TILE, out_dim), lambda i: (i, 0), memory_space=pltpu.VMEM),  # grgb
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2 * n_layers)],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM(w.shape, jnp.float32) for w in weights]
            + [pltpu.VMEM((1, b.shape[-1]), jnp.float32) for b in biases]
            + [pltpu.SMEM((1,), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(scalars, enc_p, targets_p, masks_p, grgb, *weights, *biases)

    rgb = outs[0][:N]
    denc = outs[1][:N]
    rgb_loss = outs[2][0, 0]
    dws = outs[3 : 3 + n_layers]
    dbs = [b.reshape(-1) for b in outs[3 + n_layers :]]
    dparams = {"mlp": [{"w": dws[i], "b": dbs[i]} for i in range(n_layers)]}
    return rgb, rgb_loss, dparams, denc
