"""Fused Ha-NeRF mask-head kernels: factored inputs + two-pass fwd/bwd.

The implicit-mask head (reference model/planar.py:475-517) is a
[426 -> 256 x4 -> 1, sigmoid] MLP over concat(embedded input RGB, embedded
uv grid). Two structural facts make it collapse on TPU:

1. The reference's `image.long()` quantization (SURVEY.md §2.4(4)) floors
   [0,1] floats to {0,1}, so each pixel's 384-dim embedded-RGB block is one
   of only 8 distinct vectors (the {0,1}^3 combinations of view-embedding
   rows 0/1). The 426-channel input therefore factors into a constant
   [42, HW] uv embedding plus a per-pixel 8-way one-hot: the first layer
   becomes W1_uv^T @ uv + (table8 @ W1_emb)^T @ onehot — an effective
   [56 -> 256] layer. First-layer FLOPs drop 8x and the per-step input
   HBM traffic drops from 368 MB ([426, N] f32) to ~50 MB.
2. With the view embedding frozen (the reference never optimizes it,
   model/planar.py:89-96), the factored input X is CONSTANT across
   training — the engine precomputes it once.

The head's output cotangent dL/dm depends on global reductions over the
whole prediction (sum(m) normalizes the masked MSE, model/planar.py:388-390),
so the mask backward cannot fuse with the forward: the pipeline is TWO
kernels — kernel A (mask fwd + the whole rgb train kernel, unnormalized
cotangent, see the round-3 section below) and kernel B (mask bwd with the
cotangent computed in-kernel). The backward recomputes the forward
tile-locally (VMEM-resident activations; recompute is cheaper than 885 MB
of activation HBM round-trips at the measured ~650 GB/s).

Layout follows fused_step.py: channels-first [C, SUB] tiles with the point
axis in lanes, both W^T (forward) and W (backward dx) resident in VMEM,
dW accumulated [out, in] in f32 scratch across grid steps.

The round-2 three-kernel chain (standalone mask fwd kernel -> rgb kernel ->
XLA elementwise dL/dm -> mask bwd kernel, 167.3/158.7 steps/s) was retired
in round 3 when this two-kernel pipeline replaced it; measurements in
PERF.md.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from marf_tpu.ops.pallas.fused_step import (
    SUB,
    _VMEM_LIMIT,
    _expand_w1,
    _interpret,
    _n_streams,
    _posenc_fwd,
    _posenc_vjp,
    _stack_bwd,
    _stack_fwd,
    mxu_dot,
)
from marf_tpu.ops.posenc import hanerf_pos_embedding

N_COMBOS = 8  # {0,1}^3 RGB index combinations (the faithful quantization)
UV_DIM = 42
X_ROWS = 56  # 42 uv + 8 onehot, padded to the 8-row sublane tile


def factor_mask_inputs(view_embedding: jax.Array, images: jax.Array, xy_grid: jax.Array):
    """Factor the mask-head inputs (reference model/planar.py:340-349).

    Args:
      view_embedding: [N_vocab, 128] frozen embedding table.
      images: [B, 3, H, W] photos in [0, 1].
      xy_grid: [HW, 2] unwarped normalized grid.

    Returns:
      (uv [42, HW], onehot [B, 8, HW], table [8, 384]) with table row c =
      concat(emb[bit2 c], emb[bit1 c], emb[bit0 c]) matching the dense
      input's [emb_r, emb_g, emb_b] channel order.
    """
    B = images.shape[0]
    idx = images.astype(jnp.int32)  # floor toward zero on [0,1] -> {0,1}
    combo = (idx[:, 0] * 4 + idx[:, 1] * 2 + idx[:, 2]).reshape(B, -1)  # [B, HW]
    uv = hanerf_pos_embedding(xy_grid).T.astype(jnp.float32)  # [42, HW]
    bits = np.array([[(c >> 2) & 1, (c >> 1) & 1, c & 1] for c in range(N_COMBOS)])
    table = view_embedding[bits].reshape(N_COMBOS, -1)  # [8, 384]
    onehot = (combo[:, None, :] == jnp.arange(N_COMBOS)[None, :, None]).astype(jnp.float32)
    return uv, onehot, table


def build_mask_x(uv: jax.Array, onehot: jax.Array, single: bool) -> jax.Array:
    """Assemble the kernel input X.

    Shared head: [X_ROWS, B*HW] (batch folded into lanes, column b*HW+i —
    the same ordering as the flat rgb streams). Per-image heads: [B, X_ROWS, HW].
    """
    B, _, HW = onehot.shape
    if single:
        uv_b = jnp.broadcast_to(uv[None], (B,) + uv.shape)
        pad = jnp.zeros((B, X_ROWS - UV_DIM - N_COMBOS, HW), dtype=jnp.float32)
        return jnp.concatenate([uv_b, onehot, pad], axis=1)
    uv_flat = jnp.tile(uv, (1, B))  # [42, B*HW], block b = uv
    oh_flat = onehot.transpose(1, 0, 2).reshape(N_COMBOS, B * HW)
    pad = jnp.zeros((X_ROWS - UV_DIM - N_COMBOS, B * HW), dtype=jnp.float32)
    return jnp.concatenate([uv_flat, oh_flat, pad], axis=0)


def slot_dedup_inputs(uv: np.ndarray, onehot: np.ndarray):
    """Deduplicate the shared-head input columns (host-side, setup-time) —
    slot0 + extras layout, designed so the per-step glue is dense
    elementwise math with NO large gathers.

    The shared head's N = B*HW input columns are pairs (pixel, combo) with
    combo the {0,1}^3 quantization index — and natural images are mostly
    non-saturated, so most pixels take the SAME combo in every image
    (canonical cat_batch3: 41762/43200 pixels have one combo across all 5
    images; K = 44654 unique columns vs N = 216000 — an exact 4.84x
    mask-head FLOP cut). Since the factored input X is constant (frozen
    view embedding), the structure is computed once here with numpy:

    - slot0: for every pixel, its MAJORITY combo — one full-HW column block
      in pixel order, so the forward scatter (m per position) and the
      backward segment-sum (cotangent per column) against per-position
      [B, HW] streams are plain broadcast-multiply/reduce, no indexing.
    - extras: the remaining (pixel, combo) columns (E = K - HW, ~1.5k on
      cat_batch3), a compact block whose per-position mapping needs only
      E-sized gathers/scatter-adds (`ext_pix`) — two orders of magnitude
      smaller than the round-3-v1 design's [N]-sized gathers, whose XLA
      in-context lowering measured ~1.5 ms each (PERF.md round 3).

    An earlier v1 (`dedup_mask_inputs`, unique-column gather/segment-sum
    layout) was replaced by this: exact same FLOP cut, but its three
    [N]-scale gathers dominated the step (8.4 ms vs the kernels' 0.5).

    Args:
      uv: [42, HW] uv positional embedding (factor_mask_inputs).
      onehot: [B, 8, HW] combo one-hots (factor_mask_inputs).

    Returns:
      (X_all [X_ROWS, HW+E] — slot0 columns then extras,
       slot0map [B, HW] f32 — 1 where image b's combo at p is the slot0 one,
       ext_pix [E] int32 — pixel of each extra column,
       extmap [B, E] f32 — 1 where image b's combo at ext_pix[j] is extra j,
       cnt_all [1, HW+E] f32 — position counts per column).
    """
    uv = np.asarray(uv)
    onehot = np.asarray(onehot)
    B, _, HW = onehot.shape
    combo = np.argmax(onehot, axis=1)  # [B, HW]
    counts = np.zeros((N_COMBOS, HW), np.int32)
    np.add.at(counts, (combo, np.arange(HW)[None].repeat(B, 0)), 1)
    slot0 = np.argmax(counts, axis=0)  # [HW] majority combo (ties -> smallest)
    slot0map = (combo == slot0[None]).astype(np.float32)  # [B, HW]
    present = counts > 0
    present[slot0, np.arange(HW)] = False
    cmb_e, pix_e = np.nonzero(present)  # extras, combo-major order
    E = len(pix_e)
    eye = np.eye(N_COMBOS, dtype=np.float32)
    pad0 = np.zeros((X_ROWS - UV_DIM - N_COMBOS, HW), dtype=np.float32)
    X0 = np.concatenate([uv, eye[:, slot0], pad0], axis=0)
    pad_e = np.zeros((X_ROWS - UV_DIM - N_COMBOS, E), dtype=np.float32)
    Xe = np.concatenate([uv[:, pix_e], eye[:, cmb_e], pad_e], axis=0)
    X_all = np.concatenate([X0, Xe], axis=1).astype(np.float32)
    extmap = (combo[:, pix_e] == cmb_e[None]).astype(np.float32)  # [B, E]
    cnt_all = np.concatenate([slot0map.sum(0), extmap.sum(0)])[None].astype(np.float32)
    return X_all, slot0map, pix_e.astype(np.int32), extmap, cnt_all


def slot_dedup_padded_inputs(uv: np.ndarray, onehot: np.ndarray, arch_cfg=None) -> dict:
    """slot_dedup_inputs + kernel-tile padding (host, setup-time): the
    device-ready dict the single-chip dedup step consumes.

    The column axis K = HW + E is padded once to the backward kernel's grid
    tile (SUB * n_streams) so the per-step XLA pad fusions disappear, and
    slot0map gains a padded copy [B, Kp] whose zero columns make the
    in-kernel segment reduction exact on the extras/padding region (see
    fused_mask_backward_dedup). Padding must happen at setup: X is constant
    (frozen view embedding), and the round-4 trace showed the per-step
    [56, K] pad costing ~14 us/step.
    """
    X_all, slot0map, ext_pix, extmap, cnt_all = slot_dedup_inputs(uv, onehot)
    B, HW = slot0map.shape
    K = X_all.shape[1]
    ns = _n_streams(arch_cfg)
    subt = SUB * ns
    Kp = -(-max(K, subt) // subt) * subt
    return {
        "mask_Xall": np.pad(X_all, ((0, 0), (0, Kp - K))),
        "mask_cntall": np.pad(cnt_all, ((0, 0), (0, Kp - K))),
        "mask_slot0map": slot0map,
        "mask_slot0map_p": np.pad(slot0map, ((0, 0), (0, Kp - HW))).astype(np.float32),
        "mask_ext_pix": ext_pix,
        "mask_extmap": extmap,
    }


def slot_dedup_sharded_inputs(uv: np.ndarray, onehot: np.ndarray, n_devices: int):
    """Per-device dedup structures for the shard_map mesh pipeline
    (parallel/shard_fused.py `_make_implicit_dedup_sharded_chunk`).

    The position axis N = B*HW is sharded contiguously (column order
    b*HW + i, device d owns [d*Nl, (d+1)*Nl)); the dedup COLUMN axis
    K = HW + E is padded to a device multiple and sharded independently.
    The slot0 position<->column mapping stays dense on each device because
    p = n mod HW is affine over a contiguous block (a tile + dynamic-slice
    in the step, no gathers); only the extras (E ~1.5k columns) need indexed
    ops, and their (position, column) pairs are grouped per OWNING device
    here at setup so the step's gathers/scatters are Eloc-sized.

    Args:
      uv: [42, HW] uv positional embedding (factor_mask_inputs).
      onehot: [B, 8, HW] combo one-hots (factor_mask_inputs).
      n_devices: mesh size D (N % D == 0, checked by fused_shardable).

    Returns:
      (X_pad [X_ROWS, K_pad] — slot0 + extras + zero columns, K_pad = D*ceil(K/D),
       slot0map_flat [1, N] f32 — slot0map reshaped to position order,
       cnt_pad [1, K_pad] f32 — per-column position counts, 0 on padding,
       ext_off [D, Eloc] i32 — extras position offsets local to each device,
       ext_col [D, Eloc] i32 — the extras' global column index (>= HW),
       ext_val [D, Eloc] f32 — 1 for real (position, column) pairs, 0 padding).
    """
    X_all, slot0map, ext_pix, extmap, cnt_all = slot_dedup_inputs(uv, onehot)
    B, HW = slot0map.shape
    N = B * HW
    D = int(n_devices)
    assert N % D == 0, f"position axis {N} must divide the mesh ({D})"
    Nl = N // D
    K = X_all.shape[1]
    K_pad = D * (-(-K // D))
    X_pad = np.pad(X_all, ((0, 0), (0, K_pad - K))).astype(np.float32)
    cnt_pad = np.pad(cnt_all, ((0, 0), (0, K_pad - K))).astype(np.float32)
    slot0map_flat = slot0map.reshape(1, N).astype(np.float32)

    # group the extras' (position, column) pairs by owning device
    bb, jj = np.nonzero(extmap)  # each pair covers exactly one position
    n_pos = bb * HW + ext_pix[jj]
    dev = n_pos // Nl
    per_dev = [np.flatnonzero(dev == d) for d in range(D)]
    Eloc = max((len(s) for s in per_dev), default=0)
    ext_off = np.zeros((D, Eloc), np.int32)
    ext_col = np.zeros((D, Eloc), np.int32)
    ext_val = np.zeros((D, Eloc), np.float32)
    for d, sel in enumerate(per_dev):
        k = len(sel)
        ext_off[d, :k] = n_pos[sel] - d * Nl
        ext_col[d, :k] = HW + jj[sel]
        ext_val[d, :k] = 1.0
    return X_pad, slot0map_flat, cnt_pad, ext_off, ext_col, ext_val


def _mask_fwd_only_kernel(n_mask, cdtype, x_ref, *refs):
    """Forward-only grid step (dedup path): dense stack + sigmoid on one
    [X_ROWS, SUB] tile of unique columns."""
    mwt = refs[:n_mask]
    mb = refs[n_mask : 2 * n_mask]
    out_ref = refs[2 * n_mask]
    m, _ = _mask_fwd_tile(x_ref[:], mwt, mb, n_mask, cdtype)
    out_ref[:] = m


def fused_mask_forward(layers: list, x_cf: jax.Array, compute_dtype="float32") -> jax.Array:
    """Single-head mask forward: [X_ROWS, K] factored (unique) columns ->
    [1, K] occlusion probability."""
    n_layers = len(layers)
    cdtype = jnp.dtype(compute_dtype)
    K = x_cf.shape[1]
    n_padded = -(-max(K, SUB) // SUB) * SUB
    grid = n_padded // SUB
    wts = [l["w"].T.astype(cdtype) for l in layers]
    biases = [l["b"].reshape(-1, 1).astype(jnp.float32) for l in layers]
    x_p = jnp.pad(x_cf, ((0, 0), (0, n_padded - K))) if n_padded != K else x_cf

    kernel = functools.partial(_mask_fwd_only_kernel, n_layers, cdtype)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((x_cf.shape[0], SUB), lambda i: (0, i), memory_space=pltpu.VMEM),
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(2 * n_layers)],
        ],
        out_specs=pl.BlockSpec((1, SUB), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_padded), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(x_p, *wts, *biases)
    return out[:, :K]


def mask_w_stack(head_params: dict, table: jax.Array) -> list:
    """Effective layer stack for the factored input: layer 1's [426, 256]
    weights become [X_ROWS, 256] = [W1_uv (rows 384:426); table8 @ W1_emb
    (rows 0:384); zero pad]. Later layers pass through unchanged."""
    mlp = head_params["mlp"]
    w1 = mlp[0]["w"]  # [426, 256]
    w1_eff = jnp.concatenate(
        [w1[384:426], table @ w1[:384], jnp.zeros((X_ROWS - UV_DIM - N_COMBOS, w1.shape[1]), dtype=w1.dtype)],
        axis=0,
    )
    return [{"w": w1_eff, "b": mlp[0]["b"]}] + list(mlp[1:])


def unfactor_mask_grads(dlayers: list, table: jax.Array) -> dict:
    """Map effective-layer grads back to the reference parameter layout:
    dW1_emb = table^T @ dP (the one-hot block's grads), dW1_uv = the uv block."""
    dw1_eff = dlayers[0]["w"]  # [X_ROWS, 256]
    dw1 = jnp.concatenate([table.T @ dw1_eff[UV_DIM : UV_DIM + N_COMBOS], dw1_eff[:UV_DIM]], axis=0)
    return {"mlp": [{"w": dw1, "b": dlayers[0]["b"]}] + list(dlayers[1:])}


def mask_w_stack_batched(head_params: dict, table: jax.Array, n_heads: int) -> list:
    """Stacked effective layers for the B-blocked kernels: every leaf gains a
    leading head axis. Shared head -> n_heads=1; per-image heads pass their
    already-stacked pytree (leaves [B, ...])."""
    if n_heads == 1:
        single = mask_w_stack(head_params, table)
        return [jax.tree.map(lambda a: a[None], layer) for layer in single]
    per_head = [
        mask_w_stack(jax.tree.map(lambda a, b=b: a[b], head_params), table) for b in range(n_heads)
    ]
    return [jax.tree.map(lambda *xs: jnp.stack(xs), *layers) for layers in zip(*per_head)]


def _mask_fwd_tile_multi(xs, wt_refs, b_refs, n_layers, cdtype, keep_acts=False):
    """Multi-stream variant of _mask_fwd_tile, layer-phased like
    fused_step._stack_fwd_multi: per LAYER, all streams' MXU dots issue
    back-to-back before any stream's relu/sigmoid, so stream s+1's dot can
    run under stream s's VPU phase. Per-stream arithmetic is identical to
    _mask_fwd_tile — only instruction order changes (ns=1 emits the same
    program). Returns (ms[stream], acts[layer][stream])."""
    hs = [x.astype(cdtype) for x in xs]
    acts = [hs]
    ms = None
    for li in range(n_layers):
        zs = [
            mxu_dot(wt_refs[li][:], h, (((1,), (0,)), ((), ()))) + b_refs[li][:]
            for h in hs
        ]
        if li != n_layers - 1:
            hs = [jax.nn.relu(z).astype(cdtype) for z in zs]
            if keep_acts:
                acts.append(hs)
        else:
            ms = [jax.nn.sigmoid(z[0:1, :]) for z in zs]  # f32 [1, W] each
    return ms, acts


def _mask_fwd_tile(x, wt_refs, b_refs, n_layers, cdtype, keep_acts=False):
    """Factored mask-head forward on one [X_ROWS, SUB] tile. wt_refs are the
    current head's 2-D [out, in] blocks (the head-stacked arrays are kept
    flattened to [H*out, in] so every BlockSpec stays 2-D — 3-D [1, out, in]
    blocks miscompiled on TPU); returns (m f32 [1, SUB], acts) with acts
    populated only when keep_acts."""
    acts = [x.astype(cdtype)]
    h = acts[0]
    for li in range(n_layers):
        z = (
            mxu_dot(wt_refs[li][:], h, (((1,), (0,)), ((), ())))
            + b_refs[li][:]
        )
        if li != n_layers - 1:
            h = jax.nn.relu(z).astype(cdtype)
            if keep_acts:
                acts.append(h)
        else:
            # row 0 only: the final layer's out=1 rows may be zero-padded to
            # the 8-row sublane tile in the head-blocked kernels (TPU block
            # shapes need 8-divisible second-minor dims; see _head_rp)
            m = jax.nn.sigmoid(z[0:1, :])  # f32 [1, SUB]
    return m, acts


# ---------------------------------------------------------------------------
# Round-3 fused implicit pipeline: ONE combined train kernel (mask fwd + rgb
# fwd/bwd) and ONE mask-backward kernel with the dL/dm cotangent computed
# in-kernel. Replaces the round-2 three-kernel + XLA-glue chain.
#
# Kernel A exploits dscale linearity (the whole rgb backward scales linearly
# with the loss cotangent), so the masked-MSE normalization 1/(3*sum(m)) —
# unknowable until the mask forward finishes — is applied POST-kernel to the
# accumulated dW/db/dcoords/loss: the kernel runs with the unnormalized
# cotangent 2*C*(rgb-t)*m^2 and one pass produces m, rgb, per-point sq,
# the global sums, and the full rgb-MLP backward. The mask-head forward and
# the rgb chains are independent per tile, giving Mosaic two dependent
# matmul chains to interleave (the single-chain MXU pipeline bound is the
# measured ceiling, PERF.md).
#
# Kernel B folds the cotangent dL/dm = a*m*sq + b*m*esq + c*m + k (a/b/c/k
# are scalars of the global sums; derivation in engine/step.py) into the
# backward kernel itself — the round-2 XLA elementwise stage and its [1, N]
# HBM round-trips disappear. Both kernels are head-blocked: grid g = (head,
# tile) flattened, mask weights/grads indexed by g // T, so per-image heads
# (reference model/planar.py:322-324) run as ONE kernel instead of B
# sequential pallas_calls.
# ---------------------------------------------------------------------------


def _head_pad(a: jax.Array, n_heads: int, hw_padded: int) -> jax.Array:
    """[C, n_heads*HW] -> [C, n_heads*hw_padded], zero-padding each head's
    column block to hw_padded (lane-aligned per-head tiles)."""
    C, N = a.shape
    HW = N // n_heads
    if HW == hw_padded:
        return a
    a3 = a.reshape(C, n_heads, HW)
    a3 = jnp.pad(a3, ((0, 0), (0, 0), (0, hw_padded - HW)))
    return a3.reshape(C, n_heads * hw_padded)


def _head_slice(a: jax.Array, n_heads: int, hw: int) -> jax.Array:
    """Inverse of _head_pad: [C, n_heads*hw_padded] -> [C, n_heads*hw]."""
    C, Np = a.shape
    hw_padded = Np // n_heads
    if hw == hw_padded:
        return a
    return a.reshape(C, n_heads, hw_padded)[:, :, :hw].reshape(C, n_heads * hw)


def _head_rp(out: int, n_heads: int) -> int:
    """Per-head row count for head-blocked weight/bias arrays: the TPU block
    shape rule needs the second-minor block dim divisible by 8 (or equal to
    the whole array dim, which only holds for n_heads == 1), so the final
    layer's out=1 rows are zero-padded to 8 per head when head-blocked."""
    return out if (n_heads == 1 or out % 8 == 0) else -(-out // 8) * 8


def _pad_head_rows(a3: jax.Array, rp: int) -> jax.Array:
    """[H, r, c] -> [H, rp, c] zero-padding each head's row block."""
    if a3.shape[1] == rp:
        return a3
    return jnp.pad(a3, ((0, 0), (0, rp - a3.shape[1]), (0, 0)))


def _implicit_kernel(n_mask, n_rgb, L, n_streams, cdtype, scalars_ref, coords_ref, x_ref, cw_ref, tgt_ref, valid_ref, *refs):
    """Kernel A grid step: mask fwd + posenc + rgb fwd + loss partials + full
    rgb bwd, channels-first, with the UNNORMALIZED cotangent (dscale
    linearity; see module note), over `n_streams` independent SUB-lane
    column streams (fused_step.NSTREAMS). scalars_ref (SMEM [1]):
    [0] = 2*C_rgb."""
    mwt = refs[:n_mask]  # per-head [rp, in] blocks (2-D head-flattened)
    mb = refs[n_mask : 2 * n_mask]  # [rp, 1]
    o = 2 * n_mask
    wt_refs = refs[o : o + n_rgb]  # rgb W^T [out, in]
    w_refs = refs[o + n_rgb : o + 2 * n_rgb]  # rgb W [in, out]
    b_refs = refs[o + 2 * n_rgb : o + 3 * n_rgb]
    o += 3 * n_rgb
    rgb_ref = refs[o]  # [3, SUB]
    m_ref = refs[o + 1]  # [1, SUB]
    sq_ref = refs[o + 2]  # [1, SUB]
    dcoords_ref = refs[o + 3]  # [2, SUB]
    msum_ref = refs[o + 4]  # [1, 1]: sum(m) (valid-gated)
    lsum_ref = refs[o + 5]  # [1, 1]: sum(m^2 sq) (valid-gated)
    o += 6
    out_dw = refs[o : o + n_rgb]
    out_db = refs[o + n_rgb : o + 2 * n_rgb]
    acc_dw = refs[o + 2 * n_rgb : o + 3 * n_rgb]
    acc_db = refs[o + 3 * n_rgb : o + 4 * n_rgb]
    acc_sums = refs[o + 4 * n_rgb]  # SMEM [2]

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        for li in range(n_rgb):
            acc_dw[li][:] = jnp.zeros_like(acc_dw[li])
            acc_db[li][:] = jnp.zeros_like(acc_db[li])
        acc_sums[0] = 0.0
        acc_sums[1] = 0.0

    g2c = scalars_ref[0]

    W = coords_ref.shape[-1] // n_streams
    for s in range(n_streams):
        sl = slice(s * W, (s + 1) * W)
        # mask-head forward (independent chain — interleaves with the rgb
        # MXU work)
        m, _ = _mask_fwd_tile(x_ref[:, sl], mwt, mb, n_mask, cdtype)

        x = coords_ref[0:1, sl]
        y = coords_ref[1:2, sl]
        enc, pe_state = _posenc_fwd(x, y, L, cw_ref)
        acts = _stack_fwd(enc, wt_refs, b_refs, n_rgb, cdtype)

        rgb = acts[n_rgb]
        rgb_ref[:, sl] = rgb
        m_ref[:, sl] = m
        valid = valid_ref[:, sl]
        mv = m * valid  # valid in {0,1}: (m*valid)^2 == m^2*valid
        diff = rgb - tgt_ref[:, sl]
        sq = jnp.sum(diff * diff, axis=0, keepdims=True)
        sq_ref[:, sl] = sq
        acc_sums[0] += jnp.sum(mv)
        acc_sums[1] += jnp.sum(mv * mv * sq)
        d_out = g2c * diff * (mv * mv)
        d = (d_out * rgb * (1.0 - rgb)).astype(cdtype)

        denc = _stack_bwd(d, acts, w_refs, acc_dw, acc_db, n_rgb, cdtype)
        dx, dy = _posenc_vjp(denc, L, pe_state)
        dcoords_ref[:, sl] = jnp.concatenate([dx, dy], axis=0)

    @pl.when(g == pl.num_programs(0) - 1)
    def _writeout():
        for li in range(n_rgb):
            out_dw[li][:] = acc_dw[li][:]
            out_db[li][:] = acc_db[li][:]
        msum_ref[:] = jnp.full((1, 1), acc_sums[0], dtype=jnp.float32)
        lsum_ref[:] = jnp.full((1, 1), acc_sums[1], dtype=jnp.float32)


def _mask_bwd_g_kernel(n_mask, T, rp_last, n_streams, cdtype, scalars_ref, x_ref, sq_ref, esq_ref, cnt_ref, *refs):
    """Kernel B grid step: recompute the mask fwd tile-locally, form the
    cotangent g = (a*sq + b*esq + c*cnt)*m + k*cnt in-kernel, chain through
    the sigmoid, accumulate per-head dW/db. scalars_ref (SMEM [4]):
    [a, b, c, k]. cnt is the duplicate count per column — 1 for real / 0 for
    padded columns in the plain path (recovering g = (a*sq+b*esq+c)*m + k
    zeroed on padding), the segment counts on the dedup path, where sq/esq
    arrive segment-summed over each unique column's duplicates."""
    mwt = refs[:n_mask]  # per-head [rp, in] blocks (forward, 2-D head-flattened)
    mw = refs[n_mask : 2 * n_mask]  # [in, rp] (backward dh)
    mb = refs[2 * n_mask : 3 * n_mask]
    out_dw = refs[3 * n_mask : 4 * n_mask]  # [1, out, in]
    out_db = refs[4 * n_mask : 5 * n_mask]  # [1, out, 1]
    acc_dw = refs[5 * n_mask : 6 * n_mask]
    acc_db = refs[6 * n_mask : 7 * n_mask]

    g = pl.program_id(0)
    i = g % T  # tile index within the current head

    @pl.when(i == 0)
    def _init():
        for li in range(n_mask):
            acc_dw[li][:] = jnp.zeros_like(acc_dw[li])
            acc_db[li][:] = jnp.zeros_like(acc_db[li])

    a_s = scalars_ref[0]
    b_s = scalars_ref[1]
    c_s = scalars_ref[2]
    k_s = scalars_ref[3]

    # Layer-phased across streams (round 5): the recompute fwd, the cotangent
    # VPU phase, and the bwd chain each issue all streams' MXU dots
    # back-to-back per layer (same structure as fused_step._stack_*_multi) —
    # kernel B is a single strictly-serial dependent chain per stream, and
    # at SUB-lane dots shorter than the ~3.5 us MXU pipeline bubble the
    # sequential-stream emission left the bubbles unfilled (the round-4
    # "streams flat" rows measured the SEQUENTIAL form of this kernel).
    # Per-accumulator add order (stream 0, 1, ...) is preserved, so ns>1
    # numerics are unchanged and ns=1 emits the identical program.
    W = x_ref.shape[-1] // n_streams
    slices = [slice(s * W, (s + 1) * W) for s in range(n_streams)]
    ms, acts = _mask_fwd_tile_multi(
        [x_ref[:, sl] for sl in slices], mwt, mb, n_mask, cdtype, keep_acts=True
    )
    ds = []
    for m, sl in zip(ms, slices):
        cnt = cnt_ref[:, sl]
        gcot = (a_s * sq_ref[:, sl] + b_s * esq_ref[:, sl] + c_s * cnt) * m + k_s * cnt
        d = (gcot * m * (1.0 - m)).astype(cdtype)
        if rp_last > 1:
            # the final layer's head-blocked grads are row-padded to the
            # 8-row tile (_head_rp) — extend the [1, SUB] cotangent with
            # zero rows so the generic dW/db/dh chain below runs on the
            # padded shapes
            d = jnp.concatenate([d, jnp.zeros((rp_last - 1, d.shape[1]), d.dtype)], axis=0)
        ds.append(d)

    for li in range(n_mask - 1, -1, -1):
        a_sl = acts[li]
        for d, a in zip(ds, a_sl):
            acc_dw[li][:] += mxu_dot(d, a, (((1,), (1,)), ((), ())))
            acc_db[li][:] += jnp.sum(d.astype(jnp.float32), axis=1, keepdims=True)
        if li > 0:
            das = [mxu_dot(mw[li][:], d, (((1,), (0,)), ((), ()))) for d in ds]
            ds = [
                (da * (a.astype(jnp.float32) > 0.0)).astype(cdtype)
                for da, a in zip(das, a_sl)
            ]

    @pl.when(i == T - 1)
    def _writeout():
        for li in range(n_mask):
            out_dw[li][:] = acc_dw[li][:]
            out_db[li][:] = acc_db[li][:]


def fused_implicit_train_kernel(rgb_params, mask_stacks, coords_cf, x_cf, cw, targets_cf, g2C, arch_cfg, n_heads=1):
    """Combined implicit-mask train kernel (kernel A).

    Args:
      rgb_params: neural-image pytree (f32 master weights, w [in, out]).
      mask_stacks: head-stacked effective mask layers (mask_w_stack_batched):
        [{w [H, in, out], b [H, out]} ...].
      coords_cf: [2, N] warped coordinates (N = n_heads * HW, column order
        head-major — the engine's flat b*HW+i layout).
      x_cf: [X_ROWS, N] factored mask inputs in the same column order.
      cw: [L] c2f band weights or None.
      targets_cf: [3, N] flat target rgb.
      g2C: scalar 2 * C_rgb — the UNNORMALIZED rgb-loss cotangent scale;
        multiply the returned dmlp/dcoords/loss_unnorm by 1/(3*sum(m))
        outside (dscale linearity).
      arch_cfg: NeuralImageConfig (static).
      n_heads: 1 (shared head) or B (per-image heads).

    Returns:
      (rgb_cf [3,N], m [1,N], sq [1,N], dcoords_cf [2,N], msum, loss_unnorm,
       dmlp) — msum = sum(m) over real columns; loss_unnorm = sum(m^2 * sq).
    """
    dims = arch_cfg.layer_dims
    n_rgb = len(dims)
    n_mask = len(mask_stacks)
    L = int(arch_cfg.posenc_L or 0)
    cdtype = jnp.dtype(arch_cfg.compute_dtype)
    N = coords_cf.shape[1]
    HW = N // n_heads
    ns = _n_streams(arch_cfg)
    subt = SUB * ns  # columns per grid step (ns independent chains)
    hw_padded = -(-max(HW, subt) // subt) * subt
    T = hw_padded // subt
    grid = n_heads * T
    out_dim = dims[-1][1]

    coords_p = _head_pad(coords_cf, n_heads, hw_padded)
    x_p = _head_pad(x_cf, n_heads, hw_padded)
    targets_p = _head_pad(targets_cf, n_heads, hw_padded)
    valid_p = _head_pad(jnp.ones((1, N), dtype=jnp.float32), n_heads, hw_padded)

    # head-stacked mask weights flattened to 2-D ([H*rp, in] etc.) so every
    # BlockSpec is a plain 2-D block — 3-D [1, out, in] head blocks
    # miscompiled on TPU (silent buffer corruption); the index map picks the
    # current head's row block via g // T. rp pads the final layer's out=1
    # rows to the 8-row tile when head-blocked (_head_rp; the padded z rows
    # are zero and _mask_fwd_tile keeps only row 0).
    rps = [_head_rp(l["w"].shape[2], n_heads) for l in mask_stacks]
    mwts = [
        _pad_head_rows(l["w"].transpose(0, 2, 1), rp).reshape(-1, l["w"].shape[1]).astype(cdtype)
        for l, rp in zip(mask_stacks, rps)
    ]  # [H*rp, in]
    mbs = [
        _pad_head_rows(l["b"][:, :, None], rp).reshape(-1, 1).astype(jnp.float32)
        for l, rp in zip(mask_stacks, rps)
    ]  # [H*rp, 1]

    ws = [rgb_params["mlp"][i]["w"] for i in range(n_rgb)]
    ws[0] = _expand_w1(ws[0], L)
    wts = [w.T.astype(cdtype) for w in ws]
    ws = [w.astype(cdtype) for w in ws]
    biases = [rgb_params["mlp"][i]["b"].reshape(-1, 1) for i in range(n_rgb)]
    scalars = jnp.stack([g2C]).astype(jnp.float32)
    cw_col = (
        cw.reshape(-1, 1).astype(jnp.float32)
        if cw is not None
        else jnp.ones((max(L, 1), 1), dtype=jnp.float32)
    )

    col = lambda c: pl.BlockSpec((c, subt), lambda g: (0, g), memory_space=pltpu.VMEM)
    headblk = lambda shp: pl.BlockSpec(
        (shp[0] // n_heads, shp[1]), lambda g: (g // T, 0), memory_space=pltpu.VMEM
    )
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_implicit_kernel, n_mask, n_rgb, L, ns, cdtype)
    n_padded = n_heads * hw_padded
    out_shapes = (
        [
            jax.ShapeDtypeStruct((out_dim, n_padded), jnp.float32),  # rgb
            jax.ShapeDtypeStruct((1, n_padded), jnp.float32),  # m
            jax.ShapeDtypeStruct((1, n_padded), jnp.float32),  # sq
            jax.ShapeDtypeStruct((2, n_padded), jnp.float32),  # dcoords
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # sum(m)
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # sum(m^2 sq)
        ]
        + [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in wts]
        + [jax.ShapeDtypeStruct((b.shape[0], 1), jnp.float32) for b in biases]
    )
    out_specs = (
        [
            col(out_dim),
            col(1),
            col(1),
            col(2),
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(wt.shape, lambda g: (0, 0), memory_space=pltpu.VMEM) for wt in wts]
        + [pl.BlockSpec((b.shape[0], 1), lambda g: (0, 0), memory_space=pltpu.VMEM) for b in biases]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [1]
            col(2),  # coords
            col(x_p.shape[0]),  # X
            pl.BlockSpec((max(L, 1), 1), lambda g: (0, 0), memory_space=pltpu.VMEM),  # c2f w
            col(out_dim),  # targets
            col(1),  # valid
            *[headblk(mwt.shape) for mwt in mwts],
            *[headblk(mb.shape) for mb in mbs],
            *[whole() for _ in range(3 * n_rgb)],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM(wt.shape, jnp.float32) for wt in wts]
            + [pltpu.VMEM((b.shape[0], 1), jnp.float32) for b in biases]
            + [pltpu.SMEM((2,), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(scalars, coords_p, x_p, cw_col, targets_p, valid_p, *mwts, *mbs, *wts, *ws, *biases)

    rgb_cf = _head_slice(outs[0], n_heads, HW)
    m_cf = _head_slice(outs[1], n_heads, HW)
    sq_cf = _head_slice(outs[2], n_heads, HW)
    dcoords_cf = _head_slice(outs[3], n_heads, HW)
    msum = outs[4][0, 0]
    loss_unnorm = outs[5][0, 0]
    dws = outs[6 : 6 + n_rgb]
    dbs = [b.reshape(-1) for b in outs[6 + n_rgb :]]
    dw1 = dws[0].T
    dw1 = jnp.concatenate([dw1[:2], dw1[8:]], axis=0) if L else dw1[: dims[0][0]]
    dmlp = {
        "mlp": [{"w": dw1, "b": dbs[0]}]
        + [{"w": dws[i].T, "b": dbs[i]} for i in range(1, n_rgb)]
    }
    return rgb_cf, m_cf, sq_cf, dcoords_cf, msum, loss_unnorm, dmlp


def fused_mask_backward_g(
    mask_stacks, x_cf, sq_cf, esq_cf, gscalars, compute_dtype="float32", n_heads=1, cnt_cf=None,
    n_streams=0,
):
    """Mask-head backward with the in-kernel cotangent (kernel B).

    Args:
      mask_stacks: head-stacked effective layers (mask_w_stack_batched).
      x_cf: [X_ROWS, N] factored inputs (N = n_heads * HW), or the unique
        columns [X_ROWS, K] on the dedup path.
      sq_cf: [1, N] per-point rgb squared error (kernel A output), or the
        segment-summed [1, K] on the dedup path.
      esq_cf: [1, N]/[1, K] per-point edge squared error, or None.
      gscalars: [4] f32 — (a, b, c, k) of dL/dm = (a*sq + b*esq + c)*m + k.
      n_heads: 1 or B.
      cnt_cf: [1, K] duplicate counts (dedup path); None = ones.
      n_streams: independent column streams per grid step; 0 = the
        MARF_FUSED_STREAMS module default (callers pass
        cfg.arch.fused_streams).

    Returns the head-stacked effective gradient list [{w [H,in,out],
    b [H,out]} ...] (pass heads through `unfactor_mask_grads`).
    """
    n_mask = len(mask_stacks)
    cdtype = jnp.dtype(compute_dtype)
    N = x_cf.shape[1]
    HW = N // n_heads
    ns = int(n_streams) or _n_streams()
    subt = SUB * ns  # columns per grid step (ns independent chains)
    hw_padded = -(-max(HW, subt) // subt) * subt
    T = hw_padded // subt
    grid = n_heads * T

    x_p = _head_pad(x_cf, n_heads, hw_padded)
    sq_p = _head_pad(sq_cf, n_heads, hw_padded)
    esq_p = _head_pad(
        esq_cf if esq_cf is not None else jnp.zeros((1, N), dtype=jnp.float32), n_heads, hw_padded
    )
    valid_p = _head_pad(
        cnt_cf if cnt_cf is not None else jnp.ones((1, N), dtype=jnp.float32), n_heads, hw_padded
    )

    # head-stacked weights flattened to 2-D blocks (see kernel A note: 3-D
    # [1, ...] head blocks miscompiled on TPU); the final layer's out=1 rows/
    # cols are zero-padded to rp per head (_head_rp) so the blocks tile
    in_dims = [l["w"].shape[1] for l in mask_stacks]
    out_dims = [l["w"].shape[2] for l in mask_stacks]
    rps = [_head_rp(o, n_heads) for o in out_dims]
    mwts = [
        _pad_head_rows(l["w"].transpose(0, 2, 1), rp).reshape(-1, l["w"].shape[1]).astype(cdtype)
        for l, rp in zip(mask_stacks, rps)
    ]  # [H*rp, in]
    mws = [
        jnp.pad(l["w"], ((0, 0), (0, 0), (0, rp - l["w"].shape[2])))
        .reshape(-1, rp)
        .astype(cdtype)
        for l, rp in zip(mask_stacks, rps)
    ]  # [H*in, rp]
    mbs = [
        _pad_head_rows(l["b"][:, :, None], rp).reshape(-1, 1).astype(jnp.float32)
        for l, rp in zip(mask_stacks, rps)
    ]  # [H*rp, 1]

    col = lambda c: pl.BlockSpec((c, subt), lambda g: (0, g), memory_space=pltpu.VMEM)
    headblk = lambda shp: pl.BlockSpec(
        (shp[0] // n_heads, shp[1]), lambda g: (g // T, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_mask_bwd_g_kernel, n_mask, T, rps[-1], ns, cdtype)
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [4]
            col(x_p.shape[0]),
            col(1),
            col(1),
            col(1),
            *[headblk(mwt.shape) for mwt in mwts],
            *[headblk(mw.shape) for mw in mws],
            *[headblk(mb.shape) for mb in mbs],
        ],
        out_specs=(
            [headblk(mwt.shape) for mwt in mwts]
            + [headblk(mb.shape) for mb in mbs]
        ),
        out_shape=(
            [jax.ShapeDtypeStruct(mwt.shape, jnp.float32) for mwt in mwts]
            + [jax.ShapeDtypeStruct(mb.shape, jnp.float32) for mb in mbs]
        ),
        scratch_shapes=(
            [pltpu.VMEM((mwt.shape[0] // n_heads, mwt.shape[1]), jnp.float32) for mwt in mwts]
            + [pltpu.VMEM((mb.shape[0] // n_heads, 1), jnp.float32) for mb in mbs]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(jnp.asarray(gscalars, jnp.float32), x_p, sq_p, esq_p, valid_p, *mwts, *mws, *mbs)
    dws = outs[:n_mask]  # [H*rp, in]
    dbs = outs[n_mask:]  # [H*rp, 1]
    return [
        {
            "w": dw.reshape(n_heads, rp, i)[:, :o].transpose(0, 2, 1),
            "b": db.reshape(n_heads, rp)[:, :o],
        }
        for dw, db, i, o, rp in zip(dws, dbs, in_dims, out_dims, rps)
    ]


def _mask_bwd_dedup_kernel(n_mask, T, n_streams, has_esq, cdtype, scalars_ref, x_ref, s0m_ref, sqb_ref, *rest):
    """Kernel B grid step, dedup-fold variant (shared head): the slot0
    segment-sum happens IN-KERNEL — Ssq over a column's duplicate positions
    is sum_b slot0map[b, col] * sq[b, col] (slot0 aligns columns with
    pixels), loaded as [B, subt] blocks and reduced over sublanes — and the
    column cotangent is

        g = (a*Ssq_red + b*Sesq_red + base) * m + k*cnt

    where base = a*Ssq_tail + b*Sesq_tail + c*cnt is precomputed in XLA
    ([1, Kp] elementwise): the tails carry the E extras columns' segment
    sums (E-sized XLA gathers), which occupy [HW, HW+E) where the padded
    sq/esq rows are zero, so reduce + base is exact on every region.
    scalars_ref (SMEM [3]): [a, b, k]."""
    esqb_ref = rest[0] if has_esq else None
    base_ref, cnt_ref, *refs = rest[1 if has_esq else 0 :]
    mwt = refs[:n_mask]  # [out, in] (forward)
    mw = refs[n_mask : 2 * n_mask]  # [in, out] (backward dh)
    mb = refs[2 * n_mask : 3 * n_mask]
    out_dw = refs[3 * n_mask : 4 * n_mask]
    out_db = refs[4 * n_mask : 5 * n_mask]
    acc_dw = refs[5 * n_mask : 6 * n_mask]
    acc_db = refs[6 * n_mask : 7 * n_mask]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for li in range(n_mask):
            acc_dw[li][:] = jnp.zeros_like(acc_dw[li])
            acc_db[li][:] = jnp.zeros_like(acc_db[li])

    a_s = scalars_ref[0]
    b_s = scalars_ref[1]
    k_s = scalars_ref[2]

    # layer-phased across streams, same rationale/ordering argument as
    # _mask_bwd_g_kernel (per-accumulator stream order preserved; ns=1
    # emits the identical program)
    W = x_ref.shape[-1] // n_streams
    slices = [slice(s * W, (s + 1) * W) for s in range(n_streams)]
    ms, acts = _mask_fwd_tile_multi(
        [x_ref[:, sl] for sl in slices], mwt, mb, n_mask, cdtype, keep_acts=True
    )
    ds = []
    for m, sl in zip(ms, slices):
        s0m = s0m_ref[:, sl]
        seg = a_s * jnp.sum(s0m * sqb_ref[:, sl], axis=0, keepdims=True) + base_ref[:, sl]
        if has_esq:
            seg += b_s * jnp.sum(s0m * esqb_ref[:, sl], axis=0, keepdims=True)
        gcot = seg * m + k_s * cnt_ref[:, sl]
        ds.append((gcot * m * (1.0 - m)).astype(cdtype))

    for li in range(n_mask - 1, -1, -1):
        a_sl = acts[li]
        for d, a in zip(ds, a_sl):
            acc_dw[li][:] += mxu_dot(d, a, (((1,), (1,)), ((), ())))
            acc_db[li][:] += jnp.sum(d.astype(jnp.float32), axis=1, keepdims=True)
        if li > 0:
            das = [mxu_dot(mw[li][:], d, (((1,), (0,)), ((), ()))) for d in ds]
            ds = [
                (da * (a.astype(jnp.float32) > 0.0)).astype(cdtype)
                for da, a in zip(das, a_sl)
            ]

    @pl.when(i == T - 1)
    def _writeout():
        for li in range(n_mask):
            out_dw[li][:] = acc_dw[li][:]
            out_db[li][:] = acc_db[li][:]


def fused_mask_backward_dedup(
    mask_stack, x_p, s0map_p, sqb_p, esqb_p, base, cnt_p, abk,
    compute_dtype="float32", n_streams=0,
):
    """Mask-head backward with the slot0 segment-sum folded in-kernel
    (kernel B, dedup pipeline, shared head only).

    Replaces the XLA stage Ssq/Sesq = segment_sum -> concat -> pad that the
    round-4 trace measured at ~55 us/step of fragmented fusions
    (multiply_reduce 25, concat 16, pads 14): the kernel reads the
    per-position streams in per-image layout and reduces them over the
    B sublanes next to the MXU recompute it already does.

    Args:
      mask_stack: SINGLE effective layer stack (mask_w_stack), not batched.
      x_p: [X_ROWS, Kp] factored unique columns, pre-padded to the grid
        tile (slot_dedup_padded_inputs).
      s0map_p: [B, Kp] slot0 indicator, zero on the extras/pad columns.
      sqb_p: [B, Kp] per-position rgb squared error in per-image layout,
        zero-padded past HW.
      esqb_p: [B, Kp] per-position edge squared error, or None (no edges).
      base: [1, Kp] precomputed a*Ssq_tail + b*Sesq_tail + c*cnt (the
        extras columns' E-sized segment sums live in the tails).
      cnt_p: [1, Kp] duplicate counts (zero on padding).
      abk: [3] f32 — (a, b, k) of dL/dm = (a*Ssq + b*Sesq + c*cnt)*m + k*cnt.
      n_streams: independent column streams per grid step; 0 = module default.

    Returns the effective gradient list [{w [in, out], b [out]} ...]
    (pass through `unfactor_mask_grads`).
    """
    n_mask = len(mask_stack)
    cdtype = jnp.dtype(compute_dtype)
    Kp = x_p.shape[1]
    ns = int(n_streams) or _n_streams()
    subt = SUB * ns
    assert Kp % subt == 0, (
        f"dedup inputs padded to {Kp} columns but the kernel tile is {subt} "
        "(SUB*n_streams) — rebuild them with slot_dedup_padded_inputs under "
        "the same MARF_FUSED_SUB/streams settings"
    )
    T = Kp // subt
    has_esq = esqb_p is not None

    wts = [l["w"].T.astype(cdtype) for l in mask_stack]  # [out, in]
    ws = [l["w"].astype(cdtype) for l in mask_stack]  # [in, out]
    bs = [l["b"].reshape(-1, 1).astype(jnp.float32) for l in mask_stack]

    col = lambda c: pl.BlockSpec((c, subt), lambda i: (0, i), memory_space=pltpu.VMEM)
    whole = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)

    kernel = functools.partial(_mask_bwd_dedup_kernel, n_mask, T, ns, has_esq, cdtype)
    esq_in = (esqb_p,) if has_esq else ()
    outs = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [3]
            col(x_p.shape[0]),
            col(s0map_p.shape[0]),
            col(sqb_p.shape[0]),
            *( [col(esqb_p.shape[0])] if has_esq else [] ),
            col(1),  # base
            col(1),  # cnt
            *[whole() for _ in range(3 * n_mask)],
        ],
        out_specs=[whole() for _ in range(2 * n_mask)],
        out_shape=(
            [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in wts]
            + [jax.ShapeDtypeStruct((b.shape[0], 1), jnp.float32) for b in bs]
        ),
        scratch_shapes=(
            [pltpu.VMEM(wt.shape, jnp.float32) for wt in wts]
            + [pltpu.VMEM((b.shape[0], 1), jnp.float32) for b in bs]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(jnp.asarray(abk, jnp.float32), x_p, s0map_p, sqb_p, *esq_in, base, cnt_p, *wts, *ws, *bs)
    dws = outs[:n_mask]  # [out, in]
    dbs = outs[n_mask:]  # [out, 1]
    return [
        {"w": dw.T, "b": db.reshape(-1)} for dw, db in zip(dws, dbs)
    ]
