"""Single-pass fused train kernel v4: posenc + MLP forward + masked-MSE loss
+ full backward (dW/db/dcoords) in ONE channels-first Pallas kernel.

This is the north-star kernel (BASELINE.json): the planar step's gradient
structure is known analytically — the edge term is gradient-blocked
(SURVEY.md §2.4(1)) and the masked rgb MSE has cotangent
d loss_rgb / d rgb = 2 * (rgb - target) * mask / (sum(mask) * 3), scaled by
the step-dependent coefficient C = 10^w_render * (1 - alpha) + 10^w_rgb
(reference model/planar.py:359-390). So instead of autodiff re-tracing the
MLP, ONE kernel pass computes rgb, the loss partials, and all gradients:
~267 GFLOP, with only the [2, N] coords / [3, N] targets / [1, N] masks /
[2, N] dcoords crossing HBM (~17 MB/step vs the 4.4 GB/step of the XLA
autodiff path).

v4 design notes (each earlier variant was measured; PERF.md):
- CHANNELS-FIRST throughout: every tensor keeps the huge point axis in
  vector lanes ([C, SUB] tiles). v2 kept posenc in XLA row-major and paid
  ~2.3 ms/step of lane-padded [N, 34] elementwise fusions + ~1.5 ms of
  [34,N]<->[N,34] transpose copies; in-kernel cf posenc replaces all of it
  with VPU work on full-lane tiles, overlapped with the MXU.
- ONE large row-stream per grid step (SUB=2000 lanes): the per-matmul MXU
  pipeline bubble is a fixed cost, so large tiles amortize it — measured
  in-kernel rate went 32 TF/s (4x512-row streams, v2) -> ~138 TF/s (1x2048).
- The encoding lives in an 8-row-aligned layout: rows 0-7 = [x, y, 0*6],
  then [sin(x f_k) * w_k], [cos(x f_k) * w_k], [sin(y f_k) * w_k],
  [cos(y f_k) * w_k] blocks of L=8 rows each. The first-layer weight matrix
  is row-permuted/zero-padded to match in XLA (tiny [34,256] work); dW1 is
  sliced back. c2f band weights w_k arrive as a [L, 1] operand (traced
  function of progress, reference model/planar.py:461-470).
- dcoords is computed in-kernel by the analytic posenc VJP
  (d sin(xf)w = w f cos(xf), etc.); only the warp chain's VJP
  (dcoords -> dwarp, a tiny [B,8] contraction) stays in XLA.

Weight layouts: the kernel receives both W^T ([out,in], forward f(x)=W^T@x
in cf) and W ([in,out], backward dx=W@dz) per layer — 2x256KB/layer of VMEM
buys transpose-free matmuls in both directions. dW accumulates as [out,in]
in f32 scratch across grid steps and is transposed once in XLA.
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Points (lanes) per grid step; must be a multiple of 128 (Mosaic lane
# tiling). The canonical 216,000-point workload pads to 217,088 columns, but
# only on the tiny [2/3/1, N] streams. Env-overridable for sweeps.
SUB = int(os.environ.get("MARF_FUSED_SUB", 2048))
# Independent column streams per grid step: each stream is a full SUB-lane
# dependent matmul chain with no data flow to the others, so Mosaic can fill
# one stream's VPU phases (posenc, relu, sigmoid, cotangent) with another's
# MXU work. SUB=4096 single-stream measured flat (PERF.md) — the bound is
# chain serialization, not matmul width, which is what this attacks.
NSTREAMS = int(os.environ.get("MARF_FUSED_STREAMS", 1))
_VMEM_LIMIT = 100 * 1024 * 1024


def _interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CI / CPU tests)."""
    return jax.default_backend() != "tpu"


def fused_step_supported(arch_cfg) -> bool:
    return not arch_cfg.skip


def _n_streams(arch_cfg=None) -> int:
    """Config-first stream count: arch_cfg.fused_streams when set, else the
    MARF_FUSED_STREAMS module default (the kernel measurement knob, also
    monkeypatched by the stream-equality tests). All four kernels resolve
    through THIS module's NSTREAMS so a single rebind reaches every kernel."""
    return int(getattr(arch_cfg, "fused_streams", 0) or 0) or NSTREAMS


def mxu_dot(a, b, dims):
    """MXU-style mixed-precision dot: (possibly bf16) operands, f32 result.

    On TPU this is the native MXU mode (bf16 x bf16 -> f32). XLA:CPU's
    DotThunk doesn't implement that combination, so interpret mode upcasts
    the operands first — numerically identical: every bf16 x bf16 product is
    exact in f32 (8-bit mantissas), and accumulation is f32 in both forms.
    """
    if _interpret() and jnp.bfloat16 in (a.dtype, b.dtype):
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def _enc_rows(L: int) -> int:
    """Rows of the in-kernel encoding: one aligned 8-row block for [x, y],
    then 4 blocks of L rows (sin/cos per input channel)."""
    return 8 + 4 * L if L else 8


def _posenc_fwd(x, y, L, cw_ref):
    """In-kernel cf posenc. Returns (enc [8+4L, SUB], vjp_state)."""
    zeros6 = jnp.zeros((6, x.shape[-1]), dtype=jnp.float32)
    xy_blk = jnp.concatenate([x, y, zeros6], axis=0)  # [8, SUB]
    if not L:
        return xy_blk, None
    k = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0).astype(jnp.float32)
    freq = jnp.exp2(k) * np.float32(np.pi)  # [L, 1] = 2^k * pi
    cw = cw_ref[:]  # [L, 1]
    spec_x = x * freq  # [L, SUB] (sublane-broadcast of x)
    spec_y = y * freq
    sin_x, cos_x = jnp.sin(spec_x) * cw, jnp.cos(spec_x) * cw
    sin_y, cos_y = jnp.sin(spec_y) * cw, jnp.cos(spec_y) * cw
    enc = jnp.concatenate([xy_blk, sin_x, cos_x, sin_y, cos_y], axis=0)
    return enc, (freq, sin_x, cos_x, sin_y, cos_y)


def _posenc_vjp(denc, L, vjp_state):
    """Analytic posenc VJP: dcoord = denc_xy + sum_k f_k * (cos*w (.) dsin
    - sin*w (.) dcos) — the sin/cos tiles already carry the c2f weight."""
    dx = denc[0:1, :]
    dy = denc[1:2, :]
    if L:
        freq, sin_x, cos_x, sin_y, cos_y = vjp_state
        dsin_x = denc[8 : 8 + L, :]
        dcos_x = denc[8 + L : 8 + 2 * L, :]
        dsin_y = denc[8 + 2 * L : 8 + 3 * L, :]
        dcos_y = denc[8 + 3 * L : 8 + 4 * L, :]
        dx = dx + jnp.sum(freq * (cos_x * dsin_x - sin_x * dcos_x), axis=0, keepdims=True)
        dy = dy + jnp.sum(freq * (cos_y * dsin_y - sin_y * dcos_y), axis=0, keepdims=True)
    return dx, dy


def _stack_fwd(enc, wt_refs, b_refs, n_layers, cdtype):
    """cf dense-stack forward: h_{l+1} = relu(W^T @ h_l + b); sigmoid out.
    Returns the activation list (enc .. rgb)."""
    acts = [enc.astype(cdtype)]
    for li in range(n_layers):
        z = (
            mxu_dot(wt_refs[li][:], acts[li], (((1,), (0,)), ((), ())))
            + b_refs[li][:]
        )
        if li != n_layers - 1:
            acts.append(jax.nn.relu(z).astype(cdtype))
        else:
            acts.append(jax.nn.sigmoid(z))  # f32 rgb [3, SUB]
    return acts


def _stack_bwd(d, acts, w_refs, acc_dw, acc_db, n_layers, cdtype):
    """cf dense-stack backward: dW = dz @ h^T (contract lanes, K=SUB — ideal
    MXU shape); dx = W @ dz; relu mask from the saved activations. Returns
    denc (the cotangent w.r.t. the encoding)."""
    for li in range(n_layers - 1, -1, -1):
        a = acts[li]
        acc_dw[li][:] += mxu_dot(d, a, (((1,), (1,)), ((), ())))
        acc_db[li][:] += jnp.sum(d.astype(jnp.float32), axis=1, keepdims=True)
        da = mxu_dot(w_refs[li][:], d, (((1,), (0,)), ((), ())))
        if li > 0:
            d = (da * (acts[li].astype(jnp.float32) > 0.0)).astype(cdtype)
        else:
            return da  # denc [enc_rows, SUB]
    return None


def _stack_fwd_multi(encs, wt_refs, b_refs, n_layers, cdtype):
    """Multi-stream cf forward: per LAYER, all streams' matmuls issue
    back-to-back before any stream's relu/sigmoid — the explicit
    interleaving lets stream s+1's MXU dot run under stream s's VPU
    elementwise phase (the round-3/4 streams knob relied on Mosaic finding
    this overlap across whole-chain program order, and measured flat).
    Per-stream arithmetic is identical to _stack_fwd — only instruction
    order changes. Returns acts[layer][stream]."""
    hs = [e.astype(cdtype) for e in encs]
    acts = [hs]
    for li in range(n_layers):
        zs = [
            mxu_dot(wt_refs[li][:], h, (((1,), (0,)), ((), ()))) + b_refs[li][:]
            for h in hs
        ]
        if li != n_layers - 1:
            hs = [jax.nn.relu(z).astype(cdtype) for z in zs]
        else:
            hs = [jax.nn.sigmoid(z) for z in zs]  # f32 rgb [3, W]
        acts.append(hs)
    return acts


def _stack_bwd_multi(ds, acts, w_refs, acc_dw, acc_db, n_layers, cdtype):
    """Multi-stream cf backward, layer-phased like _stack_fwd_multi. The
    per-accumulator add order (stream 0 then 1 ...) matches the sequential
    stream loop exactly, so acc_dw/acc_db stay bit-identical. Returns
    dencs (one cotangent per stream)."""
    for li in range(n_layers - 1, -1, -1):
        a_s = acts[li]
        for d, a in zip(ds, a_s):
            acc_dw[li][:] += mxu_dot(d, a, (((1,), (1,)), ((), ())))
            acc_db[li][:] += jnp.sum(d.astype(jnp.float32), axis=1, keepdims=True)
        das = [mxu_dot(w_refs[li][:], d, (((1,), (0,)), ((), ()))) for d in ds]
        if li > 0:
            ds = [(da * (a.astype(jnp.float32) > 0.0)).astype(cdtype) for da, a in zip(das, a_s)]
        else:
            return das
    return None


def _kernel(n_layers, L, n_streams, cdtype, scalars_ref, coords_ref, cw_ref, tgt_ref, msk_ref, *refs):
    """One grid step: posenc -> MLP fwd -> loss partials -> full bwd, cf,
    over `n_streams` independent SUB-lane column streams (see NSTREAMS).

    scalars_ref (SMEM [2]): [0] = d_total/d_rgb scale (2 * C / (sum(m)*3)),
    [1] = loss-partial scale (1 / (sum(m)*3)).
    cw_ref (VMEM [max(L,1), 1]): c2f band weights (ones when c2f is off).
    """
    wt_refs = refs[:n_layers]  # W^T [out, in] (forward)
    w_refs = refs[n_layers : 2 * n_layers]  # W [in, out] (backward dx)
    b_refs = refs[2 * n_layers : 3 * n_layers]  # [out, 1]
    rgb_ref = refs[3 * n_layers]  # [3, SUB]
    dcoords_ref = refs[3 * n_layers + 1]  # [2, SUB]
    sq_ref = refs[3 * n_layers + 2]  # [1, SUB] raw per-point sq error
    loss_ref = refs[3 * n_layers + 3]  # [1, 1]
    out_dw = refs[3 * n_layers + 4 : 4 * n_layers + 4]  # [out, in]
    out_db = refs[4 * n_layers + 4 : 5 * n_layers + 4]  # [out, 1]
    acc_dw = refs[5 * n_layers + 4 : 6 * n_layers + 4]
    acc_db = refs[6 * n_layers + 4 : 7 * n_layers + 4]
    loss_acc = refs[7 * n_layers + 4]  # SMEM [1]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for li in range(n_layers):
            acc_dw[li][:] = jnp.zeros_like(acc_dw[li])
            acc_db[li][:] = jnp.zeros_like(acc_db[li])
        loss_acc[0] = 0.0

    dscale = scalars_ref[0]
    lscale = scalars_ref[1]

    W = coords_ref.shape[-1] // n_streams
    sls = [slice(s * W, (s + 1) * W) for s in range(n_streams)]
    pes = [_posenc_fwd(coords_ref[0:1, sl], coords_ref[1:2, sl], L, cw_ref) for sl in sls]
    acts = _stack_fwd_multi([enc for enc, _ in pes], wt_refs, b_refs, n_layers, cdtype)

    # ---- loss partials + output cotangent (per stream)
    ds = []
    for s, sl in enumerate(sls):
        rgb = acts[n_layers][s]
        rgb_ref[:, sl] = rgb
        msk = msk_ref[:, sl]
        diff = rgb - tgt_ref[:, sl]
        sq_ref[:, sl] = jnp.sum(diff * diff, axis=0, keepdims=True)
        diff_m = diff * msk
        loss_acc[0] += jnp.sum(diff_m * diff_m) * lscale
        d_out = dscale * diff_m * msk
        ds.append((d_out * rgb * (1.0 - rgb)).astype(cdtype))  # chain through sigmoid

    dencs = _stack_bwd_multi(ds, acts, w_refs, acc_dw, acc_db, n_layers, cdtype)
    for s, sl in enumerate(sls):
        dx, dy = _posenc_vjp(dencs[s], L, pes[s][1])
        dcoords_ref[:, sl] = jnp.concatenate([dx, dy], axis=0)

    @pl.when(step == pl.num_programs(0) - 1)
    def _writeout():
        for li in range(n_layers):
            out_dw[li][:] = acc_dw[li][:]
            out_db[li][:] = acc_db[li][:]
        loss_ref[:] = jnp.full((1, 1), loss_acc[0], dtype=jnp.float32)


def _kernel_warp(n_layers, L, n_streams, cdtype, scalars_ref, grid_ref, hrows_ref, cw_ref, tgt_ref, msk_ref, *refs):
    """v5 grid step: in-kernel homography warp + posenc + MLP fwd + loss +
    full bwd INCLUDING the warp VJP (dH accumulated per image).

    grid_ref [3, SUB]: rows (u, v, b) — the constant unwarped normalized
    grid and per-column image index (b = -1 on padding columns, zeroing the
    one-hot so padded columns cannot pollute dH).
    hrows_ref [16, PB]: column b = row-major flattened H[b] (9 rows used).
    Only the tiny sl(3)->SL(3) expm and its VJP stay in XLA
    (reference warp.py:70-81: x @ H^T then perspective divide +1e-8).
    """
    wt_refs = refs[:n_layers]
    w_refs = refs[n_layers : 2 * n_layers]
    b_refs = refs[2 * n_layers : 3 * n_layers]
    rgb_ref = refs[3 * n_layers]  # [3, SUB]
    dh_ref = refs[3 * n_layers + 1]  # [16, PB]
    sq_ref = refs[3 * n_layers + 2]  # [1, SUB] raw per-point sq error
    loss_ref = refs[3 * n_layers + 3]  # [1, 1]
    out_dw = refs[3 * n_layers + 4 : 4 * n_layers + 4]
    out_db = refs[4 * n_layers + 4 : 5 * n_layers + 4]
    acc_dw = refs[5 * n_layers + 4 : 6 * n_layers + 4]
    acc_db = refs[6 * n_layers + 4 : 7 * n_layers + 4]
    acc_dh = refs[7 * n_layers + 4]  # VMEM [16, PB]
    loss_acc = refs[7 * n_layers + 5]  # SMEM [1]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        for li in range(n_layers):
            acc_dw[li][:] = jnp.zeros_like(acc_dw[li])
            acc_db[li][:] = jnp.zeros_like(acc_db[li])
        acc_dh[:] = jnp.zeros_like(acc_dh)
        loss_acc[0] = 0.0

    dscale = scalars_ref[0]
    lscale = scalars_ref[1]

    W = grid_ref.shape[-1] // n_streams
    sls = [slice(s * W, (s + 1) * W) for s in range(n_streams)]
    PB = acc_dh.shape[1]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (PB, 1), 0).astype(jnp.float32)

    # ---- in-kernel warp per stream: one-hot the image index, gather H
    # columns, apply (the one-hot dots issue back-to-back on the MXU)
    warps = []
    for sl in sls:
        u = grid_ref[0:1, sl]  # [1, SUB]
        v = grid_ref[1:2, sl]
        bidx = grid_ref[2:3, sl]
        bo = (bidx == iota_b).astype(jnp.float32)  # [PB, SUB]
        hc = mxu_dot(hrows_ref[:], bo, (((1,), (0,)), ((), ())))  # [16, SUB]; rows 0-8 = per-column H entries
        rden = 1.0 / (hc[8:9, :] * 1.0 + hc[6:7, :] * u + hc[7:8, :] * v + np.float32(1e-8))
        x = (hc[0:1, :] * u + hc[1:2, :] * v + hc[2:3, :]) * rden
        y = (hc[3:4, :] * u + hc[4:5, :] * v + hc[5:6, :]) * rden
        warps.append((u, v, bo, rden, x, y))

    pes = [_posenc_fwd(x, y, L, cw_ref) for (_, _, _, _, x, y) in warps]
    acts = _stack_fwd_multi([enc for enc, _ in pes], wt_refs, b_refs, n_layers, cdtype)

    ds = []
    for s, sl in enumerate(sls):
        rgb = acts[n_layers][s]
        rgb_ref[:, sl] = rgb
        msk = msk_ref[:, sl]
        diff = rgb - tgt_ref[:, sl]
        sq_ref[:, sl] = jnp.sum(diff * diff, axis=0, keepdims=True)
        diff_m = diff * msk
        loss_acc[0] += jnp.sum(diff_m * diff_m) * lscale
        d_out = dscale * diff_m * msk
        ds.append((d_out * rgb * (1.0 - rgb)).astype(cdtype))

    dencs = _stack_bwd_multi(ds, acts, w_refs, acc_dw, acc_db, n_layers, cdtype)

    for s, (u, v, bo, rden, x, y) in enumerate(warps):
        dx, dy = _posenc_vjp(dencs[s], L, pes[s][1])
        # ---- warp VJP: x = xh * rden, y = yh * rden, rden = 1/(wden + eps)
        # => dxh = dx*rden, dwden = -(dx*x + dy*y)*rden; dH rows via segment-
        # sum over the one-hot (a [16, SUB] x [SUB, PB] MXU contraction)
        dxh = dx * rden
        dyh = dy * rden
        dwden = -(dx * x + dy * y) * rden
        zeros7 = jnp.zeros((7, u.shape[-1]), dtype=jnp.float32)
        drows = jnp.concatenate(
            [dxh * u, dxh * v, dxh, dyh * u, dyh * v, dyh, dwden * u, dwden * v, dwden, zeros7],
            axis=0,
        )  # [16, SUB]
        acc_dh[:] += mxu_dot(drows, bo, (((1,), (1,)), ((), ())))  # [16, PB]

    @pl.when(step == pl.num_programs(0) - 1)
    def _writeout():
        for li in range(n_layers):
            out_dw[li][:] = acc_dw[li][:]
            out_db[li][:] = acc_db[li][:]
        dh_ref[:] = acc_dh[:]
        loss_ref[:] = jnp.full((1, 1), loss_acc[0], dtype=jnp.float32)


def _expand_w1(w1: jax.Array, L: int) -> jax.Array:
    """[2+4L, out] reference-ordered first-layer weights -> the kernel's
    8-row-aligned encoding layout [8+4L, out] (zero rows 2-7)."""
    if not L:
        pad = jnp.zeros((6, w1.shape[1]), dtype=w1.dtype)
        return jnp.concatenate([w1, pad], axis=0)
    return jnp.concatenate(
        [w1[:2], jnp.zeros((6, w1.shape[1]), dtype=w1.dtype), w1[2:]], axis=0
    )


def fused_train_kernel(params, coords_cf, cw, targets_cf, masks_cf, g_loss_scale, inv_sum3, arch_cfg):
    """Run the fused posenc+fwd+loss+bwd kernel, channels-first.

    Args:
      params: MLP pytree (f32 master weights, w [in, out]).
      coords_cf: [2, N] warped coordinates (N divisible by 8; padded here to
        a SUB multiple if needed).
      cw: [L] c2f band weights (traced function of progress), or None when
        posenc/c2f are off.
      targets_cf: [3, N] flat target rgb.
      masks_cf: [1, N] flat binary mask (ones when masks are off).
      g_loss_scale: scalar — d total_loss / d rgb_loss (analytic cotangent).
      inv_sum3: scalar — 1 / (sum(mask) * 3) (reference masked-MSE
        normalization, model/planar.py:388-390).
      arch_cfg: NeuralImageConfig (static).

    Returns:
      (rgb_cf [3, N], rgb_loss scalar, dparams pytree, dcoords_cf [2, N],
       sq_cf [1, N] — raw per-point squared error, for the implicit dedup
       path's segment sums).
    """
    dims = arch_cfg.layer_dims
    n_layers = len(dims)
    L = int(arch_cfg.posenc_L or 0)
    cdtype = jnp.dtype(arch_cfg.compute_dtype)
    N = coords_cf.shape[1]
    ns = _n_streams(arch_cfg)
    subt = SUB * ns  # columns per grid step (ns independent chains)
    n_padded = -(-max(N, subt) // subt) * subt
    grid = n_padded // subt
    out_dim = dims[-1][1]

    def pad_cols(a):
        if a.shape[1] == n_padded:
            return a
        return jnp.pad(a, ((0, 0), (0, n_padded - a.shape[1])))

    coords_p = pad_cols(coords_cf)
    targets_p = pad_cols(targets_cf)
    masks_p = pad_cols(masks_cf)  # zero mask on padding -> no loss/grad pollution

    ws = [params["mlp"][i]["w"] for i in range(n_layers)]
    ws[0] = _expand_w1(ws[0], L)
    enc_rows = _enc_rows(L)
    wts = [w.T.astype(cdtype) for w in ws]  # [out, in] forward
    ws = [w.astype(cdtype) for w in ws]  # [in, out] backward
    biases = [params["mlp"][i]["b"].reshape(-1, 1) for i in range(n_layers)]
    scalars = jnp.stack([2.0 * g_loss_scale * inv_sum3, inv_sum3]).astype(jnp.float32)
    cw_col = (
        cw.reshape(-1, 1).astype(jnp.float32)
        if cw is not None
        else jnp.ones((max(L, 1), 1), dtype=jnp.float32)
    )

    kernel = functools.partial(_kernel, n_layers, L, ns, cdtype)
    out_shapes = (
        [
            jax.ShapeDtypeStruct((out_dim, n_padded), jnp.float32),  # rgb
            jax.ShapeDtypeStruct((2, n_padded), jnp.float32),  # dcoords
            jax.ShapeDtypeStruct((1, n_padded), jnp.float32),  # sq
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # rgb_loss
        ]
        + [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in wts]  # dW [out,in]
        + [jax.ShapeDtypeStruct((b.shape[0], 1), jnp.float32) for b in biases]
    )
    out_specs = (
        [
            pl.BlockSpec((out_dim, subt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, subt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for wt in wts]
        + [pl.BlockSpec((b.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.VMEM) for b in biases]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [2]
            pl.BlockSpec((2, subt), lambda i: (0, i), memory_space=pltpu.VMEM),  # coords
            pl.BlockSpec((max(L, 1), 1), lambda i: (0, 0), memory_space=pltpu.VMEM),  # c2f w
            pl.BlockSpec((out_dim, subt), lambda i: (0, i), memory_space=pltpu.VMEM),  # targets
            pl.BlockSpec((1, subt), lambda i: (0, i), memory_space=pltpu.VMEM),  # masks
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3 * n_layers)],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM(wt.shape, jnp.float32) for wt in wts]
            + [pltpu.VMEM((b.shape[0], 1), jnp.float32) for b in biases]
            + [pltpu.SMEM((1,), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(scalars, coords_p, cw_col, targets_p, masks_p, *wts, *ws, *biases)

    rgb_cf = outs[0][:, :N]
    dcoords_cf = outs[1][:, :N]
    sq_cf = outs[2][:, :N]
    rgb_loss = outs[3][0, 0]
    dws = outs[4 : 4 + n_layers]
    dbs = [b.reshape(-1) for b in outs[4 + n_layers :]]
    # kernel dW is [out, in] in the expanded-enc layout; back to params layout
    dw1 = dws[0].T  # [enc_rows, out]
    dw1 = jnp.concatenate([dw1[:2], dw1[8:]], axis=0) if L else dw1[: dims[0][0]]
    dparams = {
        "mlp": [{"w": dw1, "b": dbs[0]}]
        + [{"w": dws[i].T, "b": dbs[i]} for i in range(1, n_layers)]
    }
    return rgb_cf, rgb_loss, dparams, dcoords_cf, sq_cf


PB = 8  # padded image-index axis of the v5 kernel (B <= 8 images)


def fused_cols(N: int, arch_cfg=None) -> int:
    """Padded column count of the fused kernels' flat streams: N rounded up
    to the grid tile (SUB * n_streams). Setup code uses this to pre-pad the
    CONSTANT inputs (targets, masks, v5 grid) once — XLA does not hoist the
    per-step transpose/tile/pad of loop-invariant operands out of the scan
    (measured ~19 us/step on canonical, round-4 trace)."""
    ns = _n_streams(arch_cfg)
    subt = SUB * ns
    return -(-max(N, subt) // subt) * subt


def build_grid_b(grid: jax.Array, B: int, n_padded: int | None = None) -> jax.Array:
    """The v5 kernel's constant (u, v, b) stream: [3, B*HW] from the
    unwarped normalized [HW, 2] grid, optionally pre-padded to `n_padded`
    columns with b = -1 (no one-hot match -> padding cannot touch dH; the
    per-step zero mask already kept it inert, this keeps the docstring's
    contract explicit)."""
    uv = grid.T  # [2, HW]
    gb = jnp.concatenate(
        [
            jnp.tile(uv, (1, B)),
            jnp.repeat(jnp.arange(B, dtype=jnp.float32), uv.shape[1])[None, :],
        ],
        axis=0,
    )
    if n_padded is not None and n_padded != gb.shape[1]:
        pad = jnp.zeros((3, n_padded - gb.shape[1]), dtype=jnp.float32)
        gb = jnp.concatenate([gb, pad.at[2].set(-1.0)], axis=1)
    return gb


def fused_train_kernel_warp(params, grid_b_cf, H, cw, targets_cf, masks_cf, g_loss_scale, inv_sum3, arch_cfg):
    """v5: the fused kernel with the homography warp (and its VJP) in-kernel.

    Args:
      params: MLP pytree (f32 master weights, w [in, out]).
      grid_b_cf: [3, N] constant stream — rows (u, v, image index b). The
        unwarped normalized grid repeats per image (column order b*HW + i).
      H: [B, 3, 3] homographies (sl3_to_SL3 of the warp params — the tiny
        expm and its VJP stay in XLA).
      cw / targets_cf / masks_cf / g_loss_scale / inv_sum3 / arch_cfg: as in
        `fused_train_kernel`.

    Returns:
      (rgb_cf [3, N], rgb_loss scalar, dparams pytree, dH [B, 3, 3],
       sq_cf [1, N] — raw per-point squared error).
    """
    dims = arch_cfg.layer_dims
    n_layers = len(dims)
    L = int(arch_cfg.posenc_L or 0)
    cdtype = jnp.dtype(arch_cfg.compute_dtype)
    B = H.shape[0]
    assert B <= PB, f"v5 kernel supports at most {PB} images (got {B})"
    N = grid_b_cf.shape[1]
    ns = _n_streams(arch_cfg)
    subt = SUB * ns  # columns per grid step (ns independent chains)
    n_padded = -(-max(N, subt) // subt) * subt
    grid = n_padded // subt
    out_dim = dims[-1][1]

    def pad_cols(a, value=0.0):
        if a.shape[1] == n_padded:
            return a
        return jnp.pad(a, ((0, 0), (0, n_padded - a.shape[1])), constant_values=value)

    # padding columns get b = -1: the in-kernel one-hot is all-zero there, so
    # hc = 0, rden = 1/eps, coords = 0 — and dH picks up nothing
    grid_p = jnp.concatenate(
        [pad_cols(grid_b_cf[:2]), pad_cols(grid_b_cf[2:3], value=-1.0)], axis=0
    )
    targets_p = pad_cols(targets_cf)
    masks_p = pad_cols(masks_cf)  # zero mask on padding -> no loss/grad pollution

    hrows = jnp.zeros((16, PB), dtype=jnp.float32)
    hrows = hrows.at[:9, :B].set(H.reshape(B, 9).T)

    ws = [params["mlp"][i]["w"] for i in range(n_layers)]
    ws[0] = _expand_w1(ws[0], L)
    wts = [w.T.astype(cdtype) for w in ws]
    ws = [w.astype(cdtype) for w in ws]
    biases = [params["mlp"][i]["b"].reshape(-1, 1) for i in range(n_layers)]
    scalars = jnp.stack([2.0 * g_loss_scale * inv_sum3, inv_sum3]).astype(jnp.float32)
    cw_col = (
        cw.reshape(-1, 1).astype(jnp.float32)
        if cw is not None
        else jnp.ones((max(L, 1), 1), dtype=jnp.float32)
    )

    kernel = functools.partial(_kernel_warp, n_layers, L, ns, cdtype)
    out_shapes = (
        [
            jax.ShapeDtypeStruct((out_dim, n_padded), jnp.float32),  # rgb
            jax.ShapeDtypeStruct((16, PB), jnp.float32),  # dH rows
            jax.ShapeDtypeStruct((1, n_padded), jnp.float32),  # sq
            jax.ShapeDtypeStruct((1, 1), jnp.float32),  # rgb_loss
        ]
        + [jax.ShapeDtypeStruct(wt.shape, jnp.float32) for wt in wts]
        + [jax.ShapeDtypeStruct((b.shape[0], 1), jnp.float32) for b in biases]
    )
    out_specs = (
        [
            pl.BlockSpec((out_dim, subt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, PB), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, subt), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        + [pl.BlockSpec(wt.shape, lambda i: (0, 0), memory_space=pltpu.VMEM) for wt in wts]
        + [pl.BlockSpec((b.shape[0], 1), lambda i: (0, 0), memory_space=pltpu.VMEM) for b in biases]
    )
    outs = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars [2]
            pl.BlockSpec((3, subt), lambda i: (0, i), memory_space=pltpu.VMEM),  # (u, v, b)
            pl.BlockSpec((16, PB), lambda i: (0, 0), memory_space=pltpu.VMEM),  # H rows
            pl.BlockSpec((max(L, 1), 1), lambda i: (0, 0), memory_space=pltpu.VMEM),  # c2f w
            pl.BlockSpec((out_dim, subt), lambda i: (0, i), memory_space=pltpu.VMEM),  # targets
            pl.BlockSpec((1, subt), lambda i: (0, i), memory_space=pltpu.VMEM),  # masks
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(3 * n_layers)],
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(
            [pltpu.VMEM(wt.shape, jnp.float32) for wt in wts]
            + [pltpu.VMEM((b.shape[0], 1), jnp.float32) for b in biases]
            + [pltpu.VMEM((16, PB), jnp.float32)]
            + [pltpu.SMEM((1,), jnp.float32)]
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_interpret(),
    )(scalars, grid_p, hrows, cw_col, targets_p, masks_p, *wts, *ws, *biases)

    rgb_cf = outs[0][:, :N]
    dH = outs[1][:9, :B].T.reshape(B, 3, 3)
    sq_cf = outs[2][:, :N]
    rgb_loss = outs[3][0, 0]
    dws = outs[4 : 4 + n_layers]
    dbs = [b.reshape(-1) for b in outs[4 + n_layers :]]
    dw1 = dws[0].T
    dw1 = jnp.concatenate([dw1[:2], dw1[8:]], axis=0) if L else dw1[: dims[0][0]]
    dparams = {
        "mlp": [{"w": dw1, "b": dbs[0]}]
        + [{"w": dws[i].T, "b": dbs[i]} for i in range(1, n_layers)]
    }
    return rgb_cf, rgb_loss, dparams, dH, sq_cf
