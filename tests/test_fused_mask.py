"""Fused implicit-mask pipeline: factoring identity + gradient/loss
equivalence with the autodiff path (interpret mode on CPU; compiles on TPU).

Reference semantics under test: the Ha-NeRF mask head + its loss coupling
(reference model/planar.py:338-352, 355-380, 475-517).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marf_tpu.engine.step import init_train_state, make_optimizer, make_train_chunk, make_train_step
from marf_tpu.models.implicit_mask import apply_implicit_mask_cf, mask_head_inputs_cf
from marf_tpu.models.neural_image import NeuralImageConfig
from marf_tpu.models.planar import PlanarConfig, init_graph_params, use_fused_implicit, use_fused_step
from marf_tpu.ops.grid import normalized_pixel_grid
from marf_tpu.ops.pallas.fused_mask import (
    build_mask_x,
    factor_mask_inputs,
    fused_implicit_train_kernel,
    fused_mask_backward_g,
    mask_w_stack,
    mask_w_stack_batched,
    unfactor_mask_grads,
)
from tests.test_models import fake_data

OPTIM = {"lr": 1e-3, "lr_warp": 1e-3, "lr_mask": 1e-3, "algo": "Adam"}


def cfg_pair(**kw):
    base = dict(
        H=32, W=64, patch_H=16, patch_W=32, batch_size=3, max_iter=100,
        use_implicit_mask=True, use_masks=False, N_vocab=8,
        arch=NeuralImageConfig(layers=(None, 64, 64, 3), posenc_L=4, barf_c2f=(0, 0.4)),
    )
    base.update(kw)
    off = PlanarConfig(**base, fused_step="off")
    on = PlanarConfig(**base, fused_step="on")
    return off, on


def implicit_data(cfg, rng):
    """fake_data with a saturated-pixel mix so the {0,1} quantization hits
    all 8 RGB index combinations."""
    data = fake_data(cfg, rng)
    rgb = np.asarray(data["rgb"])
    rgb = np.where(rng.rand(*rgb.shape) > 0.5, 1.0, rgb).astype(np.float32)
    return dict(data, rgb=jnp.asarray(rgb))


def run_steps(cfg, data, n=3):
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(OPTIM, cfg.max_iter)
    state = init_train_state(params, tx)
    chunk = make_train_chunk(make_train_step(cfg, tx), n, donate=False)
    return chunk(state, data)


def test_gating():
    off, on = cfg_pair()
    assert not use_fused_implicit(off)
    assert use_fused_implicit(on)
    assert not use_fused_step(on)  # the rgb-only fused branch stays off
    # fix-modes that break the factoring keep the autodiff path
    _, on_q = cfg_pair(mask_quantize_levels=256)
    assert not use_fused_implicit(on_q)
    _, on_v = cfg_pair(train_view_embedding=True)
    assert not use_fused_implicit(on_v)
    _, on_d = cfg_pair(differentiable_edges=True)
    assert not use_fused_implicit(on_d)


@pytest.mark.parametrize("single", [False, True])
def test_factoring_matches_dense(rng, single):
    """X/table factoring reproduces the dense mask-head forward exactly."""
    cfg, _ = cfg_pair(build_single_masks=single)
    data = implicit_data(cfg, rng)
    params = init_graph_params(jax.random.PRNGKey(1), cfg)
    grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)

    dense = mask_head_inputs_cf(params["view_embedding"], data["rgb"], grid)  # [B, 426, HW]
    uv, onehot, table = factor_mask_inputs(params["view_embedding"], data["rgb"], grid)
    X = build_mask_x(uv, onehot, single=single)

    if single:
        for b in range(cfg.batch_size):
            head = jax.tree.map(lambda a, b=b: a[b], params["implicit_mask"])
            m_dense = apply_implicit_mask_cf(head, dense[b])
            m_eff = apply_implicit_mask_cf({"mlp": mask_w_stack(head, table)}, X[b])
            np.testing.assert_allclose(np.asarray(m_eff), np.asarray(m_dense), rtol=1e-5, atol=1e-6)
    else:
        flat = dense.transpose(1, 0, 2).reshape(dense.shape[1], -1)
        m_dense = apply_implicit_mask_cf(params["implicit_mask"], flat)
        m_eff = apply_implicit_mask_cf({"mlp": mask_w_stack(params["implicit_mask"], table)}, X)
        np.testing.assert_allclose(np.asarray(m_eff), np.asarray(m_dense), rtol=1e-5, atol=1e-6)


def test_mask_backward_g_kernel_matches_autodiff(rng):
    """Kernel B (in-kernel cotangent g = (a*sq + b*esq + c)*m + k) equals
    autodiff of sum(g_explicit * m) through the effective stack."""
    cfg, _ = cfg_pair()
    data = implicit_data(cfg, rng)
    params = init_graph_params(jax.random.PRNGKey(2), cfg)
    grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
    uv, onehot, table = factor_mask_inputs(params["view_embedding"], data["rgb"], grid)
    X = build_mask_x(uv, onehot, single=False)
    stack = mask_w_stack(params["implicit_mask"], table)
    N = X.shape[1]
    sq = jnp.asarray(np.abs(rng.randn(1, N)).astype(np.float32))
    esq = jnp.asarray(np.abs(rng.randn(1, N)).astype(np.float32))
    a, b, c, k = 0.7, 0.3, -0.2, 0.05

    stacks = mask_w_stack_batched(params["implicit_mask"], table, 1)
    dstacks = fused_mask_backward_g(stacks, X, sq, esq, jnp.asarray([a, b, c, k], jnp.float32))
    dstack = [jax.tree.map(lambda x: x[0], layer) for layer in dstacks]

    def f(layers):
        m = apply_implicit_mask_cf({"mlp": layers}, X)
        g = (a * sq + b * esq + c) * m + k
        # the kernel treats g as a constant cotangent: detach its m
        return jnp.sum(jax.lax.stop_gradient(g) * m)

    dref = jax.grad(f)(stack)
    for li, (dk, dr) in enumerate(zip(dstack, dref)):
        np.testing.assert_allclose(
            np.asarray(dk["w"]), np.asarray(dr["w"]), rtol=1e-4, atol=1e-6, err_msg=f"layer {li} dW"
        )
        np.testing.assert_allclose(
            np.asarray(dk["b"]), np.asarray(dr["b"]), rtol=1e-4, atol=1e-6, err_msg=f"layer {li} db"
        )
    # unfactored dW1 has the reference [426, 256] layout
    dparams = unfactor_mask_grads(dstack, table)
    assert dparams["mlp"][0]["w"].shape == params["implicit_mask"]["mlp"][0]["w"].shape


def test_implicit_train_kernel_outputs(rng):
    """Kernel A: m/rgb/sq/sums match a plain-JAX recompute; the unnormalized
    dmlp/dcoords scale exactly by 1/(3*sum(m)) (dscale linearity)."""
    cfg, _ = cfg_pair()
    data = implicit_data(cfg, rng)
    params = init_graph_params(jax.random.PRNGKey(3), cfg)
    grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
    uv, onehot, table = factor_mask_inputs(params["view_embedding"], data["rgb"], grid)
    X = build_mask_x(uv, onehot, single=False)
    stacks = mask_w_stack_batched(params["implicit_mask"], table, 1)

    from marf_tpu.models.neural_image import apply_neural_image_cf
    from marf_tpu.ops.posenc import barf_c2f_weights
    from marf_tpu.ops.warp import warp_grid_cf_flat

    N = X.shape[1]
    coords = warp_grid_cf_flat(grid, params["warp"])
    progress = jnp.asarray(0.37, jnp.float32)
    cw = barf_c2f_weights(progress, tuple(cfg.arch.barf_c2f), cfg.arch.posenc_L)
    targets = data["rgb"].transpose(1, 0, 2, 3).reshape(3, N)
    g2C = 1.8

    rgb, m, sq, dcoords_u, msum, loss_u, dmlp_u = fused_implicit_train_kernel(
        params["neural_image"], stacks, coords, X, cw, targets, g2C, cfg.arch, 1
    )

    m_ref = apply_implicit_mask_cf({"mlp": mask_w_stack(params["implicit_mask"], table)}, X)
    rgb_ref = apply_neural_image_cf(params["neural_image"], coords, cfg.arch, progress)
    sq_ref = jnp.sum((rgb_ref - targets) ** 2, axis=0, keepdims=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(sq_ref), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(msum), float(jnp.sum(m_ref)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(loss_u), float(jnp.sum(m_ref**2 * sq_ref)), rtol=1e-4
    )

    # autodiff oracle for the normalized gradients
    inv_sum3 = 1.0 / (float(msum) * 3.0)

    def loss_fn(ni_params, warp):
        c = warp_grid_cf_flat(grid, warp)
        r = apply_neural_image_cf(ni_params, c, cfg.arch, progress)
        mm = jax.lax.stop_gradient(m_ref)
        return 0.5 * g2C * jnp.sum((mm * (r - targets)) ** 2) * inv_sum3

    dref_mlp, dref_warp = jax.grad(loss_fn, argnums=(0, 1))(params["neural_image"], params["warp"])
    scaled = jax.tree.map(lambda g: g * inv_sum3, dmlp_u)
    for li in range(len(cfg.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(scaled["mlp"][li]["w"]),
            np.asarray(dref_mlp["mlp"][li]["w"]),
            rtol=1e-3, atol=1e-6, err_msg=f"dW layer {li}",
        )
    _, warp_vjp = jax.vjp(lambda wp: warp_grid_cf_flat(grid, wp), params["warp"])
    dwarp = jax.tree.map(lambda g: g * inv_sum3, warp_vjp(dcoords_u)[0])
    np.testing.assert_allclose(np.asarray(dwarp), np.asarray(dref_warp), rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize(
    "single,use_edges",
    [(False, True), (False, False), (True, True)],
)
def test_fused_implicit_matches_autodiff(rng, single, use_edges):
    off, on = cfg_pair(build_single_masks=single, use_edges=use_edges, alpha_initial=0.3)
    data = implicit_data(off, rng)
    if not use_edges:
        data = dict(data, edges=None)
    s_off, m_off = run_steps(off, data)
    s_on, m_on = run_steps(on, data)
    for key in ("all", "loss_rgb", "loss_mask", "loss_render", "PSNR"):
        np.testing.assert_allclose(
            np.asarray(m_on[key]), np.asarray(m_off[key]), rtol=1e-5, atol=1e-7, err_msg=key
        )
    if use_edges:
        np.testing.assert_allclose(
            np.asarray(m_on["loss_edge"]), np.asarray(m_off["loss_edge"]), rtol=1e-5, atol=1e-7
        )
    np.testing.assert_allclose(
        np.asarray(s_on.params["warp"]), np.asarray(s_off.params["warp"]), rtol=1e-3, atol=1e-6
    )
    for li in range(len(off.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s_on.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s_off.params["neural_image"]["mlp"][li]["w"]),
            rtol=1e-3, atol=1e-6, err_msg=f"neural_image layer {li}",
        )
    for li in range(5):
        np.testing.assert_allclose(
            np.asarray(s_on.params["implicit_mask"]["mlp"][li]["w"]),
            np.asarray(s_off.params["implicit_mask"]["mlp"][li]["w"]),
            rtol=1e-3, atol=1e-6, err_msg=f"mask head layer {li}",
        )


@pytest.mark.parametrize("use_edges", [True, False])
def test_fused_implicit_dedup_matches_autodiff(rng, use_edges):
    """The slot0+extras dedup pipeline (mask kernels on unique (pixel,
    combo) columns, dense scatter/segment-sum mapping) equals the autodiff
    path exactly."""
    from marf_tpu.ops.pallas.fused_mask import slot_dedup_padded_inputs

    off, on = cfg_pair(use_edges=use_edges, alpha_initial=0.3)
    data = implicit_data(off, rng)
    if not use_edges:
        data = dict(data, edges=None)
    params = init_graph_params(jax.random.PRNGKey(0), off)
    grid = normalized_pixel_grid(off.grid_spec, crop=off.use_cropped_images)
    uv, onehot, table = factor_mask_inputs(params["view_embedding"], data["rgb"], grid)
    dd = slot_dedup_padded_inputs(np.asarray(uv), np.asarray(onehot), off.arch)
    N = off.batch_size * grid.shape[0]
    HW = grid.shape[0]
    E = dd["mask_ext_pix"].shape[0]
    assert HW + E < N  # must actually dedup
    assert E > 0  # the saturated mix must exercise extras
    assert int(dd["mask_cntall"].sum()) == N
    assert dd["mask_Xall"].shape[1] >= HW + E  # pre-padded to the kernel tile
    ddata = dict(
        data,
        mask_table=jnp.asarray(table),
        **{k: jnp.asarray(v) for k, v in dd.items()},
    )
    s_off, m_off = run_steps(off, data)
    s_on, m_on = run_steps(on, ddata)
    for key in ("all", "loss_rgb", "loss_mask", "loss_render", "PSNR"):
        np.testing.assert_allclose(
            np.asarray(m_on[key]), np.asarray(m_off[key]), rtol=1e-5, atol=1e-7, err_msg=key
        )
    if use_edges:
        np.testing.assert_allclose(
            np.asarray(m_on["loss_edge"]), np.asarray(m_off["loss_edge"]), rtol=1e-5, atol=1e-7
        )
    np.testing.assert_allclose(
        np.asarray(s_on.params["warp"]), np.asarray(s_off.params["warp"]), rtol=1e-3, atol=1e-6
    )
    for li in range(len(off.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s_on.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s_off.params["neural_image"]["mlp"][li]["w"]),
            rtol=1e-3, atol=1e-6, err_msg=f"neural_image layer {li}",
        )
    for li in range(5):
        # atol: the segment-sum groups additions differently from the
        # per-position autodiff sum; the reordering noise (~1e-7 rel on
        # grads) is amplified by Adam's g/sqrt(v) normalization on
        # near-zero entries over the 3 steps
        np.testing.assert_allclose(
            np.asarray(s_on.params["implicit_mask"]["mlp"][li]["w"]),
            np.asarray(s_off.params["implicit_mask"]["mlp"][li]["w"]),
            rtol=1e-3, atol=5e-4, err_msg=f"mask head layer {li}",
        )


def test_fused_implicit_mask_error_metric(rng):
    """use_masks + implicit: the Mask_Error metric matches the autodiff path."""
    off, on = cfg_pair(use_masks=True)
    data = implicit_data(off, rng)
    _, m_off = run_steps(off, data)
    _, m_on = run_steps(on, data)
    np.testing.assert_allclose(
        np.asarray(m_on["Mask_Error"]), np.asarray(m_off["Mask_Error"]), rtol=1e-5, atol=1e-7
    )


def test_fused_implicit_lazy_metrics_matches_eager(rng):
    """tpu.lazy_metrics on the implicit pipeline: chunk-final Mask_Error /
    Homography_Error identical to eager — Mask_Error is computed
    channels-first from the kernel's live m_flat (engine/step.py _mask_err)
    so this also proves that alias equals the [B,1,h,w]-layout mse —
    intermediate rows report 0, and the parameter trajectory is untouched."""
    _, eager = cfg_pair(use_masks=True, lazy_metrics="off")
    _, lazy = cfg_pair(use_masks=True, lazy_metrics="on")
    data = implicit_data(eager, rng)
    s_e, m_e = run_steps(eager, data, n=4)
    s_l, m_l = run_steps(lazy, data, n=4)
    for li in range(5):
        np.testing.assert_array_equal(
            np.asarray(s_l.params["implicit_mask"]["mlp"][li]["w"]),
            np.asarray(s_e.params["implicit_mask"]["mlp"][li]["w"]),
            err_msg=f"mask head layer {li}",
        )
    for key in ("all", "loss_rgb", "loss_mask", "PSNR", "Mask_Error", "Homography_Error"):
        np.testing.assert_allclose(
            np.asarray(m_l[key])[-1], np.asarray(m_e[key])[-1],
            rtol=1e-5, atol=1e-7, err_msg=key,
        )
    assert np.all(np.asarray(m_l["Mask_Error"])[:-1] == 0.0)
    assert np.all(np.asarray(m_e["Mask_Error"])[:-1] > 0.0)


def test_fused_implicit_precomputed_X(rng):
    """The engine-precomputed mask_X/mask_table path equals the inline one."""
    _, on = cfg_pair()
    data = implicit_data(on, rng)
    params = init_graph_params(jax.random.PRNGKey(0), on)
    grid = normalized_pixel_grid(on.grid_spec, crop=on.use_cropped_images)
    uv, onehot, table = factor_mask_inputs(params["view_embedding"], data["rgb"], grid)
    data_pre = dict(data, mask_X=build_mask_x(uv, onehot, single=False), mask_table=table)
    s_inline, m_inline = run_steps(on, data)
    s_pre, m_pre = run_steps(on, data_pre)
    np.testing.assert_allclose(np.asarray(m_pre["all"]), np.asarray(m_inline["all"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_pre.params["implicit_mask"]["mlp"][0]["w"]),
        np.asarray(s_inline.params["implicit_mask"]["mlp"][0]["w"]),
        rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("nstreams", [2, 3])
def test_fused_implicit_multi_stream(rng, monkeypatch, nstreams):
    """NSTREAMS>=2 in the implicit kernel A/B pair equals the autodiff path
    (streams only regroup the tile iteration; fused_step.NSTREAMS knob)."""
    from marf_tpu.ops.pallas import fused_mask as fm
    from marf_tpu.ops.pallas import fused_step as fs

    # all four kernels resolve streams through fused_step.NSTREAMS
    # (fused_step._n_streams) — one rebind reaches kernel A and B too
    monkeypatch.setattr(fs, "NSTREAMS", nstreams)
    monkeypatch.setattr(fs, "SUB", 256)
    monkeypatch.setattr(fm, "SUB", 256)
    off, on = cfg_pair(use_edges=True, alpha_initial=0.3, build_single_masks=True)
    data = implicit_data(off, rng)
    s_off, m_off = run_steps(off, data)
    s_on, m_on = run_steps(on, data)
    for key in ("all", "loss_rgb", "loss_mask", "loss_render", "PSNR"):
        np.testing.assert_allclose(
            np.asarray(m_on[key]), np.asarray(m_off[key]), rtol=1e-5, atol=1e-7, err_msg=key
        )
    for li in range(5):
        np.testing.assert_allclose(
            np.asarray(s_on.params["implicit_mask"]["mlp"][li]["w"]),
            np.asarray(s_off.params["implicit_mask"]["mlp"][li]["w"]),
            rtol=1e-3, atol=5e-4, err_msg=f"mask head layer {li}",
        )


def test_slot_dedup_builder_invariants(rng):
    """slot_dedup_inputs: every position (b, p) is covered by exactly one
    column (slot0 or one extra), counts are consistent, and each column's
    X matches the dense build for its (pixel, combo)."""
    from marf_tpu.ops.pallas.fused_mask import N_COMBOS, UV_DIM, slot_dedup_inputs

    B, HW = 4, 64
    uv = rng.randn(UV_DIM, HW).astype(np.float32)
    combo = rng.randint(0, N_COMBOS, size=(B, HW))
    onehot = np.eye(N_COMBOS, dtype=np.float32)[combo].transpose(0, 2, 1)  # [B, 8, HW]
    X_all, slot0map, ext_pix, extmap, cnt_all = slot_dedup_inputs(uv, onehot)
    E = ext_pix.shape[0]
    assert X_all.shape[1] == HW + E

    # exactly-once coverage: slot0map[b,p] + sum_j extmap[b,j]*[ext_pix[j]==p] == 1
    cover = slot0map.copy()
    for j in range(E):
        cover[:, ext_pix[j]] += extmap[:, j]
    np.testing.assert_array_equal(cover, np.ones((B, HW), np.float32))
    # counts consistent and positive for every kept column
    np.testing.assert_array_equal(
        cnt_all[0], np.concatenate([slot0map.sum(0), extmap.sum(0)])
    )
    assert (cnt_all[0, HW:] >= 1).all()  # extras only exist if some image uses them
    assert cnt_all.sum() == B * HW

    # column contents: slot0 column p is (uv[:,p], onehot of the majority
    # combo); each extra j is (uv[:,ext_pix[j]], onehot of its combo)
    counts = np.zeros((N_COMBOS, HW), np.int32)
    np.add.at(counts, (combo, np.arange(HW)[None].repeat(B, 0)), 1)
    slot0 = np.argmax(counts, axis=0)
    np.testing.assert_allclose(X_all[:UV_DIM, :HW], uv)
    np.testing.assert_array_equal(
        np.argmax(X_all[UV_DIM : UV_DIM + N_COMBOS, :HW], axis=0), slot0
    )
    np.testing.assert_allclose(X_all[:UV_DIM, HW:], uv[:, ext_pix])
    ext_combo = np.argmax(X_all[UV_DIM : UV_DIM + N_COMBOS, HW:], axis=0)
    for j in range(E):
        assert counts[ext_combo[j], ext_pix[j]] > 0
        assert ext_combo[j] != slot0[ext_pix[j]]


def test_slot_dedup_sharded_builder_invariants(rng):
    """slot_dedup_sharded_inputs: the per-device extras structures cover the
    same (position, column) pairs as slot_dedup_inputs' extmap, each assigned
    to its owning device, offsets local, padding zero-valid; the padded
    column axis divides the mesh and carries zero counts."""
    from marf_tpu.ops.pallas.fused_mask import (
        N_COMBOS,
        UV_DIM,
        slot_dedup_inputs,
        slot_dedup_sharded_inputs,
    )

    B, HW, D = 4, 64, 8
    N = B * HW
    Nl = N // D
    uv = rng.randn(UV_DIM, HW).astype(np.float32)
    combo = rng.randint(0, N_COMBOS, size=(B, HW))
    onehot = np.eye(N_COMBOS, dtype=np.float32)[combo].transpose(0, 2, 1)
    X_all, slot0map, ext_pix, extmap, cnt_all = slot_dedup_inputs(uv, onehot)
    K = X_all.shape[1]
    X_pad, slot0map_flat, cnt_pad, ext_off, ext_col, ext_val = slot_dedup_sharded_inputs(
        uv, onehot, D
    )

    assert X_pad.shape[1] % D == 0 and X_pad.shape[1] >= K
    np.testing.assert_allclose(X_pad[:, :K], X_all)
    assert (X_pad[:, K:] == 0).all()
    np.testing.assert_allclose(cnt_pad[0, :K], cnt_all[0])
    assert (cnt_pad[0, K:] == 0).all()
    np.testing.assert_allclose(slot0map_flat, slot0map.reshape(1, N))

    # reconstruct the extras (position, column) pair set and compare
    pairs = set()
    for d in range(D):
        for e in range(ext_off.shape[1]):
            if ext_val[d, e]:
                n = d * Nl + ext_off[d, e]
                assert 0 <= ext_off[d, e] < Nl  # offsets local to the device
                pairs.add((int(n), int(ext_col[d, e])))
            else:
                assert ext_off[d, e] == 0 and ext_col[d, e] == 0
    expect = set()
    bb, jj = np.nonzero(extmap)
    for b, j in zip(bb, jj):
        expect.add((int(b * HW + ext_pix[j]), int(HW + j)))
    assert pairs == expect
    assert len(pairs) == int(extmap.sum())


def test_fused_implicit_bfloat16(rng):
    """bfloat16 compute_dtype through the implicit two-kernel pipeline
    (shared head, dedup auto-on off-TPU): finite training and loose f32
    tracking — smoke/sanity, not equality (see test_fused_step_bfloat16)."""
    arch16 = NeuralImageConfig(
        layers=(None, 64, 64, 3), posenc_L=4, barf_c2f=(0, 0.4), compute_dtype="bfloat16"
    )
    _, on16 = cfg_pair(arch=arch16, use_edges=True, alpha_initial=0.3)
    _, on32 = cfg_pair(use_edges=True, alpha_initial=0.3)
    data = implicit_data(on32, rng)
    s16, m16 = run_steps(on16, data, n=5)
    _, m32 = run_steps(on32, data, n=5)
    assert np.asarray(m16["finite"]).all()
    np.testing.assert_allclose(
        np.asarray(m16["all"])[0], np.asarray(m32["all"])[0], rtol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(m16["all"])[-1], np.asarray(m32["all"])[-1], rtol=5e-2
    )
    assert abs(float(np.asarray(m16["PSNR"])[-1]) - float(np.asarray(m32["PSNR"])[-1])) < 1.0
    assert np.isfinite(np.asarray(s16.params["implicit_mask"]["mlp"][0]["w"])).all()


def test_fused_implicit_staged_constant_streams(rng):
    """engine/step.py stage_fused_constant_streams on the implicit pipeline:
    targets_cf_p + grid_b_p staged (masks are the dynamic predicted m — no
    masks_cf_p) and the trajectory is identical to the in-graph fallback."""
    from marf_tpu.engine.step import stage_fused_constant_streams

    _, on = cfg_pair(use_edges=True, alpha_initial=0.3)
    data = implicit_data(on, rng)
    staged = stage_fused_constant_streams(on, data)
    assert set(staged) == {"targets_cf_p", "grid_b_p"}
    s_fb, m_fb = run_steps(on, data)
    s_st, m_st = run_steps(on, dict(data, **staged))
    for key in ("all", "loss_rgb", "loss_mask", "loss_edge", "PSNR"):
        np.testing.assert_array_equal(
            np.asarray(m_st[key]), np.asarray(m_fb[key]), err_msg=key
        )
    np.testing.assert_array_equal(
        np.asarray(s_st.params["warp"]), np.asarray(s_fb.params["warp"])
    )
    np.testing.assert_array_equal(
        np.asarray(s_st.params["implicit_mask"]["mlp"][0]["w"]),
        np.asarray(s_fb.params["implicit_mask"]["mlp"][0]["w"]),
    )
