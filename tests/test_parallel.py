"""Multi-chip sharding tests on the 8-virtual-device CPU mesh: the sharded
train step must be numerically equivalent to the single-device step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marf_tpu.engine.step import init_train_state, make_optimizer, make_train_chunk, make_train_step
from marf_tpu.models.neural_image import NeuralImageConfig
from marf_tpu.models.planar import PlanarConfig, init_graph_params
from marf_tpu.parallel.mesh import choose_pixel_axis, make_mesh, shard_planar_data
from marf_tpu.parallel.sharded import make_sharded_train_setup
from tests.test_models import fake_data

OPTIM = {"lr": 1e-3, "lr_warp": 1e-3, "lr_mask": 1e-3, "algo": "Adam"}


def mesh_cfg(**kw):
    # patch_H=24 -> h % 8 == 0: shard the height axis on an 8-device mesh
    defaults = dict(
        H=48, W=64, patch_H=24, patch_W=32, batch_size=3, max_iter=100,
        arch=NeuralImageConfig(layers=(None, 32, 32, 3), barf_c2f=(0, 0.4)),
    )
    defaults.update(kw)
    return PlanarConfig(**defaults)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_choose_pixel_axis():
    assert choose_pixel_axis(24, 32, 8) == 2
    assert choose_pixel_axis(30, 32, 8) == 3
    assert choose_pixel_axis(30, 31, 8) is None
    assert choose_pixel_axis(24, 32, 1) is None


def test_sharded_data_placement(rng):
    cfg = mesh_cfg()
    mesh = make_mesh(8)
    data = shard_planar_data(fake_data(cfg, rng), mesh, axis=2)
    rgb_sharding = data["rgb"].sharding
    assert not rgb_sharding.is_fully_replicated
    assert data["gt_hom"].sharding.is_fully_replicated


@pytest.mark.parametrize("use_implicit_mask", [False, True])
def test_sharded_step_matches_single_device(rng, use_implicit_mask):
    cfg = mesh_cfg(use_implicit_mask=use_implicit_mask, N_vocab=16)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    raw = fake_data(cfg, rng)
    tx = make_optimizer(OPTIM, cfg.max_iter)

    # single device
    state1 = init_train_state(params, tx)
    step_fn = make_train_step(cfg, tx)
    chunk1 = make_train_chunk(step_fn, 3, donate=False)
    s1, m1 = chunk1(state1, raw)

    # 8-device mesh, pixel-sharded
    mesh = make_mesh(8)
    state8, data8, chunk8 = make_sharded_train_setup(
        cfg, tx, mesh, raw, params, n_steps=3, donate=False
    )
    s8, m8 = chunk8(state8, data8)

    np.testing.assert_allclose(np.asarray(m8["all"]), np.asarray(m1["all"]), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s8.params["warp"]), np.asarray(s1.params["warp"]), rtol=2e-4, atol=2e-6
    )
    w1 = np.asarray(s1.params["neural_image"]["mlp"][0]["w"])
    w8 = np.asarray(s8.params["neural_image"]["mlp"][0]["w"])
    np.testing.assert_allclose(w8, w1, rtol=2e-4, atol=2e-6)


@pytest.mark.parametrize("lazy", ["off", "on"])
def test_fused_shardmap_matches_single_device_fused(rng, lazy):
    """The fused Pallas kernel under shard_map (parallel/shard_fused.py):
    per-shard kernel + psum'd grads must equal the single-device fused step.
    lazy='on' additionally proves the chunk-final-only edge term (an
    all_gather inside lax.cond — uniform across devices) and the lazy aux
    metrics compile and match under shard_map."""
    from marf_tpu.parallel.shard_fused import fused_shardable, make_fused_sharded_setup

    cfg = mesh_cfg(
        fused_step="on",
        fused_warp="on",
        lazy_metrics=lazy,
        arch=NeuralImageConfig(layers=(None, 32, 32, 3), posenc_L=4, barf_c2f=(0, 0.4)),
    )
    assert fused_shardable(cfg, 8)  # 3*24*32 = 2304 divisible by 8
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    raw = fake_data(cfg, rng)
    tx = make_optimizer(OPTIM, cfg.max_iter)

    state1 = init_train_state(params, tx)
    chunk1 = make_train_chunk(make_train_step(cfg, tx), 3, donate=False)
    s1, m1 = chunk1(state1, raw)

    mesh = make_mesh(8)
    state8, data8, chunk8 = make_fused_sharded_setup(
        cfg, tx, mesh, raw, params, n_steps=3, donate=False
    )
    assert not data8["rgb_cf"].sharding.is_fully_replicated
    s8, m8 = chunk8(state8, data8)

    for key in ("all", "loss_rgb", "loss_edge", "PSNR", "Homography_Error"):
        np.testing.assert_allclose(
            np.asarray(m8[key]), np.asarray(m1[key]), rtol=2e-5, atol=1e-7, err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(s8.params["warp"]), np.asarray(s1.params["warp"]), rtol=2e-4, atol=2e-6
    )
    for li in range(len(cfg.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s8.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s1.params["neural_image"]["mlp"][li]["w"]),
            rtol=2e-4, atol=2e-6, err_msg=f"layer {li}",
        )


@pytest.mark.parametrize("batch_size,fused_warp", [(9, "on"), (3, "off")])
def test_fused_shardmap_v4_leg_matches_single_device(rng, batch_size, fused_warp):
    """Fixed-mask configs beyond the v5 kernel's image-axis bound (B > PB)
    or with the in-kernel warp disabled run the v4 coords-based kernel under
    shard_map (round 4 — previously these fell back to the GSPMD XLA step)."""
    from marf_tpu.ops.pallas.fused_step import PB
    from marf_tpu.parallel.shard_fused import fused_shardable, make_fused_sharded_setup

    if fused_warp == "on":
        assert batch_size > PB  # must actually exercise the B > PB fallback
    cfg = mesh_cfg(
        batch_size=batch_size,
        fused_step="on",
        fused_warp=fused_warp,
        arch=NeuralImageConfig(layers=(None, 32, 32, 3), posenc_L=4, barf_c2f=(0, 0.4)),
    )
    assert fused_shardable(cfg, 8)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    raw = fake_data(cfg, rng)
    tx = make_optimizer(OPTIM, cfg.max_iter)

    state1 = init_train_state(params, tx)
    chunk1 = make_train_chunk(make_train_step(cfg, tx), 2, donate=False)
    s1, m1 = chunk1(state1, raw)

    mesh = make_mesh(8)
    state8, data8, chunk8 = make_fused_sharded_setup(
        cfg, tx, mesh, raw, params, n_steps=2, donate=False
    )
    s8, m8 = chunk8(state8, data8)

    for key in ("all", "loss_rgb", "loss_edge", "PSNR", "Homography_Error"):
        np.testing.assert_allclose(
            np.asarray(m8[key]), np.asarray(m1[key]), rtol=2e-5, atol=1e-7, err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(s8.params["warp"]), np.asarray(s1.params["warp"]), rtol=2e-4, atol=2e-6
    )
    for li in range(len(cfg.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s8.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s1.params["neural_image"]["mlp"][li]["w"]),
            rtol=2e-4, atol=2e-6, err_msg=f"layer {li}",
        )


@pytest.mark.parametrize(
    "single,use_edges,batch_size,lazy",
    [(False, True, 3, "off"), (False, False, 3, "off"), (True, True, 8, "off"),
     (False, True, 3, "on")],
)
def test_fused_implicit_shardmap_matches_single_device(rng, single, use_edges, batch_size, lazy):
    """The implicit-mask two-kernel pipeline under shard_map (round 3): per-
    shard kernels + ICI psums must equal the single-device fused implicit
    step — shared head (columns split mid-image) and per-image heads (whole
    heads per device). lazy='on' proves the chunk-final-only aux metrics
    (the Mask_Error psum inside lax.cond — uniform across devices) compile
    and match under shard_map."""
    from marf_tpu.parallel.shard_fused import fused_shardable, make_fused_sharded_setup

    cfg = mesh_cfg(
        batch_size=batch_size,
        use_implicit_mask=True,
        use_masks=True,
        use_edges=use_edges,
        alpha_initial=0.3,
        N_vocab=16,
        build_single_masks=single,
        fused_step="on",
        fused_dedup="off",  # pin the NON-dedup mesh pipeline (dedup test below)
        lazy_metrics=lazy,
        arch=NeuralImageConfig(layers=(None, 32, 32, 3), posenc_L=4, barf_c2f=(0, 0.4)),
    )
    assert fused_shardable(cfg, 8)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    raw = fake_data(cfg, rng)
    tx = make_optimizer(OPTIM, cfg.max_iter)

    state1 = init_train_state(params, tx)
    chunk1 = make_train_chunk(make_train_step(cfg, tx), 2, donate=False)
    s1, m1 = chunk1(state1, raw)

    mesh = make_mesh(8)
    state8, data8, chunk8 = make_fused_sharded_setup(
        cfg, tx, mesh, raw, params, n_steps=2, donate=False
    )
    assert not data8["mask_X"].sharding.is_fully_replicated
    s8, m8 = chunk8(state8, data8)

    keys = ["all", "loss_rgb", "loss_mask", "PSNR", "Homography_Error", "Mask_Error"]
    if use_edges:
        keys.append("loss_edge")
    for key in keys:
        np.testing.assert_allclose(
            np.asarray(m8[key]), np.asarray(m1[key]), rtol=2e-5, atol=1e-7, err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(s8.params["warp"]), np.asarray(s1.params["warp"]), rtol=2e-4, atol=2e-6
    )
    for li in range(len(cfg.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s8.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s1.params["neural_image"]["mlp"][li]["w"]),
            rtol=2e-4, atol=2e-6, err_msg=f"neural_image layer {li}",
        )
    for li in range(5):
        # the cotangent scalars cross an ICI psum whose summation order
        # differs from the single-device kernel accumulation; on elements
        # whose true gradient is ~0, Adam's first-step normalization
        # (m_hat/sqrt(v_hat) -> sign(g)) amplifies that reorder noise to
        # full +/-lr steps. Allow isolated lr-scale flips, nothing more.
        w8 = np.asarray(s8.params["implicit_mask"]["mlp"][li]["w"])
        w1 = np.asarray(s1.params["implicit_mask"]["mlp"][li]["w"])
        # measured: <=0.18% isolated flips, p99.9 ~ 1e-5, max ~ 1.4*lr; a
        # real head-indexing bug would mismatch a whole head block (12.5%)
        # at weight scale (~1e-1), far outside both bounds
        bad = np.abs(w8 - w1) > (2e-4 * np.abs(w1) + 2e-6)
        assert bad.mean() < 5e-3, f"mask head layer {li}: {bad.sum()}/{bad.size} mismatches"
        assert np.abs(w8 - w1).max() < 3e-3, f"mask head layer {li}: max {np.abs(w8 - w1).max()}"


@pytest.mark.parametrize("use_edges", [True, False])
def test_fused_implicit_dedup_shardmap_matches_single_device(rng, use_edges):
    """The shared-head DEDUP implicit pipeline under shard_map (round 4):
    column-sharded mask kernels + dense per-device slot0 expansion/segment
    sums + Eloc-sized extras must equal the single-device dedup step."""
    from marf_tpu.ops.grid import normalized_pixel_grid
    from marf_tpu.ops.pallas.fused_mask import factor_mask_inputs, slot_dedup_padded_inputs
    from marf_tpu.parallel.shard_fused import fused_shardable, make_fused_sharded_setup

    cfg = mesh_cfg(
        use_implicit_mask=True,
        use_masks=True,
        use_edges=use_edges,
        alpha_initial=0.3,
        N_vocab=16,
        fused_step="on",
        fused_dedup="on",
        arch=NeuralImageConfig(layers=(None, 32, 32, 3), posenc_L=4, barf_c2f=(0, 0.4)),
    )
    assert fused_shardable(cfg, 8)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    raw = fake_data(cfg, rng)
    # saturate a pixel mix so the {0,1} quantization yields extras columns
    # (uniform rgb floors to combo 0 everywhere -> no extras to exercise)
    rgb = np.asarray(raw["rgb"])
    rgb = np.where(rng.rand(*rgb.shape) > 0.5, 1.0, rgb).astype(np.float32)
    raw = dict(raw, rgb=jnp.asarray(rgb))
    tx = make_optimizer(OPTIM, cfg.max_iter)

    # single device, dedup arrays precomputed (engine/trainer layout)
    grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
    uv, onehot, table = factor_mask_inputs(params["view_embedding"], raw["rgb"], grid)
    dd = slot_dedup_padded_inputs(np.asarray(uv), np.asarray(onehot), cfg.arch)
    assert dd["mask_extmap"].sum() > 0  # the random data must exercise the extras path
    ddata = dict(
        raw,
        mask_table=jnp.asarray(table),
        **{k: jnp.asarray(v) for k, v in dd.items()},
    )
    state1 = init_train_state(params, tx)
    chunk1 = make_train_chunk(make_train_step(cfg, tx), 2, donate=False)
    s1, m1 = chunk1(state1, ddata)

    # 8-device mesh: flatten builds the per-device dedup structures itself
    mesh = make_mesh(8)
    state8, data8, chunk8 = make_fused_sharded_setup(
        cfg, tx, mesh, raw, params, n_steps=2, donate=False
    )
    assert "mask_Xall" in data8 and "mask_extoff" in data8
    assert not data8["mask_Xall"].sharding.is_fully_replicated
    assert not data8["mask_slot0map_flat"].sharding.is_fully_replicated
    s8, m8 = chunk8(state8, data8)

    keys = ["all", "loss_rgb", "loss_mask", "PSNR", "Homography_Error", "Mask_Error"]
    if use_edges:
        keys.append("loss_edge")
    for key in keys:
        np.testing.assert_allclose(
            np.asarray(m8[key]), np.asarray(m1[key]), rtol=2e-5, atol=1e-7, err_msg=key
        )
    np.testing.assert_allclose(
        np.asarray(s8.params["warp"]), np.asarray(s1.params["warp"]), rtol=2e-4, atol=2e-6
    )
    for li in range(len(cfg.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s8.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s1.params["neural_image"]["mlp"][li]["w"]),
            rtol=2e-4, atol=2e-6, err_msg=f"neural_image layer {li}",
        )
    for li in range(5):
        # same ICI-psum reorder noise rationale as the non-dedup test above
        w8 = np.asarray(s8.params["implicit_mask"]["mlp"][li]["w"])
        w1 = np.asarray(s1.params["implicit_mask"]["mlp"][li]["w"])
        bad = np.abs(w8 - w1) > (2e-4 * np.abs(w1) + 2e-6)
        assert bad.mean() < 5e-3, f"mask head layer {li}: {bad.sum()}/{bad.size} mismatches"
        assert np.abs(w8 - w1).max() < 3e-3, f"mask head layer {li}: max {np.abs(w8 - w1).max()}"


def test_sharded_width_axis(rng):
    """h not divisible by 8 -> width sharding path."""
    cfg = mesh_cfg(H=60, W=64, patch_H=30, patch_W=32)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    raw = fake_data(cfg, rng)
    tx = make_optimizer(OPTIM, cfg.max_iter)
    mesh = make_mesh(8)
    state8, data8, chunk8 = make_sharded_train_setup(cfg, tx, mesh, raw, params, n_steps=2, donate=False)
    s8, m8 = chunk8(state8, data8)
    assert np.isfinite(np.asarray(m8["all"])).all()

    state1 = init_train_state(params, tx)
    chunk1 = make_train_chunk(make_train_step(cfg, tx), 2, donate=False)
    s1, m1 = chunk1(state1, raw)
    np.testing.assert_allclose(np.asarray(m8["all"]), np.asarray(m1["all"]), rtol=2e-5, atol=1e-7)


def test_sharded_full_training_progress(rng):
    cfg = mesh_cfg()
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    raw = fake_data(cfg, rng)
    tx = make_optimizer(OPTIM, cfg.max_iter)
    mesh = make_mesh(8)
    state, data, chunk = make_sharded_train_setup(cfg, tx, mesh, raw, params, n_steps=30, donate=False)
    s, m = chunk(state, data)
    losses = np.asarray(m["loss_rgb"])
    assert losses[-1] < losses[0]
    assert int(s.step) == 30


def test_trainer_multichip_equals_single_device(tmp_path):
    """The user-facing path (VERDICT round-1 item 4): `--tpu.n_devices=8` (or
    MARF_DEVICES=8) routes the full trainer through the mesh — sharded data,
    replicated state, GSPMD step — and the training curves equal the
    single-device run."""
    from tests.test_train_integration import make_opt, run_lifecycle

    # H=96/W=128 -> patch 48x64: height axis divides the 8-device mesh
    m1 = run_lifecycle(
        make_opt(tmp_path, name="single", max_iter=40, output_path=str(tmp_path / "single"))
    )
    opt8 = make_opt(tmp_path, name="mesh8", max_iter=40, output_path=str(tmp_path / "mesh8"))
    opt8.tpu.n_devices = 8
    m8 = run_lifecycle(opt8)

    assert m8.mesh is not None and m8.mesh.devices.size == 8
    assert not m8.data["rgb"].sharding.is_fully_replicated
    np.testing.assert_allclose(
        np.asarray(m8.state.params["warp"]), np.asarray(m1.state.params["warp"]),
        rtol=2e-4, atol=2e-6,
    )
    import sys

    sys.path.insert(0, "tools")
    from compare_runs import compare, load_scalars

    report = compare(load_scalars(m1.opt.output_path), load_scalars(m8.opt.output_path))
    assert report, "no TB curves found to compare"
    for tag, row in report.items():
        assert row["status"] == "ok", (tag, row)
        assert row["max_abs_diff"] < 2e-3, (tag, row)


def test_trainer_multichip_shard_fused(tmp_path):
    """With the fused kernel forced on, the trainer's mesh path routes
    through shard_map (per-shard Pallas + ICI psum) instead of disabling the
    kernel — and matches the single-device fused run."""
    from tests.test_train_integration import make_opt, run_lifecycle

    def fused_opt(name):
        o = make_opt(tmp_path, name=name, max_iter=20, output_path=str(tmp_path / name))
        o.tpu.fused_step = "on"
        o.tpu.fused_warp = "on"
        return o

    m1 = run_lifecycle(fused_opt("fused1"))
    opt8 = fused_opt("fused8")
    opt8.tpu.n_devices = 8
    m8 = run_lifecycle(opt8)

    assert m8.shard_fused
    assert not m8.train_data["rgb_cf"].sharding.is_fully_replicated
    # psum changes the dW summation order vs the single-chip scratch
    # accumulator, so trajectories decouple at f32 rounding level (measured
    # ~6e-5..3e-4 on warp after 20 iters through the Adam normalization —
    # same class as PARITY.md's rounding-chaos band; a wrong gradient would
    # diverge to 1e-2+ within a few steps)
    np.testing.assert_allclose(
        np.asarray(m8.state.params["warp"]), np.asarray(m1.state.params["warp"]),
        rtol=2e-3, atol=5e-4,
    )
    import sys

    sys.path.insert(0, "tools")
    from compare_runs import compare, load_scalars

    report = compare(load_scalars(m1.opt.output_path), load_scalars(m8.opt.output_path))
    assert report, "no TB curves found to compare"
    for tag, row in report.items():
        assert row["status"] == "ok", (tag, row)
        assert row["max_abs_diff"] < 5e-3, (tag, row)


def test_trainer_multichip_implicit_dedup(tmp_path):
    """The trainer's mesh path with the shared-head dedup pipeline: the
    factored inputs are stashed by _build_compiled (mask_uv/mask_onehot),
    flatten builds the per-device structures, and the run matches the
    single-device dedup trainer."""
    from tests.test_train_integration import make_opt, run_lifecycle

    def implicit_opt(name):
        o = make_opt(tmp_path, name=name, max_iter=20, output_path=str(tmp_path / name))
        o.use_masks = False
        o.use_implicit_mask = True
        o.tpu.fused_step = "on"
        o.tpu.fused_dedup = "on"
        return o

    m1 = run_lifecycle(implicit_opt("dedup1"))
    opt8 = implicit_opt("dedup8")
    opt8.tpu.n_devices = 8
    m8 = run_lifecycle(opt8)

    assert m8.shard_fused
    assert "mask_Xall" in m8.train_data and "mask_extoff" in m8.train_data
    assert not m8.train_data["mask_Xall"].sharding.is_fully_replicated
    # same rounding-decoupling rationale as test_trainer_multichip_shard_fused
    np.testing.assert_allclose(
        np.asarray(m8.state.params["warp"]), np.asarray(m1.state.params["warp"]),
        rtol=2e-3, atol=5e-4,
    )
    import sys

    sys.path.insert(0, "tools")
    from compare_runs import compare, load_scalars

    report = compare(load_scalars(m1.opt.output_path), load_scalars(m8.opt.output_path))
    assert report, "no TB curves found to compare"
    for tag, row in report.items():
        assert row["status"] == "ok", (tag, row)
        assert row["max_abs_diff"] < 5e-3, (tag, row)


def test_2d_mesh_batch_x_pixel(rng):
    """2-axis ('batch','data') mesh: B sharded over 2 devices, pixel rows
    over 4 — numerically equal to single-device."""
    from marf_tpu.parallel.mesh import make_mesh_2d

    cfg = mesh_cfg(batch_size=2)  # B=2 over batch axis; h=24 over 4 pixel devices
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    raw = fake_data(cfg, rng)
    tx = make_optimizer(OPTIM, cfg.max_iter)

    state1 = init_train_state(params, tx)
    chunk1 = make_train_chunk(make_train_step(cfg, tx), 2, donate=False)
    s1, m1 = chunk1(state1, raw)

    mesh = make_mesh_2d(2, 4)
    state2d, data2d, chunk2d = make_sharded_train_setup(cfg, tx, mesh, raw, params, n_steps=2, donate=False)
    assert not data2d["rgb"].sharding.is_fully_replicated
    s2, m2 = chunk2d(state2d, data2d)
    np.testing.assert_allclose(np.asarray(m2["all"]), np.asarray(m1["all"]), rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s2.params["warp"]), np.asarray(s1.params["warp"]), rtol=2e-4, atol=2e-6
    )
