"""Train-step tests: optimizer grouping, fix_first, schedules, metrics, chunking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marf_tpu.engine.step import (
    chunk_schedule,
    init_train_state,
    make_optimizer,
    make_train_chunk,
    make_train_step,
)
from marf_tpu.models.neural_image import NeuralImageConfig
from marf_tpu.models.planar import PlanarConfig, init_graph_params
from tests.test_models import fake_data, small_cfg


def build(cfg, optim=None, rng=None, use_homographies=True):
    rng = rng or np.random.RandomState(0)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(optim or {"lr": 1e-3, "lr_warp": 1e-3, "lr_mask": 1e-3, "algo": "Adam"}, cfg.max_iter)
    state = init_train_state(params, tx)
    data = fake_data(cfg, rng)
    step_fn = make_train_step(cfg, tx, use_homographies=use_homographies)
    return state, data, step_fn


def test_single_step_updates_params(rng):
    cfg = small_cfg()
    state, data, step_fn = build(cfg, rng=rng)
    new_state, metrics = jax.jit(step_fn)(state, data)
    assert int(new_state.step) == 1
    w_old = np.asarray(state.params["neural_image"]["mlp"][0]["w"])
    w_new = np.asarray(new_state.params["neural_image"]["mlp"][0]["w"])
    assert not np.allclose(w_old, w_new)
    assert np.isfinite(float(metrics["all"]))
    assert "PSNR" in metrics and "Homography_Error" in metrics


def test_fix_first_zeroes_warp0(rng):
    cfg = small_cfg(fix_first=True)
    state, data, step_fn = build(cfg, rng=rng)
    new_state, _ = jax.jit(step_fn)(state, data)
    warp = np.asarray(new_state.params["warp"])
    np.testing.assert_array_equal(warp[0], 0.0)
    assert np.abs(warp[1:]).max() > 0  # others moved


def test_no_fix_first(rng):
    cfg = small_cfg(fix_first=False)
    state, data, step_fn = build(cfg, rng=rng)
    new_state, _ = jax.jit(step_fn)(state, data)
    assert np.abs(np.asarray(new_state.params["warp"])[0]).max() > 0


def test_loss_decreases_over_steps(rng):
    cfg = small_cfg()
    state, data, step_fn = build(cfg, optim={"lr": 5e-3, "lr_warp": 5e-3, "lr_mask": 5e-3, "algo": "Adam"}, rng=rng)
    chunk = make_train_chunk(step_fn, 100, donate=False)
    state2, metrics = chunk(state, data)
    first, last = float(metrics["loss_rgb"][0]), float(metrics["loss_rgb"][-1])
    # fake_data targets are random noise, so progress is bounded; the real
    # convergence check is tests/test_train_integration.py on synthetic data
    assert last < first * 0.97, (first, last)
    assert int(state2.step) == 100


def test_chunk_metrics_match_stepwise(rng):
    """A scanned chunk must be bit-equivalent to calling the step n times."""
    cfg = small_cfg()
    state, data, step_fn = build(cfg, rng=rng)
    chunk = make_train_chunk(step_fn, 4, donate=False)
    s_chunk, m_chunk = chunk(state, data)
    s_loop = state
    step_jit = jax.jit(step_fn)
    losses = []
    for _ in range(4):
        s_loop, m = step_jit(s_loop, data)
        losses.append(float(m["all"]))
    np.testing.assert_allclose(np.asarray(m_chunk["all"]), losses, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_chunk.params["warp"]), np.asarray(s_loop.params["warp"]), rtol=1e-6, atol=1e-7
    )


def test_frozen_view_embedding(rng):
    """The reference never adds embedding_view to the optimizer
    (model/planar.py:89-96) — it must stay frozen."""
    cfg = small_cfg(use_implicit_mask=True, N_vocab=16)
    state, data, step_fn = build(cfg, rng=rng)
    new_state, _ = jax.jit(step_fn)(state, data)
    np.testing.assert_array_equal(
        np.asarray(new_state.params["view_embedding"]), np.asarray(state.params["view_embedding"])
    )
    # but the mask head does train
    m_old = np.asarray(state.params["implicit_mask"]["mlp"][0]["w"])
    m_new = np.asarray(new_state.params["implicit_mask"]["mlp"][0]["w"])
    assert not np.allclose(m_old, m_new)


def test_per_group_learning_rates(rng):
    """lr_warp=0 must freeze the warp while the MLP still moves."""
    cfg = small_cfg()
    state, data, step_fn = build(cfg, optim={"lr": 1e-3, "lr_warp": 0.0, "lr_mask": 1e-3, "algo": "Adam"}, rng=rng)
    new_state, _ = jax.jit(step_fn)(state, data)
    np.testing.assert_array_equal(np.asarray(new_state.params["warp"]), np.asarray(state.params["warp"]))
    assert not np.allclose(
        np.asarray(new_state.params["neural_image"]["mlp"][0]["w"]),
        np.asarray(state.params["neural_image"]["mlp"][0]["w"]),
    )


def test_exponential_lr_schedule(rng):
    cfg = small_cfg()
    optim = {"lr": 1e-2, "lr_warp": 1e-2, "lr_mask": 1e-2, "algo": "Adam", "lr_end": 1e-4,
             "sched": {"type": "ExponentialLR"}, "apply_sched": True}
    state, data, step_fn = build(cfg, optim=optim, rng=rng)
    chunk = make_train_chunk(step_fn, 10, donate=False)
    s, m = chunk(state, data)
    assert np.isfinite(np.asarray(m["all"])).all()


def test_mask_error_metric(rng):
    cfg = small_cfg(use_implicit_mask=True, N_vocab=16)
    state, data, step_fn = build(cfg, rng=rng)
    _, metrics = jax.jit(step_fn)(state, data)
    assert "Mask_Error" in metrics
    assert float(metrics["Mask_Error"]) > 0


def test_chunk_schedule():
    assert chunk_schedule(3000, 20, 100) == 20
    assert chunk_schedule(3000, 30, 100) == 10
    assert chunk_schedule(5, 20, 100) == 5
    assert chunk_schedule(3000, 7, 13) == 1
    # freq.ckpt folds into the chunk so periodic checkpoints actually fire
    assert chunk_schedule(3000, 20, 100, 50) == 10
    assert chunk_schedule(3000, 20, 100, 100) == 20


def test_sched_inert_without_apply_flag(rng):
    """Faithful-by-default: optim.sched is INERT unless apply_sched is set
    (the reference never calls sched.step(), model/planar.py)."""
    from marf_tpu.engine.step import _lr_schedule

    optim = {"lr": 1e-2, "sched": {"type": "StepLR", "steps": 2, "gamma": 0.5}}
    assert _lr_schedule(1e-2, optim, 100) == 1e-2
    sched = _lr_schedule(1e-2, dict(optim, apply_sched=True), 100)
    assert callable(sched) and sched(4) == pytest.approx(1e-2 * 0.25)


def test_homography_error_decreases_with_gt_alignment(rng):
    """Sanity: warp params equal to GT give (near) zero error when gt_hom is
    the expm of those params."""
    from marf_tpu.ops.lie import sl3_to_SL3
    from marf_tpu.ops.losses import homography_error

    w = jnp.asarray(rng.randn(3, 8).astype(np.float32) * 0.1)
    H = sl3_to_SL3(w)
    assert float(homography_error(H, H)) < 1e-10
    assert float(homography_error(H, jnp.asarray(np.eye(3, dtype=np.float32))[None].repeat(3, 0))) > 0


def test_train_view_embedding_fix_mode(rng):
    """optim.train_view_embedding=True unfreezes the view embedding."""
    cfg = small_cfg(use_implicit_mask=True, N_vocab=16)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    optim = {"lr": 1e-2, "lr_warp": 1e-2, "lr_mask": 1e-2, "algo": "Adam", "train_view_embedding": True}
    tx = make_optimizer(optim, cfg.max_iter)
    state = init_train_state(params, tx)
    data = fake_data(cfg, rng)
    step_fn = make_train_step(cfg, tx)
    new_state, _ = jax.jit(step_fn)(state, data)
    # only rows 0/1 of the embedding are gathered (the {0,1} quirk) -> those
    # rows move, the rest stay
    old = np.asarray(state.params["view_embedding"])
    new = np.asarray(new_state.params["view_embedding"])
    assert not np.allclose(new[:2], old[:2])
    np.testing.assert_array_equal(new[2:], old[2:])


def test_steplr_schedule(rng):
    cfg = small_cfg()
    optim = {"lr": 1e-2, "lr_warp": 1e-2, "lr_mask": 1e-2, "algo": "Adam",
             "sched": {"type": "StepLR", "steps": 2, "gamma": 0.5}, "apply_sched": True}
    state, data, step_fn = build(cfg, optim=optim, rng=rng)
    chunk = make_train_chunk(step_fn, 6, donate=False)
    s, m = chunk(state, data)
    assert np.isfinite(np.asarray(m["all"])).all()


def test_sgd_and_rmsprop_algos(rng):
    cfg = small_cfg()
    for algo in ("SGD", "RMSprop", "AdamW"):
        state, data, step_fn = build(cfg, optim={"lr": 1e-3, "lr_warp": 1e-3, "lr_mask": 1e-3, "algo": algo}, rng=rng)
        new_state, metrics = jax.jit(step_fn)(state, data)
        assert np.isfinite(float(metrics["all"])), algo


@pytest.mark.parametrize(
    "optim",
    [
        {"lr": 1e-3, "lr_warp": 3e-3, "lr_mask": 5e-4, "algo": "Adam"},
        {"lr": 1e-3, "lr_warp": 3e-3, "lr_mask": 5e-4, "algo": "Adam",
         "apply_sched": True, "lr_end": 1e-4,
         "sched": {"type": "ExponentialLR"}},
    ],
    ids=["const_lr", "exp_sched"],
)
def test_flat_optimizer_matches_multi_transform(rng, optim):
    """make_flat_optimizer (one fused [P] Adam pass with a per-element lr
    vector) is trajectory-identical to the optax.multi_transform path,
    including per-group lrs, exp-decay schedules, and the frozen view
    embedding."""
    from marf_tpu.engine.step import make_flat_optimizer

    cfg = small_cfg(use_implicit_mask=True, use_masks=False, N_vocab=8)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    data = fake_data(cfg, rng)

    tx_ref = make_optimizer(optim, cfg.max_iter)
    tx_flat = make_flat_optimizer(optim, cfg.max_iter, params)
    assert tx_flat is not None
    assert make_flat_optimizer(dict(optim, algo="SGD"), cfg.max_iter, params) is None

    s_ref = init_train_state(params, tx_ref)
    s_flat = init_train_state(params, tx_flat)
    step_ref = jax.jit(make_train_step(cfg, tx_ref))
    step_flat = jax.jit(make_train_step(cfg, tx_flat))
    for _ in range(5):
        s_ref, _ = step_ref(s_ref, data)
        s_flat, _ = step_flat(s_flat, data)
    ref_leaves = jax.tree_util.tree_leaves(s_ref.params)
    flat_leaves = jax.tree_util.tree_leaves(s_flat.params)
    assert len(ref_leaves) == len(flat_leaves)
    # rtol: the schedule scalar is applied in a different multiplication
    # order (and via select) than optax's per-group tree map — pure float32
    # rounding, measured at <= 2e-6 rel over 5 steps
    for i, (a, b) in enumerate(zip(ref_leaves, flat_leaves)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7, err_msg=f"leaf {i}"
        )
    # the frozen view embedding must be bit-identical to init
    np.testing.assert_array_equal(
        np.asarray(s_flat.params["view_embedding"]), np.asarray(params["view_embedding"])
    )
