"""End-to-end integration tests: full trainer lifecycle on synthetic data
(the convergence check the reference validated only by eyeballing TensorBoard,
SURVEY.md §4)."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from marf_tpu.utils.attrdict import AttrDict
from marf_tpu.utils.config import load_options, resolve_yaml_path


def make_opt(tmp_path, **overrides):
    opt = load_options(resolve_yaml_path("planar"))
    opt.update(
        AttrDict(
            model="planar",
            yaml="planar",
            group="it",
            name="run",
            seed=3,
            dataset="synthetic",
            H=96,
            W=128,
            patch_H=48,
            patch_W=64,
            max_iter=60,
            barf_c2f=[0, 0.4],
            output_path=str(tmp_path / "out"),
            freq=AttrDict(scalar=20, vis=30, ckpt=None),
        )
    )
    opt.update(AttrDict(overrides))
    os.makedirs(opt.output_path, exist_ok=True)
    return opt


def run_lifecycle(opt):
    from marf_tpu.engine.trainer import Model

    m = Model(opt)
    m.load_dataset()
    m.build_networks()
    m.setup_optimizer()
    m.setup_visualizer()
    m.train()
    return m


def test_full_lifecycle_and_convergence(tmp_path):
    opt = make_opt(tmp_path)
    opt.tb.show_edges = True
    opt.tb.show_corners = True
    m = run_lifecycle(opt)
    # loss went down: re-evaluate rgb loss at final params vs initial
    assert m.it == 60
    # frame dumps at iter 0 + every vis=30 -> 0,30,60 => 3 frames
    frames = sorted(glob.glob(f"{m.vis_path}/*.png"))
    assert len(frames) == 3
    # TB event file exists
    events = glob.glob(f"{m.opt.output_path}/events.out.tfevents.*")
    assert events
    # opt-in image panels landed (predicted_edges: the reference ships it
    # commented out, model/planar.py:288-292; warp_corners: reference op
    # defined but never called, warp.py:83-93)
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    ea = EventAccumulator(m.opt.output_path)
    ea.Reload()
    imgs = set(ea.Tags()["images"])
    assert any(t.startswith("train/predicted_edges") for t in imgs), imgs
    assert any(t.startswith("train/warp_corners") for t in imgs), imgs
    # checkpoint saved at end
    assert os.path.isdir(f"{m.opt.output_path}/ckpt/60")
    # warp gauge pinned
    warp = np.asarray(m.state.params["warp"])
    np.testing.assert_array_equal(warp[0], 0.0)


def test_psnr_improves(tmp_path):
    """PSNR at the end must beat PSNR at the start on learnable synthetic data."""
    from marf_tpu.engine.step import make_train_chunk, make_train_step

    m = run_lifecycle(make_opt(tmp_path, max_iter=200))
    # recompute loss at step 0 params vs trained params via fresh model
    opt2 = make_opt(tmp_path, name="fresh", max_iter=200)
    m2 = Model_init_only(opt2)
    import jax.numpy as jnp

    from marf_tpu.models.planar import graph_forward, graph_loss

    loss0 = graph_loss(
        graph_forward(m2.params, m2.data, m2.cfg, jnp.float32(0.0)), m2.data, m2.cfg, jnp.int32(0)
    )
    lossT = graph_loss(
        graph_forward(m.state.params, m.data, m.cfg, jnp.float32(1.0)), m.data, m.cfg, jnp.int32(0)
    )
    psnr0 = -10 * np.log10(float(loss0["rgb"]))
    psnrT = -10 * np.log10(float(lossT["rgb"]))
    assert psnrT > psnr0 + 3.0, (psnr0, psnrT)


def test_profile_overlay_keeps_cadence(tmp_path):
    """--profile must not shift scalar/vis cadences: profiling is an overlay
    on the normal loop (VERDICT r1 weak 6 — the old branch hand-balanced
    iteration bookkeeping and skipped logging for profiled chunks)."""
    m = run_lifecycle(make_opt(tmp_path, profile=1))
    assert os.path.isdir(f"{m.opt.output_path}/profile")
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    ea = EventAccumulator(m.opt.output_path)
    ea.Reload()
    steps = [s.step for s in ea.Scalars("train/PSNR")]
    assert steps == [20, 40, 60], steps  # freq.scalar=20, max_iter=60 — none skipped


def Model_init_only(opt):
    from marf_tpu.engine.trainer import Model

    m = Model(opt)
    m.load_dataset()
    m.build_networks()
    return m


def test_checkpoint_resume_roundtrip(tmp_path):
    """Train 40 iters, resume to 60; state round-trips exactly."""
    from marf_tpu.engine import checkpoint as ckpt_lib
    from marf_tpu.engine.trainer import Model

    opt = make_opt(tmp_path, max_iter=40)
    m = run_lifecycle(opt)
    saved_warp = np.asarray(m.state.params["warp"])

    opt2 = make_opt(tmp_path, max_iter=60)
    opt2.resume = True
    m2 = Model(opt2)
    m2.load_dataset()
    m2.build_networks()
    m2.setup_optimizer()
    assert m2.it == 40
    np.testing.assert_array_equal(np.asarray(m2.state.params["warp"]), saved_warp)
    m2.setup_visualizer()
    m2.train()
    assert int(m2.state.step) == 60


def test_legacy_group_optimizer_checkpoint_restores(tmp_path):
    """A checkpoint written with the optax.multi_transform state (pre
    flat-Adam layout) restores via the trainer's self-healing fallback."""
    from marf_tpu.engine import checkpoint as ckpt_lib
    from marf_tpu.engine.step import init_train_state, make_optimizer
    from marf_tpu.engine.trainer import Model

    opt = make_opt(tmp_path, max_iter=40)
    m = Model(opt)
    m.load_dataset()
    m.build_networks()
    # save a step-20 checkpoint in the legacy per-group state layout
    tx_old = make_optimizer(dict(opt.optim), 40)
    legacy = init_train_state(m.params, tx_old)
    legacy = legacy.replace(step=jnp.asarray(20, jnp.int32))
    ckpt_lib.save_checkpoint(opt.output_path, legacy)

    opt2 = make_opt(tmp_path, max_iter=40)
    opt2.resume = True
    m2 = Model(opt2)
    m2.load_dataset()
    m2.build_networks()
    m2.setup_optimizer()  # flat template fails -> falls back to multi_transform
    assert m2.it == 20
    assert isinstance(m2.state.opt_state, tuple) or hasattr(m2.state.opt_state, "inner_states")


def test_implicit_mask_lifecycle(tmp_path):
    opt = make_opt(tmp_path, use_implicit_mask=True, N_vocab=32, max_iter=20)
    m = run_lifecycle(opt)
    assert "implicit_mask" in m.state.params


def test_no_posenc_ablation(tmp_path):
    """--arch.posenc! baseline config (BASELINE.md eval config 3)."""
    opt = make_opt(tmp_path, max_iter=20, barf_c2f=None)
    opt.arch.posenc = False
    m = run_lifecycle(opt)
    assert m.cfg.arch.posenc_L is None


def test_fused_lifecycle_stages_constant_streams(tmp_path):
    """tpu.fused_step=on through the full trainer: _build_compiled stages
    the pre-padded constant streams (engine/step.py
    stage_fused_constant_streams) and the run trains to completion on them
    (interpret mode on CPU). Step-level staged-vs-fallback equality lives in
    test_fused_step.py; this covers the trainer wiring."""
    opt = make_opt(
        tmp_path, H=48, W=64, patch_H=24, patch_W=32, max_iter=8,
        batch_size=2, freq=AttrDict(scalar=4, vis=8, ckpt=None),
    )
    opt.tpu.fused_step = "on"
    opt.tpu.fused_warp = "on"
    m = run_lifecycle(opt)
    assert m.it == 8
    for key in ("targets_cf_p", "masks_cf_p", "grid_b_p"):
        assert key in m.data, key
    from marf_tpu.ops.pallas.fused_step import fused_cols

    h, w = m.cfg.map_hw
    np_cols = fused_cols(2 * h * w, m.cfg.arch)
    assert m.data["targets_cf_p"].shape == (3, np_cols)
    assert m.data["grid_b_p"].shape == (3, np_cols)
    assert np.isfinite(np.asarray(m.state.params["warp"])).all()
    for layer in m.state.params["neural_image"]["mlp"]:
        assert np.isfinite(np.asarray(layer["w"])).all()
