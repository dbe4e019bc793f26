"""Single-pass fused train kernel: gradient/loss equivalence with the
autodiff path (interpret mode on CPU; compiles on TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marf_tpu.engine.step import init_train_state, make_optimizer, make_train_chunk, make_train_step
from marf_tpu.models.neural_image import NeuralImageConfig
from marf_tpu.models.planar import PlanarConfig, init_graph_params, use_fused_step
from tests.test_models import fake_data

OPTIM = {"lr": 1e-3, "lr_warp": 1e-3, "lr_mask": 1e-3, "algo": "Adam"}


def cfg_pair(fused_warp="off", **kw):
    base = dict(
        H=32, W=64, patch_H=16, patch_W=32, batch_size=3, max_iter=100,
        arch=NeuralImageConfig(layers=(None, 64, 64, 3), posenc_L=4, barf_c2f=(0, 0.4)),
    )
    base.update(kw)
    off = PlanarConfig(**base, fused_step="off")
    on = PlanarConfig(**base, fused_step="on", fused_warp=fused_warp)
    return off, on


def run_steps(cfg, data, n=3):
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(OPTIM, cfg.max_iter)
    state = init_train_state(params, tx)
    chunk = make_train_chunk(make_train_step(cfg, tx), n, donate=False)
    return chunk(state, data)


def test_gating():
    off, on = cfg_pair()
    assert not use_fused_step(off)
    assert use_fused_step(on)
    # implicit masks keep the autodiff path
    _, on_im = cfg_pair(use_implicit_mask=True, N_vocab=8)
    assert not use_fused_step(on_im)


@pytest.mark.parametrize(
    "use_masks,use_edges,fused_warp",
    [(True, True, "off"), (True, False, "off"), (False, True, "off"),
     (True, True, "on"), (False, True, "on")],
)
def test_fused_step_matches_autodiff(rng, use_masks, use_edges, fused_warp):
    off, on = cfg_pair(use_masks=use_masks, use_edges=use_edges, fused_warp=fused_warp)
    data = fake_data(off, rng)
    if not use_masks:
        data = dict(data, masks=None, masks_eroded=None)
    s_off, m_off = run_steps(off, data)
    s_on, m_on = run_steps(on, data)
    np.testing.assert_allclose(np.asarray(m_on["all"]), np.asarray(m_off["all"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m_on["loss_rgb"]), np.asarray(m_off["loss_rgb"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(m_on["loss_edge"]), np.asarray(m_off["loss_edge"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_on.params["warp"]), np.asarray(s_off.params["warp"]), rtol=1e-3, atol=1e-6
    )
    for li in range(len(off.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s_on.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s_off.params["neural_image"]["mlp"][li]["w"]),
            rtol=1e-3, atol=1e-6, err_msg=f"layer {li} weights",
        )


def test_fused_step_alpha_schedule(rng):
    """The analytic cotangent must track alpha over steps: compare at a later
    step where alpha differs materially."""
    off, on = cfg_pair(alpha_initial=0.2, alpha_final=0.9)
    data = fake_data(off, rng)
    s_off, m_off = run_steps(off, data, n=10)
    s_on, m_on = run_steps(on, data, n=10)
    np.testing.assert_allclose(np.asarray(m_on["all"]), np.asarray(m_off["all"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_on.params["warp"]), np.asarray(s_off.params["warp"]), rtol=2e-3, atol=1e-6
    )


@pytest.mark.parametrize("fused_warp", ["off", "on"])
def test_fused_step_no_posenc(rng, fused_warp):
    """L=0 path: the kernel's encoding block is just the aligned [x, y] rows."""
    arch = NeuralImageConfig(layers=(None, 64, 64, 3), posenc_L=None)
    off, on = cfg_pair(arch=arch, fused_warp=fused_warp)
    data = fake_data(off, rng)
    s_off, m_off = run_steps(off, data)
    s_on, m_on = run_steps(on, data)
    np.testing.assert_allclose(np.asarray(m_on["all"]), np.asarray(m_off["all"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_on.params["warp"]), np.asarray(s_off.params["warp"]), rtol=1e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_on.params["neural_image"]["mlp"][0]["w"]),
        np.asarray(s_off.params["neural_image"]["mlp"][0]["w"]),
        rtol=1e-3, atol=1e-6,
    )


def test_fused_step_psnr_metric(rng):
    off, on = cfg_pair()
    data = fake_data(off, rng)
    _, m_off = run_steps(off, data)
    _, m_on = run_steps(on, data)
    np.testing.assert_allclose(np.asarray(m_on["PSNR"]), np.asarray(m_off["PSNR"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_on["Homography_Error"]), np.asarray(m_off["Homography_Error"]), rtol=1e-3, atol=1e-6
    )


@pytest.mark.parametrize(
    "fused_warp,sub,nstreams",
    # 320: N=1536 pads to 1920 — padding + streams; nstreams=3 widens the
    # per-grid-step tile to 3 SUB lanes (320*3=960 -> pad 1536 to 1920)
    [("off", 256, 2), ("on", 256, 2), ("on", 320, 2), ("on", 256, 3), ("on", 320, 3)],
)
def test_fused_step_multi_stream(rng, monkeypatch, fused_warp, sub, nstreams):
    """NSTREAMS>=2 (independent per-grid-step column chains, MARF_FUSED_STREAMS)
    equals the autodiff path — the streams only regroup the tile iteration."""
    from marf_tpu.ops.pallas import fused_step as fs

    monkeypatch.setattr(fs, "NSTREAMS", nstreams)
    monkeypatch.setattr(fs, "SUB", sub)
    off, on = cfg_pair(fused_warp=fused_warp)
    data = fake_data(off, rng)
    s_off, m_off = run_steps(off, data)
    s_on, m_on = run_steps(on, data)
    np.testing.assert_allclose(np.asarray(m_on["all"]), np.asarray(m_off["all"]), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(s_on.params["warp"]), np.asarray(s_off.params["warp"]), rtol=1e-3, atol=1e-6
    )
    for li in range(len(off.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s_on.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s_off.params["neural_image"]["mlp"][li]["w"]),
            rtol=1e-3, atol=1e-6, err_msg=f"layer {li} weights",
        )


@pytest.mark.parametrize("fused_warp,nstreams", [("on", 1), ("on", 2), ("off", 1)])
def test_fused_step_bfloat16(rng, monkeypatch, fused_warp, nstreams):
    """bfloat16 compute_dtype (tpu.compute_dtype wiring): the kernel runs
    finite with streams and tracks the f32 path loosely (8-bit mantissa —
    this is a smoke/sanity bound, not equality; the TPU measurement rows are
    canon_bf16 / canon_s2_bf16 in tools/tpu_sweep.sh)."""
    from marf_tpu.ops.pallas import fused_step as fs

    monkeypatch.setattr(fs, "NSTREAMS", nstreams)
    arch16 = NeuralImageConfig(
        layers=(None, 64, 64, 3), posenc_L=4, barf_c2f=(0, 0.4), compute_dtype="bfloat16"
    )
    _, on16 = cfg_pair(arch=arch16, fused_warp=fused_warp)
    _, on32 = cfg_pair(fused_warp=fused_warp)
    data = fake_data(on32, rng)
    s16, m16 = run_steps(on16, data, n=5)
    _, m32 = run_steps(on32, data, n=5)
    assert np.asarray(m16["finite"]).all()
    # identical initial params -> the first-row loss differs only by dtype
    np.testing.assert_allclose(
        np.asarray(m16["all"])[0], np.asarray(m32["all"])[0], rtol=2e-2
    )
    # the trajectory stays in the same basin
    np.testing.assert_allclose(
        np.asarray(m16["all"])[-1], np.asarray(m32["all"])[-1], rtol=5e-2
    )
    assert abs(float(np.asarray(m16["PSNR"])[-1]) - float(np.asarray(m32["PSNR"])[-1])) < 0.5
    assert np.isfinite(np.asarray(s16.params["warp"])).all()


def test_fused_streams_config_knob(rng, monkeypatch):
    """tpu.fused_streams (NeuralImageConfig.fused_streams) selects the stream
    count per-config — no env/module global needed — and equals NSTREAMS=1."""
    from marf_tpu.ops.pallas import fused_step as fs

    # pin the module default so an inherited MARF_FUSED_STREAMS env can't
    # silently turn this into a streams=2-vs-streams=2 comparison
    monkeypatch.setattr(fs, "NSTREAMS", 1)
    arch2 = NeuralImageConfig(
        layers=(None, 64, 64, 3), posenc_L=4, barf_c2f=(0, 0.4), fused_streams=2
    )
    _, on2 = cfg_pair(arch=arch2, fused_warp="on")
    _, on1 = cfg_pair(fused_warp="on")
    data = fake_data(on1, rng)
    s2, m2 = run_steps(on2, data)
    s1, m1 = run_steps(on1, data)
    # streams regroup the tile iteration -> float-rounding-level differences
    # only (same house tolerances as test_fused_step_multi_stream)
    np.testing.assert_allclose(np.asarray(m2["all"]), np.asarray(m1["all"]), rtol=1e-5, atol=1e-7)
    for li in range(len(on1.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s2.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s1.params["neural_image"]["mlp"][li]["w"]),
            rtol=1e-3, atol=1e-6, err_msg=f"layer {li} weights",
        )


def test_lazy_metrics_matches_eager(rng):
    """tpu.lazy_metrics: the parameter trajectory is untouched (the edge term
    is gradient-blocked; Homography_Error is pure-metric), chunk-final
    metrics are identical, and intermediate stacked rows carry
    edge_loss = 0 / Homography_Error = 0."""
    from marf_tpu.models.planar import use_lazy_aux_metrics, use_lazy_edge_metrics

    base = dict(
        H=32, W=64, patch_H=16, patch_W=32, batch_size=3, max_iter=100,
        use_edges=True, alpha_initial=0.3,
        arch=NeuralImageConfig(layers=(None, 64, 64, 3), posenc_L=4, barf_c2f=(0, 0.4)),
    )
    eager = PlanarConfig(**base, fused_step="on", fused_warp="on", lazy_metrics="off")
    lazy = PlanarConfig(**base, fused_step="on", fused_warp="on", lazy_metrics="on")
    assert not use_lazy_edge_metrics(eager) and use_lazy_edge_metrics(lazy)
    assert not use_lazy_aux_metrics(eager) and use_lazy_aux_metrics(lazy)
    data = fake_data(eager, rng)

    s_e, m_e = run_steps(eager, data, n=4)
    s_l, m_l = run_steps(lazy, data, n=4)

    # updates never see the edge term -> identical parameters
    np.testing.assert_allclose(
        np.asarray(s_l.params["warp"]), np.asarray(s_e.params["warp"]), rtol=1e-6, atol=1e-8
    )
    for li in range(len(eager.arch.layer_dims)):
        np.testing.assert_allclose(
            np.asarray(s_l.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s_e.params["neural_image"]["mlp"][li]["w"]),
            rtol=1e-6, atol=1e-8, err_msg=f"layer {li}",
        )
    # chunk-final row (the only consumed one) identical, incl. the edge term
    for key in ("all", "loss_rgb", "loss_edge", "loss_render", "PSNR", "Homography_Error"):
        np.testing.assert_allclose(
            np.asarray(m_l[key])[-1], np.asarray(m_e[key])[-1],
            rtol=1e-5, atol=1e-7, err_msg=key,
        )
    # intermediate rows: edge term + aux metrics skipped (reported as 0),
    # rgb terms exact
    assert np.all(np.asarray(m_l["loss_edge"])[:-1] == 0.0)
    assert np.all(np.asarray(m_e["loss_edge"])[:-1] > 0.0)
    assert np.all(np.asarray(m_l["Homography_Error"])[:-1] == 0.0)
    assert np.all(np.asarray(m_e["Homography_Error"])[:-1] > 0.0)
    np.testing.assert_allclose(
        np.asarray(m_l["loss_rgb"]), np.asarray(m_e["loss_rgb"]), rtol=1e-5, atol=1e-7
    )
    assert np.asarray(m_l["finite"]).all()


@pytest.mark.parametrize("fused_warp", ["off", "on"])
def test_staged_constant_streams_match_fallback(rng, fused_warp):
    """engine/step.py stage_fused_constant_streams: the setup-staged
    pre-padded constant streams (targets_cf_p / masks_cf_p / grid_b_p) must
    produce the same trajectory as the in-graph fallback build — they are
    the same values, staged once instead of rebuilt per step."""
    from marf_tpu.engine.step import stage_fused_constant_streams

    _, on = cfg_pair(fused_warp=fused_warp, use_masks=True, use_edges=True)
    data = fake_data(on, rng)
    staged_keys = stage_fused_constant_streams(on, data)
    assert set(staged_keys) == (
        {"targets_cf_p", "masks_cf_p", "grid_b_p"}
        if fused_warp == "on"
        else {"targets_cf_p", "masks_cf_p"}
    )
    from marf_tpu.ops.pallas.fused_step import fused_cols

    h, w = on.map_hw
    N = on.batch_size * h * w
    Np = fused_cols(N, on.arch)
    for k, v in staged_keys.items():
        assert v.shape[1] == Np, k
        if k != "grid_b_p":
            assert np.all(np.asarray(v)[:, N:] == 0.0), f"{k} pad not zero"
    if fused_warp == "on":
        # v5 contract: padding columns carry b = -1 (no one-hot match)
        assert np.all(np.asarray(staged_keys["grid_b_p"])[2, N:] == -1.0)

    s_fb, m_fb = run_steps(on, data)
    s_st, m_st = run_steps(on, dict(data, **staged_keys))
    for key in ("all", "loss_rgb", "loss_edge", "PSNR"):
        np.testing.assert_array_equal(
            np.asarray(m_st[key]), np.asarray(m_fb[key]), err_msg=key
        )
    np.testing.assert_array_equal(
        np.asarray(s_st.params["warp"]), np.asarray(s_fb.params["warp"])
    )
    for li in range(len(on.arch.layer_dims)):
        np.testing.assert_array_equal(
            np.asarray(s_st.params["neural_image"]["mlp"][li]["w"]),
            np.asarray(s_fb.params["neural_image"]["mlp"][li]["w"]),
            err_msg=f"layer {li} weights",
        )
