"""Model tests: init distribution parity, forward shapes/semantics, torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from marf_tpu.models.implicit_mask import (
    apply_implicit_mask,
    embed_image,
    init_implicit_mask,
    init_view_embedding,
    mask_head_inputs,
)
from marf_tpu.models.neural_image import (
    NeuralImageConfig,
    apply_neural_image,
    init_neural_image,
)
from marf_tpu.models.planar import PlanarConfig, graph_forward, graph_loss, init_graph_params


def small_cfg(**kw):
    defaults = dict(
        H=48, W=64, patch_H=24, patch_W=32, batch_size=3, max_iter=100,
        arch=NeuralImageConfig(layers=(None, 32, 32, 3), barf_c2f=(0, 0.4)),
    )
    defaults.update(kw)
    return PlanarConfig(**defaults)


def fake_data(cfg, rng):
    h, w = cfg.map_hw
    B = cfg.batch_size
    return {
        "rgb": jnp.asarray(rng.rand(B, 3, h, w).astype(np.float32)),
        "masks": jnp.asarray((rng.rand(B, 1, h, w) > 0.3).astype(np.float32)),
        "masks_eroded": jnp.asarray((rng.rand(B, 1, h, w) > 0.5).astype(np.float32)),
        "edges": jnp.asarray(rng.rand(B, 1, h, w).astype(np.float32)),
        "gt_hom": jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))),
    }


# ------------------------------------------------------------------ init parity


def test_linear_init_distribution():
    """torch.nn.Linear parity: W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    from marf_tpu.models.linear import init_linear

    fan_in = 64
    p = init_linear(jax.random.PRNGKey(0), fan_in, 4096)
    bound = 1.0 / np.sqrt(fan_in)
    w = np.asarray(p["w"])
    assert w.min() >= -bound and w.max() <= bound
    assert abs(w.mean()) < 0.002
    # uniform std = bound/sqrt(3)
    assert abs(w.std() - bound / np.sqrt(3)) < 0.002


def test_first_layer_c2f_rescale():
    cfg = NeuralImageConfig(layers=(None, 16, 3), barf_c2f=(0, 0.4), posenc_L=8)
    p = init_neural_image(jax.random.PRNGKey(0), cfg)
    input_dim = 2 + 4 * 8
    bound = 1.0 / np.sqrt(input_dim) * np.sqrt(input_dim / 2.0)
    w0 = np.asarray(p["mlp"][0]["w"])
    assert w0.shape == (input_dim, 16)
    assert w0.max() <= bound + 1e-6 and w0.max() > bound * 0.9
    # no rescale without c2f
    p2 = init_neural_image(jax.random.PRNGKey(0), NeuralImageConfig(layers=(None, 16, 3), posenc_L=8))
    assert np.asarray(p2["mlp"][0]["w"]).max() <= 1.0 / np.sqrt(input_dim) + 1e-6


# ------------------------------------------------------------- neural image fwd


def test_neural_image_forward_torch_oracle(rng):
    """Against an independent torch implementation of the reference forward
    (model/planar.py:429-471) with parameters copied over."""
    import torch

    L = 4
    cfg = NeuralImageConfig(layers=(None, 16, 16, 3), posenc_L=L, barf_c2f=(0.0, 0.5))
    params = init_neural_image(jax.random.PRNGKey(1), cfg)
    coords = rng.randn(2, 50, 2).astype(np.float32)
    progress = 0.2

    ours = np.asarray(apply_neural_image(params, jnp.asarray(coords), cfg, jnp.float32(progress)))

    # torch oracle, written from the reference's formulas
    tc = torch.from_numpy(coords)
    freq = 2 ** torch.arange(L, dtype=torch.float32) * np.pi
    spectrum = tc[..., None] * freq
    enc = torch.stack([spectrum.sin(), spectrum.cos()], dim=-2).reshape(2, 50, -1)
    start, end = 0.0, 0.5
    alpha = (progress - start) / (end - start) * L
    k = torch.arange(L, dtype=torch.float32)
    weight = (1 - (alpha - k).clamp(min=0, max=1).mul(np.pi).cos()) / 2
    enc = (enc.reshape(-1, L) * weight).reshape(2, 50, -1)
    feat = torch.cat([tc, enc], dim=-1)
    for li, layer in enumerate(params["mlp"]):
        w = torch.from_numpy(np.asarray(layer["w"]))
        b = torch.from_numpy(np.asarray(layer["b"]))
        feat = feat @ w + b
        if li != len(params["mlp"]) - 1:
            feat = torch.relu(feat)
    expected = torch.sigmoid(feat).numpy()
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_neural_image_no_posenc():
    cfg = NeuralImageConfig(layers=(None, 8, 3), posenc_L=None)
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    assert params["mlp"][0]["w"].shape[0] == 2
    out = apply_neural_image(params, jnp.zeros((4, 10, 2)), cfg)
    assert out.shape == (4, 10, 3)


def test_neural_image_skip_connections():
    cfg = NeuralImageConfig(layers=(None, 8, 8, 3), skip=(1,), posenc_L=2)
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    input_dim = 2 + 4 * 2
    assert params["mlp"][1]["w"].shape[0] == 8 + input_dim
    out = apply_neural_image(params, jnp.zeros((1, 5, 2)), cfg)
    assert out.shape == (1, 5, 3)


def test_output_in_sigmoid_range(rng):
    cfg = NeuralImageConfig(layers=(None, 8, 3), posenc_L=2)
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    out = np.asarray(apply_neural_image(params, jnp.asarray(rng.randn(2, 9, 2).astype(np.float32)), cfg))
    assert (out > 0).all() and (out < 1).all()


# ------------------------------------------------------------- implicit masks


def test_embed_image_binary_quirk(rng):
    """image.long() on [0,1] floats -> only embedding rows {0,1} used
    (SURVEY.md §2.4(4))."""
    table = init_view_embedding(jax.random.PRNGKey(0), n_vocab=10)
    img = rng.rand(3, 4, 5).astype(np.float32)
    img[0, 0, 0] = 1.0  # exactly 1 -> index 1
    out = np.asarray(embed_image(table, jnp.asarray(img)))
    assert out.shape == (20, 3 * 128)
    t = np.asarray(table)
    flat_idx = (img >= 1.0).astype(int).reshape(3, -1).T  # oracle: floor
    expected = t[flat_idx].reshape(20, -1)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_embed_image_quantize_fix_mode(rng):
    table = init_view_embedding(jax.random.PRNGKey(0), n_vocab=300)
    img = rng.rand(3, 2, 2).astype(np.float32)
    out = np.asarray(embed_image(table, jnp.asarray(img), quantize_levels=256))
    idx = np.clip((img * 255).astype(int), 0, 299).reshape(3, -1).T
    expected = np.asarray(table)[idx].reshape(4, -1)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_implicit_mask_forward_shapes(rng):
    params = init_implicit_mask(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(7, 426).astype(np.float32))
    out = np.asarray(apply_implicit_mask(params, x))
    assert out.shape == (7, 1)
    assert (out > 0).all() and (out < 1).all()


def test_mask_head_inputs_shape(rng):
    table = init_view_embedding(jax.random.PRNGKey(0), n_vocab=10)
    images = jnp.asarray(rng.rand(2, 3, 4, 6).astype(np.float32))
    grid = jnp.asarray(rng.randn(24, 2).astype(np.float32))
    out = mask_head_inputs(table, images, grid)
    assert out.shape == (2, 24, 384 + 42)


# ------------------------------------------------------------------ full graph


def test_graph_forward_shapes(rng):
    cfg = small_cfg()
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    data = fake_data(cfg, rng)
    out = graph_forward(params, data, cfg, jnp.float32(0.1))
    h, w = cfg.map_hw
    assert out["rgb_prediction"].shape == (3, h * w, 3)
    assert out["rgb_prediction_map"].shape == (3, 3, h, w)
    assert out["edge_prediction"].shape == (3, 3, h, w)


def test_graph_forward_implicit_mask_modes(rng):
    for single in (False, True):
        cfg = small_cfg(use_implicit_mask=True, build_single_masks=single, N_vocab=20)
        params = init_graph_params(jax.random.PRNGKey(0), cfg)
        data = fake_data(cfg, rng)
        out = graph_forward(params, data, cfg, jnp.float32(0.1))
        h, w = cfg.map_hw
        assert out["mask_prediction"].shape == (3, h * w, 1)
        assert out["mask_prediction_map"].shape == (3, 1, h, w)
        if single:
            # heads are independent: different params per image
            w0 = np.asarray(params["implicit_mask"]["mlp"][0]["w"])
            assert not np.allclose(w0[0], w0[1])


def test_graph_loss_terms(rng):
    cfg = small_cfg()
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    data = fake_data(cfg, rng)
    out = graph_forward(params, data, cfg, jnp.float32(0.0))
    loss = graph_loss(out, data, cfg, jnp.int32(0))
    assert set(loss) == {"render", "rgb", "mask", "edge"}
    # at step 0, alpha = alpha_initial = 0 -> render = rgb + 0.5*0
    np.testing.assert_allclose(float(loss["render"]), float(loss["rgb"]), rtol=1e-6)
    # at mid schedule alpha = 0.5
    loss_mid = graph_loss(out, data, cfg, jnp.int32(50))
    expected = 0.5 * float(loss_mid["rgb"]) + 0.5 * float(loss_mid["edge"])
    np.testing.assert_allclose(float(loss_mid["render"]), expected, rtol=1e-5)


def test_graph_loss_no_masks(rng):
    cfg = small_cfg(use_masks=False)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    data = dict(fake_data(cfg, rng), masks=None, masks_eroded=None)
    out = graph_forward(params, data, cfg, jnp.float32(0.0))
    loss = graph_loss(out, data, cfg, jnp.int32(0))
    # unmasked MSE path
    expected = np.mean((np.asarray(out["rgb_prediction_map"]) - np.asarray(data["rgb"])) ** 2)
    np.testing.assert_allclose(float(loss["rgb"]), expected, rtol=1e-5)


def test_dedup_hw_validation_env_gate(tmp_path, monkeypatch):
    """fused_dedup='auto' refuses a validation recorded under different
    {jax, jaxlib, libtpu} versions (VERDICT r4 weak-1: the miscompiles the
    gate guards against were version-specific), and a pre-stamp record
    (no env) counts as stale."""
    import json
    import warnings

    import pytest

    from marf_tpu.models import planar as pm

    f = tmp_path / "hw_validation.json"
    monkeypatch.setattr(pm, "_HW_VALIDATION_FILE", str(f))
    monkeypatch.setattr(pm.jax, "default_backend", lambda: "tpu")

    here = {**pm.runtime_env(),
            "device": pm.jax.devices()[0].device_kind}

    # stale versions -> False, with a one-time warning
    f.write_text(json.dumps({"fused_dedup": {"validated": True, "env": {
        **here, "jax": "0.0.1"}}}))
    monkeypatch.setattr(pm, "_dedup_stale_warned", False)
    with pytest.warns(UserWarning, match="revalidated"):
        assert pm.dedup_hw_validated() is False

    # matching env (incl. the device generation) -> True
    f.write_text(json.dumps({"fused_dedup": {"validated": True, "env": here}}))
    assert pm.dedup_hw_validated() is True

    # different device generation, same versions -> False (a v5e validation
    # says nothing about another chip's Mosaic lowering)
    f.write_text(json.dumps({"fused_dedup": {"validated": True, "env": {
        **here, "device": "TPU v9 imaginary0"}}}))
    monkeypatch.setattr(pm, "_dedup_stale_warned", False)
    with pytest.warns(UserWarning):
        assert pm.dedup_hw_validated() is False

    # libtpu change alone -> False (new Mosaic = the miscompile vector)
    f.write_text(json.dumps({"fused_dedup": {"validated": True, "env": {
        **here, "libtpu": "libtpu-nightly==9.9.9"}}}))
    monkeypatch.setattr(pm, "_dedup_stale_warned", False)
    with pytest.warns(UserWarning):
        assert pm.dedup_hw_validated() is False

    # pre-stamp record (no env) -> False
    f.write_text(json.dumps({"fused_dedup": {"validated": True}}))
    monkeypatch.setattr(pm, "_dedup_stale_warned", False)
    with pytest.warns(UserWarning):
        assert pm.dedup_hw_validated() is False

    # not validated at all -> False, no warning
    f.write_text(json.dumps({}))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert pm.dedup_hw_validated() is False
