"""Fused posenc+MLP Pallas kernel: forward/backward parity with the XLA path
(interpreter mode on CPU; the same kernels compile on TPU)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marf_tpu.models.neural_image import (
    NeuralImageConfig,
    apply_neural_image,
    init_neural_image,
)
from marf_tpu.ops.pallas.fused_mlp import fused_mlp_supported, fused_neural_image
from marf_tpu.ops.posenc import barf_c2f_weights


def cfgs():
    return NeuralImageConfig(layers=(None, 64, 64, 3), posenc_L=4, barf_c2f=(0, 0.4), fused="off")


def _fused_cfg(cfg):
    return dataclasses.replace(cfg, fused="on")


@pytest.mark.parametrize("n_points", [256, 1024, 1500])  # below/at/above one tile
def test_forward_parity(rng, n_points):
    cfg = cfgs()
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray((rng.rand(n_points, 2) * 2 - 1).astype(np.float32))
    progress = jnp.float32(0.15)
    ref = apply_neural_image(params, coords, cfg, progress)
    fused = apply_neural_image(params, coords, _fused_cfg(cfg), progress)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_forward_parity_batched(rng):
    cfg = cfgs()
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray((rng.rand(3, 700, 2) * 2 - 1).astype(np.float32))
    progress = jnp.float32(0.3)
    ref = apply_neural_image(params, coords, cfg, progress)
    fused = apply_neural_image(params, coords, _fused_cfg(cfg), progress)
    assert fused.shape == ref.shape == (3, 700, 3)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_forward_parity_no_posenc(rng):
    cfg = NeuralImageConfig(layers=(None, 32, 3), posenc_L=None, fused="off")
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray((rng.rand(300, 2) * 2 - 1).astype(np.float32))
    ref = apply_neural_image(params, coords, cfg)
    fused = apply_neural_image(params, coords, _fused_cfg(cfg))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_forward_parity_no_c2f(rng):
    cfg = NeuralImageConfig(layers=(None, 32, 3), posenc_L=4, barf_c2f=None, fused="off")
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray((rng.rand(200, 2) * 2 - 1).astype(np.float32))
    ref = apply_neural_image(params, coords, cfg)
    fused = apply_neural_image(params, coords, _fused_cfg(cfg))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gradient_parity(rng):
    """Full VJP parity: dparams and dcoords vs the XLA autodiff path."""
    cfg = cfgs()
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray((rng.rand(900, 2) * 2 - 1).astype(np.float32))
    target = jnp.asarray(rng.rand(900, 3).astype(np.float32))
    progress = jnp.float32(0.2)

    def loss_ref(p, c):
        return jnp.sum((apply_neural_image(p, c, cfg, progress) - target) ** 2)

    fcfg = _fused_cfg(cfg)

    def loss_fused(p, c):
        return jnp.sum((apply_neural_image(p, c, fcfg, progress) - target) ** 2)

    (l_ref, (gp_ref, gc_ref)) = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, coords)
    (l_fused, (gp_fused, gc_fused)) = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, coords)

    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gc_fused), np.asarray(gc_ref), rtol=1e-3, atol=1e-4)
    for li in range(len(params["mlp"])):
        np.testing.assert_allclose(
            np.asarray(gp_fused["mlp"][li]["w"]), np.asarray(gp_ref["mlp"][li]["w"]),
            rtol=1e-3, atol=1e-4, err_msg=f"dW layer {li}",
        )
        np.testing.assert_allclose(
            np.asarray(gp_fused["mlp"][li]["b"]), np.asarray(gp_ref["mlp"][li]["b"]),
            rtol=1e-3, atol=1e-4, err_msg=f"db layer {li}",
        )


def test_supported_gate():
    assert fused_mlp_supported(NeuralImageConfig())
    assert not fused_mlp_supported(NeuralImageConfig(skip=(2,)))


def test_fused_in_full_train_step(rng):
    """The fused kernel slots into the full jitted train step."""
    from marf_tpu.engine.step import init_train_state, make_optimizer, make_train_chunk, make_train_step
    from marf_tpu.models.planar import PlanarConfig, init_graph_params
    from tests.test_models import fake_data

    arch = NeuralImageConfig(layers=(None, 32, 32, 3), posenc_L=4, barf_c2f=(0, 0.4), fused="on")
    cfg = PlanarConfig(H=32, W=48, patch_H=16, patch_W=24, batch_size=2, max_iter=50, arch=arch)
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer({"lr": 1e-3, "lr_warp": 1e-3, "lr_mask": 1e-3, "algo": "Adam"}, 50)
    state = init_train_state(params, tx)
    data = fake_data(cfg, rng)
    chunk = make_train_chunk(make_train_step(cfg, tx), 3, donate=False)
    s, m = chunk(state, data)
    assert np.isfinite(np.asarray(m["all"])).all()
    # and it actually trains (params move)
    assert not np.allclose(
        np.asarray(s.params["neural_image"]["mlp"][0]["w"]),
        np.asarray(params["neural_image"]["mlp"][0]["w"]),
    )
