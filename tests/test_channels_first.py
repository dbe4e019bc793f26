"""Channels-first compute path: numerical parity with the row-major path."""

import jax
import jax.numpy as jnp
import numpy as np

from marf_tpu.models.neural_image import (
    NeuralImageConfig,
    apply_neural_image,
    apply_neural_image_cf,
    init_neural_image,
)
from marf_tpu.ops.grid import GridSpec, normalized_pixel_grid
from marf_tpu.ops.posenc import barf_posenc, barf_posenc_cf
from marf_tpu.ops.warp import warp_grid, warp_grid_cf


def test_posenc_cf_matches_rm(rng):
    coord = (rng.rand(5, 40, 2) * 2 - 1).astype(np.float32)
    rm = np.asarray(barf_posenc(jnp.asarray(coord), 8))
    cf = np.asarray(barf_posenc_cf(jnp.asarray(coord.transpose(0, 2, 1)), 8))
    np.testing.assert_allclose(cf.transpose(0, 2, 1), rm, atol=1e-6)


def test_warp_cf_matches_rm(rng):
    spec = GridSpec(H=48, W=64, patch_H=24, patch_W=32)
    grid = normalized_pixel_grid(spec, crop=True)
    w = jnp.asarray(rng.randn(4, 8).astype(np.float32) * 0.2)
    rm = np.asarray(warp_grid(grid, w))  # [B, HW, 2]
    cf = np.asarray(warp_grid_cf(grid, w))  # [B, 2, HW]
    np.testing.assert_allclose(cf.transpose(0, 2, 1), rm, rtol=1e-5, atol=1e-6)


def test_apply_cf_matches_rm(rng):
    for skip in ((), (1,)):
        cfg = NeuralImageConfig(layers=(None, 32, 32, 3), skip=skip, posenc_L=4, barf_c2f=(0, 0.4))
        params = init_neural_image(jax.random.PRNGKey(0), cfg)
        coords = jnp.asarray((rng.rand(3, 120, 2) * 2 - 1).astype(np.float32))
        progress = jnp.float32(0.2)
        rm = np.asarray(apply_neural_image(params, coords, cfg, progress))
        cf = np.asarray(apply_neural_image_cf(params, coords.transpose(0, 2, 1), cfg, progress))
        np.testing.assert_allclose(cf.transpose(0, 2, 1), rm, rtol=1e-5, atol=1e-6)


def test_apply_cf_grad_matches_rm(rng):
    cfg = NeuralImageConfig(layers=(None, 16, 3), posenc_L=4, barf_c2f=(0, 0.4))
    params = init_neural_image(jax.random.PRNGKey(0), cfg)
    coords = jnp.asarray((rng.rand(200, 2) * 2 - 1).astype(np.float32))
    p = jnp.float32(0.3)
    g_rm = jax.grad(lambda prm: jnp.sum(apply_neural_image(prm, coords, cfg, p) ** 2))(params)
    g_cf = jax.grad(lambda prm: jnp.sum(apply_neural_image_cf(prm, coords.T, cfg, p) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_rm), jax.tree.leaves(g_cf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_graph_forward_uses_cf_and_matches(rng):
    """graph_forward (cf layout) gives the same maps as a manual row-major
    warp+MLP oracle (the torch-oracle-tested reference layout)."""
    from marf_tpu.models.planar import graph_forward, init_graph_params
    from marf_tpu.ops.grid import normalized_pixel_grid
    from marf_tpu.ops.warp import warp_grid
    from tests.test_models import fake_data, small_cfg

    cfg = small_cfg()
    params = init_graph_params(jax.random.PRNGKey(0), cfg)
    data = fake_data(cfg, rng)
    out_cf = graph_forward(params, data, cfg, jnp.float32(0.1))
    grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
    warped = warp_grid(grid, params["warp"])  # [B, HW, 2]
    rgb_rm = apply_neural_image(params["neural_image"], warped, cfg.arch, jnp.float32(0.1))
    h, w = cfg.map_hw
    out_rm = {
        "rgb_prediction": rgb_rm,
        "rgb_prediction_map": rgb_rm.reshape(cfg.batch_size, h, w, 3).transpose(0, 3, 1, 2),
    }
    np.testing.assert_allclose(
        np.asarray(out_cf["rgb_prediction_map"]), np.asarray(out_rm["rgb_prediction_map"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_cf["rgb_prediction"]), np.asarray(out_rm["rgb_prediction"]),
        rtol=1e-5, atol=1e-5,
    )
