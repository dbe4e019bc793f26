"""Sweep runner + data-layer tests (CPU, synthetic)."""

import os

import numpy as np
import pytest

from marf_tpu.data.planar import (
    compute_edges_host,
    erode_images_host,
    load_images,
    prepare_images,
    resolve_data_root,
    save_images,
    synthesize_planar_dataset,
)
from marf_tpu.models.neural_image import NeuralImageConfig
from marf_tpu.models.planar import PlanarConfig

REF_DATA = "/root/reference/data/planar"


def small_cfg(**kw):
    d = dict(H=96, W=128, patch_H=48, patch_W=64, batch_size=3, max_iter=40,
             arch=NeuralImageConfig(layers=(None, 32, 3), posenc_L=4))
    d.update(kw)
    return PlanarConfig(**d)


def test_synthetic_dataset_layout():
    cfg = small_cfg()
    d = synthesize_planar_dataset(cfg, seed=1)
    assert d["rgb"].shape == (3, 3, 48, 64)
    assert d["masks"].shape == (3, 1, 48, 64)
    assert d["gt_hom"].shape == (3, 3, 3)
    assert d["edges"].shape == (3, 1, 48, 64)
    assert 0.0 <= d["rgb"].min() and d["rgb"].max() <= 1.0
    # image 0 is unwarped: its normalized gt homography is the identity
    np.testing.assert_allclose(d["gt_hom"][0], np.eye(3), atol=1e-5)
    # masks are binary with some occlusion
    assert set(np.unique(d["masks"])) == {0.0, 1.0}
    assert d["masks"].mean() < 1.0


def test_save_images_roundtrip(tmp_path, rng):
    imgs = rng.rand(2, 3, 8, 10).astype(np.float32)
    paths = save_images(imgs, "dbg", str(tmp_path))
    assert all(os.path.isfile(p) for p in paths)
    back = load_images(paths)
    np.testing.assert_allclose(back, imgs, atol=1 / 255.0 + 1e-6)


@pytest.mark.skipif(not os.path.isdir(REF_DATA), reason="reference dataset not mounted")
def test_real_dataset_loading():
    cfg = PlanarConfig()
    root = resolve_data_root("cat_batch3")
    assert root.endswith("cat_batch3")
    d = prepare_images(
        cfg,
        fps_images=[os.path.join(root, f"{i}.png") for i in range(2)],
        fps_masks=[os.path.join(root, f"{i}-m.png") for i in range(2)],
        fp_gt=os.path.join(root, "gt.png"),
        fps_hom=[os.path.join(root, "H_0_1.mat")],
    )
    # thumbnails to patch size, SIDAR mask inversion applied
    assert d["rgb"].shape == (2, 3, 180, 240)
    assert d["masks"].shape == (2, 1, 180, 240)
    assert set(np.unique(d["masks"])) <= {0.0, 1.0}
    assert d["gt"].shape == (3, 360, 480)
    assert d["gt_hom"].shape == (2, 3, 3)
    assert d["edges"].shape == (2, 1, 180, 240)
    assert d["masks_eroded"].sum() <= d["masks"].sum()


def test_host_edges_erosion_consistency(rng):
    imgs = rng.rand(2, 1, 20, 24).astype(np.float32)
    e = compute_edges_host(imgs)
    assert e.shape == imgs.shape and np.isfinite(e).all()
    m = (imgs > 0.5).astype(np.float32)
    er = erode_images_host(m)
    assert (er <= m + 1e-6).all()


def test_sweep_case_table():
    import sweep

    assert set(sweep.CASES) == set(range(1, 10))
    for case in sweep.CASES.values():
        assert "name" in case


def test_sweep_runs_one_case(tmp_path, monkeypatch):
    import sweep

    monkeypatch.chdir(tmp_path)  # output/ lands in tmp
    m = sweep.run_case(
        "synthetic", 4, seed=3, group="sweeptest",
        extra=dict(H=96, W=128, patch_H=48, patch_W=64, max_iter=20,
                   freq={"scalar": 10, "vis": 20, "ckpt": None}, save_checkpoint=False),
    )
    assert m.it == 20
    assert os.path.isdir(m.vis_path)


def test_tb_writer_roundtrip(tmp_path, rng):
    """Our torch-free TB writer produces event files TensorBoard can read back."""
    from marf_tpu.utils.tb import SummaryWriter
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    w = SummaryWriter(str(tmp_path))
    for i in range(5):
        w.add_scalar("train/PSNR", 20.0 + i, step=i * 20)
    w.add_image("train/predicted_image", rng.rand(3, 8, 10).astype(np.float32), step=100)
    w.close()
    ea = EventAccumulator(str(tmp_path))
    ea.Reload()
    scalars = ea.Scalars("train/PSNR")
    assert [s.step for s in scalars] == [0, 20, 40, 60, 80]
    assert abs(scalars[-1].value - 24.0) < 1e-6
    assert ea.Tags()["images"] == ["train/predicted_image"]
