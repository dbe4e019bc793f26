"""Golden-trajectory regression: a 200-iter fixed-seed run on the real
cat_batch3 data must reproduce the recorded PSNR / Homography_Error
checkpoints (VERDICT r1 item 7 — turns the manually-verified convergence
parity into CI; metric definitions: reference model/planar.py:219-254).

The run uses reduced-resolution real data (patch 36x48 — canonical is
~12 s/step on the 1-CPU test platform, infeasible for CI; dims must keep
the source 4:3 aspect because PIL.thumbnail preserves aspect ratio,
reference inputs.py:27-28) but the full real pipeline end to end:
image/mask/.mat-homography loading + resize, warp, c2f schedule, composite
loss, Adam groups, metrics. Any change that shifts convergence trips the
checkpoints.

Goldens were recorded on the CPU backend (the conftest-forced test platform)
at f32, where the trajectory is deterministic; tolerances absorb minor XLA
version drift. Regenerate with:
    MARF_GOLDEN_REGEN=1 python -m pytest tests/test_golden_trajectory.py -s
which rewrites tests/golden_cat_batch3.json.

Skips when the reference dataset isn't on disk.
"""

import json
import os

import numpy as np
import pytest

from marf_tpu.utils.attrdict import AttrDict
from marf_tpu.utils.config import load_options, resolve_yaml_path

GOLDEN_FILE = os.path.join(os.path.dirname(__file__), "golden_cat_batch3.json")
# barf_c2f=[0,0.4] with max_iter=200 closes the c2f mask at step 80, so the
# 120/160/200 checkpoints run with the positional-encoding mask fully open
# and the alpha schedule well past its midpoint — late-schedule regressions
# (c2f weight handling, alpha mixing) are catchable off-TPU (VERDICT r4
# weak-5; the TPU goldens in tools/bench_goldens.json carry the
# full-resolution guardrail duty).
CHECK_STEPS = (40, 80, 120, 160, 200)
MAX_ITER = 200


def _dataset_available() -> bool:
    from marf_tpu.data.planar import resolve_data_root

    try:
        resolve_data_root("cat_batch3")
        return True
    except FileNotFoundError:
        return False


def _read_scalars(output_path: str) -> dict:
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    ea = EventAccumulator(output_path)
    ea.Reload()
    out = {}
    for tag in ("train/PSNR", "train/Homography_Error"):
        out[tag] = {s.step: s.value for s in ea.Scalars(tag)}
    return out


@pytest.mark.skipif(not _dataset_available(), reason="cat_batch3 data not on disk")
def test_golden_trajectory_cat_batch3(tmp_path):
    from marf_tpu.engine.trainer import Model

    opt = load_options(resolve_yaml_path("planar"))
    opt.update(
        AttrDict(
            model="planar",
            yaml="planar",
            group="golden",
            name="run",
            seed=3,
            H=72,
            W=96,
            patch_H=36,
            patch_W=48,
            max_iter=MAX_ITER,
            barf_c2f=[0, 0.4],
            output_path=str(tmp_path / "out"),
            freq=AttrDict(scalar=20, vis=MAX_ITER, ckpt=None),
            save_checkpoint=False,
        )
    )
    os.makedirs(opt.output_path, exist_ok=True)
    m = Model(opt)
    m.load_dataset()
    m.build_networks()
    m.setup_optimizer()
    m.setup_visualizer()
    m.train()

    scalars = _read_scalars(opt.output_path)
    measured = {
        str(step): {
            "PSNR": float(scalars["train/PSNR"][step]),
            "Homography_Error": float(scalars["train/Homography_Error"][step]),
        }
        for step in CHECK_STEPS
    }

    if os.environ.get("MARF_GOLDEN_REGEN"):
        print("\ngolden values:\n" + json.dumps(measured, indent=2))
        with open(GOLDEN_FILE, "w") as f:
            json.dump(measured, f, indent=2)
        pytest.skip("regenerated goldens")

    assert os.path.exists(GOLDEN_FILE), "golden file missing; run with MARF_GOLDEN_REGEN=1"
    with open(GOLDEN_FILE) as f:
        golden = json.load(f)
    for step in CHECK_STEPS:
        g, got = golden[str(step)], measured[str(step)]
        assert abs(got["PSNR"] - g["PSNR"]) < 0.05, (
            f"PSNR@{step}: {got['PSNR']:.4f} vs golden {g['PSNR']:.4f}"
        )
        assert abs(got["Homography_Error"] - g["Homography_Error"]) < 5e-3 + 1e-3 * abs(g["Homography_Error"]), (
            f"Homography_Error@{step}: {got['Homography_Error']:.5f} vs golden {g['Homography_Error']:.5f}"
        )
