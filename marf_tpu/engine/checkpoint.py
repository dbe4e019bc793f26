"""Checkpoint / resume.

The reference stubs this capability but never implements it: `load:` /
`resume:` config keys exist (reference options/planar.yaml:31,88) and
`progress` is an nn.Parameter "so it could be checkpointed"
(model/planar.py:406-408), yet no state_dict/save/restore call exists
(SURVEY.md §2.4(2)). Implemented here for real with orbax: the full
TrainState pytree {step, params, opt_state} round-trips; `--resume` picks the
latest step, `--load=<path>` restores from an explicit run directory.
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _ORBAX = True
except ImportError:  # pragma: no cover
    _ORBAX = False

from marf_tpu.engine.step import TrainState
from marf_tpu.utils.console import log

_CKPT_SUBDIR = "ckpt"


def _ckpt_dir(output_path: str) -> str:
    return os.path.abspath(os.path.join(output_path, _CKPT_SUBDIR))


def save_checkpoint(output_path: str, state: TrainState) -> str:
    """Save the TrainState under `<output_path>/ckpt/<step>`."""
    assert _ORBAX, "orbax is required for checkpointing"
    step = int(state.step)
    path = os.path.join(_ckpt_dir(output_path), str(step))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    log.info(f"saved checkpoint @ step {step} -> {path}")
    return path


def latest_checkpoint(output_path: str) -> str | None:
    d = _ckpt_dir(output_path)
    if not os.path.isdir(d):
        return None
    steps = [int(s) for s in os.listdir(d) if s.isdigit()]
    if not steps:
        return None
    return os.path.join(d, str(max(steps)))


def restore_checkpoint(path: str, template: TrainState) -> TrainState:
    """Restore a TrainState from `path`, shaped like `template`."""
    assert _ORBAX, "orbax is required for checkpointing"
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(template))
    restored = ckptr.restore(os.path.abspath(path), abstract)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x)), restored)


def resolve_restore_path(output_path: str, load: str | None, resume) -> str | None:
    """Honor the reference's `load:` / `resume:` config keys
    (options/planar.yaml:31,88): `load` is an explicit path (run dir or ckpt
    dir); `resume` True -> latest in this run dir, int -> that step."""
    if load:
        cand = load
        if os.path.isdir(os.path.join(cand, _CKPT_SUBDIR)):
            cand = latest_checkpoint(cand)
        return cand
    if resume:
        if resume is True:
            return latest_checkpoint(output_path)
        return os.path.join(_ckpt_dir(output_path), str(int(resume)))
    return None
