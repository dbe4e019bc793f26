"""Loaded via PYTHONPATH when running the reference on CPU torch: make
`torch.cuda.device('cpu')` a no-op context (reference train.py:21 assumes a
CUDA device exists; this image has CPU torch only)."""

import contextlib

import torch


class _DeviceCtx:
    def __init__(self, device=None):
        self._ctx = contextlib.nullcontext()

    def __enter__(self):
        return self._ctx.__enter__()

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)


_orig = torch.cuda.device


def _device(dev=None):
    if isinstance(dev, str) and not dev.startswith("cuda"):
        return _DeviceCtx(dev)
    return _orig(dev)


torch.cuda.device = _device

# The reference's compute_edges only detaches when image.is_cuda
# (inputs.py:57-58); on CPU the .numpy() call hits a grad-tracking tensor.
# Auto-detach reproduces the GPU behavior (the edge path is gradient-blocked
# either way, SURVEY.md §2.4(1)).
_orig_numpy = torch.Tensor.numpy


def _numpy(self, *args, **kwargs):
    if self.requires_grad:
        self = self.detach()
    return _orig_numpy(self, *args, **kwargs)


torch.Tensor.numpy = _numpy

# MARF_DUMP_INIT=<path.npz>: dump the Graph's initial state_dict the moment
# build_networks() moves it to the device (reference model/planar.py:84) —
# i.e. exactly the parameters training starts from, after the c2f first-layer
# rescale (reference model/planar.py:421-426). Used for the same-init parity
# transplant into marf_tpu (--load_torch_init).
import os as _os

_dump_path = _os.environ.get("MARF_DUMP_INIT")
if _dump_path:
    _orig_to = torch.nn.Module.to

    def _to(self, *args, **kwargs):
        out = _orig_to(self, *args, **kwargs)
        if type(self).__name__ == "Graph" and not _os.path.exists(_dump_path):
            import numpy as _np

            sd = {k: v.detach().cpu().numpy() for k, v in self.state_dict().items()}
            _np.savez(_dump_path, **sd)
            print(f"[refshim] dumped initial state_dict ({len(sd)} tensors) -> {_dump_path}")
        return out

    torch.nn.Module.to = _to
