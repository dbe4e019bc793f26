"""Minimal TensorBoard event writer (no torch dependency).

Writes the same scalar/image event streams the reference emits via
`torch.utils.tensorboard.SummaryWriter` (reference model/planar.py:110-111,
226-254, util_vis.py:10-22), using tensorboard's own `EventFileWriter` and
protos. Tags and cadences are kept identical so curves diff cleanly against
reference runs (SURVEY.md §5 "Metrics / logging").
"""

from __future__ import annotations

import io
import time

import numpy as np

try:
    from tensorboard.compat.proto.event_pb2 import Event
    from tensorboard.compat.proto.summary_pb2 import Summary
    from tensorboard.summary.writer.event_file_writer import EventFileWriter

    _TB_AVAILABLE = True
except ImportError:  # pragma: no cover - tensorboard is expected in the image
    _TB_AVAILABLE = False

from PIL import Image


class SummaryWriter:
    """Scalar + image TensorBoard writer with the torch SummaryWriter surface
    used by the reference (`add_scalar`, `add_image`, `flush`, `close`)."""

    def __init__(self, log_dir: str, flush_secs: int = 10):
        if not _TB_AVAILABLE:
            raise RuntimeError("tensorboard is not installed")
        self._writer = EventFileWriter(log_dir, flush_secs=flush_secs)

    def add_scalar(self, tag: str, value, step: int) -> None:
        summary = Summary(value=[Summary.Value(tag=tag, simple_value=float(value))])
        self._writer.add_event(Event(wall_time=time.time(), step=int(step), summary=summary))

    def add_image(self, tag: str, image, step: int) -> None:
        """image: [C, H, W] float array in [0, 1] (C in {1, 3, 4})."""
        arr = np.asarray(image)
        if arr.ndim == 2:
            arr = arr[None]
        chw = np.clip(arr, 0.0, 1.0)
        hwc = (np.transpose(chw, (1, 2, 0)) * 255).astype(np.uint8)
        if hwc.shape[-1] == 1:
            hwc = hwc[..., 0]
        buf = io.BytesIO()
        Image.fromarray(hwc).save(buf, format="PNG")
        img_proto = Summary.Image(
            height=chw.shape[1],
            width=chw.shape[2],
            colorspace=chw.shape[0],
            encoded_image_string=buf.getvalue(),
        )
        summary = Summary(value=[Summary.Value(tag=tag, image=img_proto)])
        self._writer.add_event(Event(wall_time=time.time(), step=int(step), summary=summary))

    def flush(self) -> None:
        self._writer.flush()

    def close(self) -> None:
        self._writer.close()
