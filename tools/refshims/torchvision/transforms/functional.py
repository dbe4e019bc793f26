"""torchvision.transforms.functional shim (PIL/numpy <-> torch)."""

import numpy as np
import torch
from PIL import Image


def to_tensor(pic):
    """PIL image or HWC ndarray -> CHW float tensor; uint8 scaled to [0,1],
    float dtypes passed through (torchvision semantics)."""
    if isinstance(pic, Image.Image):
        arr = np.asarray(pic)
    else:
        arr = np.asarray(pic)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    arr = np.ascontiguousarray(arr.transpose(2, 0, 1))
    t = torch.from_numpy(arr)
    if t.dtype == torch.uint8:
        return t.float().div(255.0)
    return t


def to_pil_image(tensor, mode=None):
    arr = tensor.detach().cpu().numpy()
    if arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
        if arr.shape[-1] == 1:
            arr = arr[..., 0]
    if arr.dtype != np.uint8:
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    return Image.fromarray(arr, mode=mode)
