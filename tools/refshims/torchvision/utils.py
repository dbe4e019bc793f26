"""torchvision.utils shim: make_grid."""

import torch


def make_grid(tensor, nrow=8, padding=2, pad_value=0.0):
    """[N, C, H, W] -> [C, H', W'] tiled grid (torchvision semantics)."""
    N, C, H, W = tensor.shape
    ncol = min(nrow, N)
    nrow_out = (N + ncol - 1) // ncol
    grid = torch.full(
        (C, padding + nrow_out * (H + padding), padding + ncol * (W + padding)),
        float(pad_value),
        dtype=tensor.dtype,
    )
    for idx in range(N):
        r, c = divmod(idx, ncol)
        y = padding + r * (H + padding)
        x = padding + c * (W + padding)
        grid[:, y : y + H, x : x + W] = tensor[idx]
    return grid
