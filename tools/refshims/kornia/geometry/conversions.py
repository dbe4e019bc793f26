"""normalize_homography shim (torch), same math as kornia's implementation:
N(h_dst, w_dst) @ M @ N(h_src, w_src)^-1 with
N(h, w) = [[2/(w-1), 0, -1], [0, 2/(h-1), -1], [0, 0, 1]]."""

import torch


def _normal_transform_pixel(height, width, dtype, device):
    eps = 1e-14
    w_denom = eps if width == 1 else width - 1.0
    h_denom = eps if height == 1 else height - 1.0
    return torch.tensor(
        [[2.0 / w_denom, 0.0, -1.0], [0.0, 2.0 / h_denom, -1.0], [0.0, 0.0, 1.0]],
        dtype=dtype,
        device=device,
    )


def normalize_homography(dst_pix_trans_src_pix, dsize_src, dsize_dst):
    src_h, src_w = dsize_src
    dst_h, dst_w = dsize_dst
    dt, dev = dst_pix_trans_src_pix.dtype, dst_pix_trans_src_pix.device
    src_norm = _normal_transform_pixel(src_h, src_w, dt, dev)
    dst_norm = _normal_transform_pixel(dst_h, dst_w, dt, dev)
    return dst_norm @ (dst_pix_trans_src_pix @ torch.linalg.inv(src_norm))
