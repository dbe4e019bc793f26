"""Pure jittable compute ops (the TPU equivalent of reference warp.py / inputs.py math)."""

from marf_tpu.ops.lie import sl3_to_SL3
from marf_tpu.ops.grid import normalized_pixel_grid, GridSpec
from marf_tpu.ops.warp import to_hom, warp_grid, warp_corners
from marf_tpu.ops.posenc import barf_posenc, barf_c2f_weights, hanerf_pos_embedding
from marf_tpu.ops.filters import sobel_edges, gaussian_blur_5x5, erode, compute_edges
from marf_tpu.ops.homography import normalize_homography, normal_transform_pixel
from marf_tpu.ops import losses
