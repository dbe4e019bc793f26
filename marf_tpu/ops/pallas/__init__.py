"""Pallas TPU kernels: fused hot-path ops."""

from marf_tpu.ops.pallas.fused_mlp import fused_neural_image, fused_mlp_supported
