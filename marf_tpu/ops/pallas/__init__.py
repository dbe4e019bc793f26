"""Pallas TPU kernels: the fused single-pass train step (fwd+loss+bwd)."""

from marf_tpu.ops.pallas.fused_step import fused_train_kernel, fused_step_supported
