"""Host-side data IO (startup only — nothing here runs in the training hot loop)."""

from marf_tpu.data.planar import prepare_images, resolve_data_root, synthesize_planar_dataset
