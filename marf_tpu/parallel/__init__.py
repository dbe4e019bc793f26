"""Multi-chip parallelism (a capability the reference lacks entirely — it is
single-process single-GPU with multi-GPU explicitly disabled, reference
options.py:117-118; SURVEY.md §2.3)."""

from marf_tpu.parallel.mesh import make_mesh, choose_pixel_axis, shard_planar_data, replicate
from marf_tpu.parallel.sharded import make_sharded_train_setup
