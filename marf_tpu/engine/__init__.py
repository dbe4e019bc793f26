"""Training engine: jitted scan-chunked train step, trainer lifecycle, checkpointing."""

from marf_tpu.engine.step import TrainState, make_optimizer, make_train_step, make_train_chunk
from marf_tpu.engine.trainer import Model
