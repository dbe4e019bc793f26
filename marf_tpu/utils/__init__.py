"""Utilities: config system, console logging, TensorBoard writing, visualization."""

from marf_tpu.utils.attrdict import AttrDict
from marf_tpu.utils.console import log
