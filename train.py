"""Main training entrypoint (reference train.py re-designed for the JAX engine).

Usage (same CLI contract as the reference, README.md:29-34):

    python3 train.py --group=<GROUP> --model=planar --yaml=planar \
        --name=<NAME> --seed=3 --barf_c2f=[0,0.4]
"""

import os
import sys

from marf_tpu.utils import config as options
from marf_tpu.utils.console import log


def main():
    log.process(os.getpid())
    log.title(f"[{sys.argv[0]}] (marf_tpu: JAX/TPU planar bundle-adjusting NeRF)")

    opt_cmd = options.parse_arguments(sys.argv[1:])
    opt = options.set_opt(opt_cmd=opt_cmd)
    options.save_options_file(opt)

    # model registry: `--model=planar` -> marf_tpu.engine.trainer.Model
    # (the reference dynamically imports model.<name>, train.py:23)
    assert opt.model == "planar", f"unknown model {opt.model!r} (available: planar)"
    from marf_tpu.engine.trainer import Model

    m = Model(opt)
    m.load_dataset()
    m.build_networks()
    m.setup_optimizer()
    m.setup_visualizer()
    m.train()


if __name__ == "__main__":
    main()
