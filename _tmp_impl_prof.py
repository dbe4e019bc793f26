"""Profile the default (non-dedup) fused implicit train step on TPU."""
import os, sys
import jax
from marf_tpu.engine.trainer import Model
from marf_tpu.utils.attrdict import AttrDict
from marf_tpu.utils.config import load_options, process_options, resolve_yaml_path

single = len(sys.argv) > 1 and sys.argv[1] == "single"
opt = load_options(resolve_yaml_path("planar"))
opt.update(AttrDict(model="planar", yaml="planar", group="r3dbg", name="ip", seed=3,
                    use_masks=False, use_implicit_mask=True, max_iter=3000,
                    build_single_masks=single))
opt.barf_c2f = [0, 0.4]
process_options(opt)
m = Model(opt)
m.load_dataset(); m.build_networks(); m.setup_optimizer(); m._build_compiled()
chunk = m._chunk(20)
state, data = m.state, m.train_data
for _ in range(2):
    state, metrics = chunk(state, data)
jax.block_until_ready(state.params["warp"])
with jax.profiler.trace("/tmp/r3dbg/impl_prof"):
    for _ in range(3):
        state, metrics = chunk(state, data)
    jax.block_until_ready(state.params["warp"])
print("done")
