"""Ablation sweep runner — the reference `script.py` re-designed.

The reference mutates options/planar.yaml in place and shells out
`python train.py ...` per dataset x ablation case (reference script.py:6-15,
21-130). Here each case is a config *override dict* applied in-process — no
YAML mutation, no subprocess per run, and the jitted step compiles once per
unique static config.

The case table reproduces the reference's nine experiment cases
(script.py:25-130 and the trailing docstring :132-143): {premade masks,
implicit masks, no masks} x {edges on/off} x {alpha schedules: 1, 0->1,
1->0, 0.5}.

Usage:
    python sweep.py [--datasets=cat_batch3,cat_batch4] [--cases=1,2,3]
                    [--seeds=3] [--group=alignment] [--max_iter=3000]
"""

import sys

from marf_tpu.utils.attrdict import AttrDict
from marf_tpu.utils.config import load_options, parse_arguments, process_options, resolve_yaml_path
from marf_tpu.utils.console import log

# The reference's nine cases (script.py:132-143). Keys are dot-path overrides.
CASES = {
    1: dict(name="masks_only", use_masks=True, use_edges=False),
    2: dict(name="edges_only_alpha1", use_masks=False, use_edges=True, alpha_initial=1.0, alpha_final=1.0),
    3: dict(name="masks_edges_alpha1", use_masks=True, use_edges=True, alpha_initial=1.0, alpha_final=1.0),
    4: dict(name="masks_edges_alpha_0to1", use_masks=True, use_edges=True, alpha_initial=0.0, alpha_final=1.0),
    5: dict(name="masks_edges_alpha_1to0", use_masks=True, use_edges=True, alpha_initial=1.0, alpha_final=0.0),
    6: dict(name="masks_edges_alpha05", use_masks=True, use_edges=True, alpha_initial=0.5, alpha_final=0.5),
    7: dict(name="plain", use_masks=False, use_edges=False),
    # Cases 8/9 run implicit masks WITHOUT ground-truth masks — a config the
    # reference cannot actually run (its log_scalars computes Mask_Error from
    # images.masks unconditionally whenever use_implicit_mask and crashes on
    # masks=None, reference model/planar.py:238-242 + :74); here Mask_Error
    # is simply skipped when no GT masks exist. Add use_masks=True to either
    # case for the reference-runnable variant with the Mask_Error curve.
    8: dict(name="implicit_masks", use_masks=False, use_implicit_mask=True, use_edges=False),
    9: dict(name="implicit_masks_edges", use_masks=False, use_implicit_mask=True, use_edges=True,
            alpha_initial=0.0, alpha_final=1.0),
}

DEFAULT_DATASETS = ["cat_batch3"]


def run_case(dataset: str, case_id: int, seed: int, group: str, extra: dict):
    from marf_tpu.engine.trainer import Model

    case = dict(CASES[case_id])
    name = f"{dataset}_{case.pop('name')}"
    opt = load_options(resolve_yaml_path("planar"))
    opt.update(AttrDict(model="planar", yaml="planar", group=group, name=name, seed=seed, dataset=dataset))
    opt.update(AttrDict(case))
    opt.update(AttrDict(extra))
    opt.barf_c2f = [0, 0.4]
    process_options(opt)
    log.title(f"SWEEP: {dataset} case {case_id} ({name}) seed {seed}")
    m = Model(opt)
    m.load_dataset()
    m.build_networks()
    m.setup_optimizer()
    m.setup_visualizer()
    m.train()
    return m


def main():
    args = parse_arguments(sys.argv[1:])
    datasets = str(args.get("datasets", ",".join(DEFAULT_DATASETS))).split(",")
    case_ids = [int(c) for c in str(args.get("cases", "4")).split(",")]
    seeds = [int(s) for s in str(args.get("seeds", "3")).split(",")]
    group = args.get("group", "alignment")
    extra = {k: v for k, v in args.items() if k not in ("datasets", "cases", "seeds", "group")}
    for dataset in datasets:
        for case_id in case_ids:
            for seed in seeds:
                run_case(dataset, case_id, seed, group, extra)


if __name__ == "__main__":
    main()
