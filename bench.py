"""Benchmark: optimization steps/sec on the canonical planar-alignment run.

Canonical config (BASELINE.md): cat_batch3, B=5, seed=3, barf_c2f=[0,0.4],
faithful reference settings (masks+edges on, stop-gradient edge term, 3000
iterations). Prints ONE JSON line:

    {"metric": "steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 30.0, "extra": {...}}

`vs_baseline` divides by the pinned reference-on-GPU estimate of 30 it/s
(see BASELINE_MEASURED.md; the >=10x north-star == vs_baseline >= 10).
The `extra` field carries the convergence metrics of the timed run (final
PSNR / homography error) so perf is never reported off a diverging config.
"""

import json
import os
import sys
import time

import numpy as np

import jax

REF_STEPS_PER_SEC = 30.0  # BASELINE_MEASURED.md
MAX_ITER = int(os.environ.get("MARF_BENCH_ITERS", 3000))
CHUNK = 100
WARMUP_CHUNKS = 1
# experiment knobs (bench defaults stay the faithful config)
DTYPE = os.environ.get("MARF_BENCH_DTYPE", "float32")
PRECISION = os.environ.get("MARF_BENCH_PRECISION", "")
FUSED_STEP = os.environ.get("MARF_BENCH_FUSED_STEP", "auto")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from marf_tpu.data.planar import device_put_dataset, load_planar_dataset, synthesize_planar_dataset
    from marf_tpu.engine.step import init_train_state, make_optimizer, make_train_chunk, make_train_step
    from marf_tpu.models.planar import PlanarConfig, init_graph_params
    from marf_tpu.models.neural_image import NeuralImageConfig

    cfg = PlanarConfig(
        max_iter=MAX_ITER,
        fused_step=FUSED_STEP,
        arch=NeuralImageConfig(
            layers=(None, 256, 256, 256, 256, 3), posenc_L=8, barf_c2f=(0, 0.4),
            compute_dtype=DTYPE,
        ),
    )
    try:
        raw = load_planar_dataset(cfg, "cat_batch3")
        dataset = "cat_batch3"
    except FileNotFoundError:
        raw = synthesize_planar_dataset(cfg, seed=3)
        dataset = "synthetic"
    if PRECISION:
        jax.config.update("jax_default_matmul_precision", PRECISION)
    data = device_put_dataset(raw)
    log(f"bench dataset: {dataset}, device: {jax.devices()[0]}")

    params = init_graph_params(jax.random.PRNGKey(int(os.environ.get("MARF_BENCH_SEED", 3))), cfg)
    tx = make_optimizer({"lr": 1e-3, "lr_warp": 1e-3, "lr_mask": 1e-3, "algo": "Adam"}, cfg.max_iter)
    state = init_train_state(params, tx)
    step_fn = make_train_step(cfg, tx, use_homographies=(raw.get("gt_hom") is not None))
    chunk = make_train_chunk(step_fn, CHUNK, donate=True)

    # warmup: compile + first chunk(s)
    for _ in range(WARMUP_CHUNKS):
        state, metrics = chunk(state, data)
    jax.block_until_ready(state.params["warp"])

    n_timed = MAX_ITER - WARMUP_CHUNKS * CHUNK
    t0 = time.perf_counter()
    for _ in range(n_timed // CHUNK):
        state, metrics = chunk(state, data)
    jax.block_until_ready(state.params["warp"])
    dt = time.perf_counter() - t0
    steps_per_sec = n_timed / dt

    final = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()}
    log(f"timed {n_timed} steps in {dt:.2f}s -> {steps_per_sec:.1f} steps/s")
    log(f"final: PSNR={final.get('PSNR'):.3f} dB, loss={final.get('all'):.5f}, "
        f"hom_err={final.get('Homography_Error', float('nan')):.4f}")

    result = {
        "metric": "steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REF_STEPS_PER_SEC, 3),
        "extra": {
            "dataset": dataset,
            "device": str(jax.devices()[0]),
            "iters_timed": n_timed,
            "final_psnr_db": round(final.get("PSNR", float("nan")), 3),
            "final_homography_error": round(final.get("Homography_Error", float("nan")), 5),
            "ref_baseline_steps_per_sec": REF_STEPS_PER_SEC,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
