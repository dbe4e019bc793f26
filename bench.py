"""Benchmark: optimization steps/sec on the canonical planar-alignment run.

Canonical config (BASELINE.md): cat_batch3, B=5, seed=3, barf_c2f=[0,0.4],
faithful reference settings (masks+edges on, stop-gradient edge term, 3000
iterations). Prints ONE JSON line:

    {"metric": "steps_per_sec", "value": N, "unit": "steps/s",
     "vs_baseline": N / 30.0, "extra": {...}}

`vs_baseline` divides by the PER-CASE reference-on-GPU estimate
(REF_BASELINE_STEPS_PER_SEC, derived in BASELINE_MEASURED.md from measured
CPU-torch reference rates; the >=10x north-star == vs_baseline >= 10). The
denominator used is echoed in extra.ref_baseline_steps_per_sec.
The `extra` field carries the convergence metrics of the timed run (final
PSNR / homography error) so perf is never reported off a diverging config.

The benchmarked program is the trainer's OWN compiled path: the config is
built from marf_tpu/configs/planar.yaml through `PlanarConfig.from_options`
and the chunk through `Model._build_compiled` — exactly what
`python train.py` runs, so bench.py cannot drift from the user surface.

Env knobs (defaults = the faithful canonical config):
    MARF_BENCH_CASE        canonical | implicit | implicit_single | noposenc
                           | edges_only (BASELINE.md eval configs)
    MARF_BENCH_ITERS       total steps (default 3000)
    MARF_BENCH_SEED        init seed (default 3)
    MARF_BENCH_DTYPE       float32 | bfloat16 (tpu.compute_dtype)
    MARF_BENCH_FUSED_STEP  auto | on | off (tpu.fused_step)
    MARF_BENCH_FUSED_WARP  auto | on | off (tpu.fused_warp, v5 in-kernel warp)
    MARF_BENCH_FUSED_DEDUP auto | on | off (tpu.fused_dedup, implicit column dedup)
    MARF_BENCH_FLAT_ADAM   auto | on | off (tpu.flat_adam; off = per-leaf
                           multi_transform Adam)
    MARF_BENCH_LAZY_METRICS auto | on | off (tpu.lazy_metrics: chunk-final-only
                           edge term / Homography_Error / Mask_Error)
    MARF_BENCH_PRECISION   '' | highest (jax_default_matmul_precision)
    MARF_BENCH_CHECK       1 (default) = assert final PSNR against
                           tools/bench_goldens.json when a golden exists
                           (exit 1 outside the band); 0 = report only
    MARF_BENCH_PROBE       1 (default) = bounded backend probe before building
                           the model so a dead tunnel yields a parseable JSON
                           error line; 0 = skip (back-to-back sweep runs)
    MARF_BENCH_PROBE_TIMEOUT  probe bound in seconds (default 90)
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

import jax

# Per-case reference baseline denominators (BASELINE_MEASURED.md). The
# fixed-mask cases share the canonical ~30 it/s reference-on-GPU estimate;
# the implicit-mask cases carry their own (smaller) estimates because the
# reference's mask head multiplies the per-iteration work — and
# build_single_masks runs the per-image heads on the HOST CPU even when the
# model is on GPU (reference model/planar.py:340-352, `.cpu()` at :347) —
# so dividing them by the canonical 30 would overstate the reference
# (VERDICT r4 item 1: make every ratio workload-fair). Values are derived in
# BASELINE_MEASURED.md from measured CPU-torch rates on this machine.
REF_BASELINE_STEPS_PER_SEC = {
    "canonical": 30.0,
    "fullposenc": 30.0,
    "edges_only": 30.0,
    "noposenc": 30.0,
    "implicit": 25.0,
    "implicit_single": 3.0,
}
MAX_ITER = int(os.environ.get("MARF_BENCH_ITERS", 3000))
CHUNK = 100
WARMUP_CHUNKS = 1
CASE = os.environ.get("MARF_BENCH_CASE", "canonical")
SEED = int(os.environ.get("MARF_BENCH_SEED", 3))
DTYPE = os.environ.get("MARF_BENCH_DTYPE", "float32")
PRECISION = os.environ.get("MARF_BENCH_PRECISION", "")
FUSED_STEP = os.environ.get("MARF_BENCH_FUSED_STEP", "auto")
FUSED_WARP = os.environ.get("MARF_BENCH_FUSED_WARP", "auto")
FUSED_DEDUP = os.environ.get("MARF_BENCH_FUSED_DEDUP", "auto")
LAZY_METRICS = os.environ.get("MARF_BENCH_LAZY_METRICS", "auto")

# BASELINE.md evaluation configs (reference script.py case table)
CASES = {
    "canonical": {},
    "fullposenc": dict(_no_c2f=True),  # BASELINE eval config 1: posenc without c2f
    "edges_only": dict(use_masks=False, alpha_initial=1.0, alpha_final=1.0),
    "noposenc": dict(_no_posenc=True, _no_c2f=True),
    "implicit": dict(use_masks=False, use_implicit_mask=True),
    "implicit_single": dict(use_masks=False, use_implicit_mask=True, build_single_masks=True),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_model():
    from marf_tpu.engine.trainer import Model
    from marf_tpu.utils.attrdict import AttrDict
    from marf_tpu.utils.config import load_options, resolve_yaml_path

    overrides = dict(CASES[CASE])
    no_posenc = overrides.pop("_no_posenc", False)
    no_c2f = overrides.pop("_no_c2f", False)

    opt = load_options(resolve_yaml_path("planar"))
    opt.update(
        AttrDict(
            model="planar",
            yaml="planar",
            group="bench",
            name=CASE,
            seed=SEED,
            max_iter=MAX_ITER,
            barf_c2f=(None if no_c2f else [0, 0.4]),
            output_path=tempfile.mkdtemp(prefix="marf_bench_"),
        )
    )
    opt.update(AttrDict(overrides))
    opt.tpu.compute_dtype = DTYPE
    opt.tpu.fused_step = FUSED_STEP
    opt.tpu.fused_warp = FUSED_WARP
    opt.tpu.fused_dedup = FUSED_DEDUP
    opt.tpu.lazy_metrics = LAZY_METRICS
    opt.tpu.flat_adam = os.environ.get("MARF_BENCH_FLAT_ADAM", "auto")
    # config-first streams knob (tpu.fused_streams); the env default also
    # reaches the kernels via the module fallback, but setting the config
    # keeps bench on the exact path train.py users get
    opt.tpu.fused_streams = int(os.environ.get("MARF_FUSED_STREAMS", 0))
    if no_posenc:
        opt.arch.posenc = False

    m = Model(opt)
    try:
        m.load_dataset()
        dataset = m.dataset
    except FileNotFoundError:
        m.dataset = "synthetic"
        m.load_dataset()
        dataset = "synthetic"
    m.build_networks()
    m.setup_optimizer()
    m._build_compiled()
    return m, dataset


def _cpu_only() -> bool:
    """True when the FIRST configured platform is cpu — no tunnel involved."""
    platforms = os.environ.get(
        "JAX_PLATFORMS", os.environ.get("JAX_PLATFORM_NAME", "")
    ).lower()
    return platforms.split(",")[0].strip() == "cpu"


TPU_LOCK = "/tmp/tpu_lock"


def wait_for_tpu_lock():
    """Honor the one-TPU-process protocol (CLAUDE.md): /tmp/tpu_lock marks
    TPU work in flight (the tools/tpu_watch.sh measurement sweep, or manual
    runs). Colliding would fail BOTH processes and can wedge the chip, so
    wait for the lock to clear (bounded by MARF_BENCH_LOCK_WAIT seconds)
    instead. The lock owner's own bench runs set MARF_TPU_LOCK_OWNER=1."""
    if os.environ.get("MARF_TPU_LOCK_OWNER") == "1" or _cpu_only():
        return
    limit = float(os.environ.get("MARF_BENCH_LOCK_WAIT", 7200))
    t0 = time.time()
    waited = False
    while os.path.exists(TPU_LOCK) and time.time() - t0 < limit:
        if not waited:
            log(f"{TPU_LOCK} present (TPU in use — sweep/watcher or manual "
                f"run); waiting up to {limit:.0f}s for it to clear")
            waited = True
        time.sleep(30)
    if waited:
        held = os.path.exists(TPU_LOCK)
        log(f"lock {'still held after the wait — proceeding anyway' if held else 'cleared'} "
            f"({time.time() - t0:.0f}s)")


def probe_backend():
    """Bounded backend probe so an infra outage yields a parseable artifact.

    A dead/hung TPU tunnel makes jax.devices() block indefinitely inside
    Model.__init__, which previously left the driver with an unparseable
    40-line traceback (BENCH_r03.json "parsed": null). Probe in a SUBPROCESS
    under a timeout and, on failure, print one parseable JSON error line.
    MARF_BENCH_PROBE=0 skips it (for back-to-back runs in a known-good
    tunnel window, e.g. tools/tpu_sweep.sh after the watcher's own probe).

    The probe must EXECUTE a computation, not just enumerate devices: a
    wedged chip (observed round-4c, after a timeout SIGTERM'd a profiling
    run mid-flight) keeps answering jax.devices() for >35 min while every
    compile/execute hangs — an enumeration-only probe passes that state and
    bench then hangs unparseably inside the real build anyway.
    """
    if os.environ.get("MARF_BENCH_PROBE", "1") == "0":
        return
    if _cpu_only():
        return  # CPU-first config: no tunnel involved; skip the second jax import
    timeout_s = float(os.environ.get("MARF_BENCH_PROBE_TIMEOUT", 90))
    # the probe FETCHES the matmul result (device->host copy) rather than
    # block_until_ready: ready events can signal early on this runtime
    # (PERF.md round-5), and a wedged chip must not pass the probe
    code = ("import jax, jax.numpy as jnp, numpy as np; "
            "v = np.asarray(jnp.ones((128, 128)) @ jnp.ones((128, 128)))[0, 0]; "
            "assert v == 128.0, v; "
            "print(jax.devices()[0])")
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        out, err = proc.communicate(timeout=timeout_s)
        if proc.returncode == 0:
            return
        detail = (err or out).strip().splitlines()[-1:]
        reason = "backend_unavailable"
    except subprocess.TimeoutExpired:
        # CLAUDE.md tunnel rule: never hard-kill a TPU process. SIGTERM first
        # with a generous grace period; SIGKILL only as a last resort (a probe
        # ignoring SIGTERM for 30s is already wedged, and leaking it would
        # hold the one-process-at-a-time chip indefinitely).
        proc.terminate()
        try:
            proc.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.communicate()
        detail = [f"device enumerate+execute probe hung > {timeout_s:.0f}s"]
        reason = "backend_unavailable"
    print(json.dumps({
        "metric": "steps_per_sec",
        "value": None,
        "unit": "steps/s",
        "vs_baseline": None,
        "error": reason,
        "extra": {"case": CASE, "platform": os.environ.get("JAX_PLATFORMS", ""),
                  "detail": " ".join(detail)[-300:]},
    }))
    log(f"backend probe failed ({reason}): {' '.join(detail)[-300:]}")
    sys.exit(2)


def golden_record(final_psnr, g):
    """Evaluate one golden band -> (ok: bool, record dict).

    Pure-Python outputs only: the record is embedded in bench's result JSON,
    and json.dumps rejects numpy scalars (np.isfinite returns np.bool_ —
    `X and np.bool_` leaks it; this crashed every golden-checked sweep run
    once). Unit-tested with numpy inputs in tests/test_bench_probe.py.
    """
    delta = abs(final_psnr - g["psnr"])
    ok = bool(delta <= g["band"]) and bool(np.isfinite(final_psnr))
    return ok, {"psnr": g["psnr"], "band": g["band"],
                "delta": round(float(delta), 4), "ok": ok}


def main():
    wait_for_tpu_lock()
    probe_backend()
    if PRECISION:
        jax.config.update("jax_default_matmul_precision", PRECISION)
    m, dataset = build_model()
    log(f"bench case: {CASE}, dataset: {dataset}, device: {jax.devices()[0]}")

    chunk = m._chunk(CHUNK)
    state, data = m.state, m.train_data

    # warmup: compile + first chunk(s). Sync by PULLING the metrics to the
    # host (device_get), NOT jax.block_until_ready: on this TPU runtime,
    # block_until_ready was observed returning before execution finished —
    # first on donated-alias state buffers, then (implicit_single, round-5
    # sweep) even on the fresh metrics outputs — producing a 500-step run
    # "timed" at 0.00s. A device->host copy cannot return early, and the
    # metrics are tiny ([chunk, ~10] scalar rows).
    for _ in range(WARMUP_CHUNKS):
        state, metrics = chunk(state, data)
    metrics = jax.device_get(metrics)

    n_timed = MAX_ITER - WARMUP_CHUNKS * CHUNK
    t0 = time.perf_counter()
    for _ in range(n_timed // CHUNK):
        state, metrics = chunk(state, data)
    metrics = jax.device_get(metrics)
    dt = time.perf_counter() - t0
    steps_per_sec = n_timed / dt

    final = {k: float(np.asarray(v)[-1]) for k, v in metrics.items()}
    log(f"timed {n_timed} steps in {dt:.2f}s -> {steps_per_sec:.1f} steps/s")
    log(f"final: PSNR={final.get('PSNR', float('nan')):.3f} dB, "
        f"loss={final.get('all', float('nan')):.5f}, "
        f"hom_err={final.get('Homography_Error', float('nan')):.4f}")

    extra = {
        "case": CASE,
        "dataset": dataset,
        "device": str(jax.devices()[0]),
        "iters_timed": n_timed,
        "final_psnr_db": round(final.get("PSNR", float("nan")), 3),
        "final_homography_error": round(final.get("Homography_Error", float("nan")), 5),
        "ref_baseline_steps_per_sec": REF_BASELINE_STEPS_PER_SEC[CASE],
    }
    if "Mask_Error" in final:
        extra["final_mask_error"] = round(final["Mask_Error"], 5)

    # convergence guardrail: fused-kernel numerics regressions fail loudly.
    # tools/bench_goldens.json records the measured PSNR@iters per case
    # (default f32 numerics); a run outside the band exits non-zero. Bands
    # are sized from the measured same-framework variant cluster (XLA vs
    # fused vs dedup all within ~0.05 dB @600, PERF.md) vs the >1 dB
    # excursions that real cotangent/schedule bugs produce.
    golden_key = f"{CASE}@{MAX_ITER}/seed{SEED}"
    golden_ok = None
    if (
        DTYPE == "float32"
        and not PRECISION
        and os.environ.get("MARF_BENCH_CHECK", "1") != "0"
    ):
        gpath = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools", "bench_goldens.json")
        try:
            with open(gpath) as f:
                goldens = json.load(f)
        except FileNotFoundError:
            goldens = {}
        g = goldens.get(golden_key)
        if g is not None:
            golden_ok, rec = golden_record(final.get("PSNR", float("nan")), g)
            extra["golden"] = {"key": golden_key, **rec}
            if not golden_ok:
                log(f"GOLDEN CHECK FAILED: {golden_key} "
                    f"PSNR {final.get('PSNR', float('nan')):.3f} "
                    f"vs golden {g['psnr']} +- {g['band']}")

    result = {
        "metric": "steps_per_sec",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REF_BASELINE_STEPS_PER_SEC[CASE], 3),
        "extra": extra,
    }
    print(json.dumps(result))
    if golden_ok is False:
        sys.exit(1)


if __name__ == "__main__":
    main()
