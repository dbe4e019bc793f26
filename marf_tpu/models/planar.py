"""The planar bundle-adjusting graph: joint homography + neural-image model.

Capability parity with `Graph` (reference model/planar.py:296-391): per-image
sl(3) warp parameters (zero-init, reference :310-311), the neural-image MLP,
optional implicit mask head(s), edge prediction, and the composite loss
(1-alpha)*rgb + 0.5*mask + alpha*edge with the masked-MSE normalization.

TPU-native design: `graph_forward` and `graph_loss` are pure functions of
(params, data, static config, traced step/progress) — no module state, no
Python-loop-over-images (vmap), no host round-trips (in-graph Sobel). The
engine jit-compiles them once into a scan-chunked train step.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp

from marf_tpu.models.implicit_mask import (
    apply_implicit_mask_cf,
    init_implicit_mask,
    init_view_embedding,
    mask_head_inputs_cf,
)
from marf_tpu.models.neural_image import (
    NeuralImageConfig,
    apply_neural_image_cf,
    init_neural_image,
)
from marf_tpu.ops.filters import compute_edges
from marf_tpu.ops.grid import GridSpec, normalized_pixel_grid
from marf_tpu.ops.losses import alpha_schedule, mask_counterweight, mse, render_loss
from marf_tpu.ops.warp import warp_grid_cf_flat


@dataclasses.dataclass(frozen=True)
class PlanarConfig:
    """All static (trace-time) configuration of the planar experiment.

    Mirrors the keys of reference options/planar.yaml; frozen + hashable so it
    can be a jit static argument without recompiles across steps.
    """

    H: int = 360
    W: int = 480
    patch_H: int = 180
    patch_W: int = 240
    batch_size: int = 5
    max_iter: int = 3000
    use_cropped_images: bool = True
    # masks (planar.yaml:9-12)
    use_masks: bool = True
    use_implicit_mask: bool = False
    build_single_masks: bool = False
    # fix-mode: optimize the view embedding (the reference never does,
    # model/planar.py:89-96); static here because it gates the fused path
    train_view_embedding: bool = False
    N_vocab: int = 1500
    # edges (planar.yaml:15-17)
    use_edges: bool = True
    alpha_initial: float = 0.0
    alpha_final: float = 1.0
    differentiable_edges: bool = False  # False = reference's stop-gradient edge term
    mask_quantize_levels: int = 1  # 1 = reference's {0,1} image.long() quirk
    # warp (planar.yaml:59-64)
    warp_type: str = "homography"
    warp_dof: int = 8
    fix_first: bool = True
    # architecture
    arch: NeuralImageConfig = dataclasses.field(default_factory=NeuralImageConfig)
    # single-pass fused fwd+loss+bwd train kernel (ops/pallas/fused_step.py):
    # 'auto' (on TPU when the config is in scope), 'on', 'off'
    fused_step: str = "auto"
    # v5 variant: homography warp + its VJP inside the kernel (only the 3x3
    # expm stays in XLA); 'auto'/'on'/'off' — applies when fused_step runs
    fused_warp: str = "auto"
    # implicit-mask column deduplication (slot0+extras, ops/pallas/
    # fused_mask.py slot_dedup_inputs): shared-head single-chip only;
    # 'auto' = on whenever that pipeline runs
    fused_dedup: str = "auto"
    # compute metric-only work (the gradient-blocked edge term in the fused
    # fixed-mask paths, the post-update Homography_Error expm, Mask_Error)
    # only at chunk-final steps: none of it affects updates, and only
    # chunk-boundary metric rows are consumed (TB cadence / bench finals) —
    # 'auto' (on TPU), 'on', 'off'
    lazy_metrics: str = "auto"
    # loss weights in log10 scale; None disables a term (planar.yaml:67-71)
    w_render: float | None = 0.0
    w_rgb: float | None = 0.0
    w_edge: float | None = 0.0
    w_mask: float | None = 0.0

    def __post_init__(self):
        assert self.warp_type == "homography", "only homography warps are supported (reference warp.py:72-80)"
        assert self.warp_dof == 8

    @property
    def grid_spec(self) -> GridSpec:
        return GridSpec(H=self.H, W=self.W, patch_H=self.patch_H, patch_W=self.patch_W)

    @property
    def map_hw(self) -> tuple[int, int]:
        """Spatial dims of prediction maps (reference model/planar.py:313-314)."""
        if self.use_cropped_images:
            return (self.patch_H, self.patch_W)
        return (self.H, self.W)

    @property
    def loss_weight(self) -> dict:
        return {"render": self.w_render, "rgb": self.w_rgb, "edge": self.w_edge, "mask": self.w_mask}

    @classmethod
    def from_options(cls, opt) -> "PlanarConfig":
        """Build from a parsed options AttrDict (reference yaml key layout)."""
        lw = opt.get("loss_weight", {})
        tpu_opts = opt.get("tpu", {})

        def tristate(key: str) -> str:
            # the config DSL yaml-parses `--tpu.x=on` to bool True; normalize
            # {True: on, False: off, str: lowercased} so CLI overrides work
            v = tpu_opts.get(key, "auto")
            if v is True:
                return "on"
            if v is False:
                return "off"
            return str(v).lower()
        arch = NeuralImageConfig(
            layers=tuple(opt.arch.layers),
            skip=tuple(opt.arch.get("skip", []) or []),
            posenc_L=(opt.arch.posenc.L_2D if opt.arch.get("posenc") else None),
            barf_c2f=(tuple(opt.barf_c2f) if opt.get("barf_c2f") else None),
            compute_dtype=str(tpu_opts.get("compute_dtype", "float32")),
            fused_streams=int(tpu_opts.get("fused_streams", 0) or 0),
        )
        cfg = cls(
            H=opt.H,
            W=opt.W,
            patch_H=opt.patch_H,
            patch_W=opt.patch_W,
            batch_size=opt.batch_size,
            max_iter=opt.max_iter,
            use_cropped_images=bool(opt.get("use_cropped_images", True)),
            use_masks=bool(opt.get("use_masks", True)),
            use_implicit_mask=bool(opt.get("use_implicit_mask", False)),
            build_single_masks=bool(opt.get("build_single_masks", False)),
            train_view_embedding=bool((opt.get("optim") or {}).get("train_view_embedding", False)),
            N_vocab=int(opt.get("N_vocab", 1500)),
            use_edges=bool(opt.get("use_edges", True)),
            alpha_initial=float(opt.get("alpha_initial", 0.0)),
            alpha_final=float(opt.get("alpha_final", 1.0)),
            differentiable_edges=bool(tpu_opts.get("differentiable_edges", False)),
            mask_quantize_levels=int(tpu_opts.get("mask_quantize_levels", 1)),
            fused_step=tristate("fused_step"),
            fused_warp=tristate("fused_warp"),
            fused_dedup=tristate("fused_dedup"),
            lazy_metrics=tristate("lazy_metrics"),
            warp_type=opt.warp.type,
            warp_dof=opt.warp.dof,
            fix_first=bool(opt.warp.get("fix_first", True)),
            arch=arch,
            w_render=lw.get("render", 0.0),
            w_rgb=lw.get("rgb", 0.0),
            w_edge=lw.get("edge", 0.0),
            w_mask=lw.get("mask", 0.0),
        )
        if (
            cfg.arch.fused_streams == 0
            and jax.default_backend() == "tpu"
            and len(jax.devices()) == 1
            and use_fused_dedup(cfg)
        ):
            # Measured round-5 default (PERF.md): the dedup pipeline's
            # layer-phased kernels run 2 independent column streams —
            # implicit@600 348 -> 350-352 steps/s, golden held (d=0.0022);
            # every other config measures flat-to-worse at ns=2, so the
            # default applies ONLY here, and only single-chip: the mesh
            # path's slot_dedup_sharded_inputs pads the column axis without
            # a stream-count input, so a pod keeps the env/config setting.
            # tpu.fused_streams != 0 pins it either way.
            cfg = dataclasses.replace(
                cfg, arch=dataclasses.replace(cfg.arch, fused_streams=2)
            )
        return cfg


def use_fused_step(cfg: PlanarConfig) -> bool:
    """Whether the single-pass fused train kernel covers this config:
    fixed/no masks (the implicit-mask head keeps the autodiff path), no skip
    connections, render loss enabled."""
    from marf_tpu.ops.pallas.fused_step import fused_step_supported

    if cfg.fused_step == "off" or cfg.use_implicit_mask or cfg.w_render is None:
        return False
    if cfg.differentiable_edges:
        # the kernel's analytic cotangent covers the masked rgb MSE only;
        # the fix-mode differentiable edge term needs autodiff
        return False
    if not fused_step_supported(cfg.arch):
        return False
    if cfg.fused_step == "on":
        return True
    # 'auto': ON for TPU — the v4 channels-first fused kernel measures 422
    # steps/s vs 142 for the XLA path on the canonical v5e workload (PERF.md).
    # Off-TPU the kernel would run in interpreter mode; keep the XLA path.
    return jax.default_backend() == "tpu"


def use_fused_implicit(cfg: PlanarConfig) -> bool:
    """Whether the implicit-mask configs run the fused kernel pipeline
    (ops/pallas/fused_mask.py + fused_step.py): requires the faithful quirks
    that make the factoring exact — frozen view embedding, {0,1} input
    quantization, gradient-blocked edges."""
    from marf_tpu.ops.pallas.fused_step import fused_step_supported

    if not cfg.use_implicit_mask or cfg.fused_step == "off" or cfg.w_render is None:
        return False
    if cfg.train_view_embedding or cfg.mask_quantize_levels != 1 or cfg.differentiable_edges:
        return False
    if not fused_step_supported(cfg.arch):
        return False
    if cfg.fused_step == "on":
        return True
    return jax.default_backend() == "tpu"


_HW_VALIDATION_FILE = os.path.join(os.path.dirname(__file__), "..", "hw_validation.json")


def runtime_env() -> dict:
    """The {jax, jaxlib, libtpu} versions the process is actually running —
    the stamp recorded with every hardware validation / golden (VERDICT r4
    weak-1: the dedup miscompiles this gate guards against were
    jax/XLA-version-specific, so a validation is only evidence for the
    versions it was measured under)."""
    import jaxlib

    env = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
    env["libtpu"] = None
    from importlib import metadata

    for dist in ("libtpu", "libtpu-nightly"):  # nightly = historical jax[tpu] name
        try:
            env["libtpu"] = f"{dist}=={metadata.version(dist)}" if dist != "libtpu" else metadata.version(dist)
            break
        except Exception:  # non-TPU installs have no libtpu distribution
            continue
    return env


def _norm_device(s) -> str:
    """'TPU v5 lite0' (a Device str, index-suffixed) -> 'TPU v5 lite'."""
    import re

    return re.sub(r"\d+$", "", str(s)).strip()


def _env_matches(recorded: dict | None) -> bool:
    """Strict env comparison: jax/jaxlib/libtpu must be EQUAL (a recorded
    None libtpu matches only a current None — an install whose libtpu
    distribution appears or changes is a new Mosaic, exactly the miscompile
    vector this gate guards), and the recorded device generation must match
    the running chip (a validation on v5e says nothing about v4/v6
    lowering). Records without the jax/jaxlib/device fields are pre-stamp
    and count as stale."""
    if not isinstance(recorded, dict):
        return False
    cur = runtime_env()
    for k in ("jax", "jaxlib"):
        if recorded.get(k) is None or recorded.get(k) != cur.get(k):
            return False
    if recorded.get("libtpu") != cur.get("libtpu"):
        return False
    rec_dev = recorded.get("device")
    if not rec_dev:
        return False
    try:
        cur_dev = jax.devices()[0].device_kind
    except Exception:
        return False
    return _norm_device(rec_dev) == _norm_device(cur_dev)


_dedup_stale_warned = False


def dedup_hw_validated() -> bool:
    """Whether fused_dedup='auto' may enable the column dedup on this backend.

    The slot0+extras dedup kernels are equality-tested against autodiff in CPU
    interpret mode (tests/test_fused_mask.py), but this kernel family has twice
    hit TPU-only Mosaic/XLA miscompiles that interpret mode cannot see
    (engine/step.py channels-first edge-conv dodge). 'auto' therefore requires
    a recorded real-TPU validation (golden PSNR held + throughput measured,
    written to marf_tpu/hw_validation.json by the tools/tpu_sweep.sh harvest)
    before the dedup path defaults on; `--tpu.fused_dedup=on` is the explicit
    opt-in that bypasses the record. Off-TPU, interpret-mode equality is the
    proof — no record needed.
    """
    if jax.default_backend() != "tpu":
        return True
    try:
        with open(_HW_VALIDATION_FILE) as f:
            rec = json.load(f)
        entry = rec.get("fused_dedup", {})
        if not entry.get("validated", False):
            return False
        if not _env_matches(entry.get("env")):
            # A jax/jaxlib/libtpu bump silently inheriting a stale validation
            # would defeat the gate (the miscompiles were version-specific) —
            # fall back to the safe non-dedup path until one golden-checked
            # tools/tpu_sweep.sh implicit600 run re-records the validation.
            global _dedup_stale_warned
            if not _dedup_stale_warned:
                _dedup_stale_warned = True
                import warnings

                warnings.warn(
                    "marf_tpu/hw_validation.json was recorded under "
                    f"{entry.get('env')} but this process runs {runtime_env()}; "
                    "fused_dedup='auto' stays OFF until revalidated "
                    "(run tools/tpu_sweep.sh, or force with tpu.fused_dedup=on)."
                )
            return False
        return True
    except (OSError, ValueError):
        return False


def _lazy_metrics_enabled(cfg: PlanarConfig) -> bool:
    if cfg.lazy_metrics == "off":
        return False
    if cfg.lazy_metrics == "on":
        return True
    return jax.default_backend() == "tpu"


def use_lazy_edge_metrics(cfg: PlanarConfig) -> bool:
    """Whether the fused fixed-mask step computes the edge term only at
    chunk-final steps. Safe because the edge loss is gradient-blocked
    (reference inputs.py:50-69 .detach()) — it NEVER affects the parameter
    update — and the trainer/bench consume only chunk-boundary metric rows
    (trainer._train_loop logs `metrics[k][-1]`); intermediate stacked rows
    carry edge_loss = 0 and are used only by the per-step finite check,
    where the edge term is redundant (it derives from the rgb prediction and
    constant targets, so any non-finite source is caught by the rgb terms).
    Implicit-mask configs keep per-step edges — their esq stream feeds the
    mask cotangent. Fix-mode differentiable edges also disable this."""
    if not cfg.use_edges:
        return False
    if cfg.use_implicit_mask or cfg.differentiable_edges:
        return False
    return _lazy_metrics_enabled(cfg)


def use_lazy_aux_metrics(cfg: PlanarConfig) -> bool:
    """Whether the step computes the pure-metric scalars (Homography_Error —
    a post-update Padé expm + corner warp per step — and Mask_Error, an
    [N]-scale MSE) only at chunk-final steps. These never feed the update or
    the per-step finite check (`check_finite(loss)` covers the loss terms
    only), and the trainer consumes only chunk-boundary rows; intermediate
    rows report 0."""
    return _lazy_metrics_enabled(cfg)


def lazy_aux_metric(cfg: PlanarConfig, heavy, fn):
    """Gate a pure-metric scalar on `heavy` (chunk-final step) when
    use_lazy_aux_metrics applies; intermediate rows report 0. Shared by the
    single-chip step (engine/step.py) and the shard_map mesh paths
    (parallel/shard_fused.py) so the gating semantics cannot diverge. `heavy`
    derives from the scan index, so it is uniform across devices — any
    collective inside `fn` (e.g. the Mask_Error psum) runs on all devices or
    none."""
    if use_lazy_aux_metrics(cfg):
        return jax.lax.cond(heavy, fn, lambda: jnp.asarray(0.0, dtype=jnp.float32))
    return fn()


def use_fused_dedup(cfg: PlanarConfig) -> bool:
    """Whether the shared-head implicit pipeline deduplicates the mask-head
    input columns (slot0+extras, ops/pallas/fused_mask.py slot_dedup_inputs):
    shared head only (per-image heads have no duplicate columns), and on TPU
    gated on the recorded hardware validation unless forced 'on'. Covers both
    the single-chip engine path and the shard_map mesh path."""
    if cfg.build_single_masks or cfg.fused_dedup == "off":
        return False
    if not use_fused_implicit(cfg):
        return False
    return cfg.fused_dedup == "on" or dedup_hw_validated()


def init_graph_params(key: jax.Array, cfg: PlanarConfig, dtype=jnp.float32) -> dict:
    """Init all trainable parameters.

    warp: [B, 8] zero-init sl(3) coordinates (reference model/planar.py:310-311).
    """
    k_img, k_mask, k_view = jax.random.split(key, 3)
    params = {
        "neural_image": init_neural_image(k_img, cfg.arch, dtype=dtype),
        "warp": jnp.zeros((cfg.batch_size, cfg.warp_dof), dtype=dtype),
    }
    if cfg.use_implicit_mask:
        if cfg.build_single_masks:
            # One independently-initialized head per image, stacked for vmap
            # (reference keeps a python dict of modules, model/planar.py:322-324).
            keys = jax.random.split(k_mask, cfg.batch_size)
            heads = [init_implicit_mask(k, dtype=dtype) for k in keys]
            params["implicit_mask"] = jax.tree.map(lambda *xs: jnp.stack(xs), *heads)
        else:
            params["implicit_mask"] = init_implicit_mask(k_mask, dtype=dtype)
        params["view_embedding"] = init_view_embedding(k_view, cfg.N_vocab, dtype=dtype)
    return params


def graph_forward(params: dict, data: dict, cfg: PlanarConfig, progress: jax.Array) -> dict:
    """Forward pass (reference Graph.forward, model/planar.py:329-353).

    Args:
      params: trainable parameter pytree.
      data: device-resident dataset dict (see marf_tpu.data.planar).
      progress: traced scalar in [0, 1] driving the c2f schedule.

    Returns:
      dict with rgb_prediction [B,HW,3], rgb_prediction_map [B,3,h,w],
      edge_prediction (if use_edges), mask_prediction(+_map) (if implicit).
    """
    h, w = cfg.map_hw
    B = cfg.batch_size
    xy_grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)  # [HW, 2]
    # flat channels-first XLA path: [C, B*HW] — pixel axis in lanes end
    # to end, batch folded into pixels so the backward's dW contractions
    # are transpose-free; only the tiny 3-channel outputs get transposed
    warped_flat = warp_grid_cf_flat(xy_grid, params["warp"])  # [2, B*HW]
    rgb_flat = apply_neural_image_cf(params["neural_image"], warped_flat, cfg.arch, progress)
    rgb_map = rgb_flat.reshape(3, B, h, w).transpose(1, 0, 2, 3)  # [B, 3, h, w]
    rgb = rgb_flat.reshape(3, B, h * w).transpose(1, 2, 0)  # [B, HW, 3]
    out = {"rgb_prediction": rgb, "rgb_prediction_map": rgb_map}
    if cfg.use_edges:
        # In-graph replacement for the reference's per-iteration host cv2
        # round-trip (reference model/planar.py:336 -> inputs.py:50-69).
        out["edge_prediction"] = compute_edges(rgb_map, differentiable=cfg.differentiable_edges)
    if cfg.use_implicit_mask:
        # channels-first head; inputs are precomputed by the engine when the
        # view embedding is frozen (the faithful default — the reference
        # never optimizes embedding_view, model/planar.py:89-96)
        inputs_cf = data.get("mask_head_inputs_cf")
        if inputs_cf is None:
            inputs_cf = mask_head_inputs_cf(
                params["view_embedding"], data["rgb"], xy_grid, quantize_levels=cfg.mask_quantize_levels
            )  # [B, 426, HW]
        if cfg.build_single_masks:
            # per-image heads: vmap over the stacked parameter pytree
            mask_cf = jax.vmap(apply_implicit_mask_cf)(params["implicit_mask"], inputs_cf)  # [B, 1, HW]
            out["mask_prediction"] = mask_cf.transpose(0, 2, 1)  # [B, HW, 1]
            out["mask_prediction_map"] = mask_cf.reshape(B, 1, h, w)
        else:
            # shared head: fold batch into the pixel axis (transpose-free dW)
            if inputs_cf.ndim == 3:
                inputs_flat = inputs_cf.transpose(1, 0, 2).reshape(inputs_cf.shape[1], -1)
            else:
                inputs_flat = inputs_cf  # already [426, B*HW] (engine precompute)
            mask_flat = apply_implicit_mask_cf(params["implicit_mask"], inputs_flat)  # [1, B*HW]
            out["mask_prediction"] = mask_flat.reshape(1, B, h * w).transpose(1, 2, 0)  # [B, HW, 1]
            out["mask_prediction_map"] = mask_flat.reshape(1, B, h, w).transpose(1, 0, 2, 3)
    return out


def graph_loss(outputs: dict, data: dict, cfg: PlanarConfig, step: jax.Array) -> dict:
    """Composite loss (reference Graph.compute_loss, model/planar.py:355-380).

    `step` is the 0-based loss-evaluation counter (the reference's Graph.it),
    driving the alpha schedule.
    """
    loss = {}
    alpha = (
        alpha_schedule(step, cfg.max_iter, cfg.alpha_initial, cfg.alpha_final)
        if cfg.use_edges
        else jnp.asarray(0.0, dtype=jnp.float32)
    )
    if cfg.w_render is not None:
        rgb_masks = None
        if cfg.use_implicit_mask:
            rgb_masks = outputs["mask_prediction_map"]
        elif cfg.use_masks:
            rgb_masks = data["masks"]
        rgb_loss = mse(outputs["rgb_prediction_map"], data["rgb"], rgb_masks)
        if cfg.use_edges:
            edge_masks = outputs["mask_prediction_map"] if cfg.use_implicit_mask else data.get("masks_eroded")
            edge_loss = mse(outputs["edge_prediction"], data["edges"], edge_masks)
        else:
            edge_loss = jnp.asarray(0.0, dtype=jnp.float32)
        mask_loss = (
            mask_counterweight(outputs["mask_prediction_map"])
            if cfg.use_implicit_mask
            else jnp.asarray(0.0, dtype=jnp.float32)
        )
        loss["render"] = render_loss(rgb_loss, edge_loss, mask_loss, alpha)
        loss["rgb"] = rgb_loss
        loss["mask"] = mask_loss
        loss["edge"] = edge_loss
    return loss
