"""Trainer lifecycle — the engine around the jitted step.

Same 5-phase lifecycle as the reference `Model` (reference train.py:24-31,
model/planar.py:31-292): load_dataset -> build_networks -> setup_optimizer ->
setup_visualizer -> train. Observable surface preserved: TensorBoard tags
`train/loss_*`, `train/PSNR`, `train/Homography_Error`, `train/Mask_Error` at
`freq.scalar`; image panels + per-vis PNG frame dumps at `freq.vis`; final
vis.mp4 mux; console EMA iteration timer.

TPU-native differences: the loop advances `gcd(freq.scalar, freq.vis)` steps
per XLA dispatch (scan chunk, donated state); metrics are stacked on device
and only synced at log boundaries; the full-image render is a second jitted
program. Plus a real checkpoint/resume capability the reference only stubs.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

import jax
import jax.numpy as jnp

import tqdm

from marf_tpu.data.planar import device_put_dataset, load_planar_dataset, synthesize_planar_dataset
from marf_tpu.engine import checkpoint as ckpt_lib
from marf_tpu.engine.step import (
    chunk_schedule,
    init_train_state,
    make_optimizer,
    make_train_chunk,
    make_train_step,
)
from marf_tpu.models.neural_image import apply_neural_image_cf
from marf_tpu.models.planar import PlanarConfig, graph_forward, init_graph_params
from marf_tpu.ops.grid import normalized_pixel_grid
from marf_tpu.utils import vis as vis_lib
from marf_tpu.utils.console import IterTimer, colorcode_to_number, log


def _setup_compilation_cache():
    """Persist EVERY compiled program, and default the cache dir on TPU.

    A train.py lifecycle compiles ~48 small setup programs (grid builds,
    edge precompute, constant-stream staging, render helpers) besides the
    train chunk; through the remote-TPU tunnel each compile costs ~0.5 s of
    round-trip even when the program itself is trivial — ~28 s of a 34 s
    600-iter run (round-5 cProfile). jax's persistent cache skips programs
    that compile in <1 s by default, which is exactly the class that
    matters here, so zero the thresholds; and without a cache dir the
    cache is off entirely, so default one on TPU (JAX_COMPILATION_CACHE_DIR
    overrides; harmless on CPU test runs where no dir is set).
    """
    try:
        if jax.config.jax_compilation_cache_dir is None and jax.default_backend() == "tpu":
            jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:  # older jax without these knobs
        pass


class Model:
    """Planar bundle-adjustment trainer (drop-in lifecycle of the reference Model)."""

    def __init__(self, opt):
        _setup_compilation_cache()
        self.opt = opt
        self.cfg = PlanarConfig.from_options(opt)
        self.mesh = None
        self.data_axis = None
        self.shard_fused = False
        n_dev = self._resolve_n_devices()
        if n_dev > 1:
            from marf_tpu.parallel.mesh import choose_pixel_axis, make_mesh

            self.mesh = make_mesh(n_dev)
            h, w = self.cfg.map_hw
            self.data_axis = choose_pixel_axis(h, w, n_dev)
            if self.data_axis is None:
                log.warn(
                    f"neither patch dim ({h}x{w}) divides the {n_dev}-device mesh; "
                    "data stays replicated (single-chip arithmetic on every chip)"
                )
            from marf_tpu.models.planar import use_fused_implicit, use_fused_step

            if use_fused_step(self.cfg) or use_fused_implicit(self.cfg):
                from marf_tpu.parallel.shard_fused import fused_shardable

                if fused_shardable(self.cfg, n_dev):
                    # GSPMD cannot partition a pallas_call — shard_map runs
                    # the unchanged kernel per pixel shard with ICI psums
                    # (parallel/shard_fused.py)
                    self.shard_fused = True
                    log.info(
                        f"multi-chip mesh ({n_dev} devices): fused kernel under "
                        "shard_map (per-shard Pallas + ICI psum)"
                    )
                else:
                    import dataclasses

                    log.info(f"multi-chip mesh ({n_dev} devices): using the GSPMD-partitioned XLA step")
                    self.cfg = dataclasses.replace(self.cfg, fused_step="off")
        self.batch_size = self.cfg.batch_size
        self.dataset = opt.get("dataset")
        os.makedirs(opt.output_path, exist_ok=True)
        self.use_homographies = bool(opt.get("use_homographies", False))
        self.data = None
        self.state = None
        self.tx = None
        self.tb = None
        self.box_colors = None
        self.vis_path = None
        self.video_fname = None
        self.timer = None
        self.it = 0
        self.vis_it = 0
        self._step_fn = None
        self._chunks = {}
        self._train_data = None
        self._forward_jit = None
        self._render_jit = None

    @property
    def train_data(self) -> dict:
        """The dict the compiled chunk consumes: flat sharded streams under
        shard_fused, the dataset dict otherwise."""
        return self._train_data if self._train_data is not None else self.data

    def _resolve_n_devices(self) -> int:
        """Mesh size: env MARF_DEVICES > --tpu.n_devices > 'auto'.

        'auto' uses every chip on a multi-chip TPU platform (a v5e pod slice
        trains data-parallel out of the box) and stays single-device on CPU —
        the 8-virtual-device test mesh opts in explicitly (tests/test_parallel.py).
        The reference is single-device by construction (reference options.py:117-118).
        """
        raw = os.environ.get("MARF_DEVICES")
        if raw is None:
            raw = (self.opt.get("tpu") or {}).get("n_devices", "auto")
        if raw in (None, "", "auto"):
            return len(jax.devices()) if jax.default_backend() == "tpu" else 1
        n = int(raw)
        avail = len(jax.devices())
        if not 1 <= n <= avail:
            # clamp rather than raise: dying right after TPU-client init can
            # wedge the remote chip (see CLAUDE.md TPU tunnel rules)
            log.warn(f"--tpu.n_devices={n} but {avail} device(s) visible; using {min(max(n, 1), avail)}")
        return min(max(n, 1), avail)

    # ---------------------------------------------------------------- phases

    def load_dataset(self):
        """Phase 1: load + preprocess once, device_put (reference model/planar.py:59-78)."""
        log.info("loading dataset...")
        if self.dataset == "synthetic":
            raw = synthesize_planar_dataset(self.cfg, seed=int(self.opt.get("seed") or 0))
            if not self.cfg.use_masks:
                raw = dict(raw, masks=None, masks_eroded=None)
        else:
            raw = load_planar_dataset(
                self.cfg,
                self.dataset,
                root=(self.opt.get("data") or {}).get("root"),
                use_masks=self.cfg.use_masks or self.cfg.use_implicit_mask,
                use_homographies=self.use_homographies,
                use_edges=self.cfg.use_edges,
            )
        if raw.get("gt_hom") is None:
            self.use_homographies = False
        if self.mesh is not None:
            from marf_tpu.parallel.mesh import shard_planar_data

            # shard_fused trains on the flat streams (_build_compiled);
            # self.data then only feeds vis and stays replicated
            axis = None if self.shard_fused else self.data_axis
            self.data = shard_planar_data(raw, self.mesh, axis)
        else:
            self.data = device_put_dataset(raw)

    def build_networks(self):
        """Phase 2: init params (reference model/planar.py:81-84)."""
        log.info("building networks...")
        key = jax.random.PRNGKey(int(self.opt.get("seed") or 0))
        self.params = init_graph_params(key, self.cfg)
        torch_init = self.opt.get("load_torch_init")
        if torch_init:
            from marf_tpu.utils.torch_init import load_torch_init

            self.params = load_torch_init(self.params, torch_init)

    def setup_optimizer(self):
        """Phase 3: per-group optimizer + state (reference model/planar.py:86-104),
        honoring load/resume checkpoints (capability the reference stubs)."""
        log.info("setting up optimizers...")
        from marf_tpu.engine.step import make_flat_optimizer

        # flat-space Adam (one fused [P] update pass, exact-equal to the
        # per-group multi_transform — step.py make_flat_optimizer); falls
        # back for non-Adam algos, or when tpu.flat_adam resolves to off.
        # 'auto' picks multi_transform for per-image mask heads: their
        # ragged head-stacked leaves (56-lane / head-padded rows) pay a
        # ~0.34 ms/step tiled-layout relayout coming out of the flat [P]
        # vector, and the per-leaf update measures +10.5% there (196.6 vs
        # 177.8 steps/s, golden held — PERF.md round-4); everywhere else
        # the flat pass wins (multi_transform's per-leaf fusions cost
        # ~0.28 ms/step on canonical, PERF.md round-3).
        flat_mode = str(self.opt.get("tpu", {}).get("flat_adam", "auto"))
        use_flat = {"on": True, "off": False}.get(
            flat_mode, not getattr(self.cfg, "build_single_masks", False)
        )
        self.tx = (
            make_flat_optimizer(dict(self.opt.optim), self.cfg.max_iter, self.params)
            if use_flat
            else None
        )
        if self.tx is None:
            self.tx = make_optimizer(dict(self.opt.optim), self.cfg.max_iter)
        self.state = init_train_state(self.params, self.tx)
        restore = ckpt_lib.resolve_restore_path(
            self.opt.output_path, self.opt.get("load"), self.opt.get("resume")
        )
        if restore:
            log.info(f"restoring checkpoint from {restore}")
            try:
                self.state = ckpt_lib.restore_checkpoint(restore, self.state)
            except Exception as first_err:
                # the checkpoint may carry the OTHER Adam state layout
                # (multi_transform vs flat — trajectory-equal, see
                # make_flat_optimizer; which one a run uses depends on
                # tpu.flat_adam and the config) — self-heal by rebuilding
                # the other optimizer and restoring against it. If that
                # ALSO fails, the checkpoint is broken for some other
                # reason: re-raise the ORIGINAL error so it isn't
                # misattributed to the optimizer layout.
                tx_primary = self.tx
                try:
                    self.tx = (
                        make_optimizer(dict(self.opt.optim), self.cfg.max_iter)
                        if use_flat
                        else make_flat_optimizer(
                            dict(self.opt.optim), self.cfg.max_iter, self.params
                        )
                    )
                    if self.tx is None:  # non-Adam: no alternate layout exists
                        raise first_err
                    self.state = init_train_state(self.params, self.tx)
                    self.state = ckpt_lib.restore_checkpoint(restore, self.state)
                except Exception:
                    self.tx = tx_primary
                    raise first_err
                log.warn(
                    "checkpoint carries the other Adam state layout "
                    f"({'multi_transform' if use_flat else 'flat'}); "
                    "using it for this run (trajectory-equal)"
                )
            self.it = int(self.state.step)
        if self.mesh is not None:
            from marf_tpu.parallel.mesh import replicate

            # params + optimizer state replicated over the mesh; gradients
            # all-reduce over ICI (GSPMD inserts the collectives)
            self.state = jax.device_put(self.state, replicate(self.mesh))

    def setup_visualizer(self):
        """Phase 4: TB writer, vis dir, border colors (reference model/planar.py:106-134)."""
        log.info("setting up visualizers...")
        if self.opt.get("tb") is not None:
            from marf_tpu.utils.tb import SummaryWriter

            self.tb = SummaryWriter(log_dir=self.opt.output_path, flush_secs=10)
        colors = [colorcode_to_number(c) for c in vis_lib.BOX_COLORS[: self.batch_size]]
        self.box_colors = np.array(colors).astype(int)
        self.vis_path = f"{self.opt.output_path}/vis"
        os.makedirs(self.vis_path, exist_ok=True)
        self.video_fname = f"{self.opt.output_path}/vis.mp4"

    # ------------------------------------------------------------- compiled fns

    def _build_compiled(self):
        from marf_tpu.models.planar import use_fused_implicit, use_fused_step

        cfg = self.cfg
        if (
            (use_fused_step(cfg) or use_fused_implicit(cfg))
            and self.mesh is None
            and "targets_cf_p" not in self.data
        ):
            # the fused kernels' constant flat streams, transposed + padded
            # ONCE (engine/step.py stage_fused_constant_streams). The mesh
            # path flattens its own sharded streams (parallel/shard_fused.py
            # FLAT_KEYS).
            from marf_tpu.engine.step import stage_fused_constant_streams

            for k, v in stage_fused_constant_streams(cfg, self.data).items():
                self.data[k] = jax.device_put(v)
        if (
            cfg.use_implicit_mask
            and not cfg.train_view_embedding
            and use_fused_implicit(cfg)
            and "mask_X" not in self.data
        ):
            # fused path: the factored inputs (42-dim uv embedding + 8-way
            # one-hot of the quantized RGB) are constants — build once
            from marf_tpu.ops.pallas.fused_mask import build_mask_x, factor_mask_inputs

            grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
            uv, onehot, table = jax.jit(factor_mask_inputs)(
                self.state.params["view_embedding"], self.data["rgb"], grid
            )
            self.data["mask_table"] = jax.device_put(table)
            from marf_tpu.models.planar import use_fused_dedup

            dedup = use_fused_dedup(cfg)
            use_dedup = dedup and self.mesh is None
            mesh_dedup = dedup and self.mesh is not None and self.shard_fused
            if cfg.fused_dedup == "on" and cfg.build_single_masks:
                log.warn(
                    "tpu.fused_dedup=on ignored: column dedup covers the "
                    "shared-head pipeline only (per-image heads have no "
                    "duplicate columns)"
                )
            if mesh_dedup:
                # the mesh path builds its own per-device dedup structures
                # from the factored inputs (parallel/shard_fused.py
                # flatten_planar_data) — stash them instead of the dense X
                self.data["mask_uv"] = uv
                self.data["mask_onehot"] = onehot
            if not use_dedup and not mesh_dedup:
                # the dedup path never reads the dense [X_ROWS, N] input —
                # skip its ~48 MB HBM residency when dedup is active
                self.data["mask_X"] = jax.device_put(
                    jax.jit(build_mask_x, static_argnames="single")(
                        uv, onehot, single=cfg.build_single_masks
                    )
                )
            if use_dedup:
                # shared head, single chip: dedup the constant input columns
                # once (host numpy) — the mask kernels then run on the
                # HW+E slot0+extras columns only (fused_mask.py
                # slot_dedup_inputs; ~4.8x fewer mask FLOPs on cat_batch3,
                # with dense per-step glue — no [N]-scale gathers).
                from marf_tpu.ops.pallas.fused_mask import slot_dedup_padded_inputs

                dedup_data = slot_dedup_padded_inputs(
                    np.asarray(uv), np.asarray(onehot), cfg.arch
                )
                for k, v in dedup_data.items():
                    self.data[k] = jax.device_put(jnp.asarray(v))
        if (
            cfg.use_implicit_mask
            and not cfg.train_view_embedding
            and not use_fused_implicit(cfg)
            and "mask_head_inputs_cf" not in self.data
        ):
            # frozen view embedding -> the mask-head inputs are constants:
            # compute once instead of re-gathering/embedding every step
            from marf_tpu.models.implicit_mask import mask_head_inputs_cf

            grid = normalized_pixel_grid(cfg.grid_spec, crop=cfg.use_cropped_images)
            inputs_cf = jax.jit(mask_head_inputs_cf, static_argnames="quantize_levels")(
                self.state.params["view_embedding"], self.data["rgb"], grid,
                quantize_levels=cfg.mask_quantize_levels,
            )  # [B, 426, HW]
            if not cfg.build_single_masks:
                # shared head consumes the flat [426, B*HW] layout
                inputs_cf = inputs_cf.transpose(1, 0, 2).reshape(inputs_cf.shape[1], -1)
            if self.mesh is not None:
                from marf_tpu.parallel.mesh import replicate

                # replicated (correctness-first: the flat pixel axis interleaves
                # batch elements, so spatial sharding doesn't transfer 1:1)
                inputs_cf = jax.device_put(inputs_cf, replicate(self.mesh))
                self.data["mask_head_inputs_cf"] = inputs_cf
            else:
                self.data["mask_head_inputs_cf"] = jax.device_put(inputs_cf)
        if self.shard_fused and self._train_data is None:
            from marf_tpu.parallel.shard_fused import flatten_planar_data, shard_flat_data

            self._train_data = shard_flat_data(
                flatten_planar_data(self.data, cfg, n_devices=self.mesh.devices.size),
                self.mesh,
            )
        self._step_fn = make_train_step(cfg, self.tx, use_homographies=self.use_homographies)

        def forward(params, data, progress):
            return graph_forward(params, data, cfg, progress)

        self._forward_jit = jax.jit(forward)

        full_grid = normalized_pixel_grid(cfg.grid_spec, crop=False)

        def render(params, progress):
            rgb_cf = apply_neural_image_cf(
                params["neural_image"], full_grid.T, cfg.arch, progress
            )  # [3, HW]
            return rgb_cf.reshape(3, cfg.H, cfg.W)

        self._render_jit = jax.jit(render)

    def _chunk(self, n: int):
        if n not in self._chunks:
            if self.shard_fused:
                from marf_tpu.parallel.shard_fused import make_fused_sharded_chunk

                self._chunks[n] = make_fused_sharded_chunk(
                    self.cfg, self.tx, self.mesh, tuple(self._train_data.keys()),
                    n, use_homographies=self.use_homographies,
                )
            else:
                self._chunks[n] = make_train_chunk(self._step_fn, n)
        return self._chunks[n]

    # ------------------------------------------------------------------ train

    def train(self):
        """Phase 5: the training loop (reference model/planar.py:136-170)."""
        log.title("TRAINING START")
        self.timer = IterTimer()
        self._build_compiled()
        freq = self.opt.freq
        max_iter = int(self.cfg.max_iter)
        c = chunk_schedule(max_iter, freq.scalar, freq.vis, freq.get("ckpt"))

        # iteration-0 visualization (reference model/planar.py:152-153)
        self.visualize(step=0)

        profile_chunks = int(self.opt.get("profile") or 0)  # trace the first N post-compile chunks

        pbar = tqdm.tqdm(total=max_iter, desc="Training", leave=False, initial=self.it)
        try:
            self._train_loop(pbar, c, max_iter, freq, profile_chunks)
        finally:
            pbar.close()
            if self._profiling:
                jax.profiler.stop_trace()
                self._profiling = False
                log.info(f"profiler trace written to {self.opt.output_path}/profile")

        if self.opt.get("save_checkpoint", True):
            ckpt_lib.save_checkpoint(self.opt.output_path, self.state)
        self._mux_video()
        if self.tb:
            self.tb.flush()
            self.tb.close()
        log.info(f"mean steps/sec: {self.timer.steps_per_sec:.2f}")
        log.title("TRAINING DONE")

    def _train_loop(self, pbar, c, max_iter, freq, profile_chunks):
        """The chunked training loop body, pipelined one chunk deep: chunk
        k+1 is DISPATCHED before chunk k's metrics are pulled to the host,
        so the ~30 ms remote-dispatch round-trip overlaps device execution
        instead of serializing with it (measured round 5 at the reference's
        freq.scalar=20 cadence: 292 -> 486 it/s on the canonical config).
        Scalar rows carry their own step value, so TB output is identical;
        boundaries that need the CURRENT state (vis, checkpoint, profiler
        windows) drain the pipeline first. An in-flight profiler trace is
        tracked on self._profiling so train()'s finally clause always closes
        it, even when the per-step finite check raises mid-chunk."""
        self._profiling = False
        self._postfix = {}
        chunk_idx = 0
        pending = None  # (it_after_chunk, n_steps, device metrics) not yet consumed

        def consume(p):
            it_k, n_k, md = p
            # PULL to the host (device_get), not block_until_ready: on this
            # TPU runtime block_until_ready was observed returning before
            # execution finished (donated-alias state buffers, and for
            # implicit_single even the fresh metric outputs — bench.py
            # round-5 note), which would make the iteration timer and the
            # profiler window meaningless.
            md = jax.device_get(md)
            # every step of every chunk is checked (the reference asserts
            # per-iteration, model/planar.py:181-182): a transient NaN
            # mid-chunk fails here even if the last step recovered. With the
            # pipeline the raise lands one chunk late but reports the exact
            # first bad iteration.
            finite_steps = np.atleast_1d(np.asarray(md.get("finite", True)))
            if not bool(finite_steps.all()):
                first_bad = it_k - len(finite_steps) + int(np.argmin(finite_steps)) + 1
                raise FloatingPointError(f"non-finite loss at iteration {first_bad}")
            if it_k % freq.scalar == 0:
                row = {k: np.asarray(v)[-1] for k, v in md.items()}
                row.pop("finite", None)
                if self.tb:
                    self.log_scalars(row, step=it_k)
                self._postfix = dict(it=it_k, loss=f"{float(row['all']):.3f}", it_per_sec=f"{self.timer.steps_per_sec:.1f}")
            pbar.update(n_k)
            pbar.set_postfix(**self._postfix)

        while self.it < max_iter:
            n = min(c, max_iter - self.it)
            # profile as a pure overlay on the normal loop: the trace spans
            # chunks [1, 1+profile_chunks) (chunk 0 carries the compile), and
            # logging / vis / checkpoint cadences are unaffected (SURVEY.md
            # §5: jax.profiler device trace as the tracing subsystem; view
            # with tensorboard --logdir <output>/profile). Profiling drains
            # the pipeline at the window edges so the trace covers exactly
            # the intended chunks.
            if profile_chunks and chunk_idx == 1:
                if pending is not None:
                    consume(pending)
                    pending = None
                jax.profiler.start_trace(f"{self.opt.output_path}/profile")
                self._profiling = True
            self.timer.tic()
            self.state, metrics = self._chunk(n)(self.state, self.train_data)
            self.it += n
            ckpt_freq = freq.get("ckpt")
            needs_state = (
                self.it % freq.vis == 0
                or (ckpt_freq and self.it % ckpt_freq == 0)
                or self.it >= max_iter
                or self._profiling
            )
            if pending is not None:
                consume(pending)  # blocks on chunk k while chunk k+1 runs
                pending = None
            pending = (self.it, n, metrics)
            if needs_state:
                consume(pending)
                pending = None
            self.timer.toc(n)
            chunk_idx += 1
            if self._profiling and chunk_idx >= 1 + profile_chunks:
                jax.profiler.stop_trace()
                self._profiling = False
                log.info(f"profiler trace written to {self.opt.output_path}/profile")
            if self.it % freq.vis == 0:
                self.visualize(step=self.it)
            if ckpt_freq and self.it % ckpt_freq == 0:
                ckpt_lib.save_checkpoint(self.opt.output_path, self.state)
        if pending is not None:
            consume(pending)

    # ------------------------------------------------------------ observability

    def log_scalars(self, row: dict, step: int, split: str = "train"):
        """Publish the reference's exact scalar tags (model/planar.py:226-254)."""
        for key in ("render", "rgb", "mask", "edge"):
            if self.cfg.loss_weight.get(key) is not None and f"loss_{key}" in row:
                self.tb.add_scalar(f"{split}/loss_{key}", row[f"loss_{key}"], step)
        if "Mask_Error" in row:
            self.tb.add_scalar(f"{split}/Mask_Error", row["Mask_Error"], step)
        if "Homography_Error" in row:
            self.tb.add_scalar(f"{split}/Homography_Error", row["Homography_Error"], step)
        self.tb.add_scalar(f"{split}/PSNR", row["PSNR"], step)

    def predict_entire_image(self) -> np.ndarray:
        """Full-canvas render from the neural image (reference model/planar.py:211-217)."""
        progress = jnp.asarray(max(self.it - 1, 0) / self.cfg.max_iter, dtype=jnp.float32)
        return np.asarray(self._render_jit(self.state.params, progress))

    def visualize(self, step: int = 0, split: str = "train"):
        """Frame dump + TB image panels (reference model/planar.py:256-292)."""
        if self._render_jit is None:
            self._build_compiled()
        tag_step = max(step, 1)  # panels land on 1, 100, 200... like the reference (model/planar.py:256-292 tags it+1)
        frame = self.predict_entire_image()  # [3, H, W]
        frame_u8 = (np.clip(frame, 0, 1) * 255).astype(np.uint8).transpose(1, 2, 0)
        from PIL import Image

        Image.fromarray(frame_u8).save(f"{self.vis_path}/{self.vis_it}.png")
        self.vis_it += 1
        if not self.tb:
            return
        colors = self.box_colors
        if self.vis_it == 1:
            rgb = np.asarray(self.data["rgb"])
            vis_lib.tb_image(self.opt, self.tb, tag_step, split, "input_images", vis_lib.color_border(rgb, colors))
            if self.cfg.use_masks and self.data.get("masks") is not None:
                masks = np.asarray(self.data["masks"])
                vis_lib.tb_image(self.opt, self.tb, tag_step, split, "input_masks", vis_lib.color_border(masks, colors))
        vis_lib.tb_image(self.opt, self.tb, tag_step, split, "predicted_image", frame[None])
        tb_opt = self.opt.get("tb") or {}
        show_edges = bool(tb_opt.get("show_edges")) and self.cfg.use_edges
        out = None
        if self.cfg.use_implicit_mask or show_edges:
            progress = jnp.asarray(max(self.it - 1, 0) / self.cfg.max_iter, dtype=jnp.float32)
            out = self._forward_jit(self.state.params, self.data, progress)
        if self.cfg.use_implicit_mask:
            h, w = self.cfg.map_hw
            mask_formed = np.asarray(out["mask_prediction"]).reshape(self.batch_size, h, w, 1).transpose(0, 3, 1, 2)
            vis_lib.tb_image(
                self.opt, self.tb, tag_step, split, "implicit_masks",
                vis_lib.color_border(mask_formed, colors, width=1, depth=1),
            )
        if show_edges:
            # the reference ships this panel commented out (model/planar.py:288-292)
            vis_lib.tb_image(
                self.opt, self.tb, tag_step, split, "predicted_edges",
                np.asarray(out["edge_prediction"]),
            )
        if bool(tb_opt.get("show_corners")):
            # consumer for the reference's never-called warp_corners
            # (warp.py:83-93): current warped patch windows on the canvas
            from marf_tpu.ops.grid import crop_corners
            from marf_tpu.ops.warp import warp_corners

            spec = self.cfg.grid_spec
            cn = np.asarray(warp_corners(crop_corners(spec), self.state.params["warp"]))  # [B, 4, 2]
            px = np.empty_like(cn)
            px[..., 0] = (cn[..., 0] / spec.norm_w + 1) / 2 * self.cfg.W - 0.5
            px[..., 1] = (cn[..., 1] / spec.norm_h + 1) / 2 * self.cfg.H - 0.5
            overlay = vis_lib.draw_corner_boxes(np.clip(frame, 0, 1), px, colors)
            vis_lib.tb_image(self.opt, self.tb, tag_step, split, "warp_corners", overlay[None])

    def _mux_video(self):
        """vis.mp4 from the frame dumps (reference model/planar.py:163-165);
        ffmpeg when available (reference-identical invocation), else a
        cv2.VideoWriter mp4v fallback so the artifact exists in ffmpeg-less
        images too (frames are kept in vis/ either way)."""
        ffmpeg = shutil.which("ffmpeg")
        if ffmpeg:
            subprocess.run(
                [ffmpeg, "-y", "-framerate", "30", "-i", f"{self.vis_path}/%d.png", "-pix_fmt", "yuv420p", self.video_fname],
                check=False,
                capture_output=True,
            )
            return
        try:
            import cv2
        except ImportError:
            log.warn("neither ffmpeg nor cv2 found; skipping vis.mp4 mux (frames kept in vis/)")
            return
        # Robust teardown: only the <int>.png frames this trainer dumps are
        # muxed (stray files in vis/ are ignored, matching ffmpeg's %d.png
        # pattern), unreadable/short frames are skipped, and no exception
        # may escape — a mux hiccup must not fail a finished training run.
        try:
            frames = sorted(
                (f for f in os.listdir(self.vis_path)
                 if f.endswith(".png") and f[: -len(".png")].isdigit()),
                key=lambda f: int(f.split(".")[0]),
            )
            first = None
            for f in frames:
                first = cv2.imread(os.path.join(self.vis_path, f))
                if first is not None:
                    break
            if first is None:
                return
            h, w = first.shape[:2]
            writer = cv2.VideoWriter(
                self.video_fname, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h)
            )
            if not writer.isOpened():
                log.warn("cv2 VideoWriter failed to open; skipping vis.mp4 mux")
                return
            written = 0
            for f in frames:
                img = cv2.imread(os.path.join(self.vis_path, f))
                if img is not None and img.shape[:2] == (h, w):
                    writer.write(img)
                    written += 1
            writer.release()
            log.info(f"muxed {written} frames -> {self.video_fname} (cv2 mp4v)")
        except Exception as e:  # pragma: no cover - defensive teardown
            log.warn(f"vis.mp4 mux failed ({e}); frames kept in {self.vis_path}")
