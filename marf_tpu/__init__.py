"""marf_tpu — TPU-native Masking Bundle-Adjusting (planar) Neural Radiance Fields.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`thomasjaron/masking-bundle-adjusting-neural-radiance-fields` (MARF):
joint optimization of per-image SL(3) homographies (sl(3) Lie-algebra
parametrization) and a coordinate-MLP "neural image", with BARF
coarse-to-fine positional-encoding annealing, occlusion masking
(pre-made masks and Ha-NeRF-style learned implicit masks), and
edge-based alignment losses.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  marf_tpu.utils     — config DSL, console log, TensorBoard writer, vis helpers
  marf_tpu.ops       — pure jittable ops: Lie/expm, grids, warps, posenc,
                       filters (Sobel/Gauss/erode), homography normalization,
                       losses; marf_tpu.ops.pallas holds fused TPU kernels
  marf_tpu.models    — parameter init + apply fns (neural image, implicit mask)
                       and the planar Graph (forward + loss as pure functions)
  marf_tpu.data      — host-side IO (PIL/cv2 at startup only), synthetic data
  marf_tpu.engine    — Trainer lifecycle (5-phase, matching the reference's
                       Model), jitted scan-chunked train loop, checkpointing
  marf_tpu.parallel  — device mesh + sharded train step (multi-chip DP over
                       pixels via jax.sharding; XLA inserts the collectives)

Everything under jit is a pure function of (TrainState, data constants); all
host work (image decode, PNG/mp4 dumps, TB writes) happens outside the step.
"""

__version__ = "0.1.0"
