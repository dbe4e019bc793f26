"""Planar dataset loading (reference inputs.py re-designed for the JAX engine).

All IO and preprocessing happens host-side once at startup (PIL decode,
LANCZOS thumbnail, cv2 target-edge/erosion, .mat homography load) and the
results are `device_put` once — the same preload strategy as the reference
(reference model/planar.py:59-78) minus its per-iteration host work.

Dataset layout (reference data/planar/<set>/): `i.png` warped+occluded
photos, `i-m.png` occlusion masks (SIDAR convention: occlusion = 1, inverted
on load, reference inputs.py:30-31,118-119), `gt.png` canvas, and optional
`H_0_i.mat` plain-text 3x3 pixel-space homographies.

A synthetic generator is provided so tests and demos never require the
on-disk dataset.
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

import jax
import jax.numpy as jnp
from PIL import Image

from marf_tpu.ops.homography import normalize_homography
from marf_tpu.utils.console import log

# Candidate roots for `data/planar/<dataset>`; the reference checkout is a
# read-only fallback so the canonical benchmark data resolves out of the box.
_DATA_ROOTS = (
    "data/planar",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "data", "planar"),
    "/root/reference/data/planar",
)


def resolve_data_root(dataset: str, root: str | None = None) -> str:
    """Find the directory holding `<dataset>/0.png` etc."""
    candidates = [root] if root else list(_DATA_ROOTS)
    for cand in candidates:
        if cand and os.path.isdir(os.path.join(cand, dataset)):
            return os.path.join(cand, dataset)
    raise FileNotFoundError(f"dataset {dataset!r} not found under any of {candidates}")


def _to_tensor(im: Image.Image) -> np.ndarray:
    """PIL -> [C, H, W] float32 in [0, 1] (torchvision to_tensor semantics)."""
    arr = np.asarray(im)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    arr = arr.transpose(2, 0, 1)
    if arr.dtype == np.uint8:
        return arr.astype(np.float32) / 255.0
    return arr.astype(np.float32)


def load_images(
    fps: list[str] | None,
    mode: str = "RGB",
    invert_gray: bool = False,
    thumbnail_hw: tuple[int, int] | None = None,
) -> np.ndarray | None:
    """Load a stack of images (reference inputs.py:16-33).

    Args:
      fps: file paths.
      mode: PIL convert mode ('RGB' or 'L').
      invert_gray: threshold-invert grayscale masks `(im < 0.5)` (SIDAR
        occlusion convention, reference inputs.py:30-31).
      thumbnail_hw: (patch_H, patch_W) LANCZOS thumbnail when
        use_cropped_images (reference inputs.py:27-28).

    Returns:
      [B, C, h, w] float32 array, or None if fps is falsy.
    """
    if not fps:
        return None
    if not isinstance(fps, list):
        raise TypeError("load_images requires a list of file paths")
    loaded = []
    for fp in fps:
        im = Image.open(fp).convert(mode)
        if thumbnail_hw is not None:
            im.thumbnail((thumbnail_hw[1], thumbnail_hw[0]), Image.Resampling.LANCZOS)
        arr = _to_tensor(im)
        if mode == "L" and invert_gray:
            arr = (arr < 0.5).astype(np.float32)
        loaded.append(arr)
    return np.stack(loaded)


def load_single_image(fp: str, mode: str = "RGB") -> np.ndarray:
    """Load one image to [C, H, W] float32 (reference inputs.py:43-48)."""
    return _to_tensor(Image.open(fp).convert(mode))


def save_images(images, suffix: str, out_dir: str = ".") -> list[str]:
    """Debug helper: dump a [B, C, H, W] stack as `<i>-<suffix>.png`
    (reference inputs.py:35-41)."""
    paths = []
    for i, im in enumerate(np.asarray(images)):
        arr = np.clip(np.asarray(im), 0.0, 1.0)
        hwc = (arr.transpose(1, 2, 0) * 255).astype(np.uint8)
        if hwc.shape[-1] == 1:
            hwc = hwc[..., 0]
        path = os.path.join(out_dir, f"{i}-{suffix}.png")
        Image.fromarray(hwc).save(path)
        paths.append(path)
    return paths


def compute_edges_host(images: np.ndarray) -> np.ndarray:
    """Target edge maps with cv2, bit-identical to the reference
    (inputs.py:50-69): Sobel ksize=3 x/y in float64, magnitude, 5x5 Gaussian.

    Args:
      images: [B, C, H, W] float array.

    Returns:
      [B, C, H, W] float32 edge maps (reference keeps float64; targets are
      constants so f32 is the TPU-native storage).
    """
    assert cv2 is not None, "cv2 required for host-side edge computation"
    out = []
    for image in images:
        i = np.transpose(image, (1, 2, 0)).astype(np.float64)
        sx = cv2.Sobel(i, cv2.CV_64F, 1, 0, ksize=3)
        sy = cv2.Sobel(i, cv2.CV_64F, 0, 1, ksize=3)
        i = np.sqrt(sx**2 + sy**2)
        i = cv2.GaussianBlur(i, (5, 5), 0)
        if i.ndim == 2:
            i = i[:, :, None]
        out.append(i.transpose(2, 0, 1))
    return np.stack(out).astype(np.float32)


def erode_images_host(images: np.ndarray, kernel: tuple[int, int] = (5, 5)) -> np.ndarray:
    """Eroded masks with cv2 (reference inputs.py:71-85)."""
    assert cv2 is not None, "cv2 required for host-side erosion"
    element = cv2.getStructuringElement(cv2.MORPH_RECT, kernel)
    out = []
    for image in images:
        i = np.transpose(image, (1, 2, 0))
        i = cv2.erode(i, element)
        if i.ndim == 2:
            i = i[:, :, None]
        out.append(i.transpose(2, 0, 1))
    return np.stack(out).astype(np.float32)


def load_homography(fps: list[str] | None, width: int, height: int, append_identity: bool = True) -> np.ndarray | None:
    """Load `.mat` plain-text homographies and kornia-normalize them
    (reference inputs.py:87-105). The identity is prepended for image 0.

    Faithfully reproduces the reference's argument order: it passes
    (opt.W, opt.H) where kornia expects (h, w) (SURVEY.md §2.4(5)), so the
    call below uses dsize=(width, height) as (h, w).
    """
    if not fps:
        return None
    if not isinstance(fps, list):
        raise TypeError("load_homography requires a list of file paths")
    homs = []
    if append_identity:
        homs.append(np.eye(3, dtype=np.float32))
    for fp in fps:
        homs.append(np.loadtxt(fp).astype(np.float32))
    gt = np.stack(homs)
    # setup-time math stays on the host CPU backend: compiling even these
    # tiny [B,3,3] ops through a remote-TPU tunnel costs minutes on a cold
    # compilation cache (measured: train.py stalled ~3 min at dataset load)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        norm = normalize_homography(jnp.asarray(gt), (width, height), (width, height))
    return np.asarray(norm)


def prepare_images(
    cfg,
    fps_images=None,
    fps_masks=None,
    fp_gt=None,
    fps_hom=None,
    edges=True,
) -> dict:
    """Assemble the dataset dict (reference inputs.py:107-127).

    Returns a dict of numpy arrays: gt, rgb, gt_hom, masks, masks_eroded,
    gray, edges — entries are None when the corresponding input is disabled.
    """
    thumb = (cfg.patch_H, cfg.patch_W) if cfg.use_cropped_images else None
    data = {}
    data["gt"] = load_single_image(fp_gt) if fp_gt else None
    data["rgb"] = load_images(fps_images, thumbnail_hw=thumb)
    data["gt_hom"] = load_homography(fps_hom, cfg.W, cfg.H)
    data["masks"] = load_images(fps_masks, mode="L", invert_gray=True, thumbnail_hw=thumb)
    data["masks_eroded"] = erode_images_host(data["masks"]) if data["masks"] is not None else None
    data["gray"] = load_images(fps_images, mode="L", thumbnail_hw=thumb)
    data["edges"] = compute_edges_host(data["gray"]) if edges else None
    return data


def load_planar_dataset(cfg, dataset: str, root: str | None = None, use_masks=True, use_homographies=True, use_edges=True) -> dict:
    """Load the standard `data/planar/<set>` layout for a PlanarConfig
    (reference model/planar.py:59-78)."""
    ddir = resolve_data_root(dataset, root)
    image_paths = [os.path.join(ddir, f"{i}.png") for i in range(cfg.batch_size)]
    mask_paths = [os.path.join(ddir, f"{i}-m.png") for i in range(cfg.batch_size)]
    hom_paths = [os.path.join(ddir, f"H_0_{i}.mat") for i in range(1, cfg.batch_size)]
    if use_homographies and not all(os.path.isfile(p) for p in hom_paths):
        log.warn(f"homography files missing under {ddir}; disabling Homography_Error metric")
        use_homographies = False
    return prepare_images(
        cfg,
        fps_images=image_paths,
        fps_masks=mask_paths if use_masks else None,
        fp_gt=os.path.join(ddir, "gt.png"),
        fps_hom=hom_paths if use_homographies else None,
        edges=use_edges,
    )


def device_put_dataset(data: dict, sharding=None) -> dict:
    """Move the dataset dict to device(s) once; None entries pass through."""
    def _put(x):
        if x is None:
            return None
        x = jnp.asarray(x, dtype=jnp.float32)
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    return {k: _put(v) for k, v in data.items()}


def synthesize_planar_dataset(
    cfg,
    seed: int = 0,
    occlusion_frac: float = 0.15,
    warp_scale: float = 0.1,
) -> dict:
    """Generate a synthetic planar-alignment dataset (no disk dependency).

    Builds a smooth random canvas, samples B pixel-space homographies around
    identity, warps the canvas with cv2 (or identity fallback), and cuts
    rectangular occlusions recorded in the masks. Matches the on-disk dict
    layout of `prepare_images` so tests/demos can swap it in directly.
    """
    rng = np.random.RandomState(seed)
    H, W, B = cfg.H, cfg.W, cfg.batch_size
    # smooth random canvas: low-res noise upsampled
    low = rng.rand(H // 24 + 2, W // 24 + 2, 3).astype(np.float32)
    canvas = np.stack([np.asarray(Image.fromarray((low[..., c] * 255).astype(np.uint8)).resize((W, H), Image.BICUBIC)) for c in range(3)], axis=-1).astype(np.float32) / 255.0

    h_img, w_img = (cfg.patch_H, cfg.patch_W) if cfg.use_cropped_images else (H, W)
    rgbs, masks, homs = [], [], []
    for b in range(B):
        if b == 0:
            Hmat = np.eye(3)
        else:
            pert = rng.randn(3, 3) * warp_scale * np.array([[0.1, 0.1, W * 0.05], [0.1, 0.1, H * 0.05], [1e-4, 1e-4, 0.1]])
            Hmat = np.eye(3) + pert
            Hmat /= np.cbrt(np.abs(np.linalg.det(Hmat)))
        homs.append(Hmat.astype(np.float32))
        if cv2 is not None:
            warped = cv2.warpPerspective(canvas, np.linalg.inv(Hmat), (W, H), flags=cv2.INTER_LINEAR, borderMode=cv2.BORDER_REFLECT)
        else:
            warped = canvas.copy()
        im = Image.fromarray((np.clip(warped, 0, 1) * 255).astype(np.uint8))
        if cfg.use_cropped_images:
            im.thumbnail((cfg.patch_W, cfg.patch_H), Image.Resampling.LANCZOS)
        arr = np.asarray(im).astype(np.float32) / 255.0
        mask = np.ones((arr.shape[0], arr.shape[1]), dtype=np.float32)
        oh = max(1, int(arr.shape[0] * occlusion_frac))
        ow = max(1, int(arr.shape[1] * occlusion_frac))
        oy, ox = rng.randint(0, arr.shape[0] - oh), rng.randint(0, arr.shape[1] - ow)
        arr[oy : oy + oh, ox : ox + ow] = rng.rand(oh, ow, 3)
        mask[oy : oy + oh, ox : ox + ow] = 0.0  # 0 = occluded (post-inversion convention)
        rgbs.append(arr.transpose(2, 0, 1))
        masks.append(mask[None])
    rgb = np.stack(rgbs)
    masks = np.stack(masks)
    gray = rgb.mean(axis=1, keepdims=True).astype(np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):  # see load_homography
        gt_hom = np.asarray(normalize_homography(jnp.asarray(np.stack(homs)), (cfg.W, cfg.H), (cfg.W, cfg.H)))
    return {
        "gt": canvas.transpose(2, 0, 1),
        "rgb": rgb,
        "gt_hom": gt_hom,
        "masks": masks,
        "masks_eroded": erode_images_host(masks) if cv2 is not None else masks,
        "gray": gray,
        "edges": compute_edges_host(gray) if cv2 is not None else np.zeros_like(gray),
    }
