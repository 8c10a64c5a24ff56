"""`leaffliction-transform` — the PlantCV-style analysis filter pipeline.

Flag/artifact parity with `srcs/cli/Transformation.py:568-703`: single-image
preview mode (outputs to artifacts/transformations/<N>/) and folder mode
(-src/-dst), `--types` filter with canonical aliases, 29-field YAML config,
`<stem>__T_<Type>.jpg` output names, 3-column mosaic with title bars.

Unlike the reference (one process per image via mp.Pool, every filter a
cv2/PlantCV call), the compute core is the on-device pipeline in
`leaffliction_tpu.segment`; host work is decode/encode and PIL drawing.
"""

from __future__ import annotations

import argparse
import re
import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from leaffliction_tpu.core.logging import get_logger, setup_logging
from leaffliction_tpu.segment.config import (
    TransformConfig,
    default_config_path,
    load_config,
)

LOGGER = get_logger(__name__)

IMAGE_EXTS = {".jpg"}
DEFAULT_TYPES = ("Blur", "Mask", "ROI", "Analyze", "Landmarks", "Hist", "Brown")
CANONICAL_TYPES: Dict[str, str] = {
    "blur": "Blur", "mask": "Mask", "roi": "ROI", "analyze": "Analyze",
    "analyse": "Analyze", "landmarks": "Landmarks",
    "pseudolandmarks": "Landmarks", "pseudo-landmarks": "Landmarks",
    "hist": "Hist", "histogram": "Hist", "brown": "Brown",
    "disease": "Brown", "spots": "Brown",
}


@dataclass(frozen=True)
class ProcessArgs:
    img_path: Path
    out_dir: Path
    types: Tuple[str, ...]
    cfg: TransformConfig
    skip_existing: bool = False
    overwrite: bool = False


def is_image(path: Path) -> bool:
    return path.is_file() and path.suffix.lower() in IMAGE_EXTS


def build_types_filter(arg: Optional[str]) -> Tuple[str, ...]:
    if not arg:
        return DEFAULT_TYPES
    result: List[str] = []
    for item in str(arg).split(","):
        key = item.strip().lower()
        if not key:
            continue
        if key in CANONICAL_TYPES:
            name = CANONICAL_TYPES[key]
            if name not in result:
                result.append(name)
        else:
            LOGGER.warning("Unknown transform type skipped: %s", item.strip())
    return tuple(result) if result else DEFAULT_TYPES


def output_names(stem: str) -> Dict[str, str]:
    return {t: f"{stem}__T_{t}.jpg" for t in DEFAULT_TYPES}


def pil_read_rgb(path: Path) -> np.ndarray:
    from PIL import Image, ImageOps

    with Image.open(path) as im:
        im = ImageOps.exif_transpose(im)
        return np.asarray(im.convert("RGB"), np.uint8)


def imwrite_rgb(path: Path, rgb: Optional[np.ndarray]) -> None:
    if rgb is None:
        return
    from PIL import Image

    path.parent.mkdir(parents=True, exist_ok=True)
    arr = np.asarray(rgb)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, -1)
    Image.fromarray(arr.astype(np.uint8)).save(path, quality=95)


def create_mosaic(original_rgb: np.ndarray,
                  filter_results: Dict[str, np.ndarray]) -> np.ndarray:
    """3-column grid, 300px tiles, dimmed title bars
    (`Transformation.py:208-263`)."""
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.utils import draw

    target = 300

    def tile(img: np.ndarray) -> np.ndarray:
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, -1)
        out = jax.image.resize(jnp.asarray(arr, jnp.float32),
                               (target, target, 3), "linear")
        return np.clip(np.round(np.asarray(out)), 0, 255).astype(np.uint8)

    images = [("Original", tile(original_rgb))]
    images += [(name, tile(img)) for name, img in filter_results.items()
               if img is not None]

    cols = 3
    rows = (len(images) + cols - 1) // cols
    mosaic = np.zeros((rows * target, cols * target, 3), np.uint8)
    for idx, (title, img) in enumerate(images):
        r, c = divmod(idx, cols)
        y, x = r * target, c * target
        mosaic[y:y + target, x:x + target] = img
        # dimmed title bar + white text
        bar = mosaic[y:y + 25, x:x + target].astype(np.float32)
        mosaic[y:y + 25, x:x + target] = (bar * 0.7).astype(np.uint8)
        mosaic = draw.text(mosaic, title, (x + 10, y + 6), (255, 255, 255))
    return mosaic


class TransformPipeline:
    """Filter dispatch bound to one config (reference `TransformPipeline`,
    `Transformation.py:326-390`)."""

    def __init__(self, cfg: TransformConfig) -> None:
        self.cfg = cfg

    def make_mask(self, rgb: np.ndarray):
        from leaffliction_tpu.segment.mask import make_mask

        return make_mask(rgb, self.cfg)

    def create_masked_rgb(self, rgb, mask):
        import jax.numpy as jnp

        from leaffliction_tpu.segment.mask import apply_mask_white

        if mask is None:
            return rgb
        out = apply_mask_white(jnp.asarray(rgb), jnp.asarray(mask > 0))
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)

    def mask_vis(self, rgb, mask):
        """Black-background masked RGB (`mask.py:585-607` apply_mask_filter)."""
        import jax.numpy as jnp

        from leaffliction_tpu.segment.mask import apply_mask_black

        out = apply_mask_black(jnp.asarray(rgb), jnp.asarray(mask > 0))
        return np.clip(np.asarray(out), 0, 255).astype(np.uint8)

    def blur(self, rgb, mask):
        import jax.numpy as jnp

        from leaffliction_tpu.segment.blur import blur_filter

        out = blur_filter(jnp.asarray(rgb, jnp.float32),
                          jnp.asarray(mask > 0), self.cfg)
        return np.asarray(out).astype(np.uint8)

    def roi(self, rgb, contour):
        from leaffliction_tpu.segment.roi import roi_filter

        return roi_filter(rgb, contour, self.cfg)

    def analyze(self, rgb, mask, contour):
        from leaffliction_tpu.segment.analyze import analyze_filter

        return analyze_filter(rgb, mask, contour, self.cfg)

    def pseudolandmarks(self, rgb, contour):
        from leaffliction_tpu.segment.landmarks import landmarks_filter

        return landmarks_filter(rgb, contour, self.cfg, self.make_mask)

    def detect_brown_spots(self, rgb, mask):
        from leaffliction_tpu.segment.brown import brown_filter

        return brown_filter(rgb, mask > 0, self.cfg)

    def histogram_hsv(self, rgb):
        from leaffliction_tpu.segment.hist import histogram_filter

        return histogram_filter(rgb, self.cfg)


def dispatch_filters(rgb, mask_img, contour, types, cfg) -> Dict[str, object]:
    """Phase 1 of the folder pipeline: launch EVERY device computation the
    selected filters need for one image, fetching nothing. jax dispatch is
    async, so a driver that dispatches a window of images before finishing
    any overlaps each image's relay round-trips with the device work of the
    others (threads were tried instead and made it 2.3x slower — the relay
    serializes calls, so only async dispatch pipelines).

    `apply_mask_white` over uint8 input yields integral float32, so feeding
    the un-rounded device array to the filters is bit-identical to the
    round-tripped uint8 `masked_rgb` the serial path uses."""
    import jax.numpy as jnp

    from leaffliction_tpu.segment.analyze import analyze_dispatch
    from leaffliction_tpu.segment.brown import brown_regions
    from leaffliction_tpu.segment.blur import blur_filter
    from leaffliction_tpu.segment.hist import hist_dispatch
    from leaffliction_tpu.segment.landmarks import landmarks_dispatch
    from leaffliction_tpu.segment.mask import apply_mask_black, apply_mask_white
    from leaffliction_tpu.segment.roi import roi_dispatch

    handles: Dict[str, object] = {}
    if mask_img is None:
        return handles
    rgb_dev = jnp.asarray(rgb)
    mask_dev = jnp.asarray(mask_img > 0)
    masked_dev = apply_mask_white(rgb_dev, mask_dev)  # integral f32
    handles["masked"] = masked_dev
    if "Mask" in types:
        handles["maskvis"] = apply_mask_black(rgb_dev, mask_dev)
    if "Blur" in types:
        handles["blur"] = blur_filter(masked_dev, mask_dev, cfg)
    if "ROI" in types:
        handles["roi"] = roi_dispatch(masked_dev, contour, cfg)
    if "Analyze" in types:
        handles["edges"] = analyze_dispatch(masked_dev)
    if "Landmarks" in types:
        handles["lm"] = landmarks_dispatch(
            masked_dev, contour, cfg, lambda _rgb: (mask_img, contour))
    if "Hist" in types:
        handles["stats"] = hist_dispatch(masked_dev)
    if "Brown" in types:
        handles["brown"] = brown_regions(masked_dev, mask_dev, cfg)
    return handles


def process_single_image(params: ProcessArgs, rgb=None,
                         precomputed_mask=None, handles=None) -> List[Path]:
    """Run the selected filters for one image.

    `precomputed_mask` is an optional (mask, contour) pair — folder mode
    computes masks for the whole directory in device batches first (the
    TPU-native counterpart of the reference's mp.Pool fan-out) and passes
    them here so the per-image pass never re-runs segmentation.
    `handles` is the optional output of `dispatch_filters` — with it this
    function only fetches/draws/saves (phase 2).
    """
    if rgb is None:
        try:
            rgb = pil_read_rgb(params.img_path)
        except Exception as exc:
            LOGGER.error("Failed to read %s (%s)", params.img_path, exc)
            return []

    pipe = TransformPipeline(params.cfg)
    saved: List[Path] = []
    filter_results: Dict[str, np.ndarray] = {}
    names = output_names(params.img_path.stem)

    def want_write(out: Path) -> bool:
        return params.overwrite or (not params.skip_existing or not out.exists())

    mask_img = contour = None
    masked_rgb = rgb
    if set(params.types) & {"Mask", "ROI", "Analyze", "Landmarks", "Brown",
                            "Blur"}:
        if precomputed_mask is not None:
            mask_img, contour = precomputed_mask
            pipe.make_mask = lambda _rgb: (mask_img, contour)  # reuse below
        else:
            mask_img, contour = pipe.make_mask(rgb)
        if mask_img is not None:
            if handles is not None and "masked" in handles:
                masked_rgb = np.clip(np.round(np.asarray(handles["masked"])),
                                     0, 255).astype(np.uint8)
            else:
                masked_rgb = pipe.create_masked_rgb(rgb, mask_img)
    handles = handles or {}

    if "Mask" in params.types:
        if mask_img is None:
            vis = rgb
        elif "maskvis" in handles:
            vis = np.clip(np.asarray(handles["maskvis"]), 0, 255
                          ).astype(np.uint8)
        else:
            vis = pipe.mask_vis(rgb, mask_img)
        filter_results["Mask"] = vis
        out = params.out_dir / names["Mask"]
        if want_write(out):
            imwrite_rgb(out, vis)
            saved.append(out)

    if "Blur" in params.types and mask_img is not None:
        if "blur" in handles:
            img = np.asarray(handles["blur"]).astype(np.uint8)
        else:
            img = pipe.blur(masked_rgb, mask_img)
        filter_results["Blur"] = img
        out = params.out_dir / names["Blur"]
        if want_write(out):
            imwrite_rgb(out, img)
            saved.append(out)

    if "ROI" in params.types:
        from leaffliction_tpu.segment.roi import roi_filter

        _, roi_vis, _ = roi_filter(masked_rgb, contour, params.cfg,
                                   dispatched=handles.get("roi"))
        vis = roi_vis if roi_vis is not None else masked_rgb
        filter_results["ROI"] = vis
        out = params.out_dir / names["ROI"]
        if want_write(out):
            imwrite_rgb(out, vis)
            saved.append(out)

    if "Analyze" in params.types:
        from leaffliction_tpu.segment.analyze import analyze_filter

        img = analyze_filter(masked_rgb, mask_img, contour, params.cfg,
                             edges=handles.get("edges"))
        filter_results["Analyze"] = img
        out = params.out_dir / names["Analyze"]
        if want_write(out):
            imwrite_rgb(out, img)
            saved.append(out)

    if "Landmarks" in params.types:
        if "lm" in handles:
            from leaffliction_tpu.segment.landmarks import landmarks_finish

            img = landmarks_finish(masked_rgb, handles["lm"], params.cfg)
        else:
            img = pipe.pseudolandmarks(masked_rgb, contour)
        filter_results["Landmarks"] = img
        out = params.out_dir / names["Landmarks"]
        if want_write(out):
            imwrite_rgb(out, img)
            saved.append(out)

    if "Hist" in params.types:
        from leaffliction_tpu.segment.hist import histogram_filter

        img = histogram_filter(masked_rgb, params.cfg,
                               stats=handles.get("stats"))
        filter_results["Hist"] = img
        out = params.out_dir / names["Hist"]
        if want_write(out):
            imwrite_rgb(out, img)
            saved.append(out)

    if "Brown" in params.types and mask_img is not None:
        from leaffliction_tpu.segment.brown import brown_filter

        img, pct, count = brown_filter(masked_rgb, mask_img > 0, params.cfg,
                                       regions=handles.get("brown"))
        LOGGER.info("Brown spots detected: %d regions, %.1f%% of leaf area",
                    count, pct)
        filter_results["Brown"] = img
        out = params.out_dir / names["Brown"]
        if want_write(out):
            imwrite_rgb(out, img)
            saved.append(out)

    if filter_results:
        match = re.search(r"image \((\d+)\)", params.img_path.stem)
        image_number = match.group(1) if match else params.img_path.stem
        mosaic = create_mosaic(rgb, filter_results)
        mosaic_path = params.out_dir / f"image{image_number}_mosaic.jpg"
        imwrite_rgb(mosaic_path, mosaic)
        saved.append(mosaic_path)
        print(f"Mosaïque créée : {mosaic_path}")
    return saved


def _precompute_masks_batched(imgs: List[Path], cfg: TransformConfig,
                              device_batch: int = 16):
    """Folder-mode mask fan-out: decode on threads, segment in device
    batches grouped by shape, trace contours on host.

    GrabCut refinement is skipped on this path (host-per-image; the batched
    scorer already picked the best candidate) — single-image mode keeps it.
    """
    import concurrent.futures as cf
    from functools import partial as _partial

    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.segment.contours import largest_contour_points
    from leaffliction_tpu.segment.mask import (
        finalize_mask_batch,
        make_mask_batch_async,
    )

    decoded: Dict[Path, np.ndarray] = {}

    def _decode(p: Path) -> None:
        try:
            decoded[p] = pil_read_rgb(p)
        except Exception as exc:
            LOGGER.error("Failed to read %s (%s)", p, exc)

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(_decode, imgs))

    by_shape: Dict[tuple, List[Path]] = {}
    for p, arr in decoded.items():
        by_shape.setdefault(arr.shape, []).append(p)

    @_partial(jax.jit, static_argnames=("wh", "ww"))
    def _upscale(dev, wh, ww):
        return jax.image.resize(dev.astype(jnp.float32),
                                (dev.shape[0], wh, ww, 3), "cubic")

    @_partial(jax.jit, static_argnames=("h", "w"))
    def _downscale_mask(mask_dev, h, w):
        return jax.image.resize(mask_dev.astype(jnp.float32),
                                (mask_dev.shape[0], h, w), "nearest") > 0.5

    # Dispatch every chunk before fetching any mask: uint8 uploads overlap
    # segmentation compute across chunks, one sync at the end.
    pending = []
    for shape, paths in by_shape.items():
        h, w = shape[0], shape[1]
        # same upscale policy as the single-image path (`mask.py:29-50`)
        s = 1.0
        if cfg.mask_upscale_factor and cfg.mask_upscale_factor > 1.0:
            s = float(cfg.mask_upscale_factor)
        elif cfg.mask_upscale_long_side and max(h, w) < cfg.mask_upscale_long_side:
            s = cfg.mask_upscale_long_side / max(h, w)
        wh, ww = int(round(h * s)), int(round(w * s))
        for start in range(0, len(paths), device_batch):
            chunk = paths[start:start + device_batch]
            dev = jnp.asarray(np.stack([decoded[p] for p in chunk]))  # uint8
            if abs(s - 1.0) > 1e-6:
                dev = _upscale(dev, wh, ww)
            mask_dev, scores = make_mask_batch_async(dev, cfg)
            pending.append((chunk, dev, mask_dev, scores, s, h, w))

    @jax.jit
    def _pack(mask_dev):
        # packed-bit download: 8x less than bool bytes over the link
        return jnp.packbits(mask_dev.astype(jnp.uint8), axis=-1)

    masks: Dict[Path, tuple] = {}
    for chunk, dev, mask_dev, scores, s, h, w in pending:
        mask_dev = finalize_mask_batch(dev, mask_dev, scores, cfg)
        if abs(s - 1.0) > 1e-6:
            mask_dev = _downscale_mask(mask_dev, h, w)
        packed = np.asarray(jax.device_get(_pack(mask_dev)))
        mask_np = np.unpackbits(packed, axis=-1, count=w) > 0
        for p, m in zip(chunk, mask_np):
            mask_u8 = m.astype(np.uint8) * 255
            masks[p] = (mask_u8, largest_contour_points(m))
    LOGGER.info("Precomputed %d masks in device batches", len(masks))
    return decoded, masks


def iter_images_in_dir(src: Path):
    for p in sorted(src.rglob("*")):
        if is_image(p):
            yield p


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description=("Image transformation pipeline (TPU-native). "
                     "Single image: transform path/to/image.jpg; "
                     "folder mode: -src DIR -dst OUTDIR"))
    p.add_argument("image", nargs="?", default=None)
    p.add_argument("--out-dir", default=None)
    p.add_argument("-src", "--src", default=None)
    p.add_argument("-dst", "--dst", default=None)
    p.add_argument("--types", default=",".join(DEFAULT_TYPES))
    p.add_argument("--config", default=None,
                   help="YAML config path (default: packaged config.yaml)")
    p.add_argument("--workers", type=int, default=0,
                   help="Kept for flag parity; compute is batched on device")
    p.add_argument("--skip-existing", action="store_true")
    p.add_argument("--overwrite", action="store_true")
    p.add_argument("--preview", action="store_true",
                   help="Force saving outputs and printing their paths "
                        "(no GUI popups) — for stdout-parsing consumers")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)
    setup_logging()
    types = build_types_filter(args.types)
    cfg_path = Path(args.config) if args.config else default_config_path()
    cfg = load_config(cfg_path)

    from leaffliction_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.image and not args.src and not args.dst:
        ip = Path(args.image)
        if not is_image(ip):
            LOGGER.error("Not a valid image: %s", ip)
            return
        match = re.search(r"image \((\d+)\)", ip.stem)
        image_number = match.group(1) if match else ip.stem
        out_dir = (Path(args.out_dir) if args.out_dir
                   else Path("artifacts") / "transformations" / image_number)
        out_dir.mkdir(parents=True, exist_ok=True)
        # --preview contract (reference `Transformation.py:568-608`, consumed
        # by its predict subprocess): outputs are always (re)written and their
        # paths printed, so a stdout-parsing caller never sees stale/missing
        # files. Saving is unconditional here; preview just defeats
        # --skip-existing.
        saved = process_single_image(ProcessArgs(
            img_path=ip, out_dir=out_dir, types=types, cfg=cfg,
            skip_existing=args.skip_existing and not args.preview,
            overwrite=args.overwrite or args.preview))
        print(f"Saved {len(saved)} outputs to {out_dir}")
        for s in saved:
            print(f"  - {s}")
        return

    if args.src and args.dst:
        src, dst = Path(args.src), Path(args.dst)
        if not src.exists():
            LOGGER.error("Source directory does not exist: %s", src)
            return
        dst.mkdir(parents=True, exist_ok=True)
        imgs = list(iter_images_in_dir(src))
        if not imgs:
            LOGGER.warning("No images found in %s", src)
            return
        LOGGER.info("Found %d images in %s", len(imgs), src)
        total_saved = 0
        needs_mask = bool(set(types) & {"Mask", "ROI", "Analyze", "Landmarks",
                                        "Brown", "Blur"})
        decoded: Dict[Path, np.ndarray] = {}
        masks: Dict[Path, tuple] = {}
        if needs_mask:
            decoded, masks = _precompute_masks_batched(imgs, cfg)
        # Two-phase windowed pipeline: dispatch a window of images' device
        # work (async, nothing fetched), then finish them (fetch + draw +
        # save) while the device keeps executing. A per-image thread pool
        # was tried instead and made folder mode 2.3x SLOWER on the relay
        # platform (serialized device calls convoy); async dispatch is the
        # lever. Window bounds live device arrays (~3 MB/image).
        window = 32
        for start in range(0, len(imgs), window):
            chunk = imgs[start:start + window]
            dispatched = []
            for img_path in chunk:
                pm = masks.get(img_path)
                dispatched.append(dispatch_filters(
                    decoded.get(img_path),
                    pm[0] if pm else None,
                    pm[1] if pm else None,
                    types, cfg) if decoded.get(img_path) is not None else None)
            for img_path, handles in zip(chunk, dispatched):
                total_saved += len(process_single_image(
                    ProcessArgs(img_path=img_path, out_dir=dst, types=types,
                                cfg=cfg, skip_existing=args.skip_existing,
                                overwrite=args.overwrite),
                    rgb=decoded.get(img_path),
                    precomputed_mask=masks.get(img_path),
                    handles=handles))
        LOGGER.info("Processed %d images, saved %d outputs",
                    len(imgs), total_saved)
        return

    LOGGER.error("Must specify either single image or --src/--dst for "
                 "folder mode")
    sys.exit(1)


if __name__ == "__main__":
    main()
