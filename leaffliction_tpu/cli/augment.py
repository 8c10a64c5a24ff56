"""`leaffliction-augment` — single-image examples or dataset balancing.

Flag/artifact parity with `srcs/cli/Augmentation.py:32-203`: single-image
mode writes `original_<name>` + 6 `<transform>_<name>` files to
artifacts/example; dataset mode balances into artifacts/augmented_directory,
writes manifest_augmented.json, and runs a post-hoc distribution analysis to
artifacts/distribution/balanced_distribution.csv.
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

from leaffliction_tpu.core.logging import get_logger, setup_logging

LOGGER = get_logger(__name__)

SUPPORTED_IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".tiff"}
DEFAULT_DATASET_OUTPUT = "artifacts/augmented_directory"
DEFAULT_SINGLE_OUTPUT = "artifacts/example"
DEFAULT_SEED = 42


class AugmentationError(Exception):
    pass


class InputValidationError(AugmentationError):
    pass


class ProcessingError(AugmentationError):
    pass


def parse_args(argv=None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description=("Apply augmentations to balance a dataset, or generate "
                     "the 6 example transforms for a single image.")
    )
    parser.add_argument("input_path")
    parser.add_argument("-out", "--output", default=None)
    parser.add_argument("-seed", "--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--workers", type=int, default=None,
                        help="Kept for reference-flag parity (batching is "
                             "on-device; decode threads are automatic)")
    return parser.parse_args(argv)


def single_image_mode(args, image_path: Path) -> None:
    import jax
    import numpy as np
    from PIL import Image

    from leaffliction_tpu.ops.augment import (
        AUG_OPS,
        BATCH_KERNELS,
        pil_expanded_size,
    )

    output_dir = Path(args.output) if args.output else Path(DEFAULT_SINGLE_OUTPUT)
    output_dir.mkdir(parents=True, exist_ok=True)
    LOGGER.info("Processing single image: %s", image_path)

    original_output = output_dir / f"original_{image_path.name}"
    shutil.copy2(image_path, original_output)
    LOGGER.info("Original image copied: %s", original_output)

    with Image.open(image_path) as im:
        arr = np.asarray(im.convert("RGB"), np.uint8)
    root_key = jax.random.key(args.seed)

    for i, transform in enumerate(AUG_OPS):
        key = jax.random.fold_in(root_key, i)[None]
        batch = arr[None]
        kernel = BATCH_KERNELS[transform]
        if transform == "rotate":
            out, angles = kernel(key, batch)
            out = np.asarray(jax.device_get(out))[0]
            h0, w0 = arr.shape[0], arr.shape[1]
            ew, eh = pil_expanded_size(float(angles[0]), w0, h0)
            top = max((out.shape[0] - eh) // 2, 0)
            left = max((out.shape[1] - ew) // 2, 0)
            out = out[top:top + eh, left:left + ew]
        else:
            out = np.asarray(jax.device_get(kernel(key, batch)))[0]
        out_path = output_dir / f"{transform}_{image_path.name}"
        Image.fromarray(out).save(out_path, quality=95)
        LOGGER.info("%s applied: %s", transform.capitalize(), out_path)
    LOGGER.info("Single image augmentation completed successfully")


def dataset_mode_dir(args, source_dir: Path) -> None:
    from leaffliction_tpu.data.balancer import DatasetBalancer

    target_dir = Path(args.output) if args.output else Path(DEFAULT_DATASET_OUTPUT)
    LOGGER.info("Processing dataset directory: %s", source_dir)
    LOGGER.info("Target directory: %s", target_dir)
    DatasetBalancer(
        source_dir=source_dir, target_dir=target_dir, seed=args.seed
    ).run()
    LOGGER.info("Dataset augmentation completed successfully")
    try:
        analyze_distribution(target_dir)
    except Exception as exc:
        LOGGER.warning("Distribution analysis failed: %s", exc)


def analyze_distribution(target_dir: Path) -> None:
    from leaffliction_tpu.cli.distribution import (
        count_images,
        merge_csv,
        plot_per_plant,
    )

    if not target_dir.exists():
        LOGGER.warning("Target directory doesn't exist: %s", target_dir)
        return
    LOGGER.info("Analyzing distribution of balanced dataset...")
    rows = count_images(target_dir, None)
    if not rows:
        LOGGER.warning("No images found in target directory")
        return
    out_dir = Path("artifacts") / "distribution"
    merge_csv(rows, out_dir / "balanced_distribution.csv")
    plot_per_plant(rows, out_dir)
    LOGGER.info("Total balanced images: %d", sum(n for _, _, n in rows))


def main(argv=None) -> None:
    setup_logging()
    try:
        from leaffliction_tpu.core.cache import enable_compilation_cache

        # augmentation kernels compile remotely on the relay; cache them
        enable_compilation_cache()
        args = parse_args(argv)
        input_path = Path(args.input_path)
        if not input_path.exists():
            raise InputValidationError(f"Input path not found: {input_path}")
        if (input_path.is_file()
                and input_path.suffix.lower() in SUPPORTED_IMAGE_EXTENSIONS):
            single_image_mode(args, input_path)
            return
        if input_path.is_dir():
            dataset_mode_dir(args, input_path)
            return
        raise InputValidationError(
            "Unsupported input. Provide a dataset directory or an image file.")
    except InputValidationError as exc:
        LOGGER.error("Input validation error: %s", exc)
        sys.exit(1)
    except ProcessingError as exc:
        LOGGER.error("Processing error: %s", exc)
        sys.exit(1)
    except Exception as exc:  # reference catch-all, Augmentation.py:114-116
        LOGGER.error("Unexpected error: %s", exc)
        sys.exit(1)


if __name__ == "__main__":
    main()
