"""Fused balance→train handoff: augmented pixels never leave the device.

The classic balancer (`data/balancer.py`, mirroring the reference's
`srcs/preprocessing/dataset_balancer.py:19-207`) materializes every augmented
image as a JPEG: decode → upload → kernel → **download → encode**. When the
consumer of the balanced dataset is the trainer itself — the reference's own
north-star workflow is balance → split → train — that round-trip is pure
waste: the trainer immediately re-decodes the JPEGs and re-uploads the pixels
to HBM. On a bandwidth-bound host↔device link the downloads alone dominate
the whole pipeline.

This module runs the identical host-side plan (deficit//6 split over the six
transforms, per-task derived seeds, `dataset_components.py:79-109` semantics)
but executes the augmentation kernels straight into the device-resident
training dataset:

    decode originals once (at train img_size)
      → upload uint8 originals ONCE
      → per-transform batched kernels gather sources by index on device
      → augmented batches concatenate onto the dataset in HBM
      → in-memory split (same allocators as `leaffliction-split`)
      → train via the gather step path (`train/steps.train_step_gather`)

Zero pixel downloads, zero JPEG round-trips. Manifest artifacts
(`manifest_augmented.json`, `manifest_split.json`, `split_summary.csv`) are
still written for reference parity; JPEG materialization of the augmented
tree is optional (`materialize=True`) and off the critical path.

Semantic deltas vs the JPEG path (documented, tolerance-level):
- augmentation happens at img_size instead of native size (the reference
  augments native and the trainer resizes; resize⇄warp commute to within
  interpolation error). Measured accuracy-neutral at north-star scale:
  `tools/parity_fused.py` (1530 originals @256², 8 classes, 20 epochs,
  same seed both arms) → best-val-acc fused−classic = +0.0032
  (1.0000 vs 0.9968), fused wall 60.3 s vs classic 372.6 s;
- rotate's expand=True canvas is resized back to img_size on device with a
  continuous expansion size (PIL's per-image ceil/floor canvas is within
  ±1 px of it) — matching what the trainer's decode-resize does to the
  expanded JPEG.
"""

from __future__ import annotations

import concurrent.futures as cf
import random
import time
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from leaffliction_tpu.core.logging import get_logger
from leaffliction_tpu.data.balancer import TRANSFORMATIONS, calculate_plan
from leaffliction_tpu.data.manifest import ManifestItem, save_manifest
from leaffliction_tpu.data.scan import count_by_plant_class, scan_dataset

LOGGER = get_logger(__name__)

DEVICE_BATCH = 64


@dataclass
class FusedTask:
    source_row: int          # row in the original-image device array
    item: ManifestItem       # the augmented item (target-tree path identity)
    transform: str
    task_seed: int


@dataclass
class FusedBalanceResult:
    """Balanced dataset, resident on device.

    `device_images` rows align with `items`/`labels`: originals first (scan
    order), then augmented images in task order.
    """

    items: List[ManifestItem]
    labels: np.ndarray           # [N] int32
    label2idx: Dict[str, int]
    device_images: object        # jax.Array uint8 [N, S, S, 3]
    n_original: int
    n_generated: int
    balance_time_s: float


def build_fused_tasks(
    items: List[ManifestItem],
    plan: Dict[str, Dict[str, int]],
    target_dir: Path,
    seed: int,
) -> List[FusedTask]:
    """Task list with the balancer's RNG semantics
    (`dataset_balancer.py:105-129`): one `random.Random(seed)` stream drawing
    a source per task (`rng.choice` over the class's sorted images) and a
    derived seed per task (`rng.randint`). Names follow the reference
    convention `<stem>_aug_<transform>_<i+1>`."""
    rng = random.Random(seed)
    # Keyed by bare class name with last-plant-wins on duplicates — the
    # reference's `_get_images_by_class` keys a dict by `class_dir.name`
    # (`dataset_balancer.py:82-96`), so a class name appearing under two
    # plants resolves to one source pool there too.
    per_plant_class: Dict[tuple, List[int]] = {}
    item_by_row: Dict[int, ManifestItem] = {}
    for row, it in enumerate(items):
        per_plant_class.setdefault((it.plant, it.cls), []).append(row)
        item_by_row[row] = it
    rows_by_class: Dict[str, List[int]] = {}
    for (_plant, cls), rows in per_plant_class.items():
        rows_by_class[cls] = rows

    tasks: List[FusedTask] = []
    for class_name, transforms in plan.items():
        rows = rows_by_class.get(class_name, [])
        if not rows:
            LOGGER.warning("No images found for class '%s'", class_name)
            continue
        for transform, count in transforms.items():
            for i in range(count):
                src_row = rng.choice(rows)
                src_item = item_by_row[src_row]
                src_path = Path(src_item.src)
                name = (f"{src_path.stem}_aug_{transform}_{i + 1}"
                        f"{src_path.suffix}")
                out_path = (target_dir / src_item.plant / src_item.cls
                            / name)
                tasks.append(FusedTask(
                    source_row=src_row,
                    item=ManifestItem(
                        plant=src_item.plant, cls=src_item.cls,
                        label=src_item.label, split="train",
                        src=out_path.resolve().as_posix(),
                        id=f"{src_item.plant}/{src_item.cls}/{name}",
                        augmented=True,
                    ),
                    transform=transform,
                    task_seed=rng.randint(0, 1_000_000),
                ))
    return tasks


def _augment_on_device(orig_dev, tasks: List[FusedTask], seed: int,
                       img_size: int, device_batch: int = DEVICE_BATCH):
    """Run all augmentation tasks on device → uint8 [n_tasks, S, S, 3].

    Batches are dispatched per (transform, chunk); nothing is fetched.
    Rotate's expanded canvas is resized back to img_size in-graph (lanczos3,
    like the trainer's decode-resize of the expanded JPEG)."""
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.ops.augment import BATCH_KERNELS
    from leaffliction_tpu.ops.resample import scale_translate_warp

    root_key = jax.random.key(seed)
    gather = jax.jit(lambda pool, sel: jnp.take(pool, sel, axis=0))

    def resize_rotated(canvas_u8, angles):
        """Per-image continuous-expansion center crop + resize to S²."""
        ch, cw = canvas_u8.shape[1], canvas_u8.shape[2]
        theta = jnp.deg2rad(jnp.abs(angles))
        c, s = jnp.cos(theta), jnp.sin(theta)
        ew = img_size * c + img_size * s     # continuous PIL expand size
        eh = ew                              # square inputs: same expansion

        def one(img, w, h):
            ax = w / img_size
            ay = h / img_size
            left = (cw - w) / 2.0
            top = (ch - h) / 2.0
            out = scale_translate_warp(
                img, jnp.stack([ax, ay]),
                jnp.stack([left + 0.5 * ax - 0.5, top + 0.5 * ay - 0.5]),
                (img_size, img_size), fill=None, kernel="lanczos3")
            return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

        return jax.vmap(one)(canvas_u8, ew, eh)

    resize_rotated_jit = jax.jit(resize_rotated)

    # group tasks by transform, remembering each task's global position —
    # tasks are CLASS-major (`build_fused_tasks`), so one transform's group
    # (and even one chunk) mixes positions from several classes whenever
    # more than one class is deficient; the emitted rows are mapped back to
    # task order with one device gather at the end
    chunks: List[object] = []              # device chunks, emission order
    emit_pos: List[int] = []               # global task position per row
    by_transform: Dict[str, List[Tuple[int, FusedTask]]] = {}
    for pos, t in enumerate(tasks):
        by_transform.setdefault(t.transform, []).append((pos, t))

    for transform in TRANSFORMATIONS:
        group = by_transform.get(transform, [])
        if not group:
            continue
        kernel = BATCH_KERNELS[transform]
        for start in range(0, len(group), device_batch):
            chunk = group[start:start + device_batch]
            used = len(chunk)
            # pad short chunks to the static device_batch: a partial chunk
            # would otherwise compile a FRESH program per (transform, size)
            # — six extra remote compilations per run on a cold cache
            sel = np.zeros((device_batch,), np.int32)
            seeds = np.zeros((device_batch,), np.uint32)
            sel[:used] = [t.source_row for _, t in chunk]
            seeds[:used] = [t.task_seed for _, t in chunk]
            imgs = gather(orig_dev, sel)
            keys = jax.vmap(
                lambda s: jax.random.fold_in(root_key, s))(seeds)
            if transform == "rotate":
                canvas, angles = kernel(keys, imgs)
                out = resize_rotated_jit(canvas, angles)
            else:
                out = kernel(keys, imgs)
            chunks.append(out[:used] if used < device_batch else out)
            emit_pos.extend(pos for pos, _ in chunk)

    if not chunks:
        return jnp.zeros((0, img_size, img_size, 3), jnp.uint8)
    emitted = jnp.concatenate(chunks, axis=0)
    # inv[p] = emitted row holding task p → out[p] = emitted[inv[p]]
    inv = np.empty((len(tasks),), np.int32)
    inv[np.asarray(emit_pos, np.int32)] = np.arange(len(tasks), dtype=np.int32)
    return gather(emitted, jnp.asarray(inv))


def balance_to_device(
    source_dir: str | Path,
    img_size: int,
    seed: int = 42,
    target_dir: str | Path = "augmented_directory",
    manifest_out_dir: str | Path = "artifacts/datasets",
    decode_workers: int = 8,
    device_batch: int = DEVICE_BATCH,
    materialize: bool = False,
    write_artifacts: bool = True,
) -> FusedBalanceResult:
    """Scan → plan → decode originals once → augment on device → manifest.

    Returns the full balanced dataset as a device-resident uint8 array plus
    aligned items/labels (all split="train"; apply a split afterwards with
    `split_fused_result`). `write_artifacts=False` skips every file write
    (manifest + materialization) — multi-host callers run this function on
    EVERY process (the computation is deterministic, so all processes hold
    identical pixels) but only process 0 touches the shared filesystem."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    source_dir = Path(source_dir)
    target_dir = Path(target_dir)
    if not source_dir.exists():
        raise FileNotFoundError(f"Dataset directory not found: {source_dir}")

    items = scan_dataset(source_dir)
    if not items:
        raise ValueError(f"No images found under {source_dir}")
    counts = count_by_plant_class(items)
    plan = calculate_plan(counts)
    n_gen_planned = sum(sum(t.values()) for t in plan.values())
    LOGGER.info("Fused balancing: %d originals, %d augmentations planned",
                len(items), n_gen_planned)

    # decode all originals once at img_size: one batched C++ call (own
    # thread pool, one GIL release) with threaded per-image PIL fallback —
    # the same shared sequence the training loader and predictor use
    from leaffliction_tpu.data.native import decode_batch_with_fallback

    orig, valid = decode_batch_with_fallback(
        [it.src for it in items], img_size, workers=decode_workers)
    keep = np.nonzero(valid)[0]
    if len(keep) == 0:
        raise ValueError(
            f"No decodable images under {source_dir} "
            f"({len(items)} files all failed to decode)")
    if len(keep) < len(items):
        items = [items[i] for i in keep]
        orig = orig[keep]
    t_decoded = time.perf_counter()

    tasks = build_fused_tasks(items, plan, target_dir, seed)

    orig_dev = jax.device_put(orig)
    # sync the bulk upload so the stage split below is honest (the consumer
    # needs these bytes on device regardless)
    np.asarray(jax.device_get(orig_dev[-1, -1, -1]))
    t_uploaded = time.perf_counter()
    LOGGER.info("Fused balancing stages: decode %.1fs, upload %.0f MB in "
                "%.1fs (%.1f MB/s)", t_decoded - t0, orig.nbytes / 1e6,
                t_uploaded - t_decoded,
                orig.nbytes / 1e6 / max(t_uploaded - t_decoded, 1e-9))
    aug_dev = _augment_on_device(orig_dev, tasks, seed, img_size,
                                 device_batch)
    all_dev = (jnp.concatenate([orig_dev, aug_dev], axis=0)
               if len(tasks) else orig_dev)

    all_items = items + [t.item for t in tasks]
    labels_sorted = sorted({it.label for it in all_items})
    label2idx = {lab: i for i, lab in enumerate(labels_sorted)}
    labels = np.asarray([label2idx[it.label] for it in all_items], np.int32)

    # reference-schema augmented manifest (`dataset_components.py:143-176`)
    manifest_out_dir = Path(manifest_out_dir)
    if write_artifacts:
        manifest_out_dir.mkdir(parents=True, exist_ok=True)
    aug_manifest = {
        "meta": {
            "created_at": None,
            "augmented_at": datetime.now(timezone.utc).isoformat(),
            "original_seed": None,
            "augmentation_seed": seed,
            "workers": 1,
            "src_root": str(target_dir),
            "total_images": len(all_items),
            "original_images": len(items),
            "augmented_images": len(tasks),
            "fused_device_resident": not materialize,
        },
        "items": [it.to_json() for it in all_items],
    }
    import json

    if write_artifacts:
        with (manifest_out_dir / "manifest_augmented.json").open(
                "w", encoding="utf-8") as f:
            json.dump(aug_manifest, f, indent=2, ensure_ascii=False)

    if materialize and write_artifacts:
        _materialize_jpegs(all_dev, items, tasks, source_dir, target_dir)

    # Honest timing: jax dispatch is async (and block_until_ready is
    # unreliable on relay transports) — fetch one pixel of the LAST row so
    # balance_time_s covers the uploads and every kernel, not just their
    # dispatch. Costs one tiny sync the consumer (trainer) would pay anyway.
    np.asarray(jax.device_get(all_dev[-1, -1, -1]))
    dt = time.perf_counter() - t0
    LOGGER.info("Fused balancing complete: %d generated on device in %.1fs "
                "(%.1f img/s, zero pixel downloads)", len(tasks), dt,
                len(tasks) / max(dt, 1e-9))
    return FusedBalanceResult(
        items=all_items, labels=labels, label2idx=label2idx,
        device_images=all_dev, n_original=len(items),
        n_generated=len(tasks), balance_time_s=dt,
    )


def _materialize_jpegs(all_dev, items, tasks, source_dir: Path,
                       target_dir: Path) -> None:
    """Optional artifact step: write the reference's augmented tree
    (copytree originals + JPEG-encode the augmented rows). Off the training
    critical path — only runs when explicitly requested."""
    import shutil

    import jax

    from leaffliction_tpu.utils.image_io import ImageLoader

    if target_dir.exists():
        shutil.rmtree(target_dir)
    shutil.copytree(source_dir, target_dir)
    if not tasks:
        return
    aug_np = np.asarray(jax.device_get(all_dev[len(items):]))

    def _write(i: int) -> None:
        ImageLoader.save_array(aug_np[i], Path(tasks[i].item.src))

    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(_write, range(len(tasks))))
    LOGGER.info("Materialized %d augmented JPEGs to %s", len(tasks),
                target_dir)


def split_fused_result(
    result: FusedBalanceResult,
    val_ratio: float = 0.2,
    split_seed: int = 32,
    manifest_out_dir: str | Path = "artifacts/datasets",
    src_root: str | Path = "augmented_directory",
    write_artifacts: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """In-memory split over the balanced items — same ratio allocator and
    seeded shuffle as `leaffliction-split` (`srcs/cli/split.py:125-166`
    semantics) — writing `manifest_split.json` + `split_summary.csv`
    (skipped with `write_artifacts=False`; see `balance_to_device`).

    Returns (train_rows, val_rows): int32 row indices into
    `result.device_images`/`result.labels`."""
    from leaffliction_tpu.cli.split import write_summary
    from leaffliction_tpu.data.split import (
        allocate_validation_by_ratio,
        apply_split,
        build_split_map,
        group_by_label,
    )

    grouped = group_by_label(result.items)
    alloc = allocate_validation_by_ratio(
        {lab: len(v) for lab, v in grouped.items()}, val_ratio)
    split_map = build_split_map(grouped, alloc, split_seed)
    split_items = apply_split(result.items, split_map)

    manifest_out_dir = Path(manifest_out_dir)
    if write_artifacts:
        manifest_out_dir.mkdir(parents=True, exist_ok=True)
        save_manifest(
            manifest_out_dir / "manifest_split.json",
            {
                "created_at": datetime.now(timezone.utc).isoformat(),
                "seed": split_seed,
                "strategy": "ratio",
                "val_ratio": val_ratio,
                "src_root": str(src_root),
            },
            split_items,
        )
        write_summary(manifest_out_dir / "split_summary.csv", split_items)

    train_rows = np.asarray(
        [i for i, it in enumerate(split_items) if it.split == "train"],
        np.int32)
    val_rows = np.asarray(
        [i for i, it in enumerate(split_items) if it.split == "val"],
        np.int32)
    # keep result.items' split fields in sync for downstream meta
    result.items = split_items
    return train_rows, val_rows
