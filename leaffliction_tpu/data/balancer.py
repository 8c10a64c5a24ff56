"""Class-balancing augmentation — host plan, device batch kernels.

Rebuild of `DatasetBalancer` (`srcs/preprocessing/dataset_balancer.py:19-207`)
and its components (`dataset_components.py:12-187`):

- distribution analysis + deficit plan (deficit = per-plant max − count,
  split evenly over the 6 transforms) — identical host logic;
- `copytree` of originals, task list with a random source image per task;
- execution: instead of a process pool running one PIL op per task, tasks are
  grouped by (transform, image shape) and pushed through the batched jitted
  kernels in `ops/augment.py` — decode on host threads, transform on device,
  encode on host;
- augmented-manifest regeneration with the reference schema
  (`dataset_components.py:120-187`).
"""

from __future__ import annotations

import json
import random
import shutil
import time
from collections import defaultdict
from dataclasses import dataclass
from datetime import datetime, timezone
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from leaffliction_tpu.core.logging import get_logger

LOGGER = get_logger(__name__)

TRANSFORMATIONS = ("flip", "rotate", "skew", "shear", "crop", "distortion")
DEVICE_BATCH = 64


@dataclass
class AugTask:
    source_img: Path
    output_path: Path
    transform: str
    task_seed: int


def calculate_plan(counts: Dict[str, Dict[str, int]]) -> Dict[str, Dict[str, int]]:
    """class → {transform: count}; deficit split //6 with remainder to the
    first transforms (`dataset_components.py:79-109`)."""
    deficits: Dict[str, int] = {}
    for _plant, classes in counts.items():
        plant_max = max(classes.values())
        for class_name, count in classes.items():
            deficit = plant_max - count
            if deficit > 0:
                deficits[class_name] = deficit
    plan: Dict[str, Dict[str, int]] = {}
    for class_name, deficit in deficits.items():
        base, remainder = divmod(deficit, 6)
        plan[class_name] = {}
        for i, transform in enumerate(TRANSFORMATIONS):
            n = base + (1 if i < remainder else 0)
            if n > 0:
                plan[class_name][transform] = n
    return plan


class DatasetBalancer:
    def __init__(
        self,
        source_dir: str | Path = "images",
        target_dir: str | Path = "augmented_directory",
        seed: int = 42,
        manifest_out_dir: Optional[Path] = None,
    ) -> None:
        self.source_dir = Path(source_dir)
        self.target_dir = Path(target_dir)
        self.seed = seed
        self.manifest_out_dir = Path(manifest_out_dir or "artifacts/datasets")
        self.counts: Dict[str, Dict[str, int]] = {}
        self.plan: Dict[str, Dict[str, int]] = {}

    # --- analysis / planning ----------------------------------------------

    def analyze_distribution(self) -> Dict[str, Dict[str, int]]:
        from leaffliction_tpu.data.scan import count_by_plant_class, scan_dataset

        if not self.source_dir.exists():
            raise FileNotFoundError(
                f"Dataset directory not found: {self.source_dir}")
        self.counts = count_by_plant_class(scan_dataset(self.source_dir))
        for plant, classes in sorted(self.counts.items()):
            LOGGER.info("%s:", plant)
            for cls, n in sorted(classes.items()):
                LOGGER.info("  %s: %d images", cls, n)
        return self.counts

    def calculate_plan(self) -> Dict[str, Dict[str, int]]:
        self.plan = calculate_plan(self.counts)
        if not self.plan:
            LOGGER.info("Dataset already balanced - no augmentations needed")
        for class_name, transforms in sorted(self.plan.items()):
            LOGGER.info("  Class: %s - %d images needed", class_name,
                        sum(transforms.values()))
        return self.plan

    # --- execution ---------------------------------------------------------

    def _prepare_target_directory(self) -> None:
        LOGGER.info("Preparing target directory: %s", self.target_dir)
        if self.target_dir.exists():
            shutil.rmtree(self.target_dir)
        shutil.copytree(self.source_dir, self.target_dir)

    def _build_tasks(self) -> List[AugTask]:
        rng = random.Random(self.seed)
        images_by_class: Dict[str, List[Path]] = defaultdict(list)
        for plant_dir in self.target_dir.iterdir():
            if not plant_dir.is_dir():
                continue
            for class_dir in plant_dir.iterdir():
                if not class_dir.is_dir():
                    continue
                images = sorted(
                    p for p in class_dir.iterdir()
                    if p.suffix.lower() == ".jpg"
                )
                images_by_class[class_dir.name] = images

        tasks: List[AugTask] = []
        for class_name, transforms in self.plan.items():
            source_images = images_by_class.get(class_name, [])
            if not source_images:
                LOGGER.warning("No images found for class '%s'", class_name)
                continue
            class_dir = source_images[0].parent
            for transform, count in transforms.items():
                for i in range(count):
                    src = rng.choice(source_images)
                    name = f"{src.stem}_aug_{transform}_{i + 1}{src.suffix}"
                    tasks.append(AugTask(
                        source_img=src,
                        output_path=class_dir / name,
                        transform=transform,
                        task_seed=rng.randint(0, 1_000_000),
                    ))
        return tasks

    def _execute_tasks(self, tasks: List[AugTask]) -> tuple[int, int]:
        import jax
        from PIL import Image

        from leaffliction_tpu.ops.augment import (
            BATCH_KERNELS,
            pil_expanded_size,
        )

        # Backend choice: device (upload-once, batched TPU kernels, download
        # + host encode) vs host (PIL process pool with the device kernels'
        # exact parameter stream — `data/host_augment.py`). `auto` probes the
        # d2h link: on narrow relay links the pixel download floors the
        # device path below a host pool (BENCH_r03: 57 vs 269 img/s).
        from leaffliction_tpu.data.host_augment import (
            execute_tasks_host,
            resolve_backend,
        )

        def scan_header_shapes() -> Dict[Path, tuple]:
            # one header open per unique source; only the auto+TPU decision
            # needs these, so resolve_backend invokes this lazily
            shapes: Dict[Path, tuple] = {}
            for p in {t.source_img for t in tasks}:
                try:
                    with Image.open(p) as im:
                        shapes[p] = (im.height, im.width, 3)
                except Exception:
                    pass
            return shapes

        if resolve_backend(tasks, scan_header_shapes) == "host":
            LOGGER.info("Executing %d tasks on the host pool backend",
                        len(tasks))
            return execute_tasks_host(tasks, self.seed)

        # native libjpeg IO when built (skips per-image Python codec overhead)
        try:
            from leaffliction_tpu.data import native as native_jpeg

            use_native = native_jpeg.native_available()
        except Exception:
            use_native = False

        def read_rgb(path: Path) -> np.ndarray:
            if use_native:
                return native_jpeg.decode_full(str(path))
            with Image.open(path) as im:
                return np.asarray(im.convert("RGB"), np.uint8)

        def write_jpeg(path: Path, arr: np.ndarray) -> None:
            if use_native:
                native_jpeg.encode(str(path), arr, 95)
            else:
                Image.fromarray(arr).save(path, quality=95)

        total = len(tasks)
        LOGGER.info("Starting batched augmentation: %d images to generate",
                    total)
        root_key = jax.random.key(self.seed)

        # decode unique sources on a thread pool (JPEG codecs release the GIL)
        import concurrent.futures as cf

        unique_srcs = list({t.source_img for t in tasks})
        decoded: Dict[Path, np.ndarray] = {}

        def _decode(path: Path) -> None:
            try:
                decoded[path] = read_rgb(path)
            except Exception as exc:
                LOGGER.error("Failed to read %s: %s", path, exc)
                decoded[path] = None  # type: ignore[assignment]

        with cf.ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(_decode, unique_srcs))

        # group by (transform, source image shape) for static-shape batching
        groups: Dict[tuple, List[AugTask]] = defaultdict(list)
        completed = failed = 0
        for task in tasks:
            arr = decoded.get(task.source_img)
            if arr is None:
                failed += 1
                continue
            groups[(task.transform, arr.shape)].append(task)

        # Windowed pipeline: keep up to PIPELINE_DEPTH chunks in flight so
        # uploads/compute overlap the (slow, fluctuating) downloads without
        # holding every output batch in HBM at once. JPEG encodes go to a
        # thread pool (libjpeg releases the GIL; serial encode at ~8 ms/img
        # would cap the whole pipeline at ~125 img/s).
        from collections import deque

        PIPELINE_DEPTH = 8
        pending: "deque" = deque()
        writer = cf.ThreadPoolExecutor(max_workers=8)
        write_futures: List[cf.Future] = []
        submitted = 0

        def _write_one(path: Path, arr: np.ndarray) -> bool:
            try:
                write_jpeg(path, arr)
                return True
            except Exception as exc:
                LOGGER.error("Failed: %s (%s)", path, exc)
                return False

        def collect_one() -> None:
            nonlocal submitted
            transform, shape, chunk, out_dev, angles_dev = pending.popleft()
            out = np.asarray(jax.device_get(out_dev))
            angles = (np.asarray(jax.device_get(angles_dev))
                      if angles_dev is not None else None)
            for j, task in enumerate(chunk):
                img_np = out[j]
                if angles is not None:
                    # crop static canvas to the exact PIL-expanded size
                    h0, w0 = shape[0], shape[1]
                    ew, eh = pil_expanded_size(float(angles[j]), w0, h0)
                    ch, cw = img_np.shape[0], img_np.shape[1]
                    top = max((ch - eh) // 2, 0)
                    left = max((cw - ew) // 2, 0)
                    img_np = img_np[top:top + eh, left:left + ew]
                write_futures.append(
                    writer.submit(_write_one, task.output_path, img_np))
                submitted += 1
                if submitted % 500 == 0:
                    LOGGER.info("Progress: %d/%d (%.1f%%) dispatched to encode",
                                submitted, total,
                                100.0 * submitted / max(total, 1))

        # Device-resident source pools: tasks re-pick the same source images
        # many times (random choice per task), so upload each unique source
        # ONCE per shape and gather task batches on device by index —
        # uploads shrink from one image per task to one per unique source.
        import jax.numpy as jnp

        gather = jax.jit(lambda pool_arr, sel: jnp.take(pool_arr, sel, axis=0))

        srcs_by_shape: Dict[tuple, List[Path]] = defaultdict(list)
        for (transform, shape), group in groups.items():
            for t in group:
                srcs_by_shape[shape].append(t.source_img)
        pools: Dict[tuple, tuple] = {}
        for shape, paths in srcs_by_shape.items():
            uniq = sorted(set(paths))
            pool_dev = jax.device_put(
                np.stack([decoded[p] for p in uniq]))
            pools[shape] = (pool_dev, {p: i for i, p in enumerate(uniq)})

        for (transform, shape), group in groups.items():
            kernel = BATCH_KERNELS[transform]
            pool_dev, src_idx = pools[shape]
            for start in range(0, len(group), DEVICE_BATCH):
                chunk = group[start:start + DEVICE_BATCH]
                sel = np.asarray([src_idx[t.source_img] for t in chunk],
                                 np.int32)
                imgs = gather(pool_dev, sel)
                keys = jax.vmap(
                    lambda s: jax.random.fold_in(root_key, s)
                )(np.asarray([t.task_seed for t in chunk], np.uint32))
                if transform == "rotate":
                    out_dev, angles_dev = kernel(keys, imgs)
                else:
                    out_dev = kernel(keys, imgs)
                    angles_dev = None
                pending.append((transform, shape, chunk, out_dev, angles_dev))
                if len(pending) > PIPELINE_DEPTH:
                    collect_one()
        while pending:
            collect_one()
        for fut in write_futures:
            if fut.result():
                completed += 1
            else:
                failed += 1
        writer.shutdown()
        LOGGER.info("Augmentation complete: %d images generated, %d failed",
                    completed, failed)
        return completed, failed

    def _generate_augmented_manifest(self) -> Path:
        """Rescan target → manifest_augmented.json
        (`dataset_components.py:127-187` schema)."""
        from leaffliction_tpu.data.scan import scan_dataset

        items = []
        for it in scan_dataset(self.target_dir):
            items.append({
                "plant": it.plant,
                "class": it.cls,
                "label": it.label,
                "split": "train",
                "src": it.src,
                "id": it.id,
                "augmented": it.augmented,
            })
        manifest = {
            "meta": {
                "created_at": None,
                "augmented_at": datetime.now(timezone.utc).isoformat(),
                "original_seed": None,
                "augmentation_seed": self.seed,
                "workers": 1,
                "src_root": str(self.target_dir),
                "total_images": len(items),
                "original_images": len([i for i in items if not i["augmented"]]),
                "augmented_images": len([i for i in items if i["augmented"]]),
            },
            "items": items,
        }
        self.manifest_out_dir.mkdir(parents=True, exist_ok=True)
        out_path = self.manifest_out_dir / "manifest_augmented.json"
        with out_path.open("w", encoding="utf-8") as f:
            json.dump(manifest, f, indent=2, ensure_ascii=False)
        LOGGER.info("Augmented manifest saved: %s", out_path)
        LOGGER.info("  Total images: %d", manifest["meta"]["total_images"])
        LOGGER.info("  Original: %d", manifest["meta"]["original_images"])
        LOGGER.info("  Augmented: %d", manifest["meta"]["augmented_images"])
        return out_path

    def run(self) -> None:
        LOGGER.info("=== Dataset Balancing System ===")
        t0 = time.perf_counter()
        self.analyze_distribution()
        self.calculate_plan()
        if self.plan:
            self._prepare_target_directory()
            tasks = self._build_tasks()
            n_done, _ = self._execute_tasks(tasks)
            self._generate_augmented_manifest()
            dt = time.perf_counter() - t0
            LOGGER.info("=== Balancing Complete (%d images in %.1fs, "
                        "%.1f img/s) ===", n_done, dt, n_done / max(dt, 1e-9))
        else:
            LOGGER.info("=== Balancing Complete ===")
