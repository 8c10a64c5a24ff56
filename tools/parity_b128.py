"""Accuracy-parity A/B: reference-default b32 vs b128 with scaled LR.

The reference trains leafcnn-base at batch 32 (`/root/reference/srcs/cli/
train.py:66-68`). On TPU that batch starves the MXU (9.3-9.4% MFU measured,
docs/performance.md) while b128 runs ~2.6x the images/sec — but a default
change needs accuracy evidence, not just a roofline argument. This tool runs
the ROUND-1 PARITY PROTOCOL (same data, same seed, same REGULARIZED config,
real `fit()` loop with in-step augmentation + EMA + plateau/early-stop) at:

    b32  lr 2e-3            (reference default)
    b128 lr 4e-3            (sqrt scaling)
    b128 lr 8e-3            (linear scaling)

over a class-separable synthetic 8-class tree (2 plants x 4 classes, leafish
blobs whose hue / spot count / background are class-coded — learnable at
224px, like the north-star tree), and prints best/final val accuracy + wall
time per config. Results belong in docs/performance.md and BASELINE.md; the
bench's `north_star_*_b128` keys cite them.

Measured 2026-08-19 (live v5e, --per-class 220 = north-star scale):

    --epochs 20:  b32/2e-3 -> 1.0000 in 280.9 s (the reference default);
                  b128/4e-3 -> 0.2131; b128/8e-3 -> 0.4034 (undertrained:
                  220 optimizer updates vs b32's 880)
    --epochs 86 --configs 128:4e-3,128:8e-3 (update-matched budget):
                  b128/4e-3 -> 1.0000 in 179.2 s, early-stopped at 64
                  (0.64x b32's wall at identical accuracy);
                  b128/8e-3 -> 0.4773 (linear lr scaling diverges)

Conclusion acted on: b32 stays the default; the throughput recipe is
`--batch-size 128 --lr 4e-3` with ~4x the epoch budget + early stop.

Usage (real TPU):  python tools/parity_b128.py [--epochs 20] [--per-class 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

IMG = 224

# class code -> (hue shift, n spots, bg gray). Distinct per class so the
# task is learnable; spots give the augment/crop pipeline real structure.
_CLASS_CODES = {
    0: (0, 0, 235), 1: (25, 3, 235), 2: (-20, 7, 235), 3: (10, 12, 235),
    4: (0, 0, 205), 5: (25, 3, 205), 6: (-20, 7, 205), 7: (10, 12, 205),
}


def _leafish(rng: np.random.Generator, size: int, code: int) -> np.ndarray:
    hue, n_spots, bg = _CLASS_CODES[code]
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy = size / 2 + rng.normal(0, size * 0.05)
    cx = size / 2 + rng.normal(0, size * 0.05)
    ry = size * 0.32 + rng.normal(0, size * 0.03)
    rx = size * 0.38 + rng.normal(0, size * 0.03)
    blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
    img = np.full((size, size, 3), bg, np.float32)
    img[..., 0][blob] = 55 + hue + rng.random() * 25
    img[..., 1][blob] = 150 + rng.random() * 50
    img[..., 2][blob] = 40 - hue * 0.5 + rng.random() * 25
    for _ in range(n_spots):
        sy = cy + rng.normal(0, ry * 0.5)
        sx = cx + rng.normal(0, rx * 0.5)
        r = size * (0.02 + rng.random() * 0.03)
        spot = ((yy - sy) ** 2 + (xx - sx) ** 2) < r * r
        img[spot] = (120 + rng.random() * 40, 70, 40)
    img += rng.normal(0, 5, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def build_tree(root: Path, per_class: int, seed: int) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    code = 0
    for plant in ("Apple", "Grape"):
        for cls in ("healthy", "rust", "scab", "rot"):
            d = root / plant / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(per_class):
                Image.fromarray(_leafish(rng, IMG, code)).save(
                    d / f"img{i}.jpg", quality=95)
            code += 1


def run_config(tree: Path, batch: int, lr: float, epochs: int,
               seed: int) -> dict:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.data.loader import BatchIterator, ImageStore
    from leaffliction_tpu.data.scan import scan_dataset
    from leaffliction_tpu.models.leafcnn import build_leafcnn
    from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
    from leaffliction_tpu.train.config import TrainConfig
    from leaffliction_tpu.train.steps import build_step_fns, create_train_state
    from leaffliction_tpu.train.trainer import fit, put_dataset

    items = scan_dataset(tree)
    labels = sorted({it.label for it in items})
    label2idx = {lab: i for i, lab in enumerate(labels)}
    # identical seeded split across configs: the A/B varies ONLY batch/lr
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(items))
    n_val = max(1, int(0.2 * len(items)))
    val_items = [items[i] for i in order[:n_val]]
    train_items = [items[i] for i in order[n_val:]]

    train_store = ImageStore(train_items, label2idx, IMG)
    val_store = ImageStore(val_items, label2idx, IMG)
    train_iter = BatchIterator(train_store, batch, shuffle=True, seed=seed)
    val_iter = BatchIterator(val_store, batch, shuffle=False)

    cfg = dataclasses.replace(TrainConfig.regularized(), lr=lr)
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    model = build_leafcnn(num_classes=len(labels), scale="base",
                          dtype=jnp.bfloat16)
    total_steps = train_iter.steps_per_epoch() * epochs
    fns = build_step_fns(model, cfg, len(labels), total_steps, mesh)
    state = create_train_state(model, cfg, img_size=IMG, seed=seed)

    t0 = time.perf_counter()
    result = fit(fns, state, train_iter, val_iter, cfg, epochs=epochs,
                 seed=seed, chain_steps=8,
                 device_dataset=jax.default_backend() != "cpu")
    wall = time.perf_counter() - t0
    hist = result.history
    return {
        "batch": batch, "lr": lr, "wall_s": round(wall, 1),
        "best_val_acc": round(max(hist["val_accuracy"]), 4),
        "final_val_acc": round(hist["val_accuracy"][-1], 4),
        "best_variant": result.best_variant,
        "variant_val_acc": round(result.val_accuracy, 4),
        "epochs_ran": result.epochs_ran,
        "img_per_sec": round(result.images_per_sec, 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--per-class", type=int, default=60)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--tree", type=Path, default=Path("/tmp/parity_tree"))
    ap.add_argument("--configs", default="32:2e-3,128:4e-3,128:8e-3",
                    help="comma list of batch:lr")
    args = ap.parse_args()

    from leaffliction_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    if not (args.tree / "Apple" / "healthy").exists():
        print(f"building tree at {args.tree} "
              f"({args.per_class * 8} images @{IMG}px)")
        build_tree(args.tree, args.per_class, args.seed)

    rows = []
    for spec in args.configs.split(","):
        b, lr = spec.split(":")
        print(f"== batch {b} lr {lr} ==", flush=True)
        rows.append(run_config(args.tree, int(b), float(lr), args.epochs,
                               args.seed))
        print(rows[-1], flush=True)

    print("\n| batch | lr | best val acc | final val acc | saved variant "
          "| wall s | img/s |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {r['lr']:g} | {r['best_val_acc']:.4f} "
              f"| {r['final_val_acc']:.4f} | {r['best_variant']} "
              f"({r['variant_val_acc']:.4f}) | {r['wall_s']} "
              f"| {r['img_per_sec']} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
