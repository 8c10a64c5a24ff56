"""Accuracy-parity A/B: fused balance (augment @img_size) vs classic
balance (augment @native resolution, the reference's semantics).

The reference balancer augments NATIVE-resolution images and the trainer
resizes at load time (`/root/reference/srcs/preprocessing/
dataset_balancer.py:137-170`); the fused device path commutes resize⇄warp
(decode+resize to img_size once, then augment on device —
`data/fused_balance.py:29-36`). Resize and affine warps commute to within
interpolation error, but the fused path is the RECOMMENDED north-star
route, so the commutation needs accuracy evidence, not just an
interpolation-theory argument (VERDICT r4 item 6).

Protocol (same shape as tools/parity_b128.py): a class-separable leafish
8-class tree at NATIVE 256² with the north-star's unbalanced counts
profile, then the two REAL pipelines end-to-end via the CLIs with the
same seed and reference-default training config:

    classic:  leaffliction-augment <tree>   (native-res balance → JPEGs)
              leaffliction-split            (same split allocators)
              leaffliction-train --manifest (decode+resize at train time)
    fused:    leaffliction-train --balance-from <tree>
              (decode+resize once → on-device augment → in-memory split)

Both runs write history.json; the A/B compares best/final val accuracy.
Identical seeds make the two plans draw the same transform assignments
(deficit//6 split, same per-task seeds), so the ONLY difference under
test is native-res-augment-then-resize vs resize-then-augment.

Usage (real TPU):  python tools/parity_fused.py [--per-class 220]
                       [--epochs 20] [--img-size 224]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

NATIVE = 256

# north-star unbalanced profile (bench.bench_north_star_e2e), scaled so
# max == --per-class
_PROFILE = (220, 200, 200, 195, 190, 185, 180, 160)


def build_tree(root: Path, per_class_max: int, seed: int) -> int:
    from PIL import Image

    from tools.parity_b128 import _leafish

    rng = np.random.default_rng(seed)
    total = 0
    code = 0
    for plant in ("Apple", "Grape"):
        for cls in ("healthy", "rust", "scab", "rot"):
            n = max(2, round(_PROFILE[code] * per_class_max / _PROFILE[0]))
            d = root / plant / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                Image.fromarray(_leafish(rng, NATIVE, code)).save(
                    d / f"img{i}.jpg", quality=95)
            total += n
            code += 1
    return total


def _train_args(epochs: int, img_size: int, seed: int, out_dir: Path):
    return ["--epochs", str(epochs), "--img-size", str(img_size),
            "--scale", "base", "--seed", str(seed),
            "--out-dir", str(out_dir)]


def run_classic(tree: Path, work: Path, epochs: int, img_size: int,
                seed: int) -> dict:
    """Reference-semantics arm: native-res balance → split → train."""
    from leaffliction_tpu.cli.augment import main as augment_main
    from leaffliction_tpu.cli.split import main as split_main
    from leaffliction_tpu.cli.train import main as train_main

    t0 = time.perf_counter()
    balanced = work / "balanced"
    # same balance root seed as the fused arm (train CLI hands its --seed
    # to fused_balance), so both arms draw the SAME task plans
    augment_main([str(tree), "-out", str(balanced), "-seed", str(seed)])
    split_main(["--src", str(balanced), "--out", str(work / "split"),
                "--val-ratio", "0.2", "--seed", str(seed),
                "--out-manifest", str(work / "split/manifest_split.json")])
    out_dir = work / "models_classic"
    train_main(["--manifest", str(work / "split/manifest_split.json")]
               + _train_args(epochs, img_size, seed, out_dir))
    wall = time.perf_counter() - t0
    hist = json.loads((out_dir / "history.json").read_text())
    return {"arm": "classic", "wall_s": round(wall, 1),
            "best_val_acc": max(hist["val_accuracy"]),
            "final_val_acc": hist["val_accuracy"][-1],
            "best_epoch": int(np.argmax(hist["val_accuracy"])) + 1}


def run_fused(tree: Path, work: Path, epochs: int, img_size: int,
              seed: int) -> dict:
    """Recommended arm: one command, augment @img_size on device."""
    from leaffliction_tpu.cli.train import main as train_main

    t0 = time.perf_counter()
    out_dir = work / "models_fused"
    train_main(["--balance-from", str(tree), "--val-ratio", "0.2"]
               + _train_args(epochs, img_size, seed, out_dir))
    wall = time.perf_counter() - t0
    hist = json.loads((out_dir / "history.json").read_text())
    return {"arm": "fused", "wall_s": round(wall, 1),
            "best_val_acc": max(hist["val_accuracy"]),
            "final_val_acc": hist["val_accuracy"][-1],
            "best_epoch": int(np.argmax(hist["val_accuracy"])) + 1}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--per-class", type=int, default=220,
                    help="largest class size (north-star scale: 220)")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--img-size", type=int, default=224)
    ap.add_argument("--seed", type=int, default=32)
    ap.add_argument("--arms", default="classic,fused")
    args = ap.parse_args()

    tmp = Path(tempfile.mkdtemp(prefix="parity-fused-"))
    cwd = os.getcwd()
    try:
        tree = tmp / "tree"
        n = build_tree(tree, args.per_class, seed=7)
        print(f"tree: {n} originals at {NATIVE}px "
              f"(8 classes, max {args.per_class})", flush=True)
        results = []
        for arm in args.arms.split(","):
            work = tmp / arm
            work.mkdir(parents=True, exist_ok=True)
            os.chdir(work)  # default artifact dirs stay inside the arm
            fn = run_classic if arm == "classic" else run_fused
            r = fn(tree, work, args.epochs, args.img_size, args.seed)
            os.chdir(cwd)
            print(json.dumps(r), flush=True)
            results.append(r)
        if len(results) == 2:
            delta = results[1]["best_val_acc"] - results[0]["best_val_acc"]
            print(f"PARITY_FUSED best-val-acc delta (fused-classic): "
                  f"{delta:+.4f}", flush=True)
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
