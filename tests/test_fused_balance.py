"""Fused balance→train handoff (`data/fused_balance.py`).

The augmented pixels are produced by the device kernels straight into the
training dataset — no JPEG round-trip, no pixel downloads. These tests pin:
the plan arithmetic against the classic balancer, task naming/RNG parity,
split allocator behavior, determinism under a fixed seed, and the one-command
CLI (`leaffliction-train --balance-from`).
"""

import json

import numpy as np
import pytest

from leaffliction_tpu.data.balancer import calculate_plan
from leaffliction_tpu.data.fused_balance import (
    balance_to_device,
    build_fused_tasks,
    split_fused_result,
)
from leaffliction_tpu.data.scan import count_by_plant_class, scan_dataset


@pytest.fixture(scope="module")
def unique_tree(tmp_path_factory):
    """PLANT/CLASS tree with globally-unique class names (so classic-vs-fused
    task naming can be compared exactly, independent of iterdir order)."""
    from PIL import Image

    from conftest import _leafish_image

    root = tmp_path_factory.mktemp("unique")
    rng = np.random.default_rng(3)
    spec = {"Apple": {"apple_healthy": 9, "apple_rust": 4},
            "Grape": {"grape_spot": 6}}
    for plant, classes in spec.items():
        for cls, n in classes.items():
            d = root / plant / cls
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(_leafish_image(rng, 48)).save(
                    d / f"img{i}.jpg", quality=92)
    return root


def test_fused_tasks_match_classic_balancer_naming(unique_tree, tmp_path):
    """Same seed → the fused task list must generate exactly the file names
    (and source picks) the classic JPEG balancer generates."""
    from leaffliction_tpu.data.balancer import DatasetBalancer

    items = scan_dataset(unique_tree)
    plan = calculate_plan(count_by_plant_class(items))
    target = tmp_path / "aug"
    tasks = build_fused_tasks(items, plan, target, seed=42)

    bal = DatasetBalancer(source_dir=unique_tree, target_dir=target,
                          seed=42, manifest_out_dir=tmp_path / "ds")
    bal.run()
    classic = {p.name for p in target.rglob("*_aug_*.jpg")}
    fused = {t.item.id.split("/")[-1] for t in tasks}
    assert fused == classic
    # and per-class counts equalize to the per-plant max
    counts = count_by_plant_class(scan_dataset(target))
    for plant, classes in counts.items():
        assert len(set(classes.values())) == 1, classes


def test_balance_to_device_shapes_and_determinism(unique_tree, tmp_path):
    res1 = balance_to_device(unique_tree, img_size=48, seed=42,
                             target_dir=tmp_path / "aug1",
                             manifest_out_dir=tmp_path / "ds1")
    n_items = len(scan_dataset(unique_tree))
    assert res1.n_original == n_items
    assert res1.n_generated == (9 - 4) + (9 - 9)  # apple_rust deficit only
    assert res1.device_images.shape == (
        n_items + res1.n_generated, 48, 48, 3)
    assert res1.labels.shape == (n_items + res1.n_generated,)
    # augmented labels match their class
    for i in range(res1.n_original, len(res1.items)):
        assert res1.items[i].augmented
        assert res1.labels[i] == res1.label2idx[res1.items[i].label]

    res2 = balance_to_device(unique_tree, img_size=48, seed=42,
                             target_dir=tmp_path / "aug2",
                             manifest_out_dir=tmp_path / "ds2")
    a = np.asarray(res1.device_images)
    b = np.asarray(res2.device_images)
    np.testing.assert_array_equal(a, b)

    res3 = balance_to_device(unique_tree, img_size=48, seed=7,
                             target_dir=tmp_path / "aug3",
                             manifest_out_dir=tmp_path / "ds3")
    assert not np.array_equal(
        a[res1.n_original:], np.asarray(res3.device_images)[res3.n_original:])

    # augmented manifest has the reference schema
    man = json.loads((tmp_path / "ds1" / "manifest_augmented.json")
                     .read_text())
    assert man["meta"]["augmented_images"] == res1.n_generated
    assert man["meta"]["original_images"] == res1.n_original
    aug_items = [i for i in man["items"] if i.get("augmented")]
    assert len(aug_items) == res1.n_generated
    assert all("_aug_" in i["id"] for i in aug_items)


def test_two_deficient_classes_row_alignment(tmp_path):
    """Regression: with MORE THAN ONE deficient class, one transform's
    device chunks mix tasks from several classes (tasks are class-major,
    chunks are transform-major) — every augmented row must still land at
    its own task's position. device_batch=1 is trivially ordered (one
    task per chunk); the default batching must produce identical rows.
    The round-3 bug concatenated chunks sorted by first-task position,
    which interleaved classes and trained on mislabeled pixels."""
    from PIL import Image

    from conftest import _leafish_image

    root = tmp_path / "tree"
    rng = np.random.default_rng(9)
    spec = {"Apple": {"a_heal": 6, "a_rust": 3},
            "Grape": {"g_spot": 5, "g_blight": 2}}
    for plant, classes in spec.items():
        for cls, n in classes.items():
            d = root / plant / cls
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(_leafish_image(rng, 40)).save(
                    d / f"img{i}.jpg", quality=92)

    ref = balance_to_device(root, img_size=32, seed=42,
                            target_dir=tmp_path / "aug1",
                            manifest_out_dir=tmp_path / "ds1",
                            device_batch=1)
    got = balance_to_device(root, img_size=32, seed=42,
                            target_dir=tmp_path / "aug2",
                            manifest_out_dir=tmp_path / "ds2")
    assert ref.n_generated == (6 - 3) + (5 - 2)
    assert [t.label for t in ref.items] == [t.label for t in got.items]
    np.testing.assert_array_equal(np.asarray(ref.device_images),
                                  np.asarray(got.device_images))


def test_split_fused_result_ratio_allocator(unique_tree, tmp_path):
    res = balance_to_device(unique_tree, img_size=48, seed=42,
                            target_dir=tmp_path / "aug",
                            manifest_out_dir=tmp_path / "ds")
    train_rows, val_rows = split_fused_result(
        res, val_ratio=0.2, split_seed=32, manifest_out_dir=tmp_path / "ds")
    n = len(res.items)
    assert len(train_rows) + len(val_rows) == n
    assert set(train_rows) | set(val_rows) == set(range(n))
    # per-label val counts follow the round-half-up ratio allocator
    from collections import Counter

    by_label = Counter(it.label for it in res.items)
    val_by_label = Counter(res.items[i].label for i in val_rows)
    for lab, cnt in by_label.items():
        expected = max(0, min(int(cnt * 0.2 + 0.5), cnt - 1))
        assert val_by_label.get(lab, 0) == expected
    # manifest + summary artifacts written
    man = json.loads((tmp_path / "ds" / "manifest_split.json").read_text())
    assert man["meta"]["strategy"] == "ratio"
    assert (tmp_path / "ds" / "split_summary.csv").exists()


def test_fused_rotate_resizes_to_img_size(unique_tree, tmp_path):
    """Rotate tasks must land back at img_size (expand-canvas → resize, like
    decoding the expanded JPEG at train time) and not be blank."""
    res = balance_to_device(unique_tree, img_size=48, seed=42,
                            target_dir=tmp_path / "aug",
                            manifest_out_dir=tmp_path / "ds")
    imgs = np.asarray(res.device_images)
    rot_rows = [i for i, it in enumerate(res.items)
                if it.augmented and "_aug_rotate_" in it.id]
    assert rot_rows, "plan should include rotate tasks"
    for r in rot_rows:
        tile = imgs[r]
        assert tile.shape == (48, 48, 3)
        assert tile.std() > 1.0  # real content, not fill


def test_materialize_writes_reference_tree(unique_tree, tmp_path):
    res = balance_to_device(unique_tree, img_size=48, seed=42,
                            target_dir=tmp_path / "aug",
                            manifest_out_dir=tmp_path / "ds",
                            materialize=True)
    written = sorted((tmp_path / "aug").rglob("*_aug_*.jpg"))
    assert len(written) == res.n_generated
    # originals copied too (copytree semantics)
    n_orig_files = len(sorted((tmp_path / "aug").rglob("img*.jpg")))
    assert n_orig_files >= res.n_original + res.n_generated - len(written)


@pytest.mark.slow
def test_train_cli_balance_from(unique_tree, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from leaffliction_tpu.cli import train as train_cli

    train_cli.main([
        "--balance-from", str(unique_tree), "--epochs", "2",
        "--img-size", "48", "--batch-size", "8", "--scale", "tiny",
        "--seed", "42", "--out-dir", str(tmp_path / "models"),
    ])
    hist = json.loads((tmp_path / "models" / "history.json").read_text())
    assert len(hist["val_accuracy"]) == 2
    labels = json.loads((tmp_path / "models" / "labels.json").read_text())
    assert len(labels["label2idx"]) == 3
    meta = json.loads((tmp_path / "models" / "meta.json").read_text())
    assert meta["data"]["num_classes"] == 3
    # the fused run wrote the split artifacts for reference parity
    assert (tmp_path / "artifacts" / "datasets"
            / "manifest_split.json").exists()
    assert (tmp_path / "artifacts" / "datasets"
            / "manifest_augmented.json").exists()
