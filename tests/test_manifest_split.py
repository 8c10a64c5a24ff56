"""Data-contract tests: scanner, manifest round-trip, split allocators.

Allocator behavior is pinned to the reference semantics
(`srcs/cli/split.py:64-166`).
"""

import json

from leaffliction_tpu.data.manifest import (
    ManifestItem,
    build_label_mapping,
    load_manifest,
    save_manifest,
    select_items,
)
from leaffliction_tpu.data.scan import count_by_label, scan_dataset
from leaffliction_tpu.data.split import (
    allocate_validation_by_ratio,
    allocate_validation_counts,
    apply_split,
    build_split_map,
    group_by_label,
)


def test_scan_dataset(tiny_dataset):
    items = scan_dataset(tiny_dataset)
    assert len(items) == 37
    labels = {it.label for it in items}
    assert labels == {
        "Apple__healthy", "Apple__rust", "Apple__scab",
        "Grape__healthy", "Grape__spot",
    }
    # sorted traversal → deterministic order
    assert items == scan_dataset(tiny_dataset)
    assert items[0].id.startswith("Apple/")


def test_label_mapping_sorted(tiny_dataset):
    items = scan_dataset(tiny_dataset)
    mapping = build_label_mapping(items)
    assert list(mapping.keys()) == sorted(mapping.keys())
    assert sorted(mapping.values()) == list(range(5))


def test_ratio_allocator_round_half_up():
    counts = {"a": 10, "b": 3, "c": 1, "d": 2}
    alloc = allocate_validation_by_ratio(counts, 0.2)
    assert alloc == {"a": 2, "b": 1, "c": 0, "d": 0}
    # cap at n-1
    assert allocate_validation_by_ratio({"x": 2}, 0.9) == {"x": 1}


def test_minimal_even_allocator_round_robin():
    counts = {"a": 5, "b": 3, "c": 10}
    alloc = allocate_validation_counts(counts, 6)
    assert sum(alloc.values()) == 6
    assert alloc == {"a": 2, "b": 2, "c": 2}
    # exhausts small labels first
    alloc = allocate_validation_counts({"a": 2, "b": 100}, 10)
    assert alloc == {"a": 1, "b": 9}
    # capacity shortfall → everything allocatable
    alloc = allocate_validation_counts({"a": 2, "b": 2}, 50)
    assert alloc == {"a": 1, "b": 1}
    # singleton labels excluded entirely
    assert allocate_validation_counts({"a": 1}, 5) == {"a": 0}


def test_split_map_deterministic(tiny_dataset):
    items = scan_dataset(tiny_dataset)
    grouped = group_by_label(items)
    alloc = allocate_validation_by_ratio(count_by_label(items), 0.2)
    m1 = build_split_map(grouped, alloc, seed=32)
    m2 = build_split_map(grouped, alloc, seed=32)
    m3 = build_split_map(grouped, alloc, seed=33)
    assert m1 == m2
    assert m1 != m3
    assert set(m1.values()) == {"train", "val"}
    per_label_val = {
        lab: sum(1 for it in its if m1[it.id] == "val")
        for lab, its in grouped.items()
    }
    assert per_label_val == alloc


def test_manifest_roundtrip_schema(tiny_dataset, tmp_path):
    items = scan_dataset(tiny_dataset)
    grouped = group_by_label(items)
    alloc = allocate_validation_by_ratio(count_by_label(items), 0.2)
    split_map = build_split_map(grouped, alloc, seed=32)
    items = apply_split(items, split_map)
    meta = {
        "created_at": "2026-01-01T00:00:00+00:00",
        "seed": 32,
        "strategy": "minimal-even >= min_val",
        "min_val": 20,
        "src_root": str(tiny_dataset),
    }
    path = tmp_path / "manifest_split.json"
    save_manifest(path, meta, items)

    raw = json.loads(path.read_text())
    assert set(raw) == {"meta", "items"}
    assert set(raw["meta"]) == {"created_at", "seed", "strategy", "min_val", "src_root"}
    assert set(raw["items"][0]) == {"plant", "class", "label", "split", "src", "id"}

    meta2, items2 = load_manifest(path)
    assert meta2 == meta
    assert items2 == items
    assert len(select_items(items2, "val")) == sum(alloc.values())


def test_augmented_flag_in_manifest(tmp_path):
    it = ManifestItem(
        plant="Apple", cls="rust", label="Apple__rust", split="train",
        src="/x/y_aug_rotate_1.jpg", id="Apple/rust/y_aug_rotate_1.jpg",
        augmented=True,
    )
    save_manifest(tmp_path / "m.json", {}, [it])
    raw = json.loads((tmp_path / "m.json").read_text())
    assert raw["items"][0]["augmented"] is True
