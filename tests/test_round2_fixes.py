"""Regression tests for the round-2 correctness fixes.

Covers the advisor findings: multi-host step-count divergence
(pad_to_steps / global_steps_per_epoch), evaluation pairing by path instead
of positional zip, wrap-around batch padding (BatchNorm bias), and the
native-decoder PIL fallback for non-JPEG inputs.
"""

import numpy as np
import pytest


# ---------------------------------------------------------------- loader ---


def _make_store(tiny_dataset, n_items, img_size=32):
    from leaffliction_tpu.data.loader import ImageStore
    from leaffliction_tpu.data.manifest import build_label_mapping
    from leaffliction_tpu.data.scan import scan_dataset

    items = scan_dataset(tiny_dataset)[:n_items]
    return ImageStore(items, build_label_mapping(items), img_size)


def test_global_steps_per_epoch_uneven_hosts():
    from leaffliction_tpu.data.loader import global_steps_per_epoch

    # The advisor's exact deadlock scenario: 65 items, 2 hosts, bs=32 —
    # per-host ceil-divide gives 2 vs 1 steps; the global formula gives 2
    # for both hosts (largest shard = 33 → ceil(33/32) = 2).
    assert global_steps_per_epoch(65, 32, process_count=2) == 2
    assert global_steps_per_epoch(64, 32, process_count=2) == 1
    assert global_steps_per_epoch(1, 32, process_count=8) == 1
    assert global_steps_per_epoch(100, 10, process_count=1) == 10


def test_pad_to_steps_fixed_step_count(tiny_dataset):
    from leaffliction_tpu.data.loader import BatchIterator

    store = _make_store(tiny_dataset, 5)
    # 5 items, bs=4 → naturally 2 batches; pad_to_steps=4 must yield 4,
    # the extra two all-padding (mask 0, indices -1).
    it = BatchIterator(store, batch_size=4, shuffle=False, pad_to_steps=4)
    assert it.steps_per_epoch() == 4
    batches = list(it.epoch(0))
    assert len(batches) == 4
    assert batches[0].mask.sum() == 4
    assert batches[1].mask.sum() == 1
    for b in batches[2:]:
        assert b.mask.sum() == 0
        assert b.images.shape == (4, 32, 32, 3)


def test_pad_to_steps_truncates_excess(tiny_dataset):
    from leaffliction_tpu.data.loader import BatchIterator

    store = _make_store(tiny_dataset, 8)
    it = BatchIterator(store, batch_size=2, shuffle=False, pad_to_steps=3)
    assert len(list(it.epoch(0))) == 3


def test_final_batch_pads_with_wraparound_not_index0(tiny_dataset):
    from leaffliction_tpu.data.loader import BatchIterator

    store = _make_store(tiny_dataset, 5)
    it = BatchIterator(store, batch_size=8, shuffle=False)
    (batch,) = list(it.epoch(0))
    # 5 real + 3 pad rows; pads must cycle the epoch permutation (0,1,2),
    # not repeat index 0 — duplicates of one image bias BatchNorm stats.
    pad_rows = batch.images[5:]
    expected = store.images[[0, 1, 2]]
    np.testing.assert_array_equal(pad_rows, expected)
    # indices record the true source row of every slot (gather-path contract)
    np.testing.assert_array_equal(batch.indices[5:], [0, 1, 2])
    assert batch.mask[5:].sum() == 0


# ------------------------------------------------------------ evaluation ---


class _FakeLoader:
    labels = ["a", "b"]
    num_classes = 2


class _FakePredictor:
    """predict_batch that silently drops the second path (unreadable)."""

    model_loader = _FakeLoader()

    def __init__(self, drop_index=1):
        self.drop_index = drop_index
        self.calls = 0

    def predict_batch(self, paths):
        self.calls += 1
        results = []
        for i, p in enumerate(paths):
            if i == self.drop_index:
                continue
            lab = "a" if i % 2 == 0 else "b"
            results.append({
                "image_path": p,
                "top_prediction": lab,
                "confidence": 0.9,
                "all_probabilities": {"a": 0.9, "b": 0.1},
            })
        return results


def test_evaluation_pairs_by_path_after_skip(tmp_path):
    from pathlib import Path

    from leaffliction_tpu.predict.evaluation import PredictionEvaluator

    paths = [Path(f"/x/img{i}.jpg") for i in range(4)]
    # predictor predicts label "a" for even i, "b" for odd i, drops i=1.
    truth = ["a", "b", "a", "b"]
    ev = PredictionEvaluator(_FakePredictor(drop_index=1))
    metrics = ev.evaluate_predictions(paths, truth, output_dir=tmp_path)
    # With path pairing: i=0,2,3 all correct → accuracy 1.0. A positional
    # zip would have scored i=2's prediction against i=1's truth (wrong).
    assert metrics["accuracy"] == 1.0

    import json

    detailed = json.loads(
        (tmp_path / "evaluation_results.json").read_text())["detailed_results"]
    assert len(detailed) == 3
    assert all(d["correct"] for d in detailed)


def test_evaluation_reuses_given_predictions(tmp_path):
    from pathlib import Path

    from leaffliction_tpu.predict.evaluation import PredictionEvaluator

    pred = _FakePredictor(drop_index=-1)
    paths = [Path(f"/x/img{i}.jpg") for i in range(3)]
    results = pred.predict_batch(paths)
    assert pred.calls == 1
    ev = PredictionEvaluator(pred)
    metrics = ev.evaluate_predictions(
        paths, ["a", "b", "a"], output_dir=tmp_path, predictions=results)
    assert pred.calls == 1  # no re-prediction
    assert metrics["accuracy"] == 1.0


# ------------------------------------------------------- native fallback ---


def test_native_decode_falls_back_to_pil_for_png(tmp_path):
    from PIL import Image

    from leaffliction_tpu.data.native import decode_resize_native

    png = tmp_path / "img.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(png)
    out = decode_resize_native(str(png), 32)
    assert out.shape == (32, 32, 3) and out.dtype == np.uint8


def test_native_decode_raises_on_garbage(tmp_path):
    from leaffliction_tpu.data.native import decode_resize_native

    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not an image at all")
    with pytest.raises(Exception):
        decode_resize_native(str(bad), 32)
