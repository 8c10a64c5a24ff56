"""Metrics golden test vs sklearn (the reference's backend) + viz helpers."""

import numpy as np
import pytest

sklearn_metrics = pytest.importorskip("sklearn.metrics")

from leaffliction_tpu.utils.metrics import (  # noqa: E402
    compute_classification_metrics,
    compute_evaluation_metrics,
)


def test_metrics_match_sklearn():
    rng = np.random.default_rng(0)
    labels = ["a", "b", "c", "d"]
    y_true = rng.integers(0, 4, 200).tolist()
    y_pred = (np.asarray(y_true) + (rng.random(200) < 0.3)
              * rng.integers(1, 4, 200)) % 4
    y_pred = y_pred.tolist()

    ours = compute_classification_metrics(y_true, y_pred, labels)
    assert ours["accuracy"] == pytest.approx(
        sklearn_metrics.accuracy_score(y_true, y_pred))
    for avg in ("macro", "weighted"):
        assert ours[f"{avg}_f1"] == pytest.approx(
            sklearn_metrics.f1_score(y_true, y_pred, average=avg,
                                     zero_division=0))
        assert ours[f"{avg}_precision"] == pytest.approx(
            sklearn_metrics.precision_score(y_true, y_pred, average=avg,
                                            zero_division=0))
        assert ours[f"{avg}_recall"] == pytest.approx(
            sklearn_metrics.recall_score(y_true, y_pred, average=avg,
                                         zero_division=0))
    per_f1 = sklearn_metrics.f1_score(y_true, y_pred, average=None,
                                      zero_division=0)
    for i, lab in enumerate(labels):
        assert ours[f"f1_{lab}"] == pytest.approx(per_f1[i])


def test_binary_metrics_match_sklearn():
    rng = np.random.default_rng(1)
    y_true = rng.integers(0, 2, 100).tolist()
    y_pred = rng.integers(0, 2, 100).tolist()
    ours = compute_classification_metrics(y_true, y_pred, ["neg", "pos"])
    assert ours["binary_f1"] == pytest.approx(
        sklearn_metrics.f1_score(y_true, y_pred, average="binary",
                                 zero_division=0))


def test_compute_evaluation_metrics_writes_json(tmp_path):
    metrics = compute_evaluation_metrics([0, 1, 1], [0, 1, 0], ["x", "y"],
                                         tmp_path)
    assert (tmp_path / "metrics.json").exists()
    assert 0 <= metrics["accuracy"] <= 1


def test_create_confusion_matrix_from_results(tmp_path):
    from leaffliction_tpu.utils.viz import create_confusion_matrix

    results = [
        {"image_path": f"/data/rust/img{i}.jpg", "top_prediction": "rust"}
        for i in range(3)
    ] + [
        {"image_path": "/data/healthy/img9.jpg", "top_prediction": "rust"},
    ]
    out = create_confusion_matrix(results, tmp_path / "cm.png")
    assert out is not None
    assert (tmp_path / "cm.json").exists()
    assert (tmp_path / "cm.png").exists()
