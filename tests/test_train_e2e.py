"""End-to-end: split → train (CPU, 8-device mesh) → artifacts → predict.

The full milestone-3 slice of SURVEY §7, exercised through the real CLIs.
"""

import json

import numpy as np
import pytest

from leaffliction_tpu.cli import predict as predict_cli
from leaffliction_tpu.cli import split as split_cli
from leaffliction_tpu.cli import train as train_cli

pytestmark = pytest.mark.slow  # e2e-scale; inner loop: -m 'not slow'


@pytest.fixture(scope="module")
def trained(tiny_dataset, tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    out = root / "datasets"
    models = root / "models"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out),
                    "--val-ratio", "0.25", "--seed", "32"])
    train_cli.main([
        "--manifest", str(out / "manifest_split.json"),
        "--epochs", "2", "--batch-size", "8", "--img-size", "32",
        "--scale", "tiny", "--fast", "--no-mixed-precision",
        "--out-dir", str(models),
    ])
    return root, out, models


def test_artifacts_schema(trained):
    _, _, models = trained
    for name in ("leaf_cnn.msgpack", "labels.json", "history.json",
                 "meta.json", "confusion_matrix.json", "confusion_matrix.png"):
        assert (models / name).exists(), name

    labels = json.loads((models / "labels.json").read_text())
    assert set(labels) == {"label2idx"}
    assert len(labels["label2idx"]) == 5

    history = json.loads((models / "history.json").read_text())
    assert set(history) >= {"loss", "accuracy", "val_loss", "val_accuracy"}
    assert len(history["loss"]) == 2

    meta = json.loads((models / "meta.json").read_text())
    for key in ("created_at", "model_file", "saved_variant", "labels",
                "run", "data", "model", "training", "system"):
        assert key in meta, key
    assert meta["data"]["img_size"] == 32
    assert meta["model"]["scale"] == "tiny"

    cm = json.loads((models / "confusion_matrix.json").read_text())
    assert set(cm) == {"matrix", "labels"}
    assert len(cm["matrix"]) == 5
    total = sum(sum(row) for row in cm["matrix"])
    assert total > 0


def test_history_sane(trained):
    """Training neither diverges nor produces invalid metrics (2 epochs on a
    37-image synthetic set is too noisy to assert learning itself)."""
    _, _, models = trained
    history = json.loads((models / "history.json").read_text())
    assert all(np.isfinite(v) for v in history["loss"])
    assert history["loss"][-1] < history["loss"][0] * 3
    assert all(0.0 <= v <= 1.0 for v in history["accuracy"])
    assert all(0.0 <= v <= 1.0 for v in history["val_accuracy"])


def test_predict_single(trained, tiny_dataset, tmp_path, monkeypatch):
    _, _, models = trained
    monkeypatch.setenv("LEAF_NO_VIEWER", "1")
    img = next((tiny_dataset / "Apple" / "healthy").glob("*.JPG"))
    out_dir = tmp_path / "pred"
    predict_cli.main([str(img), "--learnings-dir", str(models),
                      "--output-dir", str(out_dir)])
    montage = out_dir / f"{img.stem}_prediction.png"
    assert montage.exists()


def test_predict_batch_json(trained, tiny_dataset, tmp_path, monkeypatch):
    _, _, models = trained
    monkeypatch.setenv("LEAF_NO_VIEWER", "1")
    json_out = tmp_path / "batch_results.json"
    predict_cli.main([str(tiny_dataset / "Apple" / "rust"), "--batch-mode",
                      "--learnings-dir", str(models),
                      "--output-dir", str(tmp_path),
                      "--json-output", str(json_out)])
    data = json.loads(json_out.read_text())
    assert set(data) == {"batch_results", "summary"}
    assert data["summary"]["total_images"] == 7
    r = data["batch_results"][0]
    assert set(r) == {"image_path", "top_prediction", "confidence",
                      "all_probabilities"}
    assert len(r["all_probabilities"]) == 5
    assert (tmp_path / "batch_dashboard.png").exists()


def test_predict_evaluate_sampling(trained, tiny_dataset, tmp_path,
                                   monkeypatch, capsys):
    root, out, models = trained
    monkeypatch.setenv("LEAF_NO_VIEWER", "1")
    json_out = tmp_path / "batch_results.json"
    # target 0.0 → first sample always passes; exercises the full eval path
    predict_cli.main([str(tiny_dataset), "--batch-mode", "--evaluate",
                      "--manifest", str(out / "manifest_split.json"),
                      "--learnings-dir", str(models),
                      "--output-dir", str(tmp_path),
                      "--json-output", str(json_out),
                      "--sample-size", "10", "--target-acc", "0.0"])
    assert json_out.exists()
    eval_json = tmp_path / "evaluation" / "evaluation_results.json"
    assert eval_json.exists()
    results = json.loads(eval_json.read_text())
    assert set(results) == {"metrics", "evaluation_info", "detailed_results"}
    assert "accuracy" in results["metrics"]
    assert any(k.startswith("f1_") for k in results["metrics"])


def test_predict_evaluate_fails_exit2(trained, tiny_dataset, tmp_path,
                                      monkeypatch):
    root, out, models = trained
    monkeypatch.setenv("LEAF_NO_VIEWER", "1")
    with pytest.raises(SystemExit) as exc:
        predict_cli.main([str(tiny_dataset), "--batch-mode", "--evaluate",
                          "--manifest", str(out / "manifest_split.json"),
                          "--learnings-dir", str(models),
                          "--output-dir", str(tmp_path),
                          "--json-output", str(tmp_path / "nope.json"),
                          "--sample-size", "10", "--target-acc", "1.01",
                          "--max-attempts", "2"])
    assert exc.value.code == 2
    assert not (tmp_path / "nope.json").exists()


def test_keras_artifact_exported_by_default(trained, tiny_dataset, tmp_path,
                                            monkeypatch):
    """With keras importable, the default artifact set includes
    `leaf_cnn.keras` (reference parity, `srcs/train/utils.py:95-97`) and
    meta records it; predict can serve from the .keras file directly."""
    import shutil

    keras = pytest.importorskip("keras")  # noqa: F841
    _, _, models = trained
    kpath = models / "leaf_cnn.keras"
    assert kpath.exists(), "default train run must export leaf_cnn.keras"
    meta = json.loads((models / "meta.json").read_text())
    assert meta["keras_file"].endswith("leaf_cnn.keras")

    # a learnings dir whose model_file IS the .keras loads through predict
    kdir = tmp_path / "keras_learnings"
    kdir.mkdir()
    shutil.copy(kpath, kdir / "leaf_cnn.keras")
    meta2 = dict(meta, model_file="leaf_cnn.keras")
    meta2.setdefault("training", {})["mixed_precision"] = False
    (kdir / "meta.json").write_text(json.dumps(meta2))
    monkeypatch.setenv("LEAF_NO_VIEWER", "1")
    img = next((tiny_dataset / "Apple" / "healthy").glob("*.JPG"))
    out_dir = tmp_path / "pred_keras"
    predict_cli.main([str(img), "--learnings-dir", str(kdir),
                      "--output-dir", str(out_dir)])
    assert (out_dir / f"{img.stem}_prediction.png").exists()
