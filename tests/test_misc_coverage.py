"""Coverage for remaining helpers: evaluate_from_manifest, dashboards,
PRNG discipline, resample edge-clamp path, loader process sharding."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_prng_streams_stable():
    from leaffliction_tpu.core.prng import (
        epoch_keys,
        key_stream,
        root_key,
        task_key,
        uniform_scalar,
    )

    k = root_key(7)
    assert np.array_equal(jax.random.key_data(task_key(k, 1, 2)),
                          jax.random.key_data(task_key(k, 1, 2)))
    assert not np.array_equal(jax.random.key_data(task_key(k, 1, 2)),
                              jax.random.key_data(task_key(k, 2, 1)))
    ek = epoch_keys(k, epoch=3, n=5)
    assert ek.shape[0] == 5
    stream = key_stream(k)
    a, b = next(stream), next(stream)
    assert not np.array_equal(jax.random.key_data(a), jax.random.key_data(b))
    v = float(uniform_scalar(k, 2.0, 3.0))
    assert 2.0 <= v < 3.0


def test_resample_edge_clamp_path():
    from leaffliction_tpu.ops.resample import row_resample

    img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
    src = jnp.asarray(np.full((4, 4), -5.0, np.float32))  # far out of range
    out = np.asarray(row_resample(img, src, fill=None))   # clamp to column 0
    assert np.allclose(out, np.asarray(img)[:, :1])
    out_f = np.asarray(row_resample(img, src, fill=99.0))
    assert np.all(out_f == 99.0)


@pytest.mark.slow
def test_evaluate_from_manifest(tmp_path, tiny_dataset):
    from leaffliction_tpu.cli import split as split_cli
    from leaffliction_tpu.cli import train as train_cli
    from leaffliction_tpu.predict.evaluation import evaluate_from_manifest
    from leaffliction_tpu.predict.predictor import Predictor

    out = tmp_path / "ds"
    models = tmp_path / "m"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out),
                    "--val-ratio", "0.25", "--seed", "32"])
    train_cli.main(["--manifest", str(out / "manifest_split.json"),
                    "--epochs", "1", "--batch-size", "8", "--img-size", "32",
                    "--scale", "tiny", "--fast", "--no-mixed-precision",
                    "--out-dir", str(models)])
    predictor = Predictor(models).load()
    metrics = evaluate_from_manifest(
        predictor, out / "manifest_split.json", split="val",
        output_dir=tmp_path / "eval")
    assert "accuracy" in metrics
    results = json.loads(
        (tmp_path / "eval" / "evaluation_results.json").read_text())
    assert results["evaluation_info"]["valid_predictions"] > 0
    # unknown split → empty metrics
    assert evaluate_from_manifest(predictor, out / "manifest_split.json",
                                  split="nope") == {}


def test_batch_dashboard_without_eval(tmp_path):
    from leaffliction_tpu.utils.viz import create_batch_dashboard

    results = [
        {"image_path": f"/d/c{i % 2}/img{i}.jpg",
         "top_prediction": f"class{i % 2}",
         "confidence": 0.5 + 0.04 * i,
         "all_probabilities": {"class0": 0.5, "class1": 0.5}}
        for i in range(8)
    ]
    out = create_batch_dashboard(results, tmp_path / "dash.png", None)
    assert out is not None and out.exists()
    assert create_batch_dashboard([], tmp_path / "empty.png", None) is None


def test_items_for_process_sharding(tiny_dataset):
    from leaffliction_tpu.data.loader import items_for_process
    from leaffliction_tpu.data.scan import scan_dataset

    items = scan_dataset(tiny_dataset)
    shards = [items_for_process(items, i, 4) for i in range(4)]
    assert sum(len(s) for s in shards) == len(items)
    ids = [it.id for s in shards for it in s]
    assert len(set(ids)) == len(items)  # disjoint cover
    assert items_for_process(items, 0, 1) == list(items)
