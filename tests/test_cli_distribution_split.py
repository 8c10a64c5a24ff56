"""End-to-end CLI tests for distribution + split on a synthetic tree."""

import csv
import json

from leaffliction_tpu.cli import distribution as dist_cli
from leaffliction_tpu.cli import split as split_cli


def test_distribution_cli(tiny_dataset, tmp_path, monkeypatch):
    out = tmp_path / "plots"
    dist_cli.main([str(tiny_dataset), "--out-dir", str(out)])
    csv_path = out / "distribution.csv"
    assert csv_path.exists()
    with csv_path.open() as f:
        rows = list(csv.DictReader(f))
    assert rows[0].keys() == {"plant", "class", "count"}
    counts = {(r["plant"], r["class"]): int(r["count"]) for r in rows}
    assert counts[("Apple", "healthy")] == 12
    assert counts[("Grape", "spot")] == 4
    assert (out / "Apple_bar.png").exists()
    assert (out / "Grape_pie.png").exists()

    # merge semantics: re-run over a subset keeps other rows intact
    dist_cli.main([str(tiny_dataset), "--plants", "Apple",
                   "--out-dir", str(out), "--no-plots"])
    with csv_path.open() as f:
        rows2 = list(csv.DictReader(f))
    assert len(rows2) == len(rows)


def test_split_cli(tiny_dataset, tmp_path):
    out = tmp_path / "datasets"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out),
                    "--val-ratio", "0.2", "--seed", "32"])
    manifest = json.loads((out / "manifest_split.json").read_text())
    assert manifest["meta"]["seed"] == 32
    assert len(manifest["items"]) == 37
    splits = {it["split"] for it in manifest["items"]}
    assert splits == {"train", "val"}

    with (out / "split_summary.csv").open() as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["label", "n_train", "n_val", "total"]
    assert rows[-1][0] == "_TOTAL_"
    total = int(rows[-1][3])
    assert total == 37
    # determinism: second run produces identical item assignments
    out2 = tmp_path / "datasets2"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out2),
                    "--val-ratio", "0.2", "--seed", "32"])
    m2 = json.loads((out2 / "manifest_split.json").read_text())
    assert [i["split"] for i in m2["items"]] == \
        [i["split"] for i in manifest["items"]]


def test_predict_input_validation(tmp_path):
    import pytest

    from leaffliction_tpu.cli import predict as predict_cli

    img = tmp_path / "x.jpg"
    img.write_bytes(b"\xff\xd8fake")
    # missing learnings dir
    with pytest.raises(SystemExit) as exc:
        predict_cli.main([str(img), "--learnings-dir", str(tmp_path / "none")])
    assert exc.value.code == 1
    # batch mode on a file
    with pytest.raises(SystemExit):
        predict_cli.main([str(img), "--batch-mode",
                          "--learnings-dir", str(tmp_path / "none")])
    # evaluate without manifest
    (tmp_path / "models").mkdir()
    (tmp_path / "models" / "meta.json").write_text("{}")
    d = tmp_path / "imgs"
    d.mkdir()
    with pytest.raises(SystemExit):
        predict_cli.main([str(d), "--batch-mode", "--evaluate",
                          "--learnings-dir", str(tmp_path / "models")])


def test_train_missing_manifest_logs_and_returns(tmp_path, caplog):
    from leaffliction_tpu.cli import train as train_cli

    train_cli.main(["--manifest", str(tmp_path / "nope.json")])
    # returns without raising (reference behavior: log + return)


def test_train_invalid_mesh_clean_error(tiny_dataset, tmp_path):
    from leaffliction_tpu.cli import split as split_cli
    from leaffliction_tpu.cli import train as train_cli

    out = tmp_path / "ds"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out),
                    "--val-ratio", "0.25", "--seed", "32"])
    # 16 devices requested, 8 virtual available → clean log + return
    train_cli.main(["--manifest", str(out / "manifest_split.json"),
                    "--epochs", "1", "--img-size", "32", "--scale", "tiny",
                    "--mesh-data", "16", "--out-dir", str(tmp_path / "m")])
    assert not (tmp_path / "m" / "meta.json").exists()
