"""Checkpoint/resume: interrupted training continues from the saved epoch."""

import pytest
import json

from leaffliction_tpu.cli import split as split_cli
from leaffliction_tpu.cli import train as train_cli

pytestmark = pytest.mark.slow  # e2e-scale; inner loop: -m 'not slow'


def test_train_checkpoint_and_resume(tiny_dataset, tmp_path):
    out = tmp_path / "ds"
    models = tmp_path / "models"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out),
                    "--val-ratio", "0.25", "--seed", "32"])
    common = ["--manifest", str(out / "manifest_split.json"),
              "--batch-size", "8", "--img-size", "32", "--scale", "tiny",
              "--fast", "--no-mixed-precision", "--out-dir", str(models)]

    # 2 epochs with per-epoch checkpointing
    train_cli.main(common + ["--epochs", "2", "--checkpoint-every", "1"])
    assert (models / "checkpoints").exists()
    h1 = json.loads((models / "history.json").read_text())
    assert len(h1["loss"]) == 2

    # resume to 4 epochs: history must extend, not restart
    train_cli.main(common + ["--epochs", "4", "--checkpoint-every", "1",
                             "--resume"])
    h2 = json.loads((models / "history.json").read_text())
    assert len(h2["loss"]) == 4
    assert h2["loss"][:2] == h1["loss"]


def test_resume_without_checkpoint_warns_and_trains(tiny_dataset, tmp_path):
    out = tmp_path / "ds"
    models = tmp_path / "m2"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out),
                    "--val-ratio", "0.25", "--seed", "32"])
    train_cli.main(["--manifest", str(out / "manifest_split.json"),
                    "--epochs", "1", "--batch-size", "8", "--img-size", "32",
                    "--scale", "tiny", "--fast", "--no-mixed-precision",
                    "--out-dir", str(models), "--resume"])
    assert (models / "leaf_cnn.msgpack").exists()
