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


def test_async_step_checkpointer_does_not_block(tmp_path, monkeypatch):
    """`maybe_save` must return before the save commits: the device→host
    fetch and the orbax write run in the background worker. Measured by
    making the fetch artificially slow and timing the call."""
    import time

    import jax.numpy as jnp

    from leaffliction_tpu.train import checkpoint as ck

    slow = 0.6
    real_host_tree = ck._host_tree

    def slow_host_tree(state):
        time.sleep(slow)
        return real_host_tree(state)

    monkeypatch.setattr(ck, "_host_tree", slow_host_tree)
    state = {"w": jnp.arange(8.0), "b": jnp.ones((3,))}
    saver = ck.AsyncStepCheckpointer(tmp_path / "ck", every_steps=1)
    try:
        t0 = time.perf_counter()
        assert saver.maybe_save(3, state, {"epoch": 0, "step_in_epoch": 3,
                                           "history": {}})
        took = time.perf_counter() - t0
        assert took < slow / 2, f"maybe_save blocked for {took:.2f}s"
    finally:
        saver.close()
    assert ck.latest_resume_step(tmp_path / "ck") == 3
    meta = ck.read_step_meta(tmp_path / "ck", 3)
    assert meta == {"epoch": 0, "step_in_epoch": 3, "history": {}}


def test_kill_mid_epoch_resumes_losing_at_most_n_steps(tiny_dataset,
                                                       tmp_path, monkeypatch):
    """Kill training mid-epoch with --checkpoint-every-steps N: the latest
    committed checkpoint is at most ~N steps behind the kill point, and
    --resume continues FROM WITHIN the epoch (skipping the consumed batch
    prefix) to the full run's history length."""
    import json as _json

    from leaffliction_tpu.train import checkpoint as ck

    out = tmp_path / "ds"
    models = tmp_path / "models"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out),
                    "--val-ratio", "0.25", "--seed", "32"])
    common = ["--manifest", str(out / "manifest_split.json"),
              "--batch-size", "8", "--img-size", "32", "--scale", "tiny",
              "--fast", "--no-mixed-precision", "--out-dir", str(models),
              "--epochs", "2", "--checkpoint-every-steps", "2"]

    calls = {"n": 0, "last_global": 0}
    kill_at = 6  # dispatch count: lands inside epoch 1 (4 steps/epoch)
    real_maybe = ck.AsyncStepCheckpointer.maybe_save

    def killing_maybe_save(self, global_step, state, meta):
        calls["n"] += 1
        calls["last_global"] = global_step
        res = real_maybe(self, global_step, state, meta)
        if calls["n"] >= kill_at:
            raise RuntimeError("simulated kill")
        return res

    monkeypatch.setattr(ck.AsyncStepCheckpointer, "maybe_save",
                        killing_maybe_save)
    with pytest.raises(RuntimeError, match="simulated kill"):
        train_cli.main(common)

    latest = ck.latest_resume_step(models / "checkpoints")
    assert latest is not None
    # at most N steps behind the kill (2N if a save was skipped while busy)
    assert calls["last_global"] - latest <= 2 * 2
    meta = ck.read_step_meta(models / "checkpoints", latest)
    assert meta is not None and meta["epoch"] >= 1  # genuinely mid-epoch
    assert 0 < meta["step_in_epoch"]

    monkeypatch.setattr(ck.AsyncStepCheckpointer, "maybe_save", real_maybe)
    train_cli.main(common + ["--resume"])
    h = _json.loads((models / "history.json").read_text())
    assert len(h["loss"]) == 2  # full run's history: epoch 0 + resumed epoch 1
    assert (models / "leaf_cnn.msgpack").exists()
