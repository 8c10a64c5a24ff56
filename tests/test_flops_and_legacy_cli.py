"""Direct tests for the MFU accounting helpers (`train/flops.py`) and the
legacy `leaffliction-balance_dataset` entry — both previously covered only
transitively."""

import numpy as np

import jax
import jax.numpy as jnp

from leaffliction_tpu.train.flops import (
    compiled_flops,
    device_peak_flops,
    mfu,
)


def test_compiled_flops_counts_matmul():
    n = 64

    @jax.jit
    def f(a, b):
        return a @ b

    a = jnp.ones((n, n), jnp.float32)
    flops = compiled_flops(f, a, a)
    # XLA counts 2*n^3 for a dense matmul; allow fusion slack
    assert flops is not None
    assert flops >= 2 * n ** 3 * 0.5
    assert flops <= 2 * n ** 3 * 2.0


def test_peak_and_mfu_none_on_cpu():
    # test backend is CPU: no public peak -> MFU unknowable, never a guess
    assert device_peak_flops() is None
    assert mfu(1e12, 0.01) is None
    # and mfu guards its other degenerate inputs
    assert mfu(None, 0.01) is None
    assert mfu(1e12, 0.0) is None


def test_compiled_flops_never_raises():
    def not_jitted(x):
        return x

    assert compiled_flops(not_jitted, 1.0) is None


def test_balance_dataset_legacy_cli(tiny_dataset, tmp_path, monkeypatch):
    from leaffliction_tpu.cli import balance_dataset as cli
    from leaffliction_tpu.data.scan import count_by_plant_class, scan_dataset

    monkeypatch.chdir(tmp_path)
    cli.main(["--source-dir", str(tiny_dataset),
              "--target-dir", str(tmp_path / "aug")])
    counts = count_by_plant_class(scan_dataset(tmp_path / "aug"))
    for plant, by_class in counts.items():
        assert len(set(by_class.values())) == 1, (plant, by_class)


def test_balance_dataset_legacy_cli_missing_source(tmp_path, monkeypatch):
    import pytest

    from leaffliction_tpu.cli import balance_dataset as cli

    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit) as exc:
        cli.main(["--source-dir", str(tmp_path / "nope")])
    assert exc.value.code == 1
