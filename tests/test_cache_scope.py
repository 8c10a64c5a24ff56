"""Persistent compile-cache scoping: cache dirs are partitioned per
requested platform so relay-compiled XLA:CPU AOT entries (built on the
relay host's CPU) are never loaded by local CPU-forced runs (mismatched
machine features risk SIGILL; see core/cache._platform_scope)."""

from pathlib import Path

import jax

from leaffliction_tpu.core.cache import _platform_scope, enable_compilation_cache


def test_platform_scope_reflects_forced_cpu():
    # conftest forces the CPU backend via jax.config.update
    assert _platform_scope() == "cpu"


def test_enable_cache_creates_scoped_dir(tmp_path):
    try:
        enable_compilation_cache(tmp_path)
        assert (tmp_path / "cpu").is_dir()
        assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cpu")
    finally:
        # restore the suite's isolated default (LEAF_JAX_CACHE_DIR)
        enable_compilation_cache()
