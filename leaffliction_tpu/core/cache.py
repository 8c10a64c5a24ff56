"""Persistent XLA compilation cache.

The tunneled TPU environment compiles remotely with high and erratic latency
(0.5 s – 7 min per program observed). Caching compiled executables on local
disk makes every program's second compile ~instant, across processes. All
CLIs and bench call `enable_compilation_cache()` before building programs.
"""

from __future__ import annotations

import os
from pathlib import Path

_DEFAULT_DIR = Path(
    os.environ.get("LEAF_JAX_CACHE_DIR",
                   Path.home() / ".cache" / "leaffliction_tpu" / "jax")
)


def _platform_scope() -> str:
    """Subdirectory per requested platform. Sessions on the relay ('axon')
    also cache XLA:CPU AOT results that were compiled on the RELAY host's
    CPU; loading those from a local CPU-forced run trips 'machine type ...
    doesn't match' warnings and risks SIGILL. Scoping the cache dir by the
    platform the process asked for keeps the two populations apart."""
    import os

    try:
        import jax

        plats = jax.config.jax_platforms
    except Exception:
        plats = None
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    return (plats.split(",")[0].strip() or "default") if plats else "default"


def enable_compilation_cache(cache_dir: Path | None = None) -> None:
    import jax

    path = Path(cache_dir or _DEFAULT_DIR) / _platform_scope()
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # older jax without these flags — cache is best-effort
        pass
