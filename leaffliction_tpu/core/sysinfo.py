"""Host/device system introspection.

Provides the `meta.json` "system" block (reference `srcs/utils/system_info.py:49-61`)
plus TPU device info the reference never had. Worker heuristic mirrors
`srcs/utils/system_info.py:37-46` so CLI flag defaults behave identically.
"""

from __future__ import annotations

import os
import platform
from typing import Any, Dict


def get_cpu_count() -> int:
    return os.cpu_count() or 1


def get_optimal_worker_count() -> int:
    """Reference heuristic: ≤2 cores → 1; ≤4 → n-1; else 75% (capped ≥1).

    (Apple-silicon special case from `system_info.py:41-43` is irrelevant on
    the TPU host but the small-count behavior is preserved.)
    """
    n = get_cpu_count()
    if n <= 2:
        return 1
    if n <= 4:
        return n - 1
    return max(1, int(n * 0.75))


def get_device_info() -> Dict[str, Any]:
    """JAX backend/device summary (lazy import: safe pre-jax-init)."""
    try:
        import jax

        devices = jax.devices()
        return {
            "backend": jax.default_backend(),
            "device_count": len(devices),
            "device_kind": devices[0].device_kind if devices else "none",
            "process_count": jax.process_count(),
        }
    except Exception:  # pragma: no cover - only hit when jax is broken
        return {"backend": "unavailable", "device_count": 0}


def get_system_info() -> Dict[str, Any]:
    info: Dict[str, Any] = {
        "platform": platform.platform(),
        "python_version": platform.python_version(),
        "processor": platform.processor() or platform.machine(),
        "cpu_count": get_cpu_count(),
    }
    info.update(get_device_info())
    return info
