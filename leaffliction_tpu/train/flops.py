"""FLOP accounting + MFU: how busy is the chip, really.

XLA's compiled-executable cost analysis gives the optimized-HLO FLOP count
for free (`compiled.cost_analysis()["flops"]`), so MFU needs no hand-derived
per-layer arithmetic: MFU = (flops/step) / (step_time · peak_flops). The
reference has no notion of this (Keras on CPU, `srcs/cli/train.py:432-437`);
for a TPU-native framework it is THE single-chip performance yardstick —
img/s can look great while the MXU idles.

Peak numbers are bf16 per chip, from the public TPU specs.
"""

from __future__ import annotations

from typing import Optional

import jax

# bf16 peak FLOP/s per chip by device_kind substring (public spec sheets).
_PEAKS = (
    ("v5 lite", 197e12),    # v5e (device_kind "TPU v5 lite")
    ("v5e", 197e12),
    ("v5p", 459e12),
    ("v5", 459e12),
    ("v6 lite", 918e12),    # Trillium / v6e
    ("v6e", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def device_peak_flops(device: Optional[jax.Device] = None) -> Optional[float]:
    """bf16 peak FLOP/s for the given (default: first) device; None when
    unknown (e.g. the CPU test backend)."""
    device = device or jax.devices()[0]
    if device.platform != "tpu":
        return None
    kind = device.device_kind.lower()
    for tag, peak in _PEAKS:
        if tag in kind:
            return peak
    return None


def compiled_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Optimized-HLO FLOPs of one call of a jitted function (via
    lower→compile→cost_analysis; cache-hit if already compiled)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def mfu(flops_per_step: Optional[float], step_time_s: float,
        device: Optional[jax.Device] = None) -> Optional[float]:
    """Model FLOPs Utilization in [0, 1]; None if peak or flops unknown."""
    peak = device_peak_flops(device)
    if not peak or not flops_per_step or step_time_s <= 0:
        return None
    return flops_per_step / (step_time_s * peak)
