"""Brown/disease-spot filter (reference `filters/brown.py:21-89`).

HSV (or LAB) brown gate within the leaf mask → open/close morphology →
connected components ≥ min-area → orange overlay + % of leaf + spot count.
Detection runs on device; the scalar stats come back for logging.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from leaffliction_tpu.ops.colorspace import rgb_to_hsv, rgb_to_lab
from leaffliction_tpu.ops.components import (
    _sizes_2d,
    _spread_keep,
    label_components,
)
from leaffliction_tpu.ops.morphology import closing, opening
from leaffliction_tpu.segment.config import TransformConfig

Array = jax.Array


@partial(jax.jit, static_argnames=("cfg",))
def brown_regions(rgb: Array, leaf_mask: Array,
                  cfg: TransformConfig) -> Tuple[Array, Array, Array]:
    """→ (filtered bool HW, percentage of leaf, component count)."""
    rgb = rgb.astype(jnp.float32)
    leaf = leaf_mask.astype(jnp.bool_)
    if cfg.use_lab_brown:
        lab = rgb_to_lab(rgb)
        raw = (lab[..., 1] >= cfg.lab_a_min) & (lab[..., 2] >= cfg.lab_b_min) & leaf
    else:
        hsv = rgb_to_hsv(rgb)
        lo, hi = cfg.brown_hue_range
        raw = ((hsv[..., 0] >= lo) & (hsv[..., 0] <= hi)
               & (hsv[..., 1] >= cfg.brown_s_min)
               & (hsv[..., 2] <= cfg.brown_v_max) & leaf)

    k = cfg.brown_morph_kernel
    clean = opening(raw, k, "ellipse")
    clean = closing(clean, k, "ellipse")

    labels = label_components(clean)
    sizes = _sizes_2d(labels)  # scatter/gather-free (see ops/components.py)
    keep = sizes >= cfg.brown_min_area_px
    h, w = labels.shape
    filtered = _spread_keep(keep, clean, h, w) & (labels > 0)

    count = jnp.sum(keep)
    total_area = jnp.sum(filtered)
    leaf_area = jnp.maximum(jnp.sum(leaf), 1)
    percentage = total_area.astype(jnp.float32) / leaf_area * 100.0
    return filtered, percentage, count


def brown_filter(rgb, leaf_mask, cfg: TransformConfig, regions=None):
    """Host-facing: → (overlay RGB uint8, percentage float, count int).

    `regions`: optional pre-dispatched `brown_regions` device tuple
    (folder mode overlaps the round-trips)."""
    import numpy as np

    if regions is None:
        regions = brown_regions(jnp.asarray(rgb), jnp.asarray(leaf_mask), cfg)
    filtered, pct, count = regions
    vis = np.asarray(rgb, np.uint8).copy()
    vis[np.asarray(filtered)] = [255, 100, 0]
    return vis, float(pct), int(count)
