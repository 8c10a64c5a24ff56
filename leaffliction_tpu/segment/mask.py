"""Leaf segmentation — on-device mask pipeline.

TPU-native rebuild of the reference's hottest function, `make_mask`
(`srcs/transform/filters/mask.py:548-582`): build candidate masks from
several colorspace strategies, post-process (fill/close/open/largest
component), score them heuristically, return the best. Everything is one
jitted program per strategy set over static shapes; no host round-trips.

Implemented strategies (reference counterparts):
- `hsv_s_otsu` / `hsv_v_otsu`: Otsu on HSV saturation / value
  (`mask.py:72-98`);
- `green_hue`: green-hue gate 35°..85° ∧ saturation floor (`mask.py:87-98`);
- `lab`: LAB a-channel gate (green side) (`mask.py:101-106`);
- `green_dominance`: g > r ∧ g > b inclusive gate (`mask.py:727-831` core);
- `kmeans`: k=3 seeded k-means in RGB, greenest cluster (`mask.py:109-140`).

Scoring (`mask.py:143-188` semantics): area-ratio closeness to 0.35,
green fraction inside mask, boundary gradient strength, border-touch penalty.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from leaffliction_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv, rgb_to_lab
from leaffliction_tpu.ops.components import largest_component
from leaffliction_tpu.ops.kmeans import kmeans_segment_greenest
from leaffliction_tpu.ops.morphology import closing, fill_holes, opening
from leaffliction_tpu.ops.threshold import otsu_binarize

Array = jax.Array

STRATEGIES = ("hsv_s_otsu", "hsv_v_otsu", "green_hue", "lab",
              "green_dominance", "kmeans")


def _postprocess(mask: Array) -> Array:
    """fill holes → close → open → largest component (`mask.py:53-69`)."""
    m = closing(mask, 5, shape="ellipse")
    m = fill_holes(m)
    m = opening(m, 3, shape="ellipse")
    return largest_component(m)


def _candidates(img: Array) -> Dict[str, Array]:
    hsv = rgb_to_hsv(img)
    lab = rgb_to_lab(img)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    r, g, b = (img[..., i].astype(jnp.float32) for i in range(3))

    green_gate = (h >= 17.5) & (h <= 42.5) & (s >= 30)  # 35°–85° in cv2 H/2
    cands = {
        "hsv_s_otsu": otsu_binarize(s),
        "hsv_v_otsu": otsu_binarize(v, invert=True),
        "green_hue": green_gate,
        "lab": lab[..., 1] <= 120.0,  # a-channel: green side
        "green_dominance": (g > r) & (g >= b) & (v > 30),
        "kmeans": kmeans_segment_greenest(img),
    }
    return cands


def _score(img: Array, mask: Array) -> Array:
    """Heuristic quality score, higher is better (`mask.py:143-188`)."""
    h, w = mask.shape
    m = mask.astype(jnp.float32)
    area_ratio = jnp.mean(m)
    # target leaf coverage ~0.35
    area_score = 1.0 - jnp.abs(area_ratio - 0.35) / 0.35
    area_score = jnp.clip(area_score, 0.0, 1.0)

    # green fraction inside the mask
    hsv = rgb_to_hsv(img)
    green = ((hsv[..., 0] >= 17.5) & (hsv[..., 0] <= 42.5)
             & (hsv[..., 1] >= 30)).astype(jnp.float32)
    green_frac = jnp.sum(green * m) / jnp.maximum(jnp.sum(m), 1.0)

    # boundary gradient: image gradient magnitude along the mask edge
    gray = rgb_to_gray(img)
    gy, gx = jnp.gradient(gray)
    grad = jnp.sqrt(gx * gx + gy * gy)
    edge = m - opening(mask, 3).astype(jnp.float32)
    edge = jnp.abs(edge)
    boundary_grad = jnp.sum(grad * edge) / jnp.maximum(jnp.sum(edge), 1.0)
    boundary_score = jnp.clip(boundary_grad / 30.0, 0.0, 1.0)

    # border-touch penalty
    border = jnp.concatenate([m[0, :], m[-1, :], m[:, 0], m[:, -1]])
    border_touch = jnp.mean(border)
    border_penalty = jnp.clip(border_touch * 2.0, 0.0, 1.0)

    empty_penalty = jnp.where(area_ratio < 0.01, 1.0, 0.0)
    return (0.4 * area_score + 0.3 * green_frac + 0.3 * boundary_score
            - 0.5 * border_penalty - empty_penalty)


@jax.jit
def make_mask_single(img: Array) -> Tuple[Array, Array]:
    """(best mask bool HW, score) for one RGB image [0,255]."""
    cands = _candidates(img)
    processed = [_postprocess(cands[k]) for k in STRATEGIES]
    scores = jnp.stack([_score(img, m) for m in processed])
    best = jnp.argmax(scores)
    stacked = jnp.stack(processed)
    return stacked[best], scores[best]


@jax.jit
def make_mask_batch(imgs: Array) -> Tuple[Array, Array]:
    """Batched best-mask: N×H×W×3 → (N×H×W bool, N scores)."""
    return jax.vmap(make_mask_single)(imgs)


def make_mask(img) -> "jax.Array":
    """Single-image convenience (numpy in → bool numpy out)."""
    import numpy as np

    mask, _ = make_mask_single(jnp.asarray(img))
    return np.asarray(mask)


def apply_mask_white(img: Array, mask: Array) -> Array:
    """Background → white (reference `apply_mask` 'white' mode,
    `srcs/utils/mask_utils.py:10-83`)."""
    m = mask[..., None].astype(jnp.bool_)
    return jnp.where(m, img.astype(jnp.float32), 255.0)
