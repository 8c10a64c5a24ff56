"""Blur filter — disease-saliency map (reference `filters/blur.py:18-79`).

Saliency = 0.4·dilated-Canny + 0.3·normalized-Sobel + 0.6·brown-regions +
0.2·unsharp color diff, min-max normalized, Gaussian smoothed, zeroed outside
the leaf mask, returned as gray→RGB. Fully on-device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from leaffliction_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv
from leaffliction_tpu.ops.filters import (
    canny,
    gaussian_blur,
    normalize_minmax,
    sobel_xy,
)
from leaffliction_tpu.ops.morphology import closing, dilate
from leaffliction_tpu.segment.config import TransformConfig

Array = jax.Array


@partial(jax.jit, static_argnames=("cfg",))
def blur_filter(rgb: Array, leaf_mask: Array, cfg: TransformConfig) -> Array:
    """rgb float [0,255] HWC + bool mask → RGB saliency visualization."""
    rgb = rgb.astype(jnp.float32)
    gray = rgb_to_gray(rgb)
    saliency = jnp.zeros_like(gray)

    edges = canny(gray, 50, 150, l2=True)
    edges_dil = dilate(edges, 3, "ellipse")
    saliency += edges_dil.astype(jnp.float32) * 255.0 * 0.4

    gx, gy = sobel_xy(gray)
    grad_norm = normalize_minmax(jnp.sqrt(gx * gx + gy * gy), 0.0, 255.0)
    saliency += jnp.round(grad_norm) * 0.3

    hsv = rgb_to_hsv(rgb)
    lo, hi = cfg.brown_hue_range
    brown = ((hsv[..., 0] >= lo) & (hsv[..., 0] <= hi)
             & (hsv[..., 1] >= cfg.brown_s_min)
             & (hsv[..., 2] <= cfg.brown_v_max)
             & leaf_mask.astype(jnp.bool_))
    brown_clean = closing(brown, 3, "ellipse")
    brown_dil = dilate(dilate(brown_clean, 3, "ellipse"), 3, "ellipse")
    saliency += brown_dil.astype(jnp.float32) * 255.0 * 0.6

    blurred = gaussian_blur(rgb, 15, 0.0)
    color_diff = jnp.mean(jnp.abs(rgb - blurred), axis=-1)
    saliency += normalize_minmax(color_diff, 0.0, 255.0) * 0.2

    sal_norm = jnp.round(normalize_minmax(saliency, 0.0, 255.0))
    sal_blur = gaussian_blur(sal_norm, 5, cfg.gaussian_sigma)
    result = jnp.where(leaf_mask.astype(jnp.bool_), sal_blur, 0.0)
    result = jnp.clip(jnp.round(result), 0, 255)
    return jnp.stack([result, result, result], axis=-1)
