"""Photometric ops: noise, contrast, brightness, autocontrast.

On-device equivalents of the reference's PIL photometric calls
(`srcs/preprocessing/image_augmenter.py:116-133` gaussian noise +
autocontrast; Keras RandomContrast at `srcs/model/cnn.py:81`;
brightness/contrast jitter at `srcs/cli/Transformation.py:984-1005`).
Inputs/outputs are float32 in [0, 255] unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def add_gaussian_noise(key: Array, img: Array, sigma: float = 5.0) -> Array:
    """Additive N(0, sigma) noise, clipped to [0,255] (`image_augmenter.py:121-124`)."""
    noise = sigma * jax.random.normal(key, img.shape, jnp.float32)
    return jnp.clip(img.astype(jnp.float32) + noise, 0.0, 255.0)


def adjust_contrast(img: Array, factor: Array | float) -> Array:
    """Scale contrast about the per-channel mean (Keras RandomContrast math)."""
    mean = jnp.mean(img, axis=(-3, -2), keepdims=True)
    return jnp.clip(mean + (img - mean) * factor, 0.0, 255.0)


def adjust_brightness(img: Array, delta: Array | float) -> Array:
    return jnp.clip(img + delta, 0.0, 255.0)


def autocontrast(img: Array, cutoff_percent: Array | float = 0.0) -> Array:
    """Per-channel linear stretch to full range, ignoring `cutoff_percent`%
    of darkest/brightest pixels (PIL `ImageOps.autocontrast` semantics used
    at `image_augmenter.py:126-129`).

    Histogram-based like PIL, fully vectorized: a 256-bin histogram per
    channel, cumulative sums locate the cutoff quantiles.
    """
    x = img.astype(jnp.float32)
    flat = x.reshape(-1, x.shape[-1])  # [P, C]
    n, c = flat.shape
    # hist[b, ch]: compare-and-matmul instead of scatter-add — XLA fuses the
    # on-the-fly one-hot into MXU tiles (~17x faster than scatter on TPU)
    q = jnp.clip(jnp.round(flat), 0, 255)
    bins = jnp.arange(256, dtype=jnp.float32)
    onehot = (q[:, :, None] == bins[None, None, :]).astype(jnp.float32)
    hist = jnp.einsum("pcb,p->bc", onehot, jnp.ones((n,), jnp.float32),
                      preferred_element_type=jnp.float32)
    cdf = jnp.cumsum(hist, axis=0)
    cut = jnp.asarray(cutoff_percent, jnp.float32) * n / 100.0
    # lo: first bin with cdf > cut ; hi: last bin with (n - cdf_prev) > cut
    lo_mask = cdf > cut
    lo = jnp.argmax(lo_mask, axis=0).astype(jnp.float32)
    cdf_rev = jnp.cumsum(hist[::-1], axis=0)
    hi_rev = jnp.argmax(cdf_rev > cut, axis=0).astype(jnp.float32)
    hi = 255.0 - hi_rev
    scale = jnp.where(hi > lo, 255.0 / jnp.maximum(hi - lo, 1e-6), 1.0)
    offset = jnp.where(hi > lo, -lo * scale, 0.0)
    out = x * scale[None, None, :] + offset[None, None, :]
    # degenerate channels (hi <= lo) stay untouched, like PIL
    out = jnp.where((hi > lo)[None, None, :], out, x)
    return jnp.clip(out, 0.0, 255.0)
