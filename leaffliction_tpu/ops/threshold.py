"""Thresholding: Otsu and range gates, vectorized on device.

Replaces `pcv.threshold.otsu` / `cv2.threshold(..., THRESH_OTSU)` call sites
(`srcs/transform/filters/mask.py:59,77-83,395-411`). Otsu is a 256-bin
histogram + argmax of inter-class variance — a few fused reductions on TPU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def histogram_256(img: Array, mask: Optional[Array] = None) -> Array:
    """256-bin histogram of an 8-bit single-channel image (optionally masked).

    Computed as a [P/64, 64] × one-hot contraction in chunks: a plain
    `(flat[:,None]==bins)` einsum materializes a P×256 float intermediate
    under vmap (gigabytes at batch 16), and a scatter-add serializes. The
    chunked matmul keeps the one-hot tile-resident.
    """
    q = jnp.clip(jnp.round(img.astype(jnp.float32)), 0, 255)
    flat = q.reshape(-1)
    weights = (
        mask.reshape(-1).astype(jnp.float32)
        if mask is not None
        else jnp.ones_like(flat, jnp.float32)
    )
    n = flat.shape[0]
    chunk = 2048
    pad = (-n) % chunk
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
        weights = jnp.concatenate([weights, jnp.zeros((pad,), jnp.float32)])
    flat = flat.reshape(-1, chunk)
    weights = weights.reshape(-1, chunk)
    bins = jnp.arange(256, dtype=jnp.float32)

    def body(carry, xs):
        vals, wts = xs
        onehot = (vals[:, None] == bins[None, :]).astype(jnp.float32)
        return carry + wts @ onehot, None

    hist, _ = jax.lax.scan(body, jnp.zeros((256,), jnp.float32),
                           (flat, weights))
    return hist


def otsu_threshold(img: Array, mask: Optional[Array] = None) -> Array:
    """Otsu's threshold value (float scalar), cv2-compatible.

    Maximizes inter-class variance w0*w1*(mu0-mu1)^2 over t ∈ [0,255];
    pixels with value > t are foreground under cv2 THRESH_BINARY.
    """
    hist = histogram_256(img, mask)
    total = jnp.sum(hist)
    bins = jnp.arange(256, dtype=jnp.float32)
    w0 = jnp.cumsum(hist)
    sum0 = jnp.cumsum(hist * bins)
    sum_total = sum0[-1]
    w1 = total - w0
    mu0 = sum0 / jnp.maximum(w0, 1e-9)
    mu1 = (sum_total - sum0) / jnp.maximum(w1, 1e-9)
    between = w0 * w1 * (mu0 - mu1) ** 2
    valid = (w0 > 0) & (w1 > 0)
    between = jnp.where(valid, between, -1.0)
    return jnp.argmax(between).astype(jnp.float32)


def otsu_binarize(img: Array, mask: Optional[Array] = None,
                  invert: bool = False) -> Array:
    """Binary mask (bool) from Otsu; invert=True for THRESH_BINARY_INV."""
    t = otsu_threshold(img, mask)
    fg = img.astype(jnp.float32) > t
    return jnp.logical_not(fg) if invert else fg


def in_range(img: Array, lo, hi) -> Array:
    """cv2.inRange over the last axis: all channels within [lo, hi] (bool)."""
    x = img.astype(jnp.float32)
    lo = jnp.asarray(lo, jnp.float32)
    hi = jnp.asarray(hi, jnp.float32)
    if x.ndim == lo.ndim:  # single channel
        return (x >= lo) & (x <= hi)
    return jnp.all((x >= lo) & (x <= hi), axis=-1)
