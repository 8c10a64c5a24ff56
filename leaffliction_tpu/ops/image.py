"""Basic batched image ops: dtype conversion, resize, normalization.

Replaces the reference's per-image PIL resize + /255 in the data path
(`srcs/dataio/sequence.py:74-96`, `srcs/utils/image_utils.py:104-130`) with
on-device batch ops.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def to_float(img: Array) -> Array:
    """uint8 [0,255] → float32 [0,1] (no-op for float inputs already scaled)."""
    if img.dtype == jnp.uint8:
        return img.astype(jnp.float32) / 255.0
    return img.astype(jnp.float32)


@partial(jax.jit, static_argnames=("size", "antialias"))
def resize_bilinear(batch: Array, size: Tuple[int, int], antialias: bool = True) -> Array:
    """Resize NHWC batch to (h, w). Uses XLA's fused resize; `antialias=True`
    approximates the reference's LANCZOS downsampling (tolerance-tested)."""
    n, _, _, c = batch.shape
    return jax.image.resize(
        to_float(batch), (n, size[0], size[1], c), method="bilinear",
        antialias=antialias,
    )


def normalize_to_unit(batch: Array) -> Array:
    return to_float(batch)


@jax.jit
def standardize(batch: Array, mean: Array, var: Array) -> Array:
    """Adaptive normalization: (x - mean) / sqrt(var + eps), per-channel.

    Mirrors Keras `Normalization` semantics (`srcs/model/cnn.py:84-86`)."""
    return (to_float(batch) - mean) * jax.lax.rsqrt(var + 1e-7)


def compute_norm_stats(batch: Array) -> Tuple[Array, Array]:
    """Per-channel mean/var over an N×H×W×C sample batch (float [0,1])."""
    x = to_float(batch)
    mean = jnp.mean(x, axis=(0, 1, 2))
    var = jnp.var(x, axis=(0, 1, 2))
    return mean, var
