"""In-graph training-time augmentation, fused into the jitted train step.

TPU-native replacement for the Keras augment Sequential
(`srcs/model/cnn.py:75-83`: RandomFlip horizontal, RandomRotation 0.05,
RandomContrast 0.1). Runs batched on device with per-example fold_in keys —
no host RNG, no per-image Python.

Inputs are float32 in [0, 1] NHWC (post-normalization scale of the data
pipeline); contrast math is scale-invariant so [0,1] is fine.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from leaffliction_tpu.ops.resample import rotate_warp

Array = jax.Array


def _augment_one(key: Array, img: Array,
                 rotation_frac: float, contrast_delta: float) -> Array:
    k_flip, k_rot, k_con = jax.random.split(key, 3)
    h, w = img.shape[0], img.shape[1]

    # horizontal flip, p=0.5
    do_flip = jax.random.bernoulli(k_flip)
    img = jnp.where(do_flip, img[:, ::-1, :], img)

    # rotation: U(-frac, frac) * 360 degrees; edge-clamp fill (vs Keras
    # reflect — tolerance-level delta for stochastic augmentation), via the
    # MXU 3-shear path rather than a gather warp
    angle = jax.random.uniform(k_rot, (), jnp.float32,
                               -rotation_frac * 360.0, rotation_frac * 360.0)
    img = rotate_warp(img, angle, (h, w), fill=None)

    # contrast: factor U(1-delta, 1+delta) about per-channel mean
    factor = jax.random.uniform(k_con, (), jnp.float32,
                                1.0 - contrast_delta, 1.0 + contrast_delta)
    mean = jnp.mean(img, axis=(0, 1), keepdims=True)
    img = jnp.clip(mean + (img - mean) * factor, 0.0, 1.0)
    return img


@partial(jax.jit, static_argnames=("rotation_frac", "contrast_delta"))
def train_augment(
    key: Array,
    batch: Array,
    rotation_frac: float = 0.05,
    contrast_delta: float = 0.1,
) -> Array:
    """Apply flip/rotate/contrast to an N×H×W×C float batch, one key per image."""
    keys = jax.random.split(key, batch.shape[0])
    return jax.vmap(
        lambda k, x: _augment_one(k, x, rotation_frac, contrast_delta)
    )(keys, batch)
