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

from leaffliction_tpu.core.logging import get_logger
from leaffliction_tpu.ops.resample import rotate_warp

Array = jax.Array

LOGGER = get_logger(__name__)


def _draw_params(key: Array, rotation_frac: float, contrast_delta: float):
    k_flip, k_rot, k_con = jax.random.split(key, 3)
    do_flip = jax.random.bernoulli(k_flip)
    angle = jax.random.uniform(k_rot, (), jnp.float32,
                               -rotation_frac * 360.0, rotation_frac * 360.0)
    factor = jax.random.uniform(k_con, (), jnp.float32,
                                1.0 - contrast_delta, 1.0 + contrast_delta)
    return do_flip, angle, factor


@partial(jax.jit, static_argnames=("rotation_frac", "contrast_delta"))
def train_augment(
    key: Array,
    batch: Array,
    rotation_frac: float = 0.05,
    contrast_delta: float = 0.1,
) -> Array:
    """Apply flip/rotate/contrast to an N×H×W×C float batch, one key per
    image.

    Rotation is U(-frac, frac)·360° with edge-clamp fill (vs Keras reflect —
    tolerance-level delta for stochastic augmentation). On TPU it runs in
    the barrel-shift Pallas kernel (`rotate_batch_pallas_clamp_f32`); the
    einsum 3-shear costs 5.1 ms per 128×224² batch inside every train step,
    the kernel ~1 ms. Elsewhere the MXU 3-shear matmul path is used.
    """
    keys = jax.random.split(key, batch.shape[0])
    do_flip, angles, factors = jax.vmap(
        lambda k: _draw_params(k, rotation_frac, contrast_delta))(keys)

    flipped = jnp.where(do_flip[:, None, None, None],
                        batch[:, :, ::-1, :], batch)

    if jax.default_backend() == "tpu" and batch.shape[1] % 8 == 0:
        from leaffliction_tpu.ops.pallas.rotate import (
            rotate_batch_pallas_clamp_f32,
        )

        rotated = rotate_batch_pallas_clamp_f32(flipped, angles)
    else:
        h, w = batch.shape[1], batch.shape[2]
        rotated = jax.vmap(
            lambda x, a: rotate_warp(x, a, (h, w), fill=None))(flipped, angles)

    mean = jnp.mean(rotated, axis=(1, 2), keepdims=True)
    return jnp.clip(mean + (rotated - mean) * factors[:, None, None, None],
                    0.0, 1.0)


@partial(jax.jit, static_argnames=("rotation_frac", "contrast_delta",
                                   "out_dtype"))
def train_augment_u8(
    key: Array,
    batch_u8: Array,
    rotation_frac: float = 0.05,
    contrast_delta: float = 0.1,
    out_dtype=jnp.float32,
) -> Array:
    """Uint8-in variant of `train_augment`: N×H×W×C uint8 → `out_dtype`
    in [0, 1].

    On TPU the flip runs on the uint8 batch (where XLA fuses it with the
    batch gather) and dequant+rotate+contrast run in ONE fused Pallas
    program (`train_aug_rotate_contrast_pallas`) — the unfused path's
    separate dequant pass, f32 NCHW transposes, and mean/apply contrast
    passes cost ~2.9 ms per 128×224² batch inside every train step; the
    fused path ~1.3 ms. Identical parameter stream (same key splits) and
    math as `train_augment`, to f32 rounding. Pass
    `out_dtype=jnp.bfloat16` for bf16-compute models: halves the
    augmented batch's HBM write+read, and the model casts to bf16 anyway.
    (The multi-image slab variant `tools/slab_train_aug.py` is NOT used
    here: its larger scoped-VMEM blocks lose double-buffered DMA inside
    the full train-step program and regress the step ~6 ms at G=4-8.)
    """
    if jax.default_backend() == "tpu" and batch_u8.shape[1] % 8 == 0:
        keys = jax.random.split(key, batch_u8.shape[0])
        do_flip, angles, factors = jax.vmap(
            lambda k: _draw_params(k, rotation_frac, contrast_delta))(keys)
        flipped = jnp.where(do_flip[:, None, None, None],
                            batch_u8[:, :, ::-1, :], batch_u8)
        import os

        h, w = batch_u8.shape[1], batch_u8.shape[2]
        # canvas dtype for the shear passes. bf16 canvases would halve the
        # barrel's vreg traffic, but current Mosaic cannot lower
        # `tpu.dynamic_rotate` on non-32-bit data (measured on v5e:
        # "Rotate with non-32-bit data: not implemented"), so f32 is the
        # only dtype that COMPILES on hardware today. This branch only runs
        # on real TPU (`default_backend() == "tpu"` above), so bf16 here
        # would crash the first train step — warn and fall back instead.
        # The experiment stays reachable through the Pallas kernels' direct
        # interpret-mode entry points (`ops/pallas/rotate.py`).
        # NOTE: read at trace time — set before the first train step.
        cv = os.environ.get("LEAF_AUG_CANVAS", "f32")
        if cv == "bf16":
            LOGGER.warning(
                "LEAF_AUG_CANVAS=bf16 cannot compile on TPU hardware "
                "(Mosaic: 'Rotate with non-32-bit data'); using f32. "
                "bf16 canvases remain available via the kernels' "
                "interpret-mode entry points.")
        canvas_dtype = jnp.float32
        c_bytes = jnp.dtype(canvas_dtype).itemsize
        o_bytes = jnp.dtype(out_dtype).itemsize
        # interleaved footprint = 2 scratch canvases + the out block, all
        # [pad8(h), pad128(3w)]; same 8 MB gate as
        # ops.augment._rotate_vmem_bytes (beyond it the per-plane kernel's
        # 3x-slower-growing blocks pipeline better)
        nhwc_scratch = ((2 * c_bytes + o_bytes) * ((h + 7) // 8 * 8)
                        * ((3 * w + 127) // 128 * 128))
        if (os.environ.get("LEAF_PALLAS_TRAIN_AUG", "nhwc") == "nhwc"
                and nhwc_scratch <= 8 * 1024 * 1024):
            # interleaved-channel variant: no NHWC<->NCHW transposes in
            # the step graph (see its docstring); default since the
            # hardware A/B (tools/ab_nhwc.py): resnet18@224 b128 18.31 vs
            # 18.85 ms/step, leafcnn-base b128 49.75 vs 50.08, b32 equal
            from leaffliction_tpu.ops.pallas.rotate import (
                train_aug_rotate_contrast_nhwc_pallas,
            )

            return train_aug_rotate_contrast_nhwc_pallas(
                flipped, angles, factors,
                max_angle_deg=rotation_frac * 360.0,
                out_dtype=out_dtype, canvas_dtype=canvas_dtype)
        from leaffliction_tpu.ops.pallas.rotate import (
            train_aug_rotate_contrast_pallas,
        )

        return train_aug_rotate_contrast_pallas(
            flipped, angles, factors,
            max_angle_deg=rotation_frac * 360.0,
            out_dtype=out_dtype)
    return train_augment(key, batch_u8.astype(jnp.float32) / 255.0,
                         rotation_frac, contrast_delta).astype(out_dtype)
