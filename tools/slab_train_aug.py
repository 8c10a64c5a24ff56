"""Measured negative result: the multi-image "slab" train-augmentation kernel.

`train_aug_fused_pallas` groups up to 4 images (12 channel planes) into one
Pallas program, hoping to amortize launch overhead over the per-plane kernel
(`ops/pallas/rotate.train_aug_rotate_contrast_pallas`). Hardware measurement
(v5e, 2026-08) showed the kernel is VPU-compute-bound — a 384-program grid and
a 16-program slab run in the same time standalone — and that INSIDE the full
train-step program its larger scoped-VMEM blocks (13.8 MB double-buffered at
G=8/f32/224²) force single-buffered DMA and regress the step ~6-7 ms at
G=4-8.

No production path uses this variant; it lives in `tools/` as the preserved
experiment (numerics still pinned by `tests/test_pallas_rotate.py`) so the
result is reproducible without inflating the production ops package.
Production train steps use `train_aug_rotate_contrast_pallas` or the
interleaved `train_aug_rotate_contrast_nhwc_pallas`, whose small blocks
pipeline cleanly inside any surrounding program.

Reference op being replaced by all of these kernels: the in-graph Keras
augmentation at `/root/reference/srcs/model/cnn.py:75-83`.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from leaffliction_tpu.ops.pallas.rotate import _LANE, _SUBLANE, _pad_to

Array = jax.Array


def _train_aug_slab_kernel(angle_ref, factor_ref, img_ref, out_ref,
                           a_ref, b_ref, *, hw: Tuple[int, int], planes: int,
                           max_angle_deg: float):
    """Multi-plane fused training augmentation: `planes` = G·3 image-channel
    planes per program, processed by a static in-program loop — ONE pallas
    launch for G whole images (vs one per image-channel in
    `_train_aug_kernel`).

    The kernel is VPU-compute-bound (measured: a 384-program grid and a
    16-program slab run in the same time — launch overhead and DMA are
    hidden by grid pipelining), so the wins here are per-element:

    - the canvas dtype follows `a_ref.dtype`. NOTE: bfloat16 canvases
      are numerically fine (image data in [0, 1] carries ~8 significant
      bits) and pass interpret-mode tests, but the current Mosaic TPU
      compiler REJECTS them — `pltpu.roll` lowers to tpu.rotate, which
      is "not implemented ... with non-32-bit data" (verified on v5e,
      2026-08). Keep f32 canvases on hardware until Mosaic grows 16-bit
      rotate support;
    - boundary tests are plain f32 compares, not the Dekker-split
      sign-exact `_scaled_positions` — for CLAMP semantics a 1-ulp
      misclassification at the content edge picks an adjacent sample
      (invisible for stochastic train augmentation), unlike the white-fill
      kernels where it flips a visible fill pixel.

    Per-plane pass math is otherwise identical to `_train_aug_kernel`
    (barrel shifts with per-ROW/per-COLUMN counts — a barrel shift is
    only valid when the count is constant along the roll axis, so planes
    are processed one at a time on a shared scratch canvas rather than
    stacked into one canvas).
    """
    h, w = hw
    ph, pw = a_ref.shape
    dt = a_ref.dtype
    i = pl.program_id(0)

    max_t = math.tan(math.radians(max_angle_deg) / 2.0)
    max_s = math.sin(math.radians(max_angle_deg))
    row_bound = int(math.ceil(max_t * (h - 1) / 2.0)) + 1
    col_bound = int(math.ceil(max_s * (w - 1) / 2.0)) + 1

    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    rows = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1).astype(jnp.float32)

    def controls(g: Array, coord: Array, upper: float, max_shift: int,
                 dim: int):
        """Barrel/lerp/validity control tensors for one shear pass:
        bias + per-bit select masks (bias trick), lerp fraction, and the
        plain-f32 bounds masks (clamp semantics tolerate 1-ulp boundary
        flips, unlike white fill)."""
        k = jnp.floor(g)
        sh = jnp.clip(k.astype(jnp.int32), -max_shift, max_shift)
        bias = 1 << max(0, max_shift.bit_length())
        sh = sh + bias
        n_bits = (bias + max_shift).bit_length()
        bit_ons = [((sh >> b) & 1) == 1
                   for b in range(n_bits) if (1 << b) < dim]
        pos = coord + g
        return bias, bit_ons, g - k, pos >= 0.0, pos <= upper

    def shear(src: Array, bias: int, bit_ons, frac: Array, axis: int,
              lo_ok: Array, hi_ok: Array, cdim: int) -> Array:
        """One pass over the canvas from precomputed controls (shared by
        all 3 channels of an image; row controls also by passes 1 and 3)."""
        dim = src.shape[axis]
        edge_low = src[0:1, :] if axis == 0 else src[:, 0:1]
        edge_high = (src[cdim - 1:cdim, :] if axis == 0
                     else src[:, cdim - 1:cdim])
        x = pltpu.roll(src, bias, axis)           # out[i] = x[i - bias]
        for b, bit_on in enumerate(bit_ons):
            rolled = pltpu.roll(x, (-(1 << b)) % dim, axis)
            x = jnp.where(bit_on, rolled, x)
        f = frac.astype(x.dtype)
        nxt = pltpu.roll(x, (-1) % dim, axis)
        out = x + f * (nxt - x)
        return jnp.where(lo_ok, jnp.where(hi_ok, out, edge_high), edge_low)

    for g_img in range(planes // 3):
        img_idx = i * (planes // 3) + g_img
        theta = angle_ref[img_idx] * (math.pi / 180.0)
        t = -jnp.tan(theta / 2.0)
        s = jnp.sin(theta)
        factor = factor_ref[img_idx]

        # per-IMAGE controls: passes 1 and 3 are the same row shear, and
        # the three channels share everything
        r_ctl = controls(t * (rows - cy), cols, w - 1.0, row_bound, pw)
        c_ctl = controls(s * (cols - cx), rows, h - 1.0, col_bound, ph)

        for c3 in range(3):
            p = g_img * 3 + c3
            a_ref[:] = jnp.zeros((ph, pw), dt)
            a_ref[0:h, 0:w] = (img_ref[0, p].astype(jnp.int32)
                               .astype(jnp.float32) / 255.0).astype(dt)

            b_ref[:] = shear(a_ref[:], r_ctl[0], r_ctl[1], r_ctl[2], 1,
                             r_ctl[3], r_ctl[4], w)
            a_ref[:] = shear(b_ref[:], c_ctl[0], c_ctl[1], c_ctl[2], 0,
                             c_ctl[3], c_ctl[4], h)
            final = shear(a_ref[:], r_ctl[0], r_ctl[1], r_ctl[2], 1,
                          r_ctl[3], r_ctl[4], w)

            # contrast mean accumulates in f32 even on a bf16 canvas
            mean = (jnp.sum(final[0:h, 0:w].astype(jnp.float32))
                    / float(h * w))
            out_ref[0, p] = (jnp.clip(mean.astype(dt)
                                      + (final - mean.astype(dt))
                                      * factor.astype(dt),
                                      0.0, 1.0)
                             .astype(out_ref.dtype))


@partial(jax.jit, static_argnames=("max_angle_deg", "out_dtype",
                                   "canvas_dtype", "interpret"))
def train_aug_fused_pallas(imgs_u8: Array, angles_deg: Array, factors: Array,
                           max_angle_deg: float = 18.0,
                           out_dtype=jnp.float32,
                           canvas_dtype=jnp.float32,
                           interpret: bool = False) -> Array:
    """Fused rotate+contrast training augmentation, multi-image programs:
    uint8 NHWC [B, h, w, 3] (flip already applied upstream) + per-image
    angles/contrast factors → `out_dtype` NHWC in [0, 1].

    Groups up to 4 images (12 planes) per pallas program — see
    `_train_aug_slab_kernel` and the G-selection comment below. With the
    f32 canvas, math is identical to
    `train_aug_rotate_contrast_pallas` / the einsum
    `ops/train_augment.train_augment` to f32 rounding; golden-tested
    against both. `canvas_dtype=jnp.bfloat16` would run the VPU-bound
    barrel passes at double vector throughput, but the current Mosaic
    compiler rejects non-32-bit `pltpu.roll` on hardware (see
    `_train_aug_slab_kernel` docstring) — interpret-mode only for now.
    `out_dtype=jnp.bfloat16` works on hardware and halves the output HBM
    traffic for steps whose model computes in bf16 anyway.
    """
    n, h, w, c = imgs_u8.shape
    assert c == 3
    # G bounded by the ~16 MB scoped-VMEM limit: at G=8/f32/224² the
    # blocks measure 13.8 MB double-buffered — fine standalone, but
    # inside the full train-step program the shared scoped-VMEM budget
    # forces single-buffered DMA and the step regresses ~6-7 ms (G=4
    # too). No production path uses this variant today — it is kept as
    # the measured negative result (with its numerics pinned by
    # tests/test_pallas_rotate.py) for any future STANDALONE caller;
    # train steps use the per-plane `train_aug_rotate_contrast_pallas`
    # or the interleaved `train_aug_rotate_contrast_nhwc_pallas`, whose
    # small blocks pipeline cleanly inside any surrounding program.
    G = 1
    for cand in (4, 2):
        if n % cand == 0:
            G = cand
            break
    planes = G * 3
    ph = _pad_to(h, _SUBLANE)
    pw = _pad_to(w, _LANE)

    nchw = jnp.transpose(imgs_u8, (0, 3, 1, 2)).reshape(n // G, planes, h, w)
    angles1d = angles_deg.astype(jnp.float32).reshape(n)
    factors1d = factors.astype(jnp.float32).reshape(n)

    out = pl.pallas_call(
        partial(_train_aug_slab_kernel, hw=(h, w), planes=planes,
                max_angle_deg=max_angle_deg),
        grid=(n // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, planes, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, planes, ph, pw), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // G, planes, ph, pw), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((ph, pw), canvas_dtype),
            pltpu.VMEM((ph, pw), canvas_dtype),
        ],
        interpret=interpret,
    )(angles1d, factors1d, nchw)

    out = out.reshape(n, 3, ph, pw)[:, :, :h, :w]
    return jnp.transpose(out, (0, 2, 3, 1))

