"""Pallas TPU kernel: fused Canny front-end (Gaussian → Sobel → NMS).

The Canny edge detector's convolution chain is the hottest part of the
segmentation candidates (`segment/mask.py` enhanced/inclusive strategies and
the landmarks vein detector). As separate XLA ops each stage round-trips the
[H, W] activation through HBM; at 224² that is ~8 stages × 400 KB of traffic
per image plus per-op overhead. This kernel keeps the whole stencil stack in
VMEM: one program per image computes

    blur = gauss5x5(gray)            (separable, reflect-101 borders)
    gx, gy = sobel3(blur)
    mag = |gx| + |gy|  (or L2)
    nms = mag where it is the directional local max, else 0

and writes only the final NMS magnitude. Thresholding + hysteresis stay in
XLA (they feed the component labeling).

Falls back to the pure-jnp implementation on non-TPU backends (the kernel
also runs under `interpret=True` for CPU tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _gauss_kernel(ksize: int = 5, sigma: float = 1.4) -> np.ndarray:
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


_G5 = _gauss_kernel()


def _edge_kernel(gray_ref, out_ref, *, l2: bool):
    """All neighbor access via circular roll + boundary masking — Mosaic has
    no lowering for reflect/`rev`, and rejects pad/concat with single-line
    pieces, so shifts are the portable VMEM stencil primitive. Border
    semantics are zero-pad (vs cv2's reflect-101): results differ only in a
    ≤4 px margin; callers compare interiors."""
    g = gray_ref[0]  # [H, W] f32 in VMEM
    h, w = g.shape
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    def shift(x, dy, dx):
        """out[i, j] = x[i+dy, j+dx], zero outside."""
        r = x
        if dy:
            r = pltpu.roll(r, (-dy) % h, 0)  # pltpu.roll wants shift >= 0
        if dx:
            r = pltpu.roll(r, (-dx) % w, 1)
        valid = ((rows_i + dy >= 0) & (rows_i + dy < h)
                 & (cols_i + dx >= 0) & (cols_i + dx < w))
        return jnp.where(valid, r, 0.0)

    # --- separable 5x5 Gaussian ---
    tmp = jnp.zeros((h, w), jnp.float32)
    for t in range(5):
        tmp = tmp + _G5[t] * shift(g, t - 2, 0)
    blur = jnp.zeros((h, w), jnp.float32)
    for t in range(5):
        blur = blur + _G5[t] * shift(tmp, 0, t - 2)

    # --- Sobel 3x3 ---
    tl, tc, tr = shift(blur, -1, -1), shift(blur, -1, 0), shift(blur, -1, 1)
    ml, mr = shift(blur, 0, -1), shift(blur, 0, 1)
    bl, bc, br = shift(blur, 1, -1), shift(blur, 1, 0), shift(blur, 1, 1)
    gx = (tr + 2.0 * mr + br) - (tl + 2.0 * ml + bl)
    gy = (bl + 2.0 * bc + br) - (tl + 2.0 * tc + tr)

    if l2:
        mag = jnp.sqrt(gx * gx + gy * gy)
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)

    # --- direction-quantized NMS (float/bool only, no int sector tensor) ---
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    is_s0 = ay <= 0.41421356 * ax              # ~horizontal gradient
    is_s2 = (~is_s0) & (ay > 2.41421356 * ax)  # ~vertical
    diag = (~is_s0) & (~is_s2)
    is_s1 = diag & ((gx * gy) >= 0)

    def ms(dy, dx):
        return shift(mag, dy, dx)

    na = jnp.where(is_s0, ms(0, 1),
                   jnp.where(is_s1, ms(-1, 1),
                             jnp.where(is_s2, ms(1, 0), ms(1, 1))))
    nb = jnp.where(is_s0, ms(0, -1),
                   jnp.where(is_s1, ms(1, -1),
                             jnp.where(is_s2, ms(-1, 0), ms(-1, -1))))
    is_max = (mag >= na) & (mag >= nb)
    out_ref[0] = jnp.where(is_max, mag, 0.0)


@partial(jax.jit, static_argnames=("l2", "interpret"))
def edge_nms_batch(gray: Array, l2: bool = False,
                   interpret: bool = False) -> Array:
    """Batched fused edge front-end: [N, H, W] f32 → NMS magnitude [N, H, W].

    One pallas program per image; the full stencil stack lives in VMEM.
    """
    n, h, w = gray.shape
    return pl.pallas_call(
        partial(_edge_kernel, l2=l2),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w), jnp.float32),
        interpret=interpret,
    )(gray.astype(jnp.float32))


def canny_fused(gray: Array, low: float = 50.0, high: float = 150.0,
                l2: bool = False, interpret: bool = False) -> Array:
    """Full Canny using the pallas front-end + component-based hysteresis.

    Single image [H, W] → bool edges; matches `ops.filters.canny` semantics.
    """
    from leaffliction_tpu.ops.components import label_components

    nms = edge_nms_batch(gray[None], l2=l2, interpret=interpret)[0]
    strong = nms > high
    weak = nms > low
    labels = label_components(weak)
    h, w = labels.shape
    table = jnp.zeros((h * w + 1,), jnp.bool_).at[
        jnp.where(strong, labels, 0).reshape(-1)].max(True)
    table = table.at[0].set(False)
    return weak & table[labels]
