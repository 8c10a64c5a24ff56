"""Binary morphology via reduce_window min/max pooling — fully fused on TPU.

Replaces cv2 erode/dilate/open/close call sites
(`srcs/transform/filters/mask.py:53-69`, `srcs/utils/mask_utils.py:118-181`).
Masks are bool (or {0,1}) HW arrays; structuring elements are square
(`ksize`×`ksize`, cv2 MORPH_RECT) or the cv2 MORPH_ELLIPSE equivalent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _ellipse_kernel(ksize: int) -> np.ndarray:
    """cv2.getStructuringElement(MORPH_ELLIPSE, (k,k)) — exact row-wise
    rasterization from OpenCV's getStructuringElement."""
    r = c = ksize // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    kern = np.zeros((ksize, ksize), bool)
    for i in range(ksize):
        dy = i - r
        if abs(dy) > r:
            continue
        dx = int(round(c * np.sqrt((r * r - dy * dy) * inv_r2)))
        j1 = max(c - dx, 0)
        j2 = min(c + dx + 1, ksize)
        kern[i, j1:j2] = True
    return kern


def _window_reduce(mask: Array, ksize: int, op: str, shape: str) -> Array:
    x = mask.astype(jnp.bool_)
    pad = ksize // 2
    if shape == "rect":
        if op == "max":
            return jax.lax.reduce_window(
                x, False, jax.lax.bitwise_or, (ksize, ksize), (1, 1),
                [(pad, ksize - 1 - pad)] * 2,
            )
        return jax.lax.reduce_window(
            x, True, jax.lax.bitwise_and, (ksize, ksize), (1, 1),
            [(pad, ksize - 1 - pad)] * 2,
        )
    # ellipse: row decomposition — the kernel is a stack of horizontal runs,
    # so dilation = OR over dy of (row-dilate by run-width, shifted by dy).
    # k reduce_windows instead of k² shift-combines (matters for k=9..39).
    kern = _ellipse_kernel(ksize)
    h, w = x.shape[-2], x.shape[-1]
    if op == "max":
        padded = jnp.pad(x, ((pad, ksize - 1 - pad), (0, 0)),
                         constant_values=False)
    else:
        padded = jnp.pad(x, ((pad, ksize - 1 - pad), (0, 0)),
                         constant_values=True)
    out = None
    for dy in range(ksize):
        row = kern[dy]
        if not row.any():
            continue
        xs = np.nonzero(row)[0]
        x0, x1 = int(xs.min()), int(xs.max())
        width = x1 - x0 + 1
        lpad = pad - x0  # horizontal padding for this run
        shifted = jax.lax.dynamic_slice_in_dim(padded, dy, h, axis=-2)
        if op == "max":
            run = jax.lax.reduce_window(
                shifted, False, jax.lax.bitwise_or, (1, width), (1, 1),
                [(0, 0), (lpad, width - 1 - lpad)],
            )
            out = run if out is None else (out | run)
        else:
            run = jax.lax.reduce_window(
                shifted, True, jax.lax.bitwise_and, (1, width), (1, 1),
                [(0, 0), (lpad, width - 1 - lpad)],
            )
            out = run if out is None else (out & run)
    return out


@partial(jax.jit, static_argnames=("ksize", "shape"))
def dilate(mask: Array, ksize: int = 3, shape: str = "rect") -> Array:
    return _window_reduce(mask, ksize, "max", shape)


@partial(jax.jit, static_argnames=("ksize", "shape"))
def erode(mask: Array, ksize: int = 3, shape: str = "rect") -> Array:
    return _window_reduce(mask, ksize, "min", shape)


@partial(jax.jit, static_argnames=("ksize", "shape", "iterations"))
def opening(mask: Array, ksize: int = 3, shape: str = "rect",
            iterations: int = 1) -> Array:
    x = mask
    for _ in range(iterations):
        x = erode(x, ksize, shape)
    for _ in range(iterations):
        x = dilate(x, ksize, shape)
    return x


@partial(jax.jit, static_argnames=("ksize", "shape", "iterations"))
def closing(mask: Array, ksize: int = 3, shape: str = "rect",
            iterations: int = 1) -> Array:
    x = mask
    for _ in range(iterations):
        x = dilate(x, ksize, shape)
    for _ in range(iterations):
        x = erode(x, ksize, shape)
    return x


def fill_holes(mask: Array, max_iters: int | None = None) -> Array:
    """Fill enclosed background regions (PlantCV `fill_holes` /
    `srcs/transform/filters/mask.py:53-69` flood-fill equivalent).

    Border-connected background is found with the same segmented-scan
    label propagation as connected components (`ops/components._propagate`)
    seeded from the border ring: each propagation round reaches the full
    length of every axis-aligned background run, so typical images converge
    in 2-3 rounds. The previous border flood grew by one pixel per round
    (3×3 dilate), needing ~h/2 sequential rounds to reach a centered blob —
    ~20× slower on a 64×224² batch. Reachability is identical, so the
    result is bit-equal.
    """
    from leaffliction_tpu.ops.components import _propagate

    m = mask.astype(jnp.bool_)
    h, w = m.shape[-2], m.shape[-1]
    border = jnp.zeros_like(m).at[..., 0, :].set(True).at[..., -1, :].set(True)
    border = border.at[..., :, 0].set(True).at[..., :, -1].set(True)
    inv = ~m
    seed = (border & inv).astype(jnp.int32)
    limit = max_iters if max_iters is not None else (h + w)
    bg = _propagate(seed, inv, limit) > 0
    holes = inv & ~bg
    return m | holes
