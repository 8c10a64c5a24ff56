"""Geometric warps: generic inverse-mapping bilinear sampler + matrix builders.

One primitive — `homography_warp` — serves every geometric op the reference
performs with PIL (`srcs/preprocessing/image_augmenter.py:33-114`: rotate,
skew/perspective, shear/affine, crop-resize) and Keras RandomRotation
(`srcs/model/cnn.py:78-81`). PIL applies *inverse* coefficient matrices
(output→input mapping); we do the same, so matrix conventions line up.

All functions are shape-static and vmap/jit friendly. Interpolation is
bilinear (PIL's BICUBIC differs at edges by design; parity is tested within
tolerance).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _reflect_index(idx: Array, size: int) -> Array:
    """Reflect out-of-range indices into [0, size) (cv2 BORDER_REFLECT_101)."""
    if size == 1:
        return jnp.zeros_like(idx)
    period = 2 * (size - 1)
    idx = jnp.mod(idx, period)
    return jnp.where(idx >= size, period - idx, idx)


def _gather_bilinear(
    img: Array, xs: Array, ys: Array, fill: float | None
) -> Array:
    """Sample img[H,W,C] at float coords (xs, ys) [out_h, out_w] bilinearly.

    fill=None → reflect borders; else constant fill for out-of-bounds.
    """
    h, w = img.shape[0], img.shape[1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi: Array, xi: Array) -> Array:
        if fill is None:
            yc = _reflect_index(yi, h)
            xc = _reflect_index(xi, w)
        else:
            yc = jnp.clip(yi, 0, h - 1)
            xc = jnp.clip(xi, 0, w - 1)
        return img[yc, xc]

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy

    if fill is not None:
        inside = (
            (xs >= 0.0) & (xs <= w - 1.0) & (ys >= 0.0) & (ys <= h - 1.0)
        )[..., None]
        out = jnp.where(inside, out, jnp.asarray(fill, out.dtype))
    return out


@partial(jax.jit, static_argnames=("out_hw", "fill"))
def homography_warp(
    img: Array,
    matrix: Array,
    out_hw: Tuple[int, int],
    fill: float | None = None,
) -> Array:
    """Warp one image with a 3x3 output→input homography.

    For each output pixel (x, y): [xs, ys, s] = matrix @ [x, y, 1]; the source
    sample is (xs/s, ys/s). Affine transforms use s == 1.
    """
    out_h, out_w = out_hw
    img_f = img.astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    m = matrix.astype(jnp.float32)
    sx = m[0, 0] * xs + m[0, 1] * ys + m[0, 2]
    sy = m[1, 0] * xs + m[1, 1] * ys + m[1, 2]
    ss = m[2, 0] * xs + m[2, 1] * ys + m[2, 2]
    inv = 1.0 / jnp.where(jnp.abs(ss) < 1e-8, 1e-8, ss)
    return _gather_bilinear(img_f, sx * inv, sy * inv, fill)


def warp_image(
    img: Array,
    matrix: Array,
    out_hw: Tuple[int, int],
    fill: float | None = None,
) -> Array:
    """Alias with clearer name for affine use; same output→input convention."""
    return homography_warp(img, matrix, out_hw, fill)


# --- matrix builders (3x3, output→input mapping) -------------------------


def affine_matrix(a: float, b: float, c: float, d: float, e: float, f: float):
    """PIL-style 6-coefficient affine (x_src = a x + b y + c, y_src = ...)."""
    return jnp.array([[a, b, c], [d, e, f], [0.0, 0.0, 1.0]], jnp.float32)


def rotation_matrix(
    angle_deg: Array | float,
    in_hw: Tuple[int, int],
    out_hw: Tuple[int, int] | None = None,
) -> Array:
    """Rotate CCW by angle (PIL convention) about the image center.

    Output→input mapping: rotate output coords by +angle about out center,
    then translate to in center. `out_hw` larger than `in_hw` reproduces
    PIL `rotate(expand=True)` within a fixed canvas.
    """
    h, w = in_hw
    oh, ow = out_hw if out_hw is not None else in_hw
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx_out, cy_out = (ow - 1) / 2.0, (oh - 1) / 2.0
    cx_in, cy_in = (w - 1) / 2.0, (h - 1) / 2.0
    # x_src = cos*(x-cxo) - sin*(y-cyo) + cxi ; y_src = sin*... + cos*... + cyi
    a, b = cos, -sin
    d, e = sin, cos
    c = cx_in - a * cx_out - b * cy_out
    f = cy_in - d * cx_out - e * cy_out
    return jnp.stack(
        [jnp.stack([a, b, c]), jnp.stack([d, e, f]),
         jnp.stack([jnp.zeros_like(a), jnp.zeros_like(a), jnp.ones_like(a)])]
    )


def shear_matrix(
    shear: Array | float, horizontal: bool, in_hw: Tuple[int, int]
) -> Array:
    """Center-anchored shear (reference shears about center via PIL affine,
    `image_augmenter.py:73-94`)."""
    h, w = in_hw
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    s = jnp.asarray(shear, jnp.float32)
    zero = jnp.zeros_like(s)
    one = jnp.ones_like(s)
    if horizontal:
        # x_src = x + s*(y - cy)
        row0 = jnp.stack([one, s, -s * cy])
        row1 = jnp.stack([zero, one, zero])
    else:
        row0 = jnp.stack([one, zero, zero])
        row1 = jnp.stack([s, one, -s * cx])
    row2 = jnp.stack([zero, zero, one])
    return jnp.stack([row0, row1, row2])


def perspective_matrix_from_coeffs(coeffs: Array) -> Array:
    """PIL PERSPECTIVE 8-coefficient vector → 3x3 homography (output→input)."""
    c = jnp.asarray(coeffs, jnp.float32).reshape(8)
    return jnp.concatenate([c, jnp.ones((1,), jnp.float32)]).reshape(3, 3)


def solve_perspective_coeffs(dst_quad, src_quad) -> Array:
    """Solve the 8 perspective coefficients mapping dst corners → src corners.

    Same linear system PIL's `ImageTransform` docs prescribe (and the
    reference builds at `image_augmenter.py:44-71`): for each of the 4 corner
    pairs, two equations in (a..h).
    """
    dst = jnp.asarray(dst_quad, jnp.float32)
    src = jnp.asarray(src_quad, jnp.float32)
    rows = []
    for i in range(4):
        X, Y = dst[i, 0], dst[i, 1]
        x, y = src[i, 0], src[i, 1]
        rows.append(jnp.stack([X, Y, jnp.ones(()), jnp.zeros(()), jnp.zeros(()),
                               jnp.zeros(()), -X * x, -Y * x]))
        rows.append(jnp.stack([jnp.zeros(()), jnp.zeros(()), jnp.zeros(()),
                               X, Y, jnp.ones(()), -X * y, -Y * y]))
    A = jnp.stack(rows)
    b = src.T.reshape(-1)  # [x0..x3, y0..y3]
    coeffs = jnp.linalg.solve(A, b)
    return jnp.concatenate([coeffs, jnp.ones((1,))]).reshape(3, 3)
