"""Color-space conversions with OpenCV 8-bit conventions, batched on device.

The reference's filter stack works in cv2's HSV (H∈[0,180), S,V∈[0,255]) and
LAB (L,a,b∈[0,255], a/b offset by 128) spaces
(`srcs/transform/filters/mask.py:72-106`, `brown.py:52-74`). We follow the
same conventions so thresholds translate 1:1.

All functions take float32 or uint8 RGB in [0,255], HWC or NHWC, and return
float32 in cv2 ranges. Pure jnp — they fuse into surrounding ops under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def _as_float(img: Array) -> Array:
    return img.astype(jnp.float32)


def rgb_to_gray(img: Array) -> Array:
    """cv2 COLOR_RGB2GRAY: Y = 0.299 R + 0.587 G + 0.114 B."""
    x = _as_float(img)
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def rgb_to_hsv(img: Array) -> Array:
    """cv2 COLOR_RGB2HSV for 8-bit: H ∈ [0,180), S,V ∈ [0,255]."""
    x = _as_float(img) / 255.0
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.max(x, axis=-1)
    c = v - jnp.min(x, axis=-1)
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        v == r, (g - b) / safe_c,
        jnp.where(v == g, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c),
    )
    h = jnp.where(c > 0, h, 0.0) * 60.0
    h = jnp.where(h < 0, h + 360.0, h)
    s = jnp.where(v > 0, c / jnp.where(v > 0, v, 1.0), 0.0)
    return jnp.stack([h / 2.0, s * 255.0, v * 255.0], axis=-1)


def _srgb_to_linear(c: Array) -> Array:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def rgb_to_lab(img: Array) -> Array:
    """cv2 COLOR_RGB2LAB for 8-bit: L,a,b ∈ [0,255] with a,b offset +128."""
    x = _srgb_to_linear(_as_float(img) / 255.0)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    # sRGB D65 → XYZ
    X = 0.412453 * r + 0.357580 * g + 0.180423 * b
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    # normalize by white point
    X = X / 0.950456
    Z = Z / 1.088754

    def f(t: Array) -> Array:
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(X), f(Y), f(Z)
    L = jnp.where(Y > 0.008856, 116.0 * jnp.cbrt(Y) - 16.0, 903.3 * Y)
    a = 500.0 * (fx - fy) + 128.0
    bb = 200.0 * (fy - fz) + 128.0
    return jnp.stack([L * 255.0 / 100.0, a, bb], axis=-1)


def hsv_to_rgb(hsv: Array) -> Array:
    """Inverse of rgb_to_hsv (cv2 ranges in, float RGB [0,255] out)."""
    h = hsv[..., 0] * 2.0 / 60.0  # sector in [0,6)
    s = hsv[..., 1] / 255.0
    v = hsv[..., 2] / 255.0
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1) * 255.0
