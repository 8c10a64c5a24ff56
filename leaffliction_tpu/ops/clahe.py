"""CLAHE — contrast-limited adaptive histogram equalization, on device.

Equivalent of cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8)) used for
vein enhancement (`srcs/transform/filters/landmarks.py:92-95`). Per-tile
256-bin histograms with clip + redistribute, CDF mappings, bilinear
interpolation of the four surrounding tile mappings per pixel — all
vectorized (no loops over tiles).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("clip_limit", "tiles"))
def clahe(gray: Array, clip_limit: float = 2.0, tiles: int = 8) -> Array:
    """gray float [0,255] HW → equalized float [0,255] HW."""
    h, w = gray.shape
    g = jnp.clip(jnp.round(gray), 0, 255).astype(jnp.int32)

    # pad so dimensions divide evenly (cv2 pads with reflection internally)
    th = -(-h // tiles)
    tw = -(-w // tiles)
    ph, pw = th * tiles - h, tw * tiles - w
    gp = jnp.pad(g, ((0, ph), (0, pw)), mode="reflect")

    tiled = gp.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)
    tiled = tiled.reshape(tiles * tiles, th * tw)  # [T, P]

    # per-tile histogram via one-hot scatter-add
    t_idx = jnp.repeat(jnp.arange(tiles * tiles), th * tw)
    hist = jnp.zeros((tiles * tiles, 256), jnp.float32).at[
        t_idx, tiled.reshape(-1)].add(1.0)

    # clip + redistribute — cv2 floors the scaled limit to an int
    limit = jnp.maximum(jnp.floor(clip_limit * (th * tw) / 256.0), 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / 256.0

    cdf = jnp.cumsum(hist, axis=1)
    n = th * tw
    # cv2 LUT: round(cdf * 255 / tile_pixels)
    luts = jnp.clip(jnp.round(cdf * 255.0 / n), 0, 255)  # [T, 256]
    luts = luts.reshape(tiles, tiles, 256)

    # bilinear interpolation between tile mappings
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    ty = (ys + 0.5) / th - 0.5
    tx = (xs + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ty), 0, tiles - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(tx), 0, tiles - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    wy = jnp.clip(ty - y0, 0.0, 1.0)[:, None]
    wx = jnp.clip(tx - x0, 0.0, 1.0)[None, :]

    gi = g  # original (unpadded) values
    y0g, y1g = y0[:, None], y1[:, None]
    x0g, x1g = x0[None, :], x1[None, :]
    v00 = luts[y0g, x0g, gi]
    v01 = luts[y0g, x1g, gi]
    v10 = luts[y1g, x0g, gi]
    v11 = luts[y1g, x1g, gi]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
