"""CLAHE — contrast-limited adaptive histogram equalization, on device.

Equivalent of cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8,8)) used for
vein enhancement (`srcs/transform/filters/landmarks.py:92-95`). Per-tile
256-bin histograms with clip + redistribute, CDF mappings, bilinear
interpolation of the four surrounding tile mappings per pixel — all
vectorized (no loops over tiles).

TPU formulation: both data-dependent steps are contractions, not
scatters/gathers (measured on v5e, batch 64 @224: gather interpolation
179 ms vs 27 ms for the matmul form; scatter-add histogram 53 ms vs 28).
- histogram: per-tile bin counts via a compare-and-sum over the 256 bin
  ids (the [T, P, 256] equality mask never reaches HBM — XLA fuses it
  into the reduction).
- interpolation: the per-pixel blend of the 4 neighboring tile LUTs
  factorizes into 1-D bilinear weight matrices WY [H, T] / WX [W, T]
  (each row has <=2 nonzeros), so the output is the 3-einsum chain
  one_hot(g) x (WY x luts) x WX on the MXU. HIGHEST precision keeps it
  exact (f32): default TPU matmul precision rounds operands to bf16,
  which costs ~1.4 gray levels here for zero speedup.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


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

    # per-tile histogram: compare-and-sum over bin ids (fused, no scatter)
    bins = jnp.arange(256, dtype=jnp.int32)
    hist = jnp.sum(tiled[:, :, None] == bins, axis=1).astype(jnp.float32)

    # clip + redistribute — cv2 floors the scaled limit to an int
    limit = jnp.maximum(jnp.floor(clip_limit * (th * tw) / 256.0), 1.0)
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / 256.0

    cdf = jnp.cumsum(hist, axis=1)
    n = th * tw
    # cv2 LUT: round(cdf * 255 / tile_pixels)
    luts = jnp.clip(jnp.round(cdf * 255.0 / n), 0, 255)  # [T, 256]
    luts = luts.reshape(tiles, tiles, 256)

    # bilinear tile-mapping interpolation as matmuls: WY/WX carry the
    # (<=2-tap) tile weights per output row/column
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    ty = (ys + 0.5) / th - 0.5
    tx = (xs + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ty), 0, tiles - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(tx), 0, tiles - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    wy = jnp.clip(ty - y0, 0.0, 1.0)
    wx = jnp.clip(tx - x0, 0.0, 1.0)

    tt = jnp.arange(tiles)
    WY = ((tt[None, :] == y0[:, None]) * (1.0 - wy[:, None])
          + (tt[None, :] == y1[:, None]) * wy[:, None])        # [H, T]
    WX = ((tt[None, :] == x0[:, None]) * (1.0 - wx[:, None])
          + (tt[None, :] == x1[:, None]) * wx[:, None])        # [W, T]
    # y0==y1 at the borders collapses WY's two taps onto one tile; the
    # (1-wy)+wy sum keeps the row normalized (same for WX).

    oh = jax.nn.one_hot(g, 256, dtype=jnp.float32)              # [H, W, 256]
    eq_rows = jnp.einsum("ht,tub->hub", WY, luts, precision=_HI)  # [H, T, 256]
    per_tile = jnp.einsum("hwb,hub->hwu", oh, eq_rows, precision=_HI)
    return jnp.einsum("hwu,wu->hw", per_tile, WX, precision=_HI)
