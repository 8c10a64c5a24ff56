"""ROI filter (reference `filters/roi.py:20-46`).

Bounding-rect crop of the leaf, letterboxed to roi_size, plus a rectangle
visualization on the original.

The letterbox resample runs on device with STATIC shapes: the per-image
crop rectangle is passed as data (traced scalars), and each resample pass
is a matmul with on-the-fly triangle weights (the `ops/resample.py`
pattern). The previous `jax.image.resize(roi, (nh, nw, 3))` compiled a new
program for every distinct bounding box — on the relay TPU that meant one
remote compile (0.5 s–minutes) per image in folder mode. This version
compiles once per image shape. Interpolation is plain bilinear, matching
the reference's cv2 INTER_LINEAR (no antialias).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import numpy as np

from leaffliction_tpu.segment.config import TransformConfig
from leaffliction_tpu.segment.contours import bounding_rect_np


def _letterbox_jit():
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("out_h", "out_w"))
    def run(img, rect, out_h, out_w):
        """img [Hs, Ws, 3] f32; rect = [x, y, w, h, ox, oy, nw, nh] f32
        (host-computed letterbox geometry) → [out_h, out_w, 3] f32 canvas."""
        x, y, w, h = rect[0], rect[1], rect[2], rect[3]
        ox, oy, nw, nh = rect[4], rect[5], rect[6], rect[7]
        hs, ws = img.shape[0], img.shape[1]

        def tri(d):
            return jnp.maximum(0.0, 1.0 - jnp.abs(d))

        # output row i ← source row y + (i - oy + 0.5)·h/nh − 0.5 (clamped
        # into the crop, replicating resize edge handling)
        ii = jnp.arange(out_h, dtype=jnp.float32)
        sy = y + (ii - oy + 0.5) * (h / nh) - 0.5
        sy = jnp.clip(sy, y, y + h - 1.0)
        in_row = (ii >= oy) & (ii < oy + nh)
        ks = jnp.arange(hs, dtype=jnp.float32)
        wy = tri(ks[:, None] - sy[None, :])           # [Hs, out_h]

        jj = jnp.arange(out_w, dtype=jnp.float32)
        sx = x + (jj - ox + 0.5) * (w / nw) - 0.5
        sx = jnp.clip(sx, x, x + w - 1.0)
        in_col = (jj >= ox) & (jj < ox + nw)
        kx = jnp.arange(ws, dtype=jnp.float32)
        wx = tri(kx[:, None] - sx[None, :])           # [Ws, out_w]

        mid = jnp.einsum("kwc,ki->iwc", img, wy,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("iwc,wj->ijc", mid, wx,
                         preferred_element_type=jnp.float32)
        box = (in_row[:, None] & in_col[None, :])[..., None]
        return jnp.where(box, out, 0.0)

    return run


_letterbox = None


def roi_dispatch(rgb: np.ndarray, contour: Optional[np.ndarray],
                 cfg: TransformConfig):
    """Phase 1: launch the letterbox resample; → (canvas_dev, rect) or
    None when there is no object."""
    if contour is None:
        return None
    import jax.numpy as jnp

    global _letterbox
    if _letterbox is None:
        _letterbox = _letterbox_jit()

    x, y, w, h = bounding_rect_np(contour)
    H, W = cfg.roi_size
    if w <= 0 or h <= 0:
        return None

    scale = min(W / max(w, 1), H / max(h, 1))
    nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
    oy, ox = (H - nh) // 2, (W - nw) // 2
    rect = jnp.asarray([x, y, w, h, ox, oy, nw, nh], jnp.float32)
    canvas_dev = _letterbox(jnp.asarray(rgb, jnp.float32), rect, H, W)
    return canvas_dev, (x, y, w, h)


def roi_filter(
    rgb: np.ndarray,
    contour: Optional[np.ndarray],
    cfg: TransformConfig,
    dispatched=None,
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[Tuple[int, int, int, int]]]:
    """→ (letterboxed ROI canvas, rectangle visualization, (x,y,w,h))."""
    if dispatched is None:
        dispatched = roi_dispatch(rgb, contour, cfg)
    if dispatched is None:
        return rgb, None, None
    canvas_f, (x, y, w, h) = dispatched
    canvas = np.clip(np.round(np.asarray(canvas_f)), 0, 255).astype(rgb.dtype)

    vis = np.asarray(rgb).copy()
    t = 2  # rectangle thickness, color (255,0,0) like the reference
    y0, y1 = max(y, 0), min(y + h, vis.shape[0])
    x0, x1 = max(x, 0), min(x + w, vis.shape[1])
    vis[y0:min(y0 + t, y1), x0:x1] = [255, 0, 0]
    vis[max(y1 - t, y0):y1, x0:x1] = [255, 0, 0]
    vis[y0:y1, x0:min(x0 + t, x1)] = [255, 0, 0]
    vis[y0:y1, max(x1 - t, x0):x1] = [255, 0, 0]

    return canvas, vis, (x, y, w, h)
