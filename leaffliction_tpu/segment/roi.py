"""ROI filter (reference `filters/roi.py:20-46`).

Bounding-rect crop of the leaf, letterboxed to roi_size, plus a rectangle
visualization on the original. The crop/resize runs on device with static
shapes (dynamic_slice + resize into the letterbox canvas); the rectangle
drawing is trivial host numpy.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from leaffliction_tpu.segment.config import TransformConfig
from leaffliction_tpu.segment.contours import bounding_rect_np


def roi_filter(
    rgb: np.ndarray,
    contour: Optional[np.ndarray],
    cfg: TransformConfig,
) -> Tuple[np.ndarray, Optional[np.ndarray], Optional[Tuple[int, int, int, int]]]:
    """→ (letterboxed ROI canvas, rectangle visualization, (x,y,w,h))."""
    if contour is None:
        return rgb, None, None
    import jax
    import jax.numpy as jnp

    x, y, w, h = bounding_rect_np(contour)
    H, W = cfg.roi_size
    roi = rgb[y:y + h, x:x + w]
    if roi.size == 0:
        return rgb, None, None

    scale = min(W / max(w, 1), H / max(h, 1))
    nw, nh = max(int(w * scale), 1), max(int(h * scale), 1)
    resized = np.asarray(jax.image.resize(
        jnp.asarray(roi, jnp.float32), (nh, nw, 3), "linear", antialias=True))
    canvas = np.zeros((H, W, 3), rgb.dtype)
    oy, ox = (H - nh) // 2, (W - nw) // 2
    canvas[oy:oy + nh, ox:ox + nw] = np.clip(np.round(resized), 0, 255
                                             ).astype(rgb.dtype)

    vis = np.asarray(rgb).copy()
    t = 2  # rectangle thickness, color (255,0,0) like the reference
    y0, y1 = max(y, 0), min(y + h, vis.shape[0])
    x0, x1 = max(x, 0), min(x + w, vis.shape[1])
    vis[y0:min(y0 + t, y1), x0:x1] = [255, 0, 0]
    vis[max(y1 - t, y0):y1, x0:x1] = [255, 0, 0]
    vis[y0:y1, x0:min(x0 + t, x1)] = [255, 0, 0]
    vis[y0:y1, max(x1 - t, x0):x1] = [255, 0, 0]

    return canvas, vis, (x, y, w, h)
