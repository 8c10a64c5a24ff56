"""Analyze filter — shape-analysis overlay (reference `filters/analyze.py:20-124`).

Overlay: contour outline, centroid cross, 4 extreme points with rays, convex
hull, PCA major/minor axes, Canny vein edges in cyan. The Canny runs on
device; moments/PCA are trivial NumPy on the contour; drawing is PIL.
Also exports the PlantCV-style shape metrics (`pcv.analyze_object`
equivalents) as a dict.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from leaffliction_tpu.segment.config import TransformConfig
from leaffliction_tpu.segment.contours import contour_area
from leaffliction_tpu.utils import draw


def shape_metrics(mask: np.ndarray, contour: np.ndarray) -> Dict[str, float]:
    """Area/perimeter/centroid/axis metrics (pcv.analyze_object analog)."""
    pts = contour.reshape(-1, 2).astype(np.float64)
    seg = np.linalg.norm(np.roll(pts, -1, axis=0) - pts, axis=1)
    area = float(np.asarray(mask, bool).sum())
    hull = draw.convex_hull_points(pts)
    hull_area = contour_area(hull.reshape(-1, 1, 2)) if len(hull) >= 3 else 0.0
    centroid = pts.mean(axis=0)
    centered = pts - centroid
    cov = centered.T @ centered / max(len(pts), 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    return {
        "area": area,
        "perimeter": float(seg.sum()),
        "convex_hull_area": float(hull_area),
        "solidity": float(area / hull_area) if hull_area > 1 else 0.0,
        "centroid_x": float(centroid[0]),
        "centroid_y": float(centroid[1]),
        "major_axis_length": float(4.0 * np.sqrt(max(evals[0], 0.0))),
        "minor_axis_length": float(4.0 * np.sqrt(max(evals[1], 0.0))),
        "ellipse_angle": float(np.degrees(np.arctan2(evecs[1, 0], evecs[0, 0]))),
    }


def analyze_dispatch(rgb: np.ndarray):
    """Phase 1: launch the device Canny (vein edges) without fetching."""
    import jax.numpy as jnp

    from leaffliction_tpu.ops.colorspace import rgb_to_gray
    from leaffliction_tpu.ops.filters import canny

    gray = rgb_to_gray(jnp.asarray(rgb, jnp.float32))
    return canny(gray, 80, 160, l2=True)


def analyze_filter(
    rgb: np.ndarray,
    mask: Optional[np.ndarray],
    contour: Optional[np.ndarray],
    cfg: TransformConfig,
    edges=None,
) -> np.ndarray:
    """`edges`: optional pre-dispatched device Canny from
    `analyze_dispatch` (folder mode overlaps the round-trips)."""
    if contour is None or mask is None:
        return draw.text(np.asarray(rgb), "Analyze: no object", (10, 24))

    overlay = np.asarray(rgb, np.uint8).copy()
    pts = contour.reshape(-1, 2)

    # contour
    overlay = draw.polyline(overlay, pts, (255, 0, 0), width=2)

    # centroid via polygon moments (mask-mean, equivalent to cv2 moments of
    # the filled contour)
    mask_bool = np.asarray(mask) > 0
    ys, xs = np.nonzero(mask_bool)
    if len(xs):
        cx, cy = int(xs.mean()), int(ys.mean())
    else:
        cx, cy = int(pts[:, 0].mean()), int(pts[:, 1].mean())
    overlay = draw.cross_marker(overlay, (cx, cy), 14, (255, 255, 0))

    # extreme points + rays
    left = pts[pts[:, 0].argmin()]
    right = pts[pts[:, 0].argmax()]
    top = pts[pts[:, 1].argmin()]
    bottom = pts[pts[:, 1].argmax()]
    for p in (left, right, top, bottom):
        overlay = draw.circle(overlay, p, 3, (255, 255, 0))
        overlay = draw.line(overlay, (cx, cy), p, (255, 255, 0), 1)

    # convex hull
    hull = draw.convex_hull_points(pts)
    overlay = draw.polyline(overlay, hull, (0, 255, 0), width=1)

    # PCA axes
    data = pts.astype(np.float64)
    mean = data.mean(axis=0)
    centered = data - mean
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    for vec, color in ((vt[0], (255, 255, 0)), (vt[1], (255, 0, 255))):
        proj = centered @ vec
        p_min = data[proj.argmin()]
        p_max = data[proj.argmax()]
        overlay = draw.line(overlay, p_min, p_max, color, 2)

    # vein edges (device Canny 80/160 L2) in cyan inside the mask
    if edges is None:
        edges = analyze_dispatch(rgb)
    edges = np.asarray(edges)
    overlay = np.array(overlay)  # PIL-backed arrays are read-only
    overlay[edges & mask_bool] = (0, 255, 255)

    return overlay
