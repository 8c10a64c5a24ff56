"""Landmarks filter — 80 pseudo-landmarks (reference `filters/landmarks.py:29-313`).

Quotas split ⅓/⅓/⅓ like the reference:
- border: arc-length contour resampling (host, `Transformation.py:301-321`);
- veins: CLAHE + multi-Canny + Sobel-threshold edge fusion gated by the
  eroded mask, Shi-Tomasi corners — all on device in one jitted program
  (`landmarks.py:76-152`);
- disease: brown connected components ≥ min-area, per-component corner picks
  with area-scaled quotas (`landmarks.py:155-257`) — detection on device,
  component ordering on host.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import numpy as np

from leaffliction_tpu.segment.config import TransformConfig
from leaffliction_tpu.segment.contours import (
    largest_contour_points,
    resample_contour,
)
from leaffliction_tpu.utils import draw

COL_BORDER = (255, 0, 0)
COL_VEIN = (0, 0, 255)
COL_DISEASE = (139, 69, 19)


_vein_jit = None


def _vein_device(rgb, mask_bool, max_corners: int):
    import jax
    import jax.numpy as jnp

    global _vein_jit
    if _vein_jit is not None:
        return _vein_jit(jnp.asarray(rgb), jnp.asarray(mask_bool), max_corners)

    from leaffliction_tpu.ops.clahe import clahe
    from leaffliction_tpu.ops.colorspace import rgb_to_gray
    from leaffliction_tpu.ops.filters import (
        canny,
        gaussian_blur,
        good_features_to_track,
        normalize_minmax,
        sobel_xy,
    )
    from leaffliction_tpu.ops.morphology import dilate, erode

    @partial(jax.jit, static_argnames=("max_corners",))
    def run(rgb, mask, max_corners):
        gray = rgb_to_gray(rgb.astype(jnp.float32))
        gray_eq = clahe(gray, 2.0, 8)
        edges1 = canny(gray_eq, 30, 90, l2=True)
        # bilateral ≈ gaussian here (smoothing before the second Canny)
        gray_smooth = gaussian_blur(gray_eq, 5, 1.2)
        edges2 = canny(gray_smooth, 50, 130, l2=True)
        gx, gy = sobel_xy(gray_eq)
        mag = normalize_minmax(jnp.sqrt(gx * gx + gy * gy), 0.0, 255.0)
        edges3 = mag > 40.0
        inner = erode(mask.astype(jnp.bool_), 3, "ellipse")
        edges = (edges1 | edges2 | edges3) & inner
        edges_d = dilate(edges, 3, "ellipse")
        ys, xs, valid = good_features_to_track(
            gray_eq, edges_d, max_corners=max_corners,
            quality_level=0.002, min_distance=2, block_size=3)
        return ys, xs, valid, edges_d

    _vein_jit = run
    return _vein_jit(jnp.asarray(rgb), jnp.asarray(mask_bool), max_corners)


def landmarks_dispatch(
    rgb: np.ndarray,
    contour: Optional[np.ndarray],
    cfg: TransformConfig,
    make_mask_func: Callable,
):
    """Phase 1: launch every mask-dependent device computation (enhanced
    mask, vein corners, disease component labels) WITHOUT fetching — the
    folder-mode driver dispatches all images first so relay round-trips
    overlap. → opaque handles for `landmarks_finish` (None if no object)."""
    import jax.numpy as jnp

    from leaffliction_tpu.ops.components import label_components
    from leaffliction_tpu.ops.morphology import closing, opening
    from leaffliction_tpu.ops.colorspace import rgb_to_hsv, rgb_to_lab
    from leaffliction_tpu.segment.brown import brown_regions

    if contour is None:
        return None

    # rgb may be a DEVICE array in folder mode (no host coercion here —
    # np.asarray would force a blocking fetch and defeat the pipelining);
    # make_mask_func must tolerate it (folder mode passes a precomputed
    # lambda; single-image mode passes host arrays).
    mask, _ = make_mask_func(rgb)
    total = max(1, int(cfg.landmarks_count))
    vein_quota = max(1, total // 3)

    if mask is None:
        return {"contour": contour, "mask": None}

    leaf = mask > 0 if mask.ndim == 2 else mask[..., 0] > 0
    # enhanced mask: leaf ∪ cleaned brown, closed (`landmarks.py:29-56`)
    brown, _, _ = brown_regions(jnp.asarray(rgb), jnp.asarray(leaf), cfg)
    enhanced = closing(jnp.asarray(leaf) | brown, 5, "ellipse")

    rgb_j = jnp.asarray(rgb, jnp.float32)
    if cfg.use_lab_brown:
        lab = rgb_to_lab(rgb_j)
        disease_raw = ((lab[..., 1] >= cfg.lab_a_min)
                       & (lab[..., 2] >= cfg.lab_b_min))
    else:
        hsv = rgb_to_hsv(rgb_j)
        lo, hi = cfg.brown_hue_range
        disease_raw = ((hsv[..., 0] >= lo) & (hsv[..., 0] <= hi)
                       & (hsv[..., 1] >= cfg.brown_s_min)
                       & (hsv[..., 2] <= cfg.brown_v_max))
    k = cfg.brown_morph_kernel
    clean = closing(opening(disease_raw & enhanced, k, "ellipse"),
                    k, "ellipse")
    labels_dev = label_components(clean)

    veins = _vein_device(rgb, enhanced, vein_quota * 8)
    return {"contour": contour, "mask": enhanced, "veins": veins,
            "labels": labels_dev}


def landmarks_finish(
    rgb: np.ndarray,
    handles,
    cfg: TransformConfig,
) -> np.ndarray:
    """Phase 2: fetch the dispatched arrays, pick quotas, draw."""
    if handles is None:
        return draw.text(np.asarray(rgb), "Landmarks: no object", (10, 24))

    rgb = np.asarray(rgb, np.uint8)
    contour = handles["contour"]
    mask_bool = None
    if handles["mask"] is not None:
        enhanced_np = np.asarray(handles["mask"])
        enhanced_contour = largest_contour_points(enhanced_np)
        if enhanced_contour is not None:
            contour = enhanced_contour
        mask_bool = enhanced_np

    vis = rgb.copy()
    total = max(1, int(cfg.landmarks_count))
    border_quota = max(1, total // 3)
    vein_quota = max(1, total // 3)
    disease_quota = max(1, total - border_quota - vein_quota)

    # border landmarks + contour outline
    border_pts = resample_contour(contour, border_quota)
    vis = draw.polyline(vis, contour.reshape(-1, 2), (0, 255, 0), width=1)
    vis = draw.circles(vis, border_pts, 2, COL_BORDER)

    # vein landmarks (device corners)
    if mask_bool is not None:
        ys, xs, valid, edges_d = handles["veins"]
        ys, xs, valid = map(np.asarray, (ys, xs, valid))
        corners = [(int(x), int(y)) for y, x, ok in zip(ys, xs, valid) if ok]
        vis = draw.circles(vis, corners[:vein_quota], 2, COL_VEIN)
        placed = min(len(corners), vein_quota)
        if placed < vein_quota:  # fallback: spread over edge pixels
            eys, exs = np.nonzero(np.asarray(edges_d))
            need = vein_quota - placed
            if len(exs) > 0 and need > 0:
                idx = np.linspace(0, len(exs) - 1, num=need, dtype=int)
                vis = draw.circles(vis, list(zip(exs[idx], eys[idx])), 2,
                                   COL_VEIN)

        # disease landmarks from the pre-dispatched component labels
        vis = _disease_landmarks(vis, rgb, cfg, np.asarray(handles["labels"]),
                                 disease_quota)
    return vis


def landmarks_filter(
    rgb: np.ndarray,
    contour: Optional[np.ndarray],
    cfg: TransformConfig,
    make_mask_func: Callable,
) -> np.ndarray:
    """Single-image entry: dispatch + finish back-to-back."""
    handles = landmarks_dispatch(rgb, contour, cfg, make_mask_func)
    return landmarks_finish(rgb, handles, cfg)


def _disease_landmarks(vis, rgb, cfg: TransformConfig, labels,
                       disease_quota: int):
    """`labels` is the pre-dispatched connected-components image of the
    cleaned brown gate (built in `landmarks_dispatch`)."""
    import jax.numpy as jnp

    from leaffliction_tpu.ops.filters import good_features_to_track
    from leaffliction_tpu.ops.colorspace import rgb_to_gray

    rgb_j = jnp.asarray(rgb, jnp.float32)
    labels = np.asarray(labels)

    ids, counts = np.unique(labels[labels > 0], return_counts=True)
    comps = [(i, int(n)) for i, n in zip(ids, counts)
             if n >= cfg.brown_min_area_px]
    comps.sort(key=lambda t: -t[1])
    if not comps:
        return vis

    total_area = sum(n for _, n in comps)
    calculated = max(len(comps), total_area // 50)
    actual_quota = min(calculated, disease_quota * 5)

    gray = rgb_to_gray(rgb_j)
    placed = 0
    for comp_id, area in comps:
        if placed >= actual_quota:
            break
        comp_mask = labels == comp_id
        points_for_comp = max(1, min(area // 40, actual_quota - placed))
        # max_corners is a STATIC jit arg: bucket it to the next power of
        # two so folder mode compiles O(log) programs, not one per distinct
        # request (each remote compile costs 0.5 s-minutes on the relay).
        # top_k results are sorted, so top-bucket sliced to the request is
        # identical to requesting exactly.
        req = max(points_for_comp * 3, 4)
        ys, xs, valid = good_features_to_track(
            gray, jnp.asarray(comp_mask),
            max_corners=1 << (req - 1).bit_length(),
            quality_level=0.005, min_distance=3, block_size=3)
        ys, xs, valid = map(np.asarray, (ys, xs, valid))
        pts = [(int(x), int(y)) for y, x, ok in zip(ys, xs, valid) if ok]
        if pts:
            vis = draw.circles(vis, pts[:points_for_comp], 4, COL_DISEASE)
            placed += min(len(pts), points_for_comp)
        else:
            cys, cxs = np.nonzero(comp_mask)
            vis = draw.circle(vis, (cxs.mean(), cys.mean()), 4, COL_DISEASE)
            placed += 1
    return vis
