"""Leaf segmentation — the full on-device mask pipeline.

TPU-native rebuild of the reference's hottest function, `make_mask`
(`srcs/transform/filters/mask.py:548-582`), with all six candidate
strategies, the post-process chain, heuristic scoring, shadow suppression,
brown-region extension, and fallback. Everything except the optional GrabCut
refinement (host cv2, viz-path only, `mask.py:307-332`) runs as jitted JAX
over static shapes, batchable with vmap.

Strategy ↔ reference mapping:
- hsv_s / hsv_v_dark (`mask.py:72-85`): Otsu on HSV S (light object) / V
  (dark object);
- hsv_h (`mask.py:87-98`): green-hue gate ∧ S≥40;
- lab (`mask.py:101-106`): a≤135 ∧ 115≤b≤170;
- kmeans (`mask.py:109-140`): k=3 over a ≤256px resize, cluster picked by
  bg_bias (light_bg → darkest mean) else greenest/most-saturated;
- enhanced (`mask.py:610-724`): HSV∧ + LAB∧ + brown ∪ 0.3·Canny-edges
  → threshold 0.3 → close/open/close → largest component;
- inclusive (`mask.py:727-831`): strong-green ∪ green-dominance ∪ LAB-green
  ∪ dilated edges, minus gray/purple/uniform background, morphology chain,
  largest component.

Post-process (`mask.py:53-69`): pcv.fill(size) → close → open → largest
contour → filled contour ≡ remove_small → close → open → largest component →
fill holes.

Scoring (`mask.py:143-188`): 0.35·area-term + 0.25·solidity +
0.25·boundary-gradient + 0.15·green-fraction, ×0.75 on border touch; hull
area for solidity is approximated on device by the support polygon over 36
directions.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaffliction_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv, rgb_to_lab
from leaffliction_tpu.ops.components import largest_component, remove_small_components
from leaffliction_tpu.ops.filters import canny, gaussian_blur, normalize_minmax, sobel_xy
from leaffliction_tpu.ops.kmeans import kmeans_pixels
from leaffliction_tpu.ops.morphology import closing, dilate, erode, fill_holes, opening
from leaffliction_tpu.ops.threshold import otsu_binarize
from leaffliction_tpu.segment.config import TransformConfig

Array = jax.Array


# --- geometry helpers (device) ---------------------------------------------


def convex_hull_area_approx(mask: Array, n_dirs: int = 36) -> Array:
    """Approximate convex-hull area: shoelace area of the polygon of extreme
    points along n_dirs directions (device-friendly hull substitute)."""
    h, w = mask.shape
    m = mask.astype(jnp.float32)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    thetas = jnp.linspace(0.0, 2.0 * jnp.pi, n_dirs, endpoint=False)

    def extreme_point(theta):
        proj = xs * jnp.cos(theta) + ys * jnp.sin(theta)
        proj = jnp.where(m > 0, proj, -jnp.inf)
        idx = jnp.argmax(proj)
        return jnp.stack([xs.reshape(-1)[idx], ys.reshape(-1)[idx]])

    pts = jax.vmap(extreme_point)(thetas)  # [n_dirs, 2]
    x, y = pts[:, 0], pts[:, 1]
    x2, y2 = jnp.roll(x, -1), jnp.roll(y, -1)
    return 0.5 * jnp.abs(jnp.sum(x * y2 - x2 * y))


def bounding_rect(mask: Array) -> Array:
    """→ [x, y, w, h] like cv2.boundingRect (int32), zeros if empty."""
    h, w = mask.shape
    m = mask.astype(jnp.bool_)
    any_row = jnp.any(m, axis=1)
    any_col = jnp.any(m, axis=0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).squeeze(-1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).squeeze(-1)
    y0 = jnp.min(jnp.where(any_row, rows, h))
    y1 = jnp.max(jnp.where(any_row, rows, -1))
    x0 = jnp.min(jnp.where(any_col, cols, w))
    x1 = jnp.max(jnp.where(any_col, cols, -1))
    empty = ~jnp.any(m)
    rect = jnp.stack([x0, y0, x1 - x0 + 1, y1 - y0 + 1])
    return jnp.where(empty, jnp.zeros((4,), jnp.int32), rect)


# --- candidate strategies ---------------------------------------------------


def _green_gate(hsv: Array, cfg: TransformConfig, s_min: float = 40.0) -> Array:
    lo, hi = cfg.green_hue_range
    return (hsv[..., 0] >= lo) & (hsv[..., 0] <= hi) & (hsv[..., 1] >= s_min)


def _cand_hsv_s(rgb: Array, hsv: Array, cfg: TransformConfig) -> Array:
    obj = "dark" if (cfg.bg_bias or "") == "dark_bg" else "light"
    return otsu_binarize(hsv[..., 1], invert=(obj == "dark"))


def _cand_hsv_v_dark(rgb: Array, hsv: Array, cfg: TransformConfig) -> Array:
    return otsu_binarize(hsv[..., 2], invert=True)


def _cand_hsv_h(rgb: Array, hsv: Array, cfg: TransformConfig) -> Array:
    return _green_gate(hsv, cfg)


def _cand_lab(lab: Array) -> Array:
    a, b = lab[..., 1], lab[..., 2]
    return (a <= 135.0) & (b >= 115.0) & (b <= 170.0)


def _cand_kmeans(rgb: Array, cfg: TransformConfig) -> Array:
    """k=3 k-means over a downscaled image; cluster pick follows
    `mask.py:126-138` (bias → brightness, else green score, else saturation)."""
    h, w = rgb.shape[0], rgb.shape[1]
    scale = min(1.0, 256.0 / max(h, w))  # downscale only, like the reference
    sh, sw = max(1, int(h * scale)), max(1, int(w * scale))
    small = jax.image.resize(rgb.astype(jnp.float32), (sh, sw, 3), "linear")
    labels, centers = kmeans_pixels(small, k=3, iters=10, seed=12345)

    hsv_c = rgb_to_hsv(centers[None])[0]  # [3,3] cv2 ranges
    lo, hi = cfg.green_hue_range
    green_score = ((hsv_c[:, 0] >= lo) & (hsv_c[:, 0] <= hi)
                   & (hsv_c[:, 1] >= 40)).astype(jnp.int32)
    brightness = jnp.mean(centers, axis=1)
    if cfg.bg_bias == "dark_bg":
        pick = jnp.argmax(brightness)
    elif cfg.bg_bias == "light_bg":
        pick = jnp.argmin(brightness)
    else:
        pick = jnp.where(jnp.any(green_score > 0),
                         jnp.argmax(green_score),
                         jnp.argmax(hsv_c[:, 1]))
    small_mask = labels == pick
    big = jax.image.resize(small_mask.astype(jnp.float32), (h, w), "nearest")
    return big > 0.5


def _cand_enhanced(rgb: Array, hsv: Array, lab: Array,
                   cfg: TransformConfig,
                   edge_hysteresis: bool = False) -> Array:
    h_c, s_c, v_c = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    l_c, a_c, b_c = lab[..., 0], lab[..., 1], lab[..., 2]
    lo, hi = cfg.green_hue_range

    hsv_veg = ((h_c >= lo) & (h_c <= hi) & (s_c >= 25)
               & (v_c >= 20) & (v_c <= 240))
    lab_veg = (a_c <= 135) & (b_c >= 105) & (l_c >= 30) & (l_c <= 220)

    if cfg.use_lab_brown:
        brown = ((a_c >= cfg.lab_a_min - 10) & (b_c >= cfg.lab_b_min - 10)
                 & (l_c >= 20))
    else:
        blo, bhi = cfg.brown_hue_range
        brown_hue = (((h_c >= blo) & (h_c <= bhi + 20))
                     | ((h_c >= 160) & (h_c <= 180)))
        brown = (brown_hue & (s_c >= cfg.brown_s_min - 10)
                 & (v_c <= cfg.brown_v_max + 30))

    gray = rgb_to_gray(rgb)
    # hysteresis off by default: the 2x5 ellipse dilation right after makes
    # the NMS+double-threshold edges equivalent for this candidate at the
    # final-mask level (pinned by tests/test_hysteresis_delta.py), and the
    # chain-connectivity pass costs ~32 extra CC iterations per image
    edges = (canny(gray, 30, 100, hysteresis=edge_hysteresis)
             | canny(gray, 50, 150, hysteresis=edge_hysteresis))
    edge_regions = dilate(dilate(edges, 5, "ellipse"), 5, "ellipse")

    veg = hsv_veg | lab_veg | brown
    combined = veg.astype(jnp.float32) + edge_regions.astype(jnp.float32) * 0.3
    m = combined > 0.3
    m = closing(m, 7, "ellipse")
    m = opening(m, 3, "ellipse")
    m = closing(m, 9, "ellipse")
    m = largest_component(m)
    return closing(m, 3, "ellipse")


def _cand_inclusive(rgb: Array, hsv: Array, lab: Array,
                    cfg: TransformConfig,
                    edge_hysteresis: bool = False) -> Array:
    h_c, s_c, v_c = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    l_c, a_c, b_c = lab[..., 0], lab[..., 1], lab[..., 2]
    r_c = rgb[..., 0].astype(jnp.float32)
    g_c = rgb[..., 1].astype(jnp.float32)
    b_rgb = rgb[..., 2].astype(jnp.float32)
    lo, hi = cfg.green_hue_range
    elo, ehi = max(0, lo - 10), min(179, hi + 15)

    strong_green = ((h_c >= elo) & (h_c <= ehi) & (s_c >= 30) & (v_c >= 30))
    green_dominant = ((g_c > r_c + 15) | (g_c > b_rgb + 15)
                      | ((g_c > r_c + 5) & (g_c > b_rgb + 5) & (s_c >= 20)))
    lab_green = ((a_c <= 125) & (b_c >= 120) & (l_c >= 20) & (l_c <= 240))

    gray = rgb_to_gray(rgb)
    blur_gray = gaussian_blur(gray, 15, 0.0)
    texture_diff = jnp.abs(gray - blur_gray)
    gray_purple_bg = (
        ((s_c <= 25) & (v_c >= 50) & (v_c <= 220))
        | ((h_c >= 120) & (h_c <= 160) & (s_c >= 20)
           & (r_c > g_c) & (b_rgb > g_c))
        | ((s_c <= 15) & (texture_diff < 10))
    )

    edges = canny(gray, 30, 100, hysteresis=edge_hysteresis)
    dilated_edges = dilate(edges, 3, "ellipse")

    plant = (strong_green | green_dominant | lab_green | dilated_edges)
    plant = plant & ~gray_purple_bg
    plant = opening(plant, 3, "ellipse")
    plant = closing(plant, 9, "ellipse")
    plant = closing(plant, 7, "ellipse")
    plant = largest_component(plant)
    return closing(plant, 5, "ellipse")


# --- post-process + scoring -------------------------------------------------


def postprocess_mask(raw: Array, cfg: TransformConfig) -> Array:
    """fill(size) → close → open → largest component → hole fill
    (`mask.py:53-69`; the contour_to_mask fill ≡ fill_holes of the largest
    component)."""
    m = remove_small_components(raw.astype(jnp.bool_), cfg.fill_size)
    k = cfg.morph_kernel
    m = closing(m, k, "ellipse")
    m = opening(m, k, "ellipse")
    m = largest_component(m)
    return fill_holes(m)


def score_mask(mask: Array, rgb: Array, cfg: TransformConfig) -> Array:
    """Heuristic score (`mask.py:143-188`), fully vectorized."""
    h, w = mask.shape
    m = mask.astype(jnp.float32)
    area = jnp.sum(m)
    area_ratio = area / (h * w)

    hull_area = convex_hull_area_approx(mask)
    solidity = jnp.where(hull_area > 1.0, area / jnp.maximum(hull_area, 1.0), 0.0)
    solidity = jnp.clip(solidity, 0.0, 1.0)

    gray = rgb_to_gray(rgb)
    gx, gy = sobel_xy(gray)
    mag = normalize_minmax(jnp.sqrt(gx * gx + gy * gy), 0.0, 1.0)
    boundary = dilate(mask, 3, "ellipse") ^ erode(mask, 3, "ellipse")
    b_sum = jnp.sum(boundary)
    b_strength = jnp.where(
        b_sum > 0, jnp.sum(mag * boundary) / jnp.maximum(b_sum, 1.0), 0.0)

    hsv = rgb_to_hsv(rgb)
    green = _green_gate(hsv, cfg)
    green_frac = jnp.sum(green & (mask > 0)) / jnp.maximum(area, 1.0)

    rect = bounding_rect(mask)
    x, y, ww, hh = rect[0], rect[1], rect[2], rect[3]
    touches = ((x <= 0) | (y <= 0) | (x + ww >= w - 1) | (y + hh >= h - 1))

    target = 0.35
    area_term = jnp.maximum(0.0, 1.0 - jnp.abs(area_ratio - target) / target)
    score = (0.35 * area_term + 0.25 * solidity + 0.25 * b_strength
             + 0.15 * green_frac)
    score = jnp.where(touches, score * 0.75, score)
    # range gates (`mask.py:152-156`)
    in_range = ((area_ratio >= cfg.min_object_area_ratio)
                & (area_ratio <= cfg.max_object_area_ratio))
    score = jnp.where(in_range, score, 0.01)
    return jnp.where(area > 1.0, score, -1.0)


# --- refinements -------------------------------------------------------------


def suppress_shadow(mask: Array, rgb: Array, cfg: TransformConfig) -> Array:
    """Seven-method shadow removal (`mask.py:191-304`), device version."""
    hsv = rgb_to_hsv(rgb)
    lab = rgb_to_lab(rgb)
    s_c, v_c = hsv[..., 1], hsv[..., 2]
    l_c = lab[..., 0]
    lo, hi = cfg.green_hue_range

    l40 = jnp.percentile(l_c, 40)
    l45 = jnp.percentile(l_c, 45)
    l50 = jnp.percentile(l_c, 50)
    very_dark_lab = l_c < l40
    low_sat_dark = (s_c < 50) & (v_c < 100)
    aggressive = (l_c < l45) & (s_c < 60) & (v_c < 120)
    very_low_v = v_c < 90
    lab_dark = l_c < l50

    gray = rgb_to_gray(rgb)
    blur = gaussian_blur(gray, 15, 0.0)
    uniform = jnp.abs(gray - blur) < 15
    shadow_uniform = uniform & (v_c < 100)

    # k-means (5 clusters on a ≤150px resize): two darkest clusters
    h, w = rgb.shape[0], rgb.shape[1]
    scale = min(1.0, 150.0 / max(h, w))
    sh, sw = max(1, int(h * scale)), max(1, int(w * scale))
    small = jax.image.resize(rgb.astype(jnp.float32), (sh, sw, 3), "linear")
    labels, centers = kmeans_pixels(small, k=5, iters=10, seed=7)
    order = jnp.argsort(jnp.mean(centers, axis=1))
    dark2 = (labels == order[0]) | (labels == order[1])
    shadow_kmeans = jax.image.resize(
        dark2.astype(jnp.float32), (h, w), "nearest") > 0.5

    green_regions = ((hsv[..., 0] >= lo) & (hsv[..., 0] <= hi)
                     & (s_c >= 40) & (v_c >= 60))

    shadow = (very_dark_lab | low_sat_dark | aggressive | very_low_v
              | lab_dark | shadow_uniform | shadow_kmeans) & ~green_regions
    shadow = dilate(shadow, 3, "ellipse")
    shadow = closing(shadow, 7, "ellipse")

    refined = mask.astype(jnp.bool_) & ~shadow
    refined = opening(refined, 3, "ellipse")
    refined = closing(refined, 7, "ellipse")
    return postprocess_mask(refined, cfg)


def extend_with_brown(mask: Array, rgb: Array, cfg: TransformConfig) -> Array:
    """Extend mask with nearby brown/diseased regions (`mask.py:335-392`)."""
    search = mask.astype(jnp.bool_)
    search = dilate(dilate(search, 20, "ellipse"), 20, "ellipse")

    hsv = rgb_to_hsv(rgb)
    lab = rgb_to_lab(rgb)
    if cfg.use_lab_brown:
        brown = ((lab[..., 1] >= cfg.lab_a_min)
                 & (lab[..., 2] >= cfg.lab_b_min) & search)
    else:
        lo, hi = cfg.brown_hue_range
        brown = ((hsv[..., 0] >= lo) & (hsv[..., 0] <= hi)
                 & (hsv[..., 1] >= cfg.brown_s_min)
                 & (hsv[..., 2] <= cfg.brown_v_max) & search)
    k = cfg.brown_morph_kernel
    brown = opening(brown, k, "ellipse")
    brown = closing(brown, k, "ellipse")
    brown = remove_small_components(brown, cfg.brown_min_area_px)
    return mask.astype(jnp.bool_) | brown


def fallback_mask(rgb: Array, cfg: TransformConfig) -> Array:
    """Otsu on the configured HSV channel (`mask.py:395-411`)."""
    hsv = rgb_to_hsv(rgb)
    chan = {"h": 0, "s": 1, "v": 2}.get(cfg.hsv_channel_for_mask, 1)
    raw = otsu_binarize(hsv[..., chan])
    return postprocess_mask(raw, cfg)


# --- main pipeline -----------------------------------------------------------


STRATEGY_BUILDERS = ("hsv_s", "hsv_v_dark", "hsv_h", "lab", "kmeans",
                     "enhanced", "inclusive")


def _candidates_for(rgb: Array, cfg: TransformConfig):
    hsv = rgb_to_hsv(rgb)
    lab = rgb_to_lab(rgb)
    strat = cfg.mask_strategy
    out = []
    if strat in ("hsv_s", "auto"):
        out.append(_cand_hsv_s(rgb, hsv, cfg))
    if strat in ("hsv_v_dark", "auto"):
        out.append(_cand_hsv_v_dark(rgb, hsv, cfg))
    if strat in ("hsv_h", "auto"):
        out.append(_cand_hsv_h(rgb, hsv, cfg))
    if strat in ("lab", "auto"):
        out.append(_cand_lab(lab))
    if strat in ("kmeans", "auto"):
        out.append(_cand_kmeans(rgb, cfg))
    if strat in ("enhanced", "auto"):
        out.append(_cand_enhanced(rgb, hsv, lab, cfg))
    if strat in ("inclusive", "auto"):
        out.append(_cand_inclusive(rgb, hsv, lab, cfg))
    if not out:  # unknown strategy → auto
        return _candidates_for(
            rgb, TransformConfig(**{**cfg.__dict__, "mask_strategy": "auto"}))
    return out


def _make_mask_no_fallback(rgb: Array, cfg: TransformConfig) -> Tuple[Array, Array]:
    rgb = rgb.astype(jnp.float32)
    cands = _candidates_for(rgb, cfg)
    processed = [postprocess_mask(c, cfg) for c in cands]
    scores = jnp.stack([score_mask(m, rgb, cfg) for m in processed])
    best_idx = jnp.argmax(scores)
    best = jnp.stack(processed)[best_idx]
    best_score = scores[best_idx]

    if cfg.shadow_suppression:
        shadowless = suppress_shadow(best, rgb, cfg)
        sc2 = score_mask(shadowless, rgb, cfg)
        best = jnp.where(sc2 >= best_score, shadowless, best)
        best_score = jnp.maximum(sc2, best_score)
    return best, best_score


@partial(jax.jit, static_argnames=("cfg",))
def make_mask_core(rgb: Array, cfg: TransformConfig) -> Tuple[Array, Array]:
    """Candidates → postprocess → score → best → shadow → brown-extend.
    → (mask bool HW, score). GrabCut (host) is applied by the caller."""
    best, best_score = _make_mask_no_fallback(rgb, cfg)
    # fallback when nothing scored — lax.cond so the Otsu+postprocess branch
    # only executes on the (rare) failure path
    best = jax.lax.cond(
        best_score <= 0.0,
        lambda: fallback_mask(rgb, cfg),
        lambda: best,
    )
    best = extend_with_brown(best, rgb, cfg)
    return best, best_score


@partial(jax.jit, static_argnames=("cfg",))
def _fallback_extend_core(rgb: Array, cfg: TransformConfig) -> Array:
    rgb = rgb.astype(jnp.float32)
    return extend_with_brown(fallback_mask(rgb, cfg), rgb, cfg)


def _grabcut_any(mask_np: np.ndarray, rgb_np: np.ndarray) -> Optional[np.ndarray]:
    """GrabCut refinement with backend selection via LEAF_GRABCUT:
    `auto` (default: cv2 when importable, else the on-device analog),
    `device` (JAX GMM+ICM, no cv2 import), `cv2`, or `off`."""
    import os

    mode = os.environ.get("LEAF_GRABCUT", "auto")
    if mode == "off":
        return None
    if mode in ("auto", "cv2"):
        refined = _grabcut_refine_host(mask_np, rgb_np)
        if refined is not None or mode == "cv2":
            return refined
    from leaffliction_tpu.segment.grabcut import grabcut_refine

    dev = grabcut_refine(jnp.asarray(rgb_np, jnp.float32),
                         jnp.asarray(mask_np > 0))
    return (np.asarray(dev) > 0).astype(np.uint8) * 255


def _grabcut_refine_host(mask_np: np.ndarray, rgb_np: np.ndarray) -> Optional[np.ndarray]:
    """cv2.grabCut refinement (`mask.py:307-332`) — host-side, viz path only."""
    try:
        import cv2
    except ImportError:
        return None
    try:
        h, w = mask_np.shape
        gc_mask = np.zeros((h, w), np.uint8)
        gc_mask[mask_np > 0] = cv2.GC_PR_FGD
        gc_mask[mask_np == 0] = cv2.GC_BGD
        bgd = np.zeros((1, 65), np.float64)
        fgd = np.zeros((1, 65), np.float64)
        cv2.grabCut(rgb_np.astype(np.uint8), gc_mask, None, bgd, fgd, 1,
                    cv2.GC_INIT_WITH_MASK)
        return (((gc_mask == cv2.GC_FGD) | (gc_mask == cv2.GC_PR_FGD))
                .astype(np.uint8) * 255)
    except Exception:
        return None


def make_mask(rgb: np.ndarray, cfg: TransformConfig | None = None
              ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Host-facing mask builder, reference signature: → (mask u8 0/255,
    contour Nx1x2 int32 or None). Handles the optional upscale
    (`mask.py:29-50`) and GrabCut refinement."""
    from leaffliction_tpu.segment.contours import largest_contour_points

    cfg = cfg or TransformConfig()
    oh, ow = rgb.shape[:2]

    s = 1.0
    if cfg.mask_upscale_factor and cfg.mask_upscale_factor > 1.0:
        s = float(cfg.mask_upscale_factor)
    elif cfg.mask_upscale_long_side and cfg.mask_upscale_long_side > 0:
        ls = max(oh, ow)
        if ls < cfg.mask_upscale_long_side:
            s = cfg.mask_upscale_long_side / ls
    if abs(s - 1.0) > 1e-6:
        work = np.asarray(jax.image.resize(
            jnp.asarray(rgb, jnp.float32),
            (int(round(oh * s)), int(round(ow * s)), 3), "cubic"))
    else:
        work = np.asarray(rgb, np.float32)

    mask_dev, score = make_mask_core(jnp.asarray(work), cfg)
    mask_np = (np.asarray(mask_dev) > 0).astype(np.uint8) * 255

    if cfg.grabcut_refine:
        refined = _grabcut_any(mask_np, work)
        if refined is not None and refined.any():
            m2 = postprocess_mask(jnp.asarray(refined > 0), cfg)
            sc2 = float(score_mask(m2, jnp.asarray(work), cfg))
            if sc2 >= float(score):
                mask_np = (np.asarray(m2) > 0).astype(np.uint8) * 255

    if abs(s - 1.0) > 1e-6:
        mask_np = np.asarray(
            jax.image.resize(jnp.asarray(mask_np, jnp.float32), (oh, ow),
                             "nearest")).astype(np.uint8)
        mask_np = (mask_np > 127).astype(np.uint8) * 255

    contour = largest_contour_points(mask_np > 0)
    return mask_np, contour


@partial(jax.jit, static_argnames=("cfg",))
def _make_mask_batch_main(imgs: Array, cfg: TransformConfig):
    return jax.vmap(lambda x: _make_mask_no_fallback(x, cfg))(imgs)


@partial(jax.jit, static_argnames=("cfg",))
def _extend_batch(masks: Array, imgs: Array, cfg: TransformConfig) -> Array:
    return jax.vmap(
        lambda m, x: extend_with_brown(m, x.astype(jnp.float32), cfg)
    )(masks, imgs)


def make_mask_batch_async(imgs: Array, cfg: TransformConfig
                          ) -> Tuple[Array, Array]:
    """Dispatch-only batched masks: → (masks_dev, scores_dev), NO host sync.

    Callers processing many chunks should dispatch them all first and
    finalize afterwards (`finalize_mask_batch`), so each chunk's
    host→device transfer overlaps the previous chunk's compute. Images may
    be uint8 (preferred: 4x less transfer than float32; the cast happens
    on device)."""
    masks, scores = _make_mask_batch_main(imgs, cfg)
    extended = _extend_batch(masks, imgs, cfg)
    return extended, scores


def finalize_mask_batch(imgs: Array, extended: Array, scores: Array,
                        cfg: TransformConfig) -> Array:
    """Resolve the (rare) zero-score failures with the Otsu fallback.

    The fallback is deferred OUT of the vmapped program: under vmap a
    `lax.cond` executes both branches for every image, so the failure path
    would cost ~20% of every batch. Failures are detected from the scores
    and re-run per image instead."""
    failed = np.nonzero(np.asarray(jax.device_get(scores)) <= 0.0)[0]
    for i in failed:
        extended = extended.at[int(i)].set(
            _fallback_extend_core(imgs[int(i)], cfg))
    return extended


def make_mask_batch(imgs: Array, cfg: TransformConfig) -> Tuple[Array, Array]:
    """Batched masks for the training/serving hot path (no host refinement):
    N×H×W×3 (uint8 or float) → (N×H×W bool, N scores)."""
    extended, scores = make_mask_batch_async(imgs, cfg)
    return finalize_mask_batch(imgs, extended, scores, cfg), scores


def apply_mask_white(img: Array, mask: Array) -> Array:
    """Background → white (reference `apply_mask` 'white',
    `srcs/utils/mask_utils.py:10-83`)."""
    m = mask[..., None].astype(jnp.bool_)
    return jnp.where(m, img.astype(jnp.float32), 255.0)


def apply_mask_black(img: Array, mask: Array) -> Array:
    m = mask[..., None].astype(jnp.bool_)
    return jnp.where(m, img.astype(jnp.float32), 0.0)


def make_mask_single(img: Array) -> Tuple[Array, Array]:
    """Back-compat simple entry (predict montage): default config, no host
    refinement."""
    return make_mask_core(img, TransformConfig(grabcut_refine=False))
