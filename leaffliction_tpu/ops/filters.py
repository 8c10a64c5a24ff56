"""Convolution-based image filters: Gaussian blur, Sobel, Canny, corners.

On-device replacements for the cv2 calls in the reference filter stack
(`srcs/transform/filters/blur.py:30-72`, `mask.py:680-689`,
`landmarks.py:92-125`). Separable convolutions via lax.conv with NHWC layout;
Canny follows cv2's structure (Gaussian → Sobel → direction-quantized NMS →
double threshold → hysteresis by iterative dilation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel: sigma<=0 → 0.3*((ksize-1)*0.5 - 1) + 0.8."""
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2.0
    k = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _sep_conv2d(img: Array, kx: np.ndarray, ky: np.ndarray) -> Array:
    """Separable 2D convolution with reflect-101 padding (cv2 default border)."""
    x = img.astype(jnp.float32)
    squeeze = x.ndim == 2
    if squeeze:
        x = x[..., None]
    px = len(kx) // 2
    py = len(ky) // 2
    x = jnp.pad(x, ((py, py), (px, px), (0, 0)), mode="reflect")
    # rows then cols via depthwise conv
    c = x.shape[-1]
    x4 = x[None]  # NHWC
    # depthwise kernels: HWIO with I=1 per group, O=c groups
    ky_f = jnp.asarray(ky).reshape(-1, 1, 1, 1) * jnp.ones((1, 1, 1, c))
    kx_f = jnp.asarray(kx).reshape(1, -1, 1, 1) * jnp.ones((1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x4.shape, ky_f.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x4, ky_f, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c)
    out = jax.lax.conv_general_dilated(
        out, kx_f, (1, 1), "VALID", dimension_numbers=dn,
        feature_group_count=c)
    out = out[0]
    return out[..., 0] if squeeze else out


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: Array, ksize: int = 5, sigma: float = 0.0) -> Array:
    """cv2.GaussianBlur equivalent (reflect-101 border)."""
    k = _gaussian_kernel_1d(ksize, sigma)
    return _sep_conv2d(img, k, k)


_SOBEL_D = np.array([-1.0, 0.0, 1.0], np.float32)
_SOBEL_S = np.array([1.0, 2.0, 1.0], np.float32)


@jax.jit
def sobel_xy(gray: Array):
    """cv2.Sobel ksize=3 x/y gradients (reflect-101 border)."""
    gx = _sep_conv2d(gray, _SOBEL_D, _SOBEL_S)
    gy = _sep_conv2d(gray, _SOBEL_S, _SOBEL_D)
    return gx, gy


@jax.jit
def sobel_magnitude(gray: Array) -> Array:
    gx, gy = sobel_xy(gray)
    return jnp.sqrt(gx * gx + gy * gy)


def quantize_gradient_sector(gx: Array, gy: Array) -> Array:
    """Gradient orientation quantized to {0°, 45°, 90°, 135°} sectors via
    ratio comparisons (atan2-free: also usable inside Pallas kernels).

    tan(22.5°) and tan(67.5°) bound the diagonal band; the sign of gx·gy
    distinguishes 45° from 135°.
    """
    ax = jnp.abs(gx)
    ay = jnp.abs(gy)
    t1 = 0.41421356  # tan(22.5°)
    t2 = 2.41421356  # tan(67.5°)
    same_sign = (gx * gy) >= 0
    return jnp.where(
        ay <= t1 * ax, 0,
        jnp.where(ay > t2 * ax, 2, jnp.where(same_sign, 1, 3)),
    ).astype(jnp.int32)


def normalize_minmax(x: Array, lo: float = 0.0, hi: float = 255.0) -> Array:
    """cv2.normalize(NORM_MINMAX) equivalent."""
    mn = jnp.min(x)
    mx = jnp.max(x)
    scale = (hi - lo) / jnp.maximum(mx - mn, 1e-12)
    return jnp.where(mx > mn, (x - mn) * scale + lo, jnp.zeros_like(x) + lo)


def _edge_nms_jnp(gray: Array, l2: bool) -> Array:
    """NMS gradient magnitude — jnp reference path (reflect borders)."""
    g = gaussian_blur(gray.astype(jnp.float32), 5, 1.4)
    gx, gy = sobel_xy(g)
    if l2:
        mag = jnp.sqrt(gx * gx + gy * gy)
    else:
        mag = jnp.abs(gx) + jnp.abs(gy)

    sector = quantize_gradient_sector(gx, gy)

    def shift(m, dy, dx):
        return jnp.roll(jnp.roll(m, dy, axis=0), dx, axis=1)

    n0a, n0b = shift(mag, 0, 1), shift(mag, 0, -1)      # 0°: left/right
    n1a, n1b = shift(mag, -1, 1), shift(mag, 1, -1)     # 45°
    n2a, n2b = shift(mag, 1, 0), shift(mag, -1, 0)      # 90°: up/down
    n3a, n3b = shift(mag, 1, 1), shift(mag, -1, -1)     # 135°
    na = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3],
                    [n0a, n1a, n2a, n3a])
    nb = jnp.select([sector == 0, sector == 1, sector == 2, sector == 3],
                    [n0b, n1b, n2b, n3b])
    is_max = (mag >= na) & (mag >= nb)
    return jnp.where(is_max, mag, 0.0)


@partial(jax.jit,
         static_argnames=("low", "high", "l2", "hysteresis", "hysteresis_iters"))
def canny(gray: Array, low: float = 50.0, high: float = 150.0,
          l2: bool = False, hysteresis: bool = True,
          hysteresis_iters: int = 0) -> Array:
    """cv2.Canny-style edges (bool mask).

    Gaussian 5x5 → Sobel → magnitude (L1 by default, like cv2) →
    direction-quantized non-maximum suppression → double threshold →
    hysteresis via fixpoint dilation (early exit on convergence;
    `hysteresis_iters=0` means exact — the internal h·w bound always
    reaches the fixpoint since each non-final round grows the kept set by
    at least one of the h·w pixels; a nonzero value caps the rounds). On
    TPU the Gauss/Sobel/NMS front-end
    runs as one fused Pallas VMEM kernel (`ops/pallas/edge.py`); elsewhere
    the jnp path is used (borders differ within a ≤4 px margin).

    `hysteresis=False` skips the chain-connectivity pass and returns the NMS
    low-threshold edges directly — much cheaper, for callers that only use
    edges as a dilated soft hint (the mask-candidate strategies).
    """
    if jax.default_backend() == "tpu":
        from leaffliction_tpu.ops.pallas.edge import edge_nms_batch

        nms = edge_nms_batch(gray[None], l2=l2)[0]
    else:
        nms = _edge_nms_jnp(gray, l2)

    if not hysteresis:
        return nms > low

    return hysteresis_flood(nms > high, nms > low, hysteresis_iters)


@partial(jax.jit, static_argnames=("iters",))
def hysteresis_flood(strong: Array, weak: Array, iters: int = 0) -> Array:
    """Keep the weak pixels 8-connected to a strong pixel. Fixpoint
    flood: grow `strong` by one 3x3 dilation per round inside `weak`,
    stop when a round changes nothing. Exact (same result as component
    labeling, which this replaced: the labels' scatter/gather table cost
    113 ms vs 33 ms per batch-64 @224 on v5e), and early exit makes the
    typical image converge in far fewer rounds. `iters=0` bounds the loop
    at h·w — NOT h+w: a serpentine weak chain can be ~h·w pixels long and
    each round advances the flood only one pixel along it. The while
    loop's convergence exit keeps typical cost unchanged; the bound only
    guarantees termination."""
    h, w = weak.shape[-2], weak.shape[-1]
    cap = iters if iters else h * w

    def cond(state):
        i, s, changed = state
        return changed & (i < cap)

    def body(state):
        i, s, _ = state
        grown = weak & jax.lax.reduce_window(
            s, False, jax.lax.bitwise_or, (3, 3), (1, 1), "SAME")
        return i + 1, grown, jnp.any(grown != s)

    _, out, _ = jax.lax.while_loop(cond, body, (0, strong, jnp.bool_(True)))
    return out


@partial(jax.jit, static_argnames=("max_corners", "min_distance", "block_size"))
def good_features_to_track(
    gray: Array,
    mask: Array,
    max_corners: int = 64,
    quality_level: float = 0.01,
    min_distance: int = 5,
    block_size: int = 3,
):
    """Shi-Tomasi corners (cv2.goodFeaturesToTrack equivalent).

    → (ys, xs, valid): fixed-size top-k arrays; `valid` marks entries above
    quality_level·max and inside `mask`. NMS via max-pool over min_distance.
    """
    g = gray.astype(jnp.float32)
    gx, gy = sobel_xy(g)
    k = np.ones((block_size,), np.float32)
    ixx = _sep_conv2d(gx * gx, k, k)
    iyy = _sep_conv2d(gy * gy, k, k)
    ixy = _sep_conv2d(gx * gy, k, k)
    # min eigenvalue of [[ixx, ixy], [ixy, iyy]]
    tr = ixx + iyy
    det_term = jnp.sqrt(jnp.maximum((ixx - iyy) ** 2 + 4 * ixy * ixy, 0.0))
    min_eig = 0.5 * (tr - det_term)
    min_eig = jnp.where(mask.astype(jnp.bool_), min_eig, 0.0)

    # NMS: keep local maxima over a (2r+1)² window
    r = max(min_distance, 1)
    pooled = jax.lax.reduce_window(
        min_eig, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1),
        [(r, r), (r, r)]
    )
    peak = (min_eig >= pooled) & (min_eig > 0)
    qual_thresh = quality_level * jnp.max(min_eig)
    cand = jnp.where(peak & (min_eig >= qual_thresh), min_eig, -jnp.inf)

    flat = cand.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_corners)
    w = gray.shape[-1]
    ys = idx // w
    xs = idx % w
    valid = jnp.isfinite(vals) & (vals > 0)
    return ys, xs, valid
