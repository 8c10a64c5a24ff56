"""MXU-native image resampling: warps as matmuls, not gathers.

The TPU's fast path is the systolic array, not scatter/gather. Bilinear
resampling along one axis is a matrix product with a 2-sparse triangle-kernel
weight matrix — and XLA fuses the on-the-fly weight construction into the
matmul tiles, so the [H, K, W] weight tensor never materializes. Measured on
a v5e chip: ~70x faster than `take_along_axis` gathers and ~35x faster than
the generic 2D-gather homography warp for a 128×224² batch.

General affine warps use the Catmull–Smith 2-pass decomposition: a horizontal
pass (per-row scale+offset along W) followed by a vertical pass (per-column
scale+offset along H). Valid while |a| is not tiny (rotations < ~60°, all
augmentation ops qualify); the generic gather warp in `ops/geometry.py`
remains the fallback for extreme angles / true perspective.

All entry points take the same output→input 3x3 matrix convention as
`ops/geometry.py`.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _tri(d: Array) -> Array:
    """Triangle (bilinear) kernel."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


_CUBIC_A = -0.5  # Keys cubic; PIL's BICUBIC uses a = -0.5


def _cubic(d: Array) -> Array:
    """4-tap Keys cubic (the PIL BICUBIC kernel,
    `/root/reference/srcs/preprocessing/image_augmenter.py:66-93` warps with
    Image.BICUBIC)."""
    a = _CUBIC_A
    ad = jnp.abs(d)
    ad2 = ad * ad
    ad3 = ad2 * ad
    near = (a + 2.0) * ad3 - (a + 3.0) * ad2 + 1.0
    far = a * (ad3 - 5.0 * ad2 + 8.0 * ad - 4.0)
    return jnp.where(ad <= 1.0, near, jnp.where(ad < 2.0, far, 0.0))


# Degree-10 Chebyshev-fit of sinc(d)·sinc(d/3) as a power-basis polynomial in
# u = d²/4.5 − 1 ∈ [−1, 1] (the kernel is even, so a poly in d² suffices; the
# affine shift keeps the basis conditioned for float32 Horner). Max abs error
# 2.9e-6 over [0, 3] — after the [K]-axis renormalization in `_weights` that
# is ≲0.005 grey levels on uint8 images, far inside the declared PIL parity
# tolerance (tests/test_bicubic_parity.py). Fit: numpy chebfit over 2e5
# samples, cheb2poly to power basis.
_LANCZOS3_POLY = (
    4.6278630530e-03, -2.2417496681e-02, 7.9319918942e-02, -2.3415820829e-01,
    4.9310521192e-01, -6.4119983731e-01, 3.3350401427e-01, 2.6843769037e-01,
    -4.3054831639e-01, 1.2933954330e-01, 1.9992452203e-02,
)  # highest degree first (Horner order)


def _lanczos3(d: Array) -> Array:
    """6-tap Lanczos (PIL LANCZOS, used by the reference's resize-back after
    crop, `image_augmenter.py:96-114`). sinc(d)·sinc(d/3) on |d| < 3.

    Evaluated as a degree-10 polynomial in d² (see `_LANCZOS3_POLY`): the
    weight build runs over the full per-image [K, out] grid before XLA fuses
    it into the matmul, so it is the VPU-bound part of the crop op. Ten FMAs
    beat even one `sin` (itself range-reduction + a longer polynomial), and
    the removable singularity at 0 needs no guard. Measured on the chained
    harness (b128@224): 1.39 ms/batch with two sins → 0.75 with the
    triple-angle identity → this form."""
    # clamp u into the fitted interval so the |d| ≥ 3 lanes (masked below)
    # can't overflow float32 at large d (u grows like d²; u¹⁰ would).
    u = jnp.minimum(d * d * (1.0 / 4.5) - 1.0, 1.0)
    acc = jnp.full_like(u, _LANCZOS3_POLY[0])
    for coef in _LANCZOS3_POLY[1:]:
        acc = acc * u + coef
    return jnp.where(jnp.abs(d) < 3.0, acc, 0.0)


_KERNELS = {"bilinear": _tri, "bicubic": _cubic, "lanczos3": _lanczos3}


def _weights(k: Array, pos: Array, kernel: str) -> Array:
    """Weight tensor kfn(k - pos); wide kernels are renormalized so taps
    dropped at the array boundary don't dim edge pixels (PIL clamps sample
    coordinates / normalizes precomputed weight rows — same effect).

    The weight tensor never materializes: XLA fuses the elementwise build
    (and the [K]-axis renormalization sum) into the matmul tiles, so a 4- or
    6-tap kernel costs the same matmul as the 2-tap one.
    """
    kfn = _KERNELS[kernel]
    w = kfn(k - pos)
    if kernel != "bilinear":
        w = w / jnp.maximum(jnp.sum(w, axis=_k_axis(k), keepdims=True), 1e-6)
    return w


def _k_axis(k: Array) -> int:
    """Axis along which `k` varies (the source-sample axis)."""
    for ax, s in enumerate(k.shape):
        if s > 1:
            return ax
    return 0


def _in_bounds(src: Array, upper: Array, kernel: str) -> Array:
    """Validity of a source position against [0, upper].

    PIL's geometric transforms sample where the half-pixel-shifted
    coordinate lies in [0, size), i.e. src ∈ [-0.5, upper + 0.5); inside
    that band but outside the array, sample coordinates clamp to the edge —
    which the renormalized wide kernels reproduce. The bilinear kernel does
    not renormalize, so it keeps the conservative [0, upper] band (outside
    taps would silently dim the result)."""
    if kernel == "bilinear":
        return (src >= 0.0) & (src <= upper)
    return (src >= -0.5) & (src < upper + 0.5)


def row_resample(
    img: Array, src_pos: Array, fill: float | None,
    kernel: str = "bilinear",
) -> Array:
    """Resample along the LAST axis (W): out[..., y, x] = img[..., y, src(y,x)].

    img: [H, K] or [H, K, C] float; src_pos: [H, W_out] source x-coordinates.
    `kernel`: bilinear (2-tap) | bicubic (4-tap Keys) | lanczos3 (6-tap).
    """
    k = jnp.arange(img.shape[-2] if img.ndim == 3 else img.shape[-1],
                   dtype=jnp.float32)
    if img.ndim == 2:
        w = _weights(k[None, :, None], src_pos[:, None, :], kernel)  # [H,K,W]
        out = jnp.einsum("hk,hkx->hx", img, w,
                         preferred_element_type=jnp.float32)
        inb = _in_bounds(src_pos, k[-1], kernel)
    else:
        w = _weights(k[None, :, None], src_pos[:, None, :], kernel)  # [H,K,W]
        out = jnp.einsum("hkc,hkx->hxc", img, w,
                         preferred_element_type=jnp.float32)
        inb = _in_bounds(src_pos, k[-1], kernel)[..., None]
    if fill is not None:
        out = jnp.where(inb, out, fill)
    else:
        # edge-clamp semantics: resample at clipped positions
        src_c = jnp.clip(src_pos, 0.0, k[-1])
        w = _weights(k[None, :, None], src_c[:, None, :], kernel)
        if img.ndim == 2:
            out = jnp.einsum("hk,hkx->hx", img, w,
                             preferred_element_type=jnp.float32)
        else:
            out = jnp.einsum("hkc,hkx->hxc", img, w,
                             preferred_element_type=jnp.float32)
    return out


def col_resample(
    img: Array, src_pos: Array, fill: float | None,
    kernel: str = "bilinear",
) -> Array:
    """Resample along the ROW axis (H): out[y, x] = img[src(x, y), x].

    img: [K, W] or [K, W, C]; src_pos: [W, H_out] source y-coordinates per
    output column.
    """
    k = jnp.arange(img.shape[0], dtype=jnp.float32)
    pos = src_pos if fill is not None else jnp.clip(src_pos, 0.0, k[-1])
    w = _weights(k[None, :, None], pos[:, None, :], kernel)    # [W, K, H_out]
    if img.ndim == 2:
        out = jnp.einsum("kx,xkz->zx", img, w,
                         preferred_element_type=jnp.float32)
        inb = _in_bounds(src_pos, k[-1], kernel)
        inb = inb.T
    else:
        out = jnp.einsum("kxc,xkz->zxc", img, w,
                         preferred_element_type=jnp.float32)
        inb = _in_bounds(src_pos, k[-1], kernel).T[..., None]
    if fill is not None:
        out = jnp.where(inb, out, fill)
    return out


@partial(jax.jit, static_argnames=("out_hw", "fill", "kernel", "half_px"))
def shear_warp(img: Array, shear: Array, horizontal: bool | Array,
               out_hw: Tuple[int, int], fill: float | None = 0.0,
               kernel: str = "bilinear", half_px: bool = False) -> Array:
    """Origin-anchored PIL shear ([1,s,0,0,1,0] / [1,0,0,s,1,0]) as one
    matmul pass. `horizontal` may be traced (both passes computed, selected).

    `half_px=True` applies the coefficients at pixel centers like PIL's
    `transform` (src = A·(out + 0.5) − 0.5 ⇒ an extra 0.5·s term), the
    convention of the reference's shear op (`image_augmenter.py:73-94`)."""
    out_h, out_w = out_hw
    x = img.astype(jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    s = jnp.asarray(shear, jnp.float32)
    c = 0.5 if half_px else 0.0

    src_x = xs[None, :] + s * (ys[:, None] + c)   # x_src = x + s·y
    out_h_pass = row_resample(x, src_x, fill, kernel)
    src_y = ys[None, :] + s * (xs[:, None] + c)   # y_src = s·x + y  → [W, H]
    out_v_pass = col_resample(x, src_y, fill, kernel)
    if isinstance(horizontal, bool):
        return out_h_pass if horizontal else out_v_pass
    return jnp.where(horizontal, out_h_pass, out_v_pass)


@partial(jax.jit, static_argnames=("out_hw", "fill", "kernel"))
def scale_translate_warp(img: Array, scale_xy: Array, offset_xy: Array,
                         out_hw: Tuple[int, int],
                         fill: float | None = None,
                         kernel: str = "bilinear") -> Array:
    """Axis-aligned affine (skew/crop ops): x_src = sx·x + ox, y_src = sy·y + oy.

    The source position depends only on the *output* coordinate, so each pass
    shares ONE [K, out] weight matrix across every row (unlike shear/rotate,
    whose shifts vary per row). Building it once turns the pass into a plain
    [rows·C, K] x [K, out] matmul at full MXU width — the per-row-weights
    einsum only lights up C=3 of the MXU's 128 result rows.
    """
    out_h, out_w = out_hw
    x = img.astype(jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    sx, sy = scale_xy[0], scale_xy[1]
    ox, oy = offset_xy[0], offset_xy[1]

    def shared_weights(src: Array, k_dim: int) -> Tuple[Array, Array]:
        k = jnp.arange(k_dim, dtype=jnp.float32)
        pos = src if fill is not None else jnp.clip(src, 0.0, k[-1])
        w = _weights(k[:, None], pos[None, :], kernel)   # [K, out]
        inb = _in_bounds(src, k[-1], kernel)
        return w, inb

    # vertical first (no column dependence)
    wy, inb_y = shared_weights(sy * ys + oy, x.shape[0])
    if x.ndim == 2:
        mid = jnp.einsum("kx,kz->zx", x, wy,
                         preferred_element_type=jnp.float32)
        mask_y = inb_y[:, None]
    else:
        mid = jnp.einsum("kxc,kz->zxc", x, wy,
                         preferred_element_type=jnp.float32)
        mask_y = inb_y[:, None, None]
    if fill is not None:
        mid = jnp.where(mask_y, mid, fill)

    wx, inb_x = shared_weights(sx * xs + ox, x.shape[1])
    if x.ndim == 2:
        out = jnp.einsum("hk,kx->hx", mid, wx,
                         preferred_element_type=jnp.float32)
        mask_x = inb_x[None, :]
    else:
        out = jnp.einsum("hkc,kx->hxc", mid, wx,
                         preferred_element_type=jnp.float32)
        mask_x = inb_x[None, :, None]
    if fill is not None:
        out = jnp.where(mask_x, out, fill)
    return out


@partial(jax.jit, static_argnames=("out_hw", "fill"))
def rotate_warp(img: Array, angle_deg: Array, out_hw: Tuple[int, int],
                fill: float | None = 255.0) -> Array:
    """Center rotation into a (possibly larger) canvas — Paeth 3-shear
    decomposition, each shear one matmul pass.

    rotate(θ) = shear_x(-tan(θ/2)) · shear_y(sin θ) · shear_x(-tan(θ/2)),
    all center-anchored on the output canvas.
    """
    out_h, out_w = out_hw
    in_h, in_w = img.shape[0], img.shape[1]
    x = img.astype(jnp.float32)
    theta = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    t = jnp.tan(theta / 2.0)
    s = jnp.sin(theta)

    # place into canvas center first (pad with fill)
    pad_y0 = (out_h - in_h) // 2
    pad_x0 = (out_w - in_w) // 2
    fill_v = 0.0 if fill is None else fill
    canvas = jnp.full((out_h, out_w) + x.shape[2:], fill_v, jnp.float32)
    canvas = jax.lax.dynamic_update_slice(
        canvas, x, (pad_y0, pad_x0) + (0,) * (x.ndim - 2))

    cy = (out_h - 1) / 2.0
    cx = (out_w - 1) / 2.0
    xs = jnp.arange(out_w, dtype=jnp.float32) - cx
    ys = jnp.arange(out_h, dtype=jnp.float32) - cy

    def shx(image, sh):
        src = (xs[None, :] + sh * ys[:, None]) + cx   # [H, W]
        return row_resample(image, src, fill)

    def shy(image, sh):
        src = (ys[None, :] + sh * xs[:, None]) + cy   # [W, H]
        return col_resample(image, src, fill)

    # composite inverse map Shx(-t)·Shy(s)·Shx(-t) = [[cosθ,-sinθ],[sinθ,cosθ]]
    # — matches geometry.rotation_matrix (PIL CCW convention).
    out = shx(canvas, -t)
    out = shy(out, s)
    out = shx(out, -t)
    return out
