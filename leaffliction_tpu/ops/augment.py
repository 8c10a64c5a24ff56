"""The six dataset-balancing augmentation ops as batched on-device kernels.

TPU-native rebuild of `ImageAugmenter` (`srcs/preprocessing/image_augmenter.py:12-133`),
which runs one PIL decode→transform→encode per *process-pool task*. Here each
op is a jitted, vmapped batch kernel over uint8 NHWC tensors with one
`jax.random` key per image (counter-based `fold_in` per task id preserves the
reference's per-task seeding semantics, `dataset_balancer.py:127`).

Semantics per op (reference lines):
- flip (:20-31): horizontal/vertical coin flip;
- rotate (:33-42): U(-30°,30°), `expand=True` white fill — batched into the
  static max-expansion canvas; the host crops to each image's exact
  PIL-expanded size (`pil_expanded_size`);
- skew (:44-71): PIL PERSPECTIVE with coeffs [1+s,0,-s·w, 0,1+s,-s·h, 0,0],
  s ∈ U(0.05,0.15), black fill;
- shear (:73-94): PIL AFFINE [1,s,0,0,1,0] or [1,0,0,s,1,0] (origin-anchored),
  s ∈ U(-0.2,0.2), coin-flip direction, black fill;
- crop (:96-114): ratio U(0.8,0.95), uniform corner, resize back (bilinear
  here vs LANCZOS — tolerance-level parity);
- distortion (:116-133): additive N(0,5) noise + autocontrast with
  cutoff U(0,2)%. (The reference's uint8 cast of signed noise wraps negatives
  to 250+ and its uint8+uint8 add overflows; the default implements the
  evident intent — clipped additive noise — while LEAF_STRICT_DISTORTION=1
  reproduces the exact wraparound arithmetic via `wrap_noise_u8`, golden-
  tested byte-for-byte against the NumPy semantics.)

Interpolation matches the reference ops: 4-tap Keys bicubic for skew/shear
(PIL BICUBIC), 6-tap lanczos3 for crop's resize-back (PIL LANCZOS), bilinear
for rotate (PIL rotate defaults to NEAREST; bilinear is the smoother
superset). Golden tests compare against PIL within tolerance.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from leaffliction_tpu.ops.photometric import (
    autocontrast,
    autocontrast_u8_exact,
)
from leaffliction_tpu.ops.resample import (
    rotate_warp,
    scale_translate_warp,
    shear_warp,
)

Array = jax.Array

AUG_OPS = ("flip", "rotate", "skew", "shear", "crop", "distortion")

# Parameter bounds shared by the device kernels below AND the host-pool
# backend's batched draw (`data/host_augment.draw_params_batch`): one
# definition so the two executors of a task plan can never silently desync
# (reference bounds: `srcs/preprocessing/image_augmenter.py:33-133`).
MAX_ROTATE_DEG = 30.0
SKEW_RANGE = (0.05, 0.15)
SHEAR_MAX = 0.2
CROP_RATIO_RANGE = (0.8, 0.95)
CUTOFF_MAX = 2.0
NOISE_STD = 5.0


def rotate_canvas_hw(h: int, w: int) -> Tuple[int, int]:
    """Static canvas covering any rotation up to ±30° with expand=True.

    The canvas must hold every intermediate of the 3-shear decomposition,
    not just the final bounding box: the centered INPUT itself (taller or
    wider than the rotated box for extreme aspect ratios) and the
    first row-shear's extent `w + tan(15°)·h` (a parallelogram whose
    corners stick out past both the input and the output box). For
    square-ish images both extra terms are dominated by the output box,
    so the hot-path canvas is unchanged; a 16×400 strip (where the old
    bounding-box-only canvas was narrower than the input and placement
    crashed) gets the wider canvas it needs. Vertical extents never
    exceed max(h, rotated height): the column shear maps content straight
    to its final rows."""
    c = math.cos(math.radians(MAX_ROTATE_DEG))
    s = math.sin(math.radians(MAX_ROTATE_DEG))
    t = math.tan(math.radians(MAX_ROTATE_DEG) / 2.0)
    oh = max(h, math.ceil(h * c + w * s))
    ow = max(w, math.ceil(w + t * h), math.ceil(w * c + h * s))
    return (oh, ow)


def pil_expanded_size(angle_deg: float, w: int, h: int) -> Tuple[int, int]:
    """Exact PIL rotate(expand=True) output size — replicates
    PIL.Image.rotate's matrix build (center translation included before
    ceil/floor, cos/sin rounded to 15 decimals) so sizes match to the pixel."""
    angle = -math.radians(angle_deg % 360.0)
    m = [
        round(math.cos(angle), 15), round(math.sin(angle), 15), 0.0,
        round(-math.sin(angle), 15), round(math.cos(angle), 15), 0.0,
    ]

    def transform(x: float, y: float) -> Tuple[float, float]:
        return m[0] * x + m[1] * y + m[2], m[3] * x + m[4] * y + m[5]

    cx, cy = w / 2.0, h / 2.0
    m[2], m[5] = transform(-cx, -cy)
    m[2] += cx
    m[5] += cy
    xx, yy = [], []
    for x, y in ((0, 0), (w, 0), (w, h), (0, h)):
        tx, ty = transform(x, y)
        xx.append(tx)
        yy.append(ty)
    nw = math.ceil(max(xx)) - math.floor(min(xx))
    nh = math.ceil(max(yy)) - math.floor(min(yy))
    return nw, nh


# --- per-image kernels (vmapped below) ------------------------------------


def _flip_one(key: Array, img: Array) -> Array:
    horizontal = jax.random.bernoulli(key)
    return jnp.where(horizontal, img[:, ::-1, :], img[::-1, :, :])


def _rotate_one(key: Array, img: Array, canvas: Tuple[int, int]) -> Tuple[Array, Array]:
    angle = jax.random.uniform(key, (), jnp.float32,
                               -MAX_ROTATE_DEG, MAX_ROTATE_DEG)
    out = rotate_warp(img, angle, canvas, fill=255.0)
    return out, angle


def _use_pallas_warps() -> bool:
    """Pallas barrel-shift warps (rotate/shear) on TPU — the matmul path is
    MXU-starved at C=3. Env LEAF_PALLAS_WARPS=0/1 (legacy alias
    LEAF_PALLAS_ROTATE) overrides."""
    import os

    flag = (os.environ.get("LEAF_PALLAS_WARPS")
            or os.environ.get("LEAF_PALLAS_ROTATE"))
    if flag is not None:
        return flag not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def _skew_one(key: Array, img: Array) -> Array:
    h, w = img.shape[0], img.shape[1]
    s = jax.random.uniform(key, (), jnp.float32, *SKEW_RANGE)
    # + 0.5·s: PIL transform applies coefficients at pixel centers
    # (src = A·(out + 0.5) − 0.5); bicubic = the reference's Image.BICUBIC
    return scale_translate_warp(
        img, jnp.stack([1.0 + s, 1.0 + s]),
        jnp.stack([-s * w + 0.5 * s, -s * h + 0.5 * s]),
        (h, w), fill=0.0, kernel="bicubic")


def _shear_one(key: Array, img: Array) -> Array:
    k_dir, k_s = jax.random.split(key)
    h, w = img.shape[0], img.shape[1]
    s = jax.random.uniform(k_s, (), jnp.float32, -SHEAR_MAX, SHEAR_MAX)
    horizontal = jax.random.bernoulli(k_dir)
    return shear_warp(img, s, horizontal, (h, w), fill=0.0,
                      kernel="bicubic", half_px=True)


def _crop_one(key: Array, img: Array) -> Array:
    k_ratio, k_left, k_top = jax.random.split(key, 3)
    h, w = img.shape[0], img.shape[1]
    ratio = jax.random.uniform(k_ratio, (), jnp.float32, *CROP_RATIO_RANGE)
    new_w = jnp.floor(w * ratio)
    new_h = jnp.floor(h * ratio)
    left = jnp.floor(jax.random.uniform(k_left, ()) * (w - new_w + 1.0))
    top = jnp.floor(jax.random.uniform(k_top, ()) * (h - new_h + 1.0))
    # PIL resize pixel-center mapping: src = (dst + 0.5) * scale - 0.5 + origin
    ax = new_w / w
    ay = new_h / h
    # lanczos3 matches the reference's LANCZOS resize-back
    # (`image_augmenter.py:96-114`); edge-clamp (fill=None) semantics
    return scale_translate_warp(
        img, jnp.stack([ax, ay]),
        jnp.stack([left + 0.5 * ax - 0.5, top + 0.5 * ay - 0.5]),
        (h, w), fill=None, kernel="lanczos3")


def _noise(key: Array, shape: Tuple[int, ...]) -> Array:
    """N(0,1) noise drawn at float16 width, returned as float32.

    The noise draw is 77% of the distortion op's cost (measured 0.62 of
    0.77 ms/batch-128 @224²), and nearly all of that is threefry bits: a
    16-bit draw halves the blocks (JAX consumes one uint32 per TWO f16
    normals) for 0.62 → 0.38 ms. f16's 10-bit mantissa still yields 1024
    distinct normals (≈0.04-grey steps on the 5σ noise) — far below
    visibility on uint8 pixels, and the distortion contract is
    distributional, not byte-pinned (the strict-wrap golden test pins the
    wrap *arithmetic* given a noise array, not the draw)."""
    return jax.random.normal(key, shape, jnp.float16).astype(jnp.float32)


def _acklam_ndtri(p: "np.ndarray") -> "np.ndarray":
    """Inverse normal CDF in float64 (Acklam's rational approximation,
    |relative error| < 1.15e-9 — far below f32 table resolution). Used
    once at import-first-use to build the strict noise table; pure NumPy
    so the table bytes are identical on every host and backend."""
    import numpy as np

    p = np.asarray(p, np.float64)
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    lo, hi = 0.02425, 1.0 - 0.02425
    out = np.empty_like(p)
    m = p < lo
    q = np.sqrt(-2.0 * np.log(np.where(m, p, 0.5)))
    out_lo = (((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
              + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q
                         + 1.0)
    m_hi = p > hi
    q = np.sqrt(-2.0 * np.log(np.where(m_hi, 1.0 - p, 0.5)))
    out_hi = -(((((c[0] * q + c[1]) * q + c[2]) * q + c[3]) * q + c[4]) * q
               + c[5]) / ((((d[0] * q + d[1]) * q + d[2]) * q + d[3]) * q
                          + 1.0)
    q = p - 0.5
    r = q * q
    out_mid = ((((((a[0] * r + a[1]) * r + a[2]) * r + a[3]) * r + a[4]) * r
                + a[5]) * q
               / (((((b[0] * r + b[1]) * r + b[2]) * r + b[3]) * r + b[4])
                  * r + 1.0))
    out = np.where(m, out_lo, np.where(m_hi, out_hi, out_mid))
    return out


_STRICT_NOISE_BITS = 11  # 2048 quantiles ≈ the f16 draw's granularity
_strict_noise_table = None


def _get_strict_noise_table():
    # cached as NumPy (a jnp constant created under trace would leak the
    # tracer); jnp.asarray below is free after the first constant-fold
    global _strict_noise_table
    if _strict_noise_table is None:
        import numpy as np

        n = 1 << _STRICT_NOISE_BITS
        q = (np.arange(n, dtype=np.float64) + 0.5) / n
        _strict_noise_table = _acklam_ndtri(q).astype(np.float32)
    return jnp.asarray(_strict_noise_table)


def _noise_strict(key: Array, shape: Tuple[int, ...]) -> Array:
    """N(0,1) noise that is BIT-IDENTICAL on every backend.

    `jax.random.normal` routes uniform bits through `erfinv`, whose f16/f32
    rounding differs between the CPU and TPU lowerings (~0.7% of draws off
    by one ulp — enough to flip a grey level after ×σ and wrap). The strict
    distortion contract is byte equality between the device balancer (TPU)
    and the host pool (jax-CPU), so the strict draw avoids transcendentals
    entirely: threefry bits (a pure integer cipher, identical everywhere)
    index a precomputed 2048-entry inverse-CDF table (f64 Acklam → f32
    constant). Gather + integer shifts carry no rounding, so the bytes
    match across backends by construction. 2048 quantiles ≈ the f16
    granularity of the fast path's draw; the tails truncate at ±3.48σ
    (±17.4 greys at σ=5 — indistinguishable on uint8 pixels)."""
    bits = jax.random.bits(key, shape, jnp.uint16)
    idx = (bits >> (16 - _STRICT_NOISE_BITS)).astype(jnp.int32)
    return jnp.take(_get_strict_noise_table(), idx)


def _distortion_one(key: Array, img: Array) -> Array:
    k_noise, k_cut = jax.random.split(key)
    x = img.astype(jnp.float32)
    x = jnp.clip(x + NOISE_STD * _noise(k_noise, x.shape), 0.0, 255.0)
    cutoff = jax.random.uniform(k_cut, (), jnp.float32, 0.0, CUTOFF_MAX)
    return autocontrast(x, cutoff)


def wrap_noise_u8(img_u8: Array, noise: Array) -> Array:
    """The reference's exact noise arithmetic, byte-for-byte
    (`srcs/preprocessing/image_augmenter.py:121-124`): the float noise is
    cast to uint8 — a C-style truncation toward zero then mod-256 wrap, so
    -3.7 becomes 253 — and added to the uint8 image with uint8 overflow
    (the subsequent np.clip on an already-uint8 array is a no-op). For
    interior pixels adding 253 ≡ subtracting 3 mod 256, so negative noise
    still darkens; the delta vs clipping is only at the value boundaries,
    where a bright pixel wraps to black instead of saturating.
    → uint8."""
    n_i = noise.astype(jnp.int32)  # truncation toward zero, like the C cast
    return ((img_u8.astype(jnp.int32) + jnp.mod(n_i, 256)) % 256
            ).astype(jnp.uint8)


def _distortion_one_wrap(key: Array, img: Array) -> Array:
    """Strict-parity distortion: same key splits as `_distortion_one` but
    with the reference's uint8 wraparound instead of clipping, and every
    stage backend-bit-identical so the device balancer and the host pool
    produce the SAME bytes for a task: table noise (`_noise_strict`),
    integer wrap, and the exact-int autocontrast remap
    (`autocontrast_u8_exact`)."""
    k_noise, k_cut = jax.random.split(key)
    noise = NOISE_STD * _noise_strict(k_noise, img.shape)
    wrapped = wrap_noise_u8(img, noise)
    cutoff = jax.random.uniform(k_cut, (), jnp.float32, 0.0, CUTOFF_MAX)
    return autocontrast_u8_exact(wrapped, cutoff).astype(jnp.float32)


# --- batched entry points ---------------------------------------------------


def _to_u8(x: Array) -> Array:
    return jnp.clip(jnp.round(x), 0, 255).astype(jnp.uint8)


@jax.jit
def flip_batch(keys: Array, imgs: Array) -> Array:
    return jax.vmap(_flip_one)(keys, imgs)


def _rotate_vmem_bytes(canvas: Tuple[int, int], interleaved: bool) -> int:
    """Per-program VMEM footprint of the Pallas rotate (2 f32 scratch
    canvases + in/out blocks), for the kernel-variant choice below."""
    oh, ow = canvas
    ph = (oh + 7) // 8 * 8
    pw = (((3 * ow if interleaved else ow) + 127) // 128) * 128
    return 2 * ph * pw * 4 + ph * pw  # scratch A+B f32 + u8 out block


@jax.jit
def rotate_batch(keys: Array, imgs: Array) -> Tuple[Array, Array]:
    """→ (canvas-size batch, angles). Host crops with `pil_expanded_size`."""
    h, w = imgs.shape[1], imgs.shape[2]
    canvas = rotate_canvas_hw(h, w)
    if _use_pallas_warps():
        angles = jax.vmap(
            lambda k: jax.random.uniform(k, (), jnp.float32,
                                         -MAX_ROTATE_DEG, MAX_ROTATE_DEG)
        )(keys)
        # Interleaved-channel variant (one program per IMAGE, no
        # transposes; 2.05 vs 2.12 ms/batch-128 for per-channel at 224)
        # while its 3·W-lane scratch fits VMEM comfortably; at large
        # canvases (≥ ~448px inputs, ~12 MB of scratch at 512 vs the
        # ~16 MB budget) fall back to the per-channel kernel, whose
        # scratch grows 3x slower (~4.7 MB at 512).
        if _rotate_vmem_bytes(canvas, interleaved=True) <= 8 * 1024 * 1024:
            from leaffliction_tpu.ops.pallas.rotate import (
                rotate_batch_pallas_nhwc,
            )

            return rotate_batch_pallas_nhwc(
                imgs, angles, canvas, fill=255.0,
                max_angle_deg=MAX_ROTATE_DEG), angles
        from leaffliction_tpu.ops.pallas.rotate import rotate_batch_pallas

        return rotate_batch_pallas(imgs, angles, canvas, fill=255.0,
                                   max_angle_deg=MAX_ROTATE_DEG), angles
    out, angles = jax.vmap(lambda k, x: _rotate_one(k, x, canvas))(keys, imgs)
    return _to_u8(out), angles


@jax.jit
def skew_batch(keys: Array, imgs: Array) -> Array:
    return _to_u8(jax.vmap(_skew_one)(keys, imgs))


@jax.jit
def shear_batch(keys: Array, imgs: Array) -> Array:
    if _use_pallas_warps():
        from leaffliction_tpu.ops.pallas.rotate import shear_batch_pallas

        def draw(key):
            k_dir, k_s = jax.random.split(key)   # same stream as _shear_one
            s = jax.random.uniform(k_s, (), jnp.float32, -0.2, 0.2)
            return s, jax.random.bernoulli(k_dir)

        shears, horiz = jax.vmap(draw)(keys)
        return shear_batch_pallas(imgs, shears, horiz, fill=0.0)
    return _to_u8(jax.vmap(_shear_one)(keys, imgs))


@jax.jit
def crop_batch(keys: Array, imgs: Array) -> Array:
    return _to_u8(jax.vmap(_crop_one)(keys, imgs))


def _use_pallas_distortion() -> bool:
    """Opt-in (LEAF_PALLAS_DISTORT=1). Measured head-to-head with a chained
    device-resident loop the fused Pallas kernel runs 1.29 ms/batch-128 vs
    0.97 ms for the XLA path once autocontrast uses the binary-search
    quantiles — the Irwin-Hall PRNG passes cost more than XLA's fused
    threefry. Kept for hosts where the native per-core PRNG wins."""
    import os

    return os.environ.get("LEAF_PALLAS_DISTORT", "") not in ("", "0", "false")


def _strict_distortion_wrap() -> bool:
    """LEAF_STRICT_DISTORTION=1 selects the reference's exact uint8
    wraparound noise (`wrap_noise_u8`) instead of the default clipped
    noise — the last bit-level augmentation delta, off by default because
    wrapping a bright pixel to black is an evident bug in the reference."""
    import os

    return os.environ.get("LEAF_STRICT_DISTORTION", "") not in (
        "", "0", "false")


@jax.jit
def distortion_batch_wrap(keys: Array, imgs: Array) -> Array:
    """Strict-parity (uint8-wraparound) distortion batch."""
    return _to_u8(jax.vmap(_distortion_one_wrap)(keys, imgs))


@jax.jit
def distortion_batch(keys: Array, imgs: Array) -> Array:
    if _strict_distortion_wrap():
        return distortion_batch_wrap(keys, imgs)
    if _use_pallas_distortion() and imgs.shape[1] % 8 == 0:
        from leaffliction_tpu.ops.pallas.distortion import (
            distortion_batch_pallas,
        )

        def draw(key):
            k_noise, k_cut = jax.random.split(key)  # same stream split
            seeds = jax.random.bits(k_noise, (imgs.shape[-1],), jnp.uint32)
            cutoff = jax.random.uniform(k_cut, (), jnp.float32, 0.0,
                                        CUTOFF_MAX)
            return seeds.astype(jnp.int32), cutoff

        seeds, cutoffs = jax.vmap(draw)(keys)
        return distortion_batch_pallas(imgs, seeds, cutoffs)
    return _to_u8(jax.vmap(_distortion_one)(keys, imgs))


BATCH_KERNELS = {
    "flip": flip_batch,
    "rotate": rotate_batch,
    "skew": skew_batch,
    "shear": shear_batch,
    "crop": crop_batch,
    "distortion": distortion_batch,
}
