"""Pallas TPU kernel: fused 3-shear rotation with the canvas resident in VMEM.

The matmul formulation of the Paeth rotation (`ops/resample.rotate_warp`) is
correct but MXU-starved: each shear pass is a batch of [C=3, K] x [K, W]
matmuls, so only 3 of the MXU's 128 result rows do work, and the three passes
round-trip the ~306² canvas through HBM twice. Measured at base shapes the
whole rotate costs ~18 ms per 128-image batch — the most expensive of the six
augmentation ops (`srcs/preprocessing/image_augmenter.py:33-42` is the
reference op being replaced).

This kernel exploits that a shear pass is a *pure per-row shift*: for
row y, `out[y, x] = in[y, x + s·(y - cy)]` — an integer shift plus a 2-tap
lerp, not a dense resample. Per image (one program per image and channel):

    canvas  <- white-fill, input placed centered        (VMEM scratch)
    pass 1  <- barrel-shift rows   by floor(-t·(y-cy)), lerp by frac
    pass 2  <- barrel-shift cols   by floor( s·(x-cx)), lerp by frac
    pass 3  <- barrel-shift rows   by floor(-t·(y-cy)), lerp by frac
    out     <- round/clip to uint8

The per-row (per-column) variable shift is done as a barrel shifter: 9
conditional `pltpu.roll` steps of 1, 2, ..., 256 lanes (sublanes), each
row/column selecting the rolled value when the corresponding bit of its
shift count is set. All three passes stay in VMEM — the only HBM traffic is
the uint8 input and output. Out-of-range sources are filled white *per pass*,
matching the einsum path's semantics exactly; circular wrap-around from the
rolls only ever lands on positions the validity mask fills anyway (max |shift|
~ 0.5·canvas/2 is smaller than the pad margin).

Numerics match `rotate_warp` to f32 rounding (same 2-tap triangle weights);
golden tests compare both against each other and against PIL.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128
_SUBLANE = 8


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split12(s: Array) -> Tuple[Array, Array]:
    """Split a small f32 scalar (|s| < 8) into a 12-bit head and tail so that
    products with integer-valued grids up to ~2^11 are exact (Dekker
    two-product without FMA). Pure arithmetic — no bitcasts."""
    hi = jnp.round(s * 4096.0) / 4096.0
    return hi, s - hi


def _scaled_positions(sh: Array, idx: Array, coord: Array,
                      upper: float) -> Tuple[Array, Array, Array]:
    """Source positions `coord + sh*idx` with double-precision-faithful
    boundary tests.

    A single f32 `coord + sh*idx` can flip the sign of a source position that
    truly sits within 1e-8 of an image edge (e.g. `1 + s*5` with s=-0.2),
    turning PIL's fill pixel into an edge sample or vice versa. Computing the
    product in exact 12-bit pieces makes the cancellation near each boundary
    exact, so the validity decision matches the reference's double math.

    Returns (pos, low_ok, high_ok) where pos ~= coord + sh*idx and
    low_ok/high_ok are sign-exact tests of pos >= 0 and pos <= upper (each
    bound evaluated with its own exact cancellation).
    """
    hi, lo = _split12(sh)
    p_hi = hi * idx                       # exact: 12-bit x 12-bit grid
    p_lo = lo * idx
    pos = (coord + p_hi) + p_lo           # cancellation near 0 is exact
    high = ((coord - upper) + p_hi) + p_lo  # cancellation near `upper` exact
    return pos, pos >= 0.0, high <= 0.0


def _cubic_w(d: Array) -> Array:
    """Keys cubic weight (a = -0.5, the PIL BICUBIC kernel) for |d| < 2."""
    a = -0.5
    ad = jnp.abs(d)
    ad2 = ad * ad
    ad3 = ad2 * ad
    near = (a + 2.0) * ad3 - (a + 3.0) * ad2 + 1.0
    far = a * (ad3 - 5.0 * ad2 + 8.0 * ad - 4.0)
    return jnp.where(ad <= 1.0, near, far)


def _shift_pass(x: Array, shift_per: Array, frac_per: Array, axis: int,
                low_ok: Array, high_ok: Array, fill: float | None,
                content_dim: int | None = None,
                max_shift: int | None = None) -> Array:
    """One shear pass over a VMEM-resident canvas.

    x: [H, W] f32. shift_per: int32 shifts (mod axis length), shaped [H, 1]
    for axis=1 (row shifts) or [1, W] for axis=0 (column shifts). frac_per:
    matching fractional lerp weights in [0, 1). low_ok/high_ok: [H, W]
    bool, True where the *real-valued* source position respects each
    canvas bound. `fill=None` selects edge-clamp semantics (out-of-range
    sources take the nearest canvas edge sample — matching the einsum
    path's clipped-position resample); a float fills out-of-range outputs
    with that constant. (Cubic interpolation lives in
    `_shear_slab_kernel`, whose per-image control sharing needs the taps
    split out of the pass anyway.)
    """
    dim = x.shape[axis]
    if fill is None:
        # content edge samples (NOT the padded edge), broadcast against the
        # out-of-range side; clamp mode requires content anchored at 0
        c = content_dim if content_dim is not None else dim
        edge_low = (x[0:1, :] if axis == 0 else x[:, 0:1])
        edge_high = (x[c - 1:c, :] if axis == 0 else x[:, c - 1:c])
    if max_shift is not None:
        # Bias trick: `shift_per` is RAW (possibly negative) and every
        # position whose true |shift| exceeds `max_shift` is covered by the
        # validity masks (its rolled value is never read), so clamp, add a
        # static bias to make shifts non-negative, pre-roll by the bias
        # (static rotate — no select), and barrel only over
        # ceil(log2(bias + max_shift + 1)) bits instead of log2(dim).
        bias = 1 << max(0, (max_shift).bit_length())
        shift_per = jnp.clip(shift_per, -max_shift, max_shift) + bias
        x = pltpu.roll(x, bias, axis)                 # out[i] = x[i - bias]
        n_bits = (bias + max_shift).bit_length()
    else:
        n_bits = max(1, math.ceil(math.log2(dim)))
    for b in range(n_bits):
        step = 1 << b
        if step >= dim:
            break
        bit_on = ((shift_per >> b) & 1) == 1
        rolled = pltpu.roll(x, (-step) % dim, axis)   # out[i] = x[i + step]
        x = jnp.where(bit_on, rolled, x)
    f = frac_per.astype(x.dtype)   # keep bf16 canvases in bf16 through lerp
    nxt = pltpu.roll(x, (-1) % dim, axis)
    # 2-tap triangle (bilinear) lerp: in[k] * (1-f) + in[k+1] * f
    out = x * (1.0 - f) + nxt * f
    if fill is None:
        return jnp.where(low_ok, jnp.where(high_ok, out, edge_high),
                         edge_low)
    return jnp.where(low_ok & high_ok, out, fill)


def _rotate_bounds(max_angle_deg, cy: float, cx: float,
                   ph: int, pw: int) -> Tuple[int | None, int | None]:
    """Static per-pass shift bounds for the barrel bias trick when the
    caller guarantees |angle| <= max_angle_deg: every row/column of the
    padded canvas has |shift| <= bound (the bound is taken over the FULL
    padded extent, so the clamp in `_shift_pass` never actually binds —
    it only shrinks the barrel to ceil(log2(bias+bound)) conditional
    rolls instead of log2(dim))."""
    if max_angle_deg is None:
        return None, None
    max_t = math.tan(math.radians(max_angle_deg) / 2.0)
    max_s = math.sin(math.radians(max_angle_deg))
    row_bound = int(math.ceil(max_t * max(cy, ph - 1 - cy))) + 1
    col_bound = int(math.ceil(max_s * max(cx, pw - 1 - cx))) + 1
    return row_bound, col_bound


def _rotate_kernel(angle_ref, img_ref, out_ref, a_ref, b_ref, *,
                   in_hw: Tuple[int, int], canvas_hw: Tuple[int, int],
                   fill: float, max_angle_deg: float | None = None):
    in_h, in_w = in_hw
    oh, ow = canvas_hw
    ph, pw = a_ref.shape  # padded scratch dims

    theta = angle_ref[pl.program_id(0)] * (math.pi / 180.0)
    t = -jnp.tan(theta / 2.0)   # row-pass shear coefficient
    s = jnp.sin(theta)          # column-pass shear coefficient
    cy = (oh - 1) / 2.0
    cx = (ow - 1) / 2.0
    row_bound, col_bound = _rotate_bounds(max_angle_deg, cy, cx, ph, pw)

    # place input centered on a white canvas (scratch A)
    pad_y0 = (oh - in_h) // 2
    pad_x0 = (ow - in_w) // 2
    a_ref[:] = jnp.full((ph, pw), fill, jnp.float32)
    # Mosaic has no direct u8<->f32 casts; hop through int32.
    a_ref[pad_y0:pad_y0 + in_h, pad_x0:pad_x0 + in_w] = (
        img_ref[0, 0].astype(jnp.int32).astype(jnp.float32))

    # tpu.iota is integer-only; build int32 and convert
    rows = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1).astype(jnp.float32)

    def row_pass(src: Array, sh: Array) -> Array:
        """out[y, x] = src[y, x + sh·(y - cy)] with white fill."""
        g = sh * (rows - cy)                      # [ph, 1] real shifts
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, rows - cy, cols, ow - 1.0)
        raw = k.astype(jnp.int32)
        return _shift_pass(src, raw if row_bound is not None else raw % pw,
                           g - k, 1, lo_ok, hi_ok, fill,
                           max_shift=row_bound)

    def col_pass(src: Array, sh: Array) -> Array:
        """out[y, x] = src[y + sh·(x - cx), x] with white fill."""
        g = sh * (cols - cx)                      # [1, pw]
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, cols - cx, rows, oh - 1.0)
        raw = k.astype(jnp.int32)
        return _shift_pass(src, raw if col_bound is not None else raw % ph,
                           g - k, 0, lo_ok, hi_ok, fill,
                           max_shift=col_bound)

    b_ref[:] = row_pass(a_ref[:], t)
    a_ref[:] = col_pass(b_ref[:], s)
    final = row_pass(a_ref[:], t)
    out_ref[0, 0] = (jnp.clip(jnp.round(final), 0.0, 255.0)
                     .astype(jnp.int32).astype(jnp.uint8))


def _shear_slab_kernel(shr_ref, shc_ref, img_ref, out_ref, a_ref, b_ref, *,
                       in_hw: Tuple[int, int], fill: float):
    """Origin-anchored PIL shear ([1,s,0,0,1,0] / [1,0,0,s,1,0]) as two
    barrel-shift passes with 4-tap Keys cubic interpolation (the reference
    shears with Image.BICUBIC, `image_augmenter.py:73-94`); the inactive
    direction's coefficient is zero, which makes that pass an exact
    identity (shift 0, frac 0, all taps in content → weights sum to 1).

    One program per IMAGE: the cubic controls (barrel select masks, tap
    validity masks, Keys weights, renormalizing denominator, boundary
    masks) depend only on the image's shear coefficients, so they are
    computed once and shared by the three channels — they are the
    majority of the cubic pass's per-element work.
    """
    in_h, in_w = in_hw
    ph, pw = a_ref.shape
    i = pl.program_id(0)
    sh_r = shr_ref[i]   # row-pass coefficient  (s when horizontal, else 0)
    sh_c = shc_ref[i]   # column-pass coefficient

    rows = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1).astype(jnp.float32)

    def controls(sh: Array, coord: Array, ortho: Array, size: int,
                 dim: int, axis: int):
        """Shared per-image controls for one cubic shear pass along `axis`
        (coord: the iota the shift scales with; ortho: the orthogonal
        iota; size: content extent along the pass)."""
        g = sh * (coord + 0.5)
        k = jnp.floor(g)
        f = g - k
        sh_mod = k.astype(jnp.int32) % dim
        n_bits = max(1, math.ceil(math.log2(dim)))
        bit_ons = [((sh_mod >> b) & 1) == 1
                   for b in range(n_bits) if (1 << b) < dim]
        # PIL `transform` convention: position in-bounds on the half-open
        # band src ∈ [-0.5, size - 0.5); sign-exact tests (white fill is
        # visible, unlike clamp)
        _, lo_ok, hi_ok = _scaled_positions(sh, coord + 0.5, ortho + 0.5,
                                            float(size))
        valid = lo_ok & hi_ok
        # 4-tap Keys weights with out-of-content taps dropped; tap
        # positions tested at floor + offset against [0, size-1]
        tap_f0 = ortho + k
        weights = []
        den = 0.0
        for off, wt in ((-1.0, _cubic_w(1.0 + f)), (0.0, _cubic_w(f)),
                        (1.0, _cubic_w(1.0 - f)), (2.0, _cubic_w(2.0 - f))):
            ok = ((tap_f0 + off >= 0.0)
                  & (tap_f0 + off <= size - 1.0)).astype(jnp.float32)
            wok = wt * ok
            weights.append(wok)
            den = den + wok
        den = jnp.where(jnp.abs(den) > 1e-6, den, 1.0)
        return bit_ons, weights, den, valid

    def cubic_pass(src: Array, bit_ons, weights, den, valid, axis: int):
        dim = src.shape[axis]
        x = src
        for b, bit_on in enumerate(bit_ons):
            rolled = pltpu.roll(x, (-(1 << b)) % dim, axis)
            x = jnp.where(bit_on, rolled, x)
        prev = pltpu.roll(x, 1, axis)
        nxt = pltpu.roll(x, (-1) % dim, axis)
        nxt2 = pltpu.roll(x, (-2) % dim, axis)
        num = (prev * weights[0] + x * weights[1]
               + nxt * weights[2] + nxt2 * weights[3])
        return jnp.where(valid, num / den, fill)

    r_ctl = controls(sh_r, rows, cols, in_w, pw, 1)
    c_ctl = controls(sh_c, cols, rows, in_h, ph, 0)

    for c3 in range(3):
        a_ref[:] = jnp.full((ph, pw), fill, jnp.float32)
        a_ref[0:in_h, 0:in_w] = (img_ref[0, c3].astype(jnp.int32)
                                 .astype(jnp.float32))
        b_ref[:] = cubic_pass(a_ref[:], *r_ctl, 1)
        final = cubic_pass(b_ref[:], *c_ctl, 0)
        out_ref[0, c3] = (jnp.clip(jnp.round(final), 0.0, 255.0)
                          .astype(jnp.int32).astype(jnp.uint8))


@partial(jax.jit, static_argnames=("fill", "interpret"))
def shear_batch_pallas(imgs: Array, shears: Array, horizontal: Array,
                       fill: float = 0.0, interpret: bool = False) -> Array:
    """Batched PIL-affine shear: uint8 NHWC [B, h, w, 3], per-image shear
    coefficients and direction flags → uint8 [B, h, w, 3].

    Matches `ops/resample.shear_warp` (which computes both passes and
    selects); here the direction is folded into the pass coefficients so
    both passes always run but the inactive one is an identity shift.
    """
    n, h, w, c = imgs.shape
    ph = _pad_to(h, _SUBLANE)
    pw = _pad_to(w, _LANE)
    horiz_f = horizontal.astype(jnp.float32)
    sh_rows = (shears * horiz_f).astype(jnp.float32).reshape(n)
    sh_cols = (shears * (1.0 - horiz_f)).astype(jnp.float32).reshape(n)
    nchw = jnp.transpose(imgs, (0, 3, 1, 2))

    out = pl.pallas_call(
        partial(_shear_slab_kernel, in_hw=(h, w), fill=fill),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, ph, pw), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, ph, pw), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((ph, pw), jnp.float32),
            pltpu.VMEM((ph, pw), jnp.float32),
        ],
        interpret=interpret,
    )(sh_rows, sh_cols, nchw)

    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))


def _shift_pass_lanes3(x: Array, shift_px: Array, frac_per: Array,
                       low_ok: Array, high_ok: Array, fill: float,
                       max_shift_px: int | None = None) -> Array:
    """Row shear pass over an INTERLEAVED-channel canvas [ph, 3·w lanes]:
    a shift of k pixels is a roll of 3k lanes, so all three channels move
    in one barrel pass. `shift_px` [ph, 1] int32 pixel shifts (raw).

    With a static `max_shift_px` bound the barrel runs over PIXEL bits
    with lane steps of 3·2^b after a static bias pre-roll — at 224px
    (3·306 → 1024 lanes) that is 7 conditional rolls instead of 10."""
    dim = x.shape[1]
    if max_shift_px is not None:
        bias = 1 << max(0, max_shift_px.bit_length())
        px = jnp.clip(shift_px, -max_shift_px, max_shift_px) + bias
        x = pltpu.roll(x, 3 * bias, 1)            # out[i] = x[i - 3·bias]
        n_bits = (bias + max_shift_px).bit_length()
        for b in range(n_bits):
            bit_on = ((px >> b) & 1) == 1
            rolled = pltpu.roll(x, (-(3 << b)) % dim, 1)
            x = jnp.where(bit_on, rolled, x)
    else:
        lanes = (shift_px * 3) % dim
        n_bits = max(1, math.ceil(math.log2(dim)))
        for b in range(n_bits):
            step = 1 << b
            if step >= dim:
                break
            bit_on = ((lanes >> b) & 1) == 1
            rolled = pltpu.roll(x, (-step) % dim, 1)
            x = jnp.where(bit_on, rolled, x)
    nxt = pltpu.roll(x, (-3) % dim, 1)     # next PIXEL = +3 lanes
    out = x * (1.0 - frac_per) + nxt * frac_per
    return jnp.where(low_ok & high_ok, out, fill)


def _rotate_nhwc_kernel(angle_ref, img_ref, out_ref, a_ref, b_ref, *,
                        in_hw: Tuple[int, int], canvas_hw: Tuple[int, int],
                        fill: float, max_angle_deg: float | None = None):
    """Expand-canvas rotation with channels interleaved in lanes — one
    program per IMAGE (vs per image-channel): per-pass trig/validity and
    the barrel control are computed once and move all 3 channels, and the
    caller needs no NHWC↔NCHW transposes."""
    in_h, in_w = in_hw
    oh, ow = canvas_hw
    ph, pw3 = a_ref.shape

    theta = angle_ref[pl.program_id(0)] * (math.pi / 180.0)
    t = -jnp.tan(theta / 2.0)
    s = jnp.sin(theta)
    cy = (oh - 1) / 2.0
    cx = (ow - 1) / 2.0
    # row bound in PIXELS over the padded row extent; col bound over the
    # padded pixel-column extent (pw3 lanes = pw3/3 pixel columns)
    row_bound, col_bound = _rotate_bounds(max_angle_deg, cy, cx,
                                          ph, pw3 // 3)

    pad_y0 = (oh - in_h) // 2
    pad_x0 = (ow - in_w) // 2
    a_ref[:] = jnp.full((ph, pw3), fill, jnp.float32)
    a_ref[pad_y0:pad_y0 + in_h, 3 * pad_x0:3 * (pad_x0 + in_w)] = (
        img_ref[0].astype(jnp.int32).astype(jnp.float32))

    rows = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0).astype(jnp.float32)
    xpix = (jax.lax.broadcasted_iota(jnp.int32, (1, pw3), 1) // 3
            ).astype(jnp.float32)

    def row_pass(src: Array, sh: Array) -> Array:
        g = sh * (rows - cy)                       # [ph, 1] pixel shifts
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, rows - cy, xpix, ow - 1.0)
        return _shift_pass_lanes3(src, k.astype(jnp.int32), g - k,
                                  lo_ok, hi_ok, fill,
                                  max_shift_px=row_bound)

    def col_pass(src: Array, sh: Array) -> Array:
        g = sh * (xpix - cx)                       # [1, pw3] row shifts
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, xpix - cx, rows, oh - 1.0)
        raw = k.astype(jnp.int32)
        return _shift_pass(src, raw if col_bound is not None else raw % ph,
                           g - k, 0, lo_ok, hi_ok, fill,
                           max_shift=col_bound)

    b_ref[:] = row_pass(a_ref[:], t)
    a_ref[:] = col_pass(b_ref[:], s)
    final = row_pass(a_ref[:], t)
    out_ref[0] = (jnp.clip(jnp.round(final), 0.0, 255.0)
                  .astype(jnp.int32).astype(jnp.uint8))


@partial(jax.jit, static_argnames=("canvas_hw", "fill", "max_angle_deg",
                                   "interpret"))
def rotate_batch_pallas_nhwc(imgs: Array, angles_deg: Array,
                             canvas_hw: Tuple[int, int], fill: float = 255.0,
                             max_angle_deg: float | None = None,
                             interpret: bool = False) -> Array:
    """Interleaved-channel variant of `rotate_batch_pallas`: same math,
    one program per image, no host-side transposes."""
    n, in_h, in_w, c = imgs.shape
    assert c == 3
    oh, ow = canvas_hw
    ph = _pad_to(oh, _SUBLANE)
    pw3 = _pad_to(3 * ow, _LANE)

    flat = imgs.reshape(n, in_h, in_w * 3)
    angles1d = angles_deg.astype(jnp.float32).reshape(n)

    out = pl.pallas_call(
        partial(_rotate_nhwc_kernel, in_hw=(in_h, in_w),
                canvas_hw=(oh, ow), fill=fill,
                max_angle_deg=max_angle_deg),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, in_h, in_w * 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ph, pw3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ph, pw3), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((ph, pw3), jnp.float32),
            pltpu.VMEM((ph, pw3), jnp.float32),
        ],
        interpret=interpret,
    )(angles1d, flat)

    return out[:, :oh, :3 * ow].reshape(n, oh, ow, 3)


def _rotate_clamp_kernel(angle_ref, img_ref, out_ref, a_ref, b_ref, *,
                         hw: Tuple[int, int]):
    """Same-canvas float rotation with edge-clamp fill — the in-graph
    training augmentation's rotate (Keras RandomRotation analog; see
    `ops/train_augment.py`). Content anchored at (0, 0); out-of-range
    source positions take the nearest content edge sample, matching
    `ops/resample.rotate_warp(fill=None)`'s clipped-position resample."""
    h, w = hw
    ph, pw = a_ref.shape

    theta = angle_ref[pl.program_id(0)] * (math.pi / 180.0)
    t = -jnp.tan(theta / 2.0)
    s = jnp.sin(theta)
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0

    a_ref[:] = jnp.zeros((ph, pw), jnp.float32)
    a_ref[0:h, 0:w] = img_ref[0, 0]

    rows = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1).astype(jnp.float32)

    def row_pass(src: Array, sh: Array) -> Array:
        g = sh * (rows - cy)
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, rows - cy, cols, w - 1.0)
        return _shift_pass(src, k.astype(jnp.int32) % pw, g - k,
                           1, lo_ok, hi_ok, None, content_dim=w)

    def col_pass(src: Array, sh: Array) -> Array:
        g = sh * (cols - cx)
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, cols - cx, rows, h - 1.0)
        return _shift_pass(src, k.astype(jnp.int32) % ph, g - k,
                           0, lo_ok, hi_ok, None, content_dim=h)

    b_ref[:] = row_pass(a_ref[:], t)
    a_ref[:] = col_pass(b_ref[:], s)
    out_ref[0, 0] = row_pass(a_ref[:], t)


def _train_aug_kernel(angle_ref, factor_ref, img_ref, out_ref, a_ref, b_ref,
                      *, hw: Tuple[int, int], max_angle_deg: float):
    """Fused in-graph training augmentation (one program per image-channel):
    uint8 dequant → same-canvas clamp rotation (3 barrel-shift passes) →
    per-channel RandomContrast — everything between the uint8 load and the
    f32 store stays in VMEM.

    Replaces the composition in `ops/train_augment.py` (dequant pass +
    f32 NCHW transposes + `rotate_batch_pallas_clamp_f32` + mean/apply
    contrast passes), cutting its HBM traffic ~3x. The static
    `max_angle_deg` bound enables the barrel bias trick (`_shift_pass`
    `max_shift`): only content-region shifts are ever consumed unmasked —
    pass-2/3 reads of larger-shift margin positions are covered by the
    validity masks — so row passes barrel over ~6 bits instead of
    log2(pw)=9.
    """
    h, w = hw
    ph, pw = a_ref.shape

    i = pl.program_id(0)
    theta = angle_ref[i] * (math.pi / 180.0)
    t = -jnp.tan(theta / 2.0)
    s = jnp.sin(theta)
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0

    # static shift bounds over the content region (see docstring)
    max_t = math.tan(math.radians(max_angle_deg) / 2.0)
    max_s = math.sin(math.radians(max_angle_deg))
    row_bound = int(math.ceil(max_t * (h - 1) / 2.0)) + 1
    col_bound = int(math.ceil(max_s * (w - 1) / 2.0)) + 1

    a_ref[:] = jnp.zeros((ph, pw), jnp.float32)
    a_ref[0:h, 0:w] = (img_ref[0, 0].astype(jnp.int32).astype(jnp.float32)
                       / 255.0)

    rows = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1).astype(jnp.float32)

    def row_pass(src: Array, sh: Array) -> Array:
        g = sh * (rows - cy)
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, rows - cy, cols, w - 1.0)
        return _shift_pass(src, k.astype(jnp.int32), g - k,
                           1, lo_ok, hi_ok, None, content_dim=w,
                           max_shift=row_bound)

    def col_pass(src: Array, sh: Array) -> Array:
        g = sh * (cols - cx)
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, cols - cx, rows, h - 1.0)
        return _shift_pass(src, k.astype(jnp.int32), g - k,
                           0, lo_ok, hi_ok, None, content_dim=h,
                           max_shift=col_bound)

    b_ref[:] = row_pass(a_ref[:], t)
    a_ref[:] = col_pass(b_ref[:], s)
    final = row_pass(a_ref[:], t)

    # RandomContrast about the per-channel content mean (Keras semantics,
    # `srcs/model/cnn.py:75-83`), clipped to [0, 1]
    mean = jnp.sum(final[0:h, 0:w]) / float(h * w)
    factor = factor_ref[i]
    out_ref[0, 0] = (jnp.clip(mean + (final - mean) * factor, 0.0, 1.0)
                     .astype(out_ref.dtype))


@partial(jax.jit, static_argnames=("max_angle_deg", "out_dtype",
                                   "interpret"))
def train_aug_rotate_contrast_pallas(imgs_u8: Array, angles_deg: Array,
                                     factors: Array,
                                     max_angle_deg: float = 18.0,
                                     out_dtype=jnp.float32,
                                     interpret: bool = False) -> Array:
    """Fused rotate+contrast training augmentation: uint8 NHWC [B, h, w, 3]
    (flip already applied upstream, where it fuses with the batch gather) +
    per-image angles/contrast factors → `out_dtype` NHWC in [0, 1].

    The NCHW transposes move uint8 in (4x less traffic than the f32
    transpose of the unfused path); dequant, rotation, and contrast are one
    VMEM-resident program per image-channel. `out_dtype=jnp.bfloat16`
    halves the augmented batch's HBM write + the following transpose's
    read for bf16-compute models (which cast the batch anyway); rotation
    math stays f32 in VMEM either way.
    """
    n, h, w, c = imgs_u8.shape
    ph = _pad_to(h, _SUBLANE)
    pw = _pad_to(w, _LANE)

    nchw = jnp.transpose(imgs_u8, (0, 3, 1, 2))
    angles1d = angles_deg.astype(jnp.float32).reshape(n)
    factors1d = factors.astype(jnp.float32).reshape(n)

    out = pl.pallas_call(
        partial(_train_aug_kernel, hw=(h, w), max_angle_deg=max_angle_deg),
        grid=(n, c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ph, pw), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, ph, pw), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((ph, pw), jnp.float32),
            pltpu.VMEM((ph, pw), jnp.float32),
        ],
        interpret=interpret,
    )(angles1d, factors1d, nchw)

    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))


def _train_aug_nhwc_kernel(angle_ref, factor_ref, img_ref, out_ref,
                           a_ref, b_ref, *, hw: Tuple[int, int],
                           max_angle_deg: float):
    """Interleaved-channel fused training augmentation — one program per
    IMAGE over an [h, 3·w]-lane canvas (channels interleaved, as NHWC
    memory already lays them out).

    Math identical to `_train_aug_kernel` (dequant → 3-pass clamp rotation
    → RandomContrast); the layout differences:

    - row passes shift PIXELS = 3 lanes, so one barrel moves all three
      channels (`_shift_pass_lanes3` mechanics) — but with CLAMP edge
      semantics: the per-channel content edge is selected by a lane%3 mask
      over the three edge-lane broadcasts (Mosaic broadcasts a [:, k:k+1]
      lane slice for free inside a select, same trick `_shift_pass` uses
      for its single edge column);
    - the column pass is unchanged — rows keep channel structure, so the
      plain `_shift_pass` clamp edges ([0:1, :] / [h-1:h, :]) are correct;
    - the contrast mean is per channel: three masked sums over the content
      region (lane%3 masks), then a mod-3 select re-broadcasts them.

    The caller needs NO NHWC↔NCHW transposes — uint8 in and `out_dtype`
    out are plain reshapes of NHWC batches. That is the point: the
    per-plane kernel's surrounding transposes are pure HBM traffic inside
    every train step.

    Canvas dtype (the scratch refs' dtype, chosen by the caller): f32 is
    bit-stable with the per-plane kernel AND the only dtype current
    Mosaic can lower — `tpu.dynamic_rotate` on bf16 fails to compile on
    v5e ("Rotate with non-32-bit data: not implemented"), so the bf16
    halved-vreg experiment is interpret-mode/future-Mosaic only.
    Row passes 1 and 3 share one set of shift/validity controls (same
    shear factor ⇒ identical masks; for f32 this is exactly the values
    the old duplicated computation produced). Measured (v5e, proper
    scalar-fetch sync, 512-batch amortization): 1.39 ms per 128×224²
    batch for the full fused dequant+rotate+contrast.
    """
    h, w = hw
    ph, pw3 = a_ref.shape
    cdt = a_ref.dtype

    i = pl.program_id(0)
    theta = angle_ref[i] * (math.pi / 180.0)
    t = -jnp.tan(theta / 2.0)
    s = jnp.sin(theta)
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0

    max_t = math.tan(math.radians(max_angle_deg) / 2.0)
    max_s = math.sin(math.radians(max_angle_deg))
    row_bound = int(math.ceil(max_t * (h - 1) / 2.0)) + 1
    col_bound = int(math.ceil(max_s * (w - 1) / 2.0)) + 1

    a_ref[:] = jnp.zeros((ph, pw3), cdt)
    a_ref[0:h, 0:3 * w] = (img_ref[0].astype(jnp.int32).astype(jnp.float32)
                           / 255.0).astype(cdt)

    rows = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, pw3), 1)
    xpix = (lane // 3).astype(jnp.float32)
    ch = lane % 3
    is_c0 = ch == 0
    is_c1 = ch == 1

    def sel3(v0: Array, v1: Array, v2: Array) -> Array:
        return jnp.where(is_c0, v0, jnp.where(is_c1, v1, v2))

    # row-pass controls (shared by passes 1 and 3 — same shear factor t):
    # pixel shifts/lerp weights [ph, 1], validity masks [ph, pw3], and the
    # biased barrel bit counts
    g_row = t * (rows - cy)
    k_row = jnp.floor(g_row)
    f_row = (g_row - k_row).astype(cdt)
    _, row_lo, row_hi = _scaled_positions(t, rows - cy, xpix, w - 1.0)
    row_bias = 1 << max(0, row_bound.bit_length())
    px_row = (jnp.clip(k_row.astype(jnp.int32), -row_bound, row_bound)
              + row_bias)
    row_bits = (row_bias + row_bound).bit_length()

    def row_pass(src: Array) -> Array:
        # clamp edges: channel-c content edge pixel, selected per lane
        e = 3 * (w - 1)
        edge_low = sel3(src[:, 0:1], src[:, 1:2], src[:, 2:3])
        edge_high = sel3(src[:, e:e + 1], src[:, e + 1:e + 2],
                         src[:, e + 2:e + 3])
        # interleaved barrel with the static bias trick, in PIXEL bits
        x = pltpu.roll(src, 3 * row_bias, 1)   # out[i] = src[i - 3·bias]
        for b in range(row_bits):
            bit_on = ((px_row >> b) & 1) == 1
            rolled = pltpu.roll(x, (-(3 << b)) % pw3, 1)
            x = jnp.where(bit_on, rolled, x)
        nxt = pltpu.roll(x, (-3) % pw3, 1)     # next PIXEL = +3 lanes
        out = x * (1.0 - f_row) + nxt * f_row
        return jnp.where(row_lo, jnp.where(row_hi, out, edge_high),
                         edge_low)

    def col_pass(src: Array, sh: Array) -> Array:
        g = sh * (xpix - cx)                       # [1, pw3] row shifts
        k = jnp.floor(g)
        _, lo_ok, hi_ok = _scaled_positions(sh, xpix - cx, rows, h - 1.0)
        return _shift_pass(src, k.astype(jnp.int32), g - k,
                           0, lo_ok, hi_ok, None, content_dim=h,
                           max_shift=col_bound)

    b_ref[:] = row_pass(a_ref[:])
    a_ref[:] = col_pass(b_ref[:], s)
    final = row_pass(a_ref[:])

    # per-channel RandomContrast means over the content region (f32
    # accumulation regardless of canvas dtype)
    content = final[0:h, 0:3 * w].astype(jnp.float32)
    m = []
    for c3 in range(3):
        mask = (ch[:, 0:3 * w] == c3).astype(jnp.float32)
        m.append(jnp.sum(content * mask) / float(h * w))
    mean = sel3(m[0], m[1], m[2])
    factor = factor_ref[i]
    out_ref[0] = (jnp.clip(mean + (final.astype(jnp.float32) - mean)
                           * factor, 0.0, 1.0).astype(out_ref.dtype))


@partial(jax.jit, static_argnames=("max_angle_deg", "out_dtype",
                                   "canvas_dtype", "interpret"))
def train_aug_rotate_contrast_nhwc_pallas(imgs_u8: Array, angles_deg: Array,
                                          factors: Array,
                                          max_angle_deg: float = 18.0,
                                          out_dtype=jnp.float32,
                                          canvas_dtype=jnp.float32,
                                          interpret: bool = False) -> Array:
    """Interleaved-channel variant of `train_aug_rotate_contrast_pallas`:
    same fused dequant+rotate+contrast math, one program per image, and —
    the point — NO NHWC↔NCHW transposes in the surrounding graph (uint8 in
    and `out_dtype` out are reshapes of the NHWC batch).

    `canvas_dtype=jnp.bfloat16` runs the shear passes on bf16 canvases —
    a ≤2/255 amplitude error; NOT compilable by current Mosaic on real
    TPUs (see `_train_aug_nhwc_kernel`), kept for interpret mode and
    future toolchains. f32 (default) is bit-stable with the per-plane
    kernel."""
    n, h, w, c = imgs_u8.shape
    assert c == 3
    ph = _pad_to(h, _SUBLANE)
    pw3 = _pad_to(3 * w, _LANE)

    flat = imgs_u8.reshape(n, h, 3 * w)
    angles1d = angles_deg.astype(jnp.float32).reshape(n)
    factors1d = factors.astype(jnp.float32).reshape(n)

    out = pl.pallas_call(
        partial(_train_aug_nhwc_kernel, hw=(h, w),
                max_angle_deg=max_angle_deg),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, 3 * w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ph, pw3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ph, pw3), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((ph, pw3), canvas_dtype),
            pltpu.VMEM((ph, pw3), canvas_dtype),
        ],
        interpret=interpret,
    )(angles1d, factors1d, flat)

    return out[:, :h, :3 * w].reshape(n, h, w, 3)


@partial(jax.jit, static_argnames=("interpret",))
def rotate_batch_pallas_clamp_f32(imgs: Array, angles_deg: Array,
                                  interpret: bool = False) -> Array:
    """Same-size float32 NHWC rotation with edge-clamp fill, one program
    per (image, channel) — the train-augmentation hot path (the einsum
    rotate costs 5.1 ms per 128×224² batch inside every train step; this
    kernel replaces it)."""
    n, h, w, c = imgs.shape
    ph = _pad_to(h, _SUBLANE)
    pw = _pad_to(w, _LANE)

    nchw = jnp.transpose(imgs.astype(jnp.float32), (0, 3, 1, 2))
    angles1d = angles_deg.astype(jnp.float32).reshape(n)

    out = pl.pallas_call(
        partial(_rotate_clamp_kernel, hw=(h, w)),
        grid=(n, c),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, h, w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ph, pw), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, ph, pw), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ph, pw), jnp.float32),
            pltpu.VMEM((ph, pw), jnp.float32),
        ],
        interpret=interpret,
    )(angles1d, nchw)

    return jnp.transpose(out[:, :, :h, :w], (0, 2, 3, 1))


@partial(jax.jit, static_argnames=("canvas_hw", "fill", "max_angle_deg",
                                   "interpret"))
def rotate_batch_pallas(imgs: Array, angles_deg: Array,
                        canvas_hw: Tuple[int, int], fill: float = 255.0,
                        max_angle_deg: float | None = None,
                        interpret: bool = False) -> Array:
    """Batched expand-canvas rotation: uint8 NHWC [B, h, w, 3] + per-image
    angles (degrees, PIL CCW convention) → uint8 [B, OH, OW, 3].

    Drop-in for the einsum `rotate_warp` path at |angle| < ~60° (the
    augmentation op uses ±30°). One pallas program per (image, channel);
    everything between the uint8 load and the uint8 store stays in VMEM.
    A static `max_angle_deg` bound (caller-guaranteed) engages the barrel
    bias trick (~5 fewer conditional rolls of ~25 at 224px). Measured
    NEUTRAL at 224 on v5e — these passes are not roll-issue-bound, unlike
    the train-aug kernel where the same trick pays — kept because it is
    bit-exact (tested) and the roll count shrinks further at 448/512.
    """
    n, in_h, in_w, c = imgs.shape
    oh, ow = canvas_hw
    ph = _pad_to(oh, _SUBLANE)
    pw = _pad_to(ow, _LANE)

    nchw = jnp.transpose(imgs, (0, 3, 1, 2))      # [B, C, h, w] u8
    angles1d = angles_deg.astype(jnp.float32).reshape(n)

    out = pl.pallas_call(
        partial(_rotate_kernel, in_hw=(in_h, in_w), canvas_hw=(oh, ow),
                fill=fill, max_angle_deg=max_angle_deg),
        grid=(n, c),
        in_specs=[
            # whole angle vector in SMEM; the kernel indexes by program id
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, in_h, in_w), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, ph, pw), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c, ph, pw), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((ph, pw), jnp.float32),
            pltpu.VMEM((ph, pw), jnp.float32),
        ],
        interpret=interpret,
    )(angles1d, nchw)

    return jnp.transpose(out[:, :, :oh, :ow], (0, 2, 3, 1))
