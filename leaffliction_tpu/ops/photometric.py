"""Photometric ops: noise, contrast, brightness, autocontrast.

On-device equivalents of the reference's PIL photometric calls
(`srcs/preprocessing/image_augmenter.py:116-133` gaussian noise +
autocontrast; Keras RandomContrast at `srcs/model/cnn.py:81`;
brightness/contrast jitter at `srcs/cli/Transformation.py:984-1005`).
Inputs/outputs are float32 in [0, 255] unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def add_gaussian_noise(key: Array, img: Array, sigma: float = 5.0) -> Array:
    """Additive N(0, sigma) noise, clipped to [0,255] (`image_augmenter.py:121-124`)."""
    noise = sigma * jax.random.normal(key, img.shape, jnp.float32)
    return jnp.clip(img.astype(jnp.float32) + noise, 0.0, 255.0)


def adjust_contrast(img: Array, factor: Array | float) -> Array:
    """Scale contrast about the per-channel mean (Keras RandomContrast math)."""
    mean = jnp.mean(img, axis=(-3, -2), keepdims=True)
    return jnp.clip(mean + (img - mean) * factor, 0.0, 255.0)


def adjust_brightness(img: Array, delta: Array | float) -> Array:
    return jnp.clip(img + delta, 0.0, 255.0)


def autocontrast_u8_exact(img_u8: Array,
                          cutoff_percent: Array | float = 0.0) -> Array:
    """`autocontrast` for uint8 inputs with a BACKEND-BIT-IDENTICAL remap.

    The f32 remap in `autocontrast` (`x*scale + offset` then round) can
    differ by one ulp between CPU and TPU lowerings (FMA contraction),
    which flips the final byte for pixels landing near .5 (~0.1% measured)
    — unacceptable for the strict distortion contract, where the device
    balancer (TPU) and the host pool (jax-CPU) must produce the SAME
    bytes. Here the quantile search is the same integer binary search and
    the remap is exact int32 arithmetic: round-half-up of
    255·(v−lo)/(hi−lo) via `(510·(v−lo) + (hi−lo)) // (2·(hi−lo))` —
    no float rounding anywhere, so every backend agrees by construction.
    → uint8."""
    q = img_u8.reshape(-1, img_u8.shape[-1])  # [P, C] uint8
    n, c = q.shape
    cut = jnp.asarray(cutoff_percent, jnp.float32) * n / 100.0

    def step(_, state):
        lo_lo, lo_hi, hi_lo, hi_hi = state
        lo_mid = (lo_lo + lo_hi) // 2
        hi_mid = (hi_lo + hi_hi + 1) // 2
        cnt_le = jnp.sum((q <= lo_mid[None, :].astype(jnp.uint8))
                         .astype(jnp.float32), axis=0)
        cnt_ge = jnp.sum((q >= hi_mid[None, :].astype(jnp.uint8))
                         .astype(jnp.float32), axis=0)
        lo_take = cnt_le > cut
        hi_take = cnt_ge > cut
        return (jnp.where(lo_take, lo_lo, lo_mid + 1),
                jnp.where(lo_take, lo_mid, lo_hi),
                jnp.where(hi_take, hi_mid, hi_lo),
                jnp.where(hi_take, hi_hi, hi_mid - 1))

    zeros = jnp.zeros((c,), jnp.int32)
    full = jnp.full((c,), 255, jnp.int32)
    lo, _, hi, _ = jax.lax.fori_loop(0, 8, step, (zeros, full, zeros, full))
    v = img_u8.astype(jnp.int32)
    span = (hi - lo)[None, None, :]
    num = 510 * (v - lo[None, None, :]) + span
    out = jnp.clip(num // jnp.maximum(2 * span, 1), 0, 255)
    return jnp.where(span > 0, out, v).astype(jnp.uint8)


def autocontrast(img: Array, cutoff_percent: Array | float = 0.0) -> Array:
    """Per-channel linear stretch to full range, ignoring `cutoff_percent`%
    of darkest/brightest pixels (PIL `ImageOps.autocontrast` semantics used
    at `image_augmenter.py:126-129`).

    Histogram-based like PIL, fully vectorized: a 256-bin histogram per
    channel, cumulative sums locate the cutoff quantiles.
    """
    x = img.astype(jnp.float32)
    flat = x.reshape(-1, x.shape[-1])  # [P, C]
    n, c = flat.shape
    q = jnp.clip(jnp.round(flat), 0, 255).astype(jnp.int32).astype(jnp.uint8)
    cut = jnp.asarray(cutoff_percent, jnp.float32) * n / 100.0
    # PIL walks the histogram for the first/last bin past the cutoff, but
    # only those two quantile bins are ever used — so instead of a 256-bin
    # histogram (256 compares/pixel), binary-search the monotone predicates
    # count(q <= v) > cut and count(q >= v) > cut: 8 iterations, each ONE
    # uint8 read of the image for both bounds.
    #   lo = min v with count(q <= v) > cut  (== first bin with cdf > cut)
    #   hi = max v with count(q >= v) > cut  (== last bin of reverse cdf)

    def step(_, state):
        lo_lo, lo_hi, hi_lo, hi_hi = state  # answer invariants per search
        lo_mid = (lo_lo + lo_hi) // 2
        hi_mid = (hi_lo + hi_hi + 1) // 2
        cnt_le = jnp.sum((q <= lo_mid[None, :].astype(jnp.uint8))
                         .astype(jnp.float32), axis=0)
        cnt_ge = jnp.sum((q >= hi_mid[None, :].astype(jnp.uint8))
                         .astype(jnp.float32), axis=0)
        lo_take = cnt_le > cut
        hi_take = cnt_ge > cut
        return (jnp.where(lo_take, lo_lo, lo_mid + 1),
                jnp.where(lo_take, lo_mid, lo_hi),
                jnp.where(hi_take, hi_mid, hi_lo),
                jnp.where(hi_take, hi_hi, hi_mid - 1))

    zeros = jnp.zeros((c,), jnp.int32)
    full = jnp.full((c,), 255, jnp.int32)
    lo_b, _, hi_b, _ = jax.lax.fori_loop(0, 8, step,
                                         (zeros, full, zeros, full))
    lo = lo_b.astype(jnp.float32)
    hi = hi_b.astype(jnp.float32)
    scale = jnp.where(hi > lo, 255.0 / jnp.maximum(hi - lo, 1e-6), 1.0)
    offset = jnp.where(hi > lo, -lo * scale, 0.0)
    out = x * scale[None, None, :] + offset[None, None, :]
    # degenerate channels (hi <= lo) stay untouched, like PIL
    out = jnp.where((hi > lo)[None, None, :], out, x)
    return jnp.clip(out, 0.0, 255.0)
