"""Golden parity: skew/shear/crop vs the reference's exact PIL calls.

The reference warps with Image.BICUBIC (shear/skew,
`/root/reference/srcs/preprocessing/image_augmenter.py:44-94`) and resizes
back with Image.LANCZOS after crop (`image_augmenter.py:96-114`). Round 2
used 2-tap bilinear everywhere (declared tolerance delta); round 3 adds the
4-tap Keys cubic and 6-tap lanczos3 kernels to the matmul resampler plus
PIL's half-pixel-center coefficient convention, shrinking measured error vs
PIL from (96² gradient fixture):

    shear: max 255 → 13, mean 1.6 → 0.61, frac(|d|>2) 9.4% → 0.8%
    skew:  max 255 → 32, mean 2.7 → 0.79, frac(|d|>2) 17.7% → 2.6%
    crop:  max  34 → 28, mean 1.6 → 0.28, frac(|d|>2) 19.0% → 0.5%

The Pallas barrel-shift shear kernel interpolates with the same cubic taps
(renormalized at content edges) and must match the matmul path to ±1 LSB.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from leaffliction_tpu.ops.resample import scale_translate_warp, shear_warp


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    base = np.stack([xx * 4 % 255, yy * 3 % 251, (xx + yy) * 2 % 253], -1)
    return (base + rng.normal(0, 6, base.shape)).clip(0, 255).astype(np.uint8)


def _check(ours, ref, max_tol, mean_tol, frac2_tol):
    d = np.abs(ours.astype(np.float32) - ref.astype(np.float32))
    assert d.max() <= max_tol, f"max {d.max()} > {max_tol}"
    assert d.mean() <= mean_tol, f"mean {d.mean():.3f} > {mean_tol}"
    frac2 = (d > 2).mean()
    assert frac2 <= frac2_tol, f"frac>2 {frac2:.4f} > {frac2_tol}"


@pytest.mark.parametrize("s", [0.18, -0.12])
@pytest.mark.parametrize("horizontal", [True, False])
def test_shear_matches_pil_bicubic(img, s, horizontal):
    h = w = 96
    coeffs = [1, s, 0, 0, 1, 0] if horizontal else [1, 0, 0, s, 1, 0]
    ref = np.asarray(Image.fromarray(img).transform(
        (w, h), Image.AFFINE, coeffs, Image.BICUBIC))
    ours = np.clip(np.round(np.asarray(shear_warp(
        jnp.asarray(img), s, horizontal, (h, w), fill=0.0,
        kernel="bicubic", half_px=True))), 0, 255)
    _check(ours, ref, max_tol=26, mean_tol=1.2, frac2_tol=0.02)


@pytest.mark.parametrize("s", [0.18, -0.12])
@pytest.mark.parametrize("horizontal", [True, False])
def test_pallas_shear_matches_matmul_cubic(img, s, horizontal):
    from leaffliction_tpu.ops.pallas.rotate import shear_batch_pallas

    h = w = 96
    matmul = np.clip(np.round(np.asarray(shear_warp(
        jnp.asarray(img), s, horizontal, (h, w), fill=0.0,
        kernel="bicubic", half_px=True))), 0, 255)
    pallas = np.asarray(shear_batch_pallas(
        jnp.asarray(img)[None], jnp.array([s]), jnp.array([horizontal]),
        fill=0.0, interpret=True))[0]
    assert np.abs(pallas.astype(np.float32) - matmul).max() <= 1.0


@pytest.mark.parametrize("s", [0.07, 0.15])
def test_skew_matches_pil_perspective_bicubic(img, s):
    h = w = 96
    coeffs = [1 + s, 0, -s * w, 0, 1 + s, -s * h, 0, 0]
    ref = np.asarray(Image.fromarray(img).transform(
        (w, h), Image.PERSPECTIVE, coeffs, Image.BICUBIC))
    # half-pixel-center convention folds into the offset: +0.5·s per axis
    ours = np.clip(np.round(np.asarray(scale_translate_warp(
        jnp.asarray(img), jnp.array([1 + s, 1 + s]),
        jnp.array([-s * w + 0.5 * s, -s * h + 0.5 * s]),
        (h, w), fill=0.0, kernel="bicubic"))), 0, 255)
    _check(ours, ref, max_tol=60, mean_tol=1.5, frac2_tol=0.05)


def test_crop_resize_matches_pil_lanczos(img):
    h = w = 96
    left, top, nw, nh = 7, 5, 80, 83
    ref = np.asarray(Image.fromarray(img)
                     .crop((left, top, left + nw, top + nh))
                     .resize((w, h), Image.LANCZOS))
    ax, ay = nw / w, nh / h
    ours = np.clip(np.round(np.asarray(scale_translate_warp(
        jnp.asarray(img), jnp.array([ax, ay]),
        jnp.array([left + 0.5 * ax - 0.5, top + 0.5 * ay - 0.5]),
        (h, w), fill=None, kernel="lanczos3"))), 0, 255)
    _check(ours, ref, max_tol=60, mean_tol=0.6, frac2_tol=0.02)
