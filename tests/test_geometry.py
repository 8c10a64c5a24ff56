"""Geometry warp golden tests vs PIL within tolerance (SURVEY §7 hard part:
bilinear vs BICUBIC differ at edges — we compare interior pixels)."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from leaffliction_tpu.ops.geometry import (
    homography_warp,
    rotation_matrix,
    shear_matrix,
    solve_perspective_coeffs,
)


@pytest.fixture(scope="module")
def img():
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    img = np.stack([xx * 4 % 255, yy * 4 % 255, (xx + yy) * 2 % 255], -1)
    return img.astype(np.uint8)


def _interior_close(ours, ref, margin=4, tol=18.0, frac=0.98):
    o = ours[margin:-margin, margin:-margin].astype(np.float32)
    r = ref[margin:-margin, margin:-margin].astype(np.float32)
    close = (np.abs(o - r) <= tol).mean()
    assert close >= frac, f"only {close:.3f} of interior pixels within {tol}"


def test_identity_warp(img):
    mat = jnp.eye(3)
    out = np.asarray(homography_warp(jnp.asarray(img), mat, (64, 64)))
    assert np.abs(out - img).max() < 1e-3


def test_rotation_matches_pil(img):
    angle = 17.0
    pil = Image.fromarray(img).rotate(
        angle, resample=Image.BILINEAR, fillcolor=(255, 255, 255)
    )
    mat = rotation_matrix(angle, (64, 64))
    ours = np.asarray(
        homography_warp(jnp.asarray(img), mat, (64, 64), fill=255.0)
    )
    _interior_close(ours, np.asarray(pil), margin=6)


def test_shear_matches_pil_affine(img):
    shear = 0.15
    # PIL affine with inverse coefficients (x_src = x + s*(y - cy))
    cy = (64 - 1) / 2.0
    coeffs = (1.0, shear, -shear * cy, 0.0, 1.0, 0.0)
    pil = Image.fromarray(img).transform(
        (64, 64), Image.AFFINE, coeffs, resample=Image.BILINEAR,
        fillcolor=(255, 255, 255),
    )
    mat = shear_matrix(shear, horizontal=True, in_hw=(64, 64))
    ours = np.asarray(
        homography_warp(jnp.asarray(img), mat, (64, 64), fill=255.0)
    )
    _interior_close(ours, np.asarray(pil), margin=6)


def test_perspective_solver_matches_pil(img):
    w = h = 64
    src = [(0, 0), (w, 0), (w, h), (0, h)]
    dst = [(4, 2), (w - 3, 5), (w - 2, h - 4), (2, h - 5)]
    # PIL-style: find coeffs mapping output(dst-quad definition) like the
    # reference's _find_coeffs(original_corners=src, distorted=dst)
    mat = solve_perspective_coeffs(dst, src)
    pil_coeffs = np.asarray(mat).reshape(9)[:8].tolist()
    pil = Image.fromarray(img).transform(
        (w, h), Image.PERSPECTIVE, pil_coeffs, resample=Image.BILINEAR,
        fillcolor=(255, 255, 255),
    )
    ours = np.asarray(
        homography_warp(jnp.asarray(img), mat, (h, w), fill=255.0)
    )
    _interior_close(ours, np.asarray(pil), margin=8)


def test_rotation_expand_canvas(img):
    """PIL rotate(expand=True) grows the canvas; we warp into the expanded
    static canvas and compare."""
    angle = 30.0
    pil = Image.fromarray(img).rotate(
        angle, resample=Image.BILINEAR, expand=True, fillcolor=(255, 255, 255)
    )
    oh, ow = pil.size[1], pil.size[0]
    mat = rotation_matrix(angle, (64, 64), out_hw=(oh, ow))
    ours = np.asarray(
        homography_warp(jnp.asarray(img), mat, (oh, ow), fill=255.0)
    )
    _interior_close(ours, np.asarray(pil), margin=10, frac=0.95)
