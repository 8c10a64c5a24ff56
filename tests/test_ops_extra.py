"""Additional kernel golden tests: CLAHE vs cv2, matmul-warp parity with the
gather reference, corner detection, k-means determinism."""

import numpy as np
import pytest

import jax.numpy as jnp

from leaffliction_tpu.ops.geometry import affine_matrix, homography_warp, rotation_matrix
from leaffliction_tpu.ops.resample import (
    rotate_warp,
    scale_translate_warp,
    shear_warp,
)

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def img():
    yy, xx = np.mgrid[0:96, 0:96].astype(np.float32)
    base = np.stack([(xx * 3) % 251, (yy * 2) % 241, (xx + yy) % 253], -1)
    noise = np.random.default_rng(0).normal(0, 6, base.shape)
    return np.clip(base + noise, 0, 255).astype(np.float32)


def test_clahe_close_to_cv2(img):
    from leaffliction_tpu.ops.clahe import clahe

    gray = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)
    ref = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(gray)
    ours = np.asarray(clahe(jnp.asarray(gray, jnp.float32), 2.0, 8))
    # per-tile LUTs match within residual-redistribution rounding (<=3, see
    # single-tile check below); the full-image delta comes from cv2's
    # tile-interpolation conventions. Require strong agreement, not equality.
    corr = np.corrcoef(ours.ravel(), ref.astype(np.float32).ravel())[0, 1]
    assert corr > 0.995
    assert np.abs(ours - ref.astype(np.float32)).mean() < 15.0

    # single-tile (1x1 grid) → pure LUT path must match tightly
    tile = gray[:12, :12]
    ref_tile = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(1, 1)).apply(tile)
    ours_tile = np.asarray(clahe(jnp.asarray(tile, jnp.float32), 2.0, 1))
    assert np.abs(ours_tile - ref_tile.astype(np.float32)).max() <= 4.0


def test_shear_warp_exact_vs_gather(img):
    for s in (0.18, -0.07):
        ref = np.asarray(homography_warp(
            jnp.asarray(img), affine_matrix(1, s, 0, 0, 1, 0), (96, 96),
            fill=0.0))
        ours = np.asarray(shear_warp(jnp.asarray(img), s, True, (96, 96),
                                     fill=0.0))
        assert np.abs(ours - ref).max() < 1e-2


def test_scale_translate_exact_vs_gather(img):
    ref = np.asarray(homography_warp(
        jnp.asarray(img),
        jnp.array([[1.1, 0, -9.6], [0, 1.1, -9.6], [0, 0, 1]]),
        (96, 96), fill=0.0))
    ours = np.asarray(scale_translate_warp(
        jnp.asarray(img), jnp.array([1.1, 1.1]), jnp.array([-9.6, -9.6]),
        (96, 96), fill=0.0))
    assert np.abs(ours - ref).max() < 1e-2


def test_rotate_warp_tolerance_vs_gather(img):
    for angle in (12.0, -28.0):
        ref = np.asarray(homography_warp(
            jnp.asarray(img), rotation_matrix(angle, (96, 96)), (96, 96),
            fill=255.0))
        ours = np.asarray(rotate_warp(jnp.asarray(img), angle, (96, 96),
                                      fill=255.0))
        diff = np.abs(ours - ref)
        # Paeth 3-shear vs direct bilinear: small interpolation deltas
        assert diff.mean() < 6.0
        assert (diff > 30).mean() < 0.06


def test_good_features_finds_corners():
    from leaffliction_tpu.ops.filters import good_features_to_track

    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = 200.0  # square → 4 strong corners
    mask = np.ones((64, 64), bool)
    ys, xs, valid = good_features_to_track(
        jnp.asarray(img), jnp.asarray(mask), max_corners=8, min_distance=5)
    pts = {(int(y), int(x)) for y, x, ok in
           zip(np.asarray(ys), np.asarray(xs), np.asarray(valid)) if ok}
    corners = [(16, 16), (16, 47), (47, 16), (47, 47)]
    hits = sum(any(abs(py - cy) <= 3 and abs(px - cx) <= 3
                   for py, px in pts) for cy, cx in corners)
    assert hits >= 3


def test_kmeans_deterministic(img):
    from leaffliction_tpu.ops.kmeans import kmeans_pixels

    l1, c1 = kmeans_pixels(jnp.asarray(img), k=3, seed=42)
    l2, c2 = kmeans_pixels(jnp.asarray(img), k=3, seed=42)
    assert np.array_equal(np.asarray(l1), np.asarray(l2))
    assert np.allclose(np.asarray(c1), np.asarray(c2))
    # 3 distinct clusters found on structured input
    assert len(np.unique(np.asarray(l1))) == 3
