"""Golden tests: on-device ops vs OpenCV/PIL oracles within tolerance.

Mirrors the test strategy mandated by SURVEY §4 (kernels vs golden oracles).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from leaffliction_tpu.ops.colorspace import (  # noqa: E402
    rgb_to_gray,
    rgb_to_hsv,
    rgb_to_lab,
)
from leaffliction_tpu.ops.components import (  # noqa: E402
    component_count,
    largest_component,
    remove_small_components,
)
from leaffliction_tpu.ops.morphology import (  # noqa: E402
    closing,
    dilate,
    erode,
    fill_holes,
    opening,
)
from leaffliction_tpu.ops.threshold import otsu_threshold  # noqa: E402


@pytest.fixture(scope="module")
def img(rng):
    # structured image: gradient + blob, more realistic than pure noise
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    base = np.stack([xx * 2, yy * 3, (xx + yy)], -1)
    blob = ((yy - 32) ** 2 + (xx - 32) ** 2 < 220)[..., None]
    img = np.where(blob, [60, 180, 70], base % 255).astype(np.uint8)
    noise = np.random.default_rng(1).normal(0, 6, img.shape)
    return np.clip(img + noise, 0, 255).astype(np.uint8)


def test_rgb_to_gray_matches_cv2(img):
    ours = np.asarray(rgb_to_gray(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    assert np.abs(ours - ref).max() <= 1.0


def test_rgb_to_hsv_matches_cv2(img):
    ours = np.asarray(rgb_to_hsv(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.float32)
    # hue wraps at 180 — compare circularly
    dh = np.abs(ours[..., 0] - ref[..., 0])
    dh = np.minimum(dh, 180 - dh)
    assert dh.max() <= 1.0
    assert np.abs(ours[..., 1] - ref[..., 1]).max() <= 2.0
    assert np.abs(ours[..., 2] - ref[..., 2]).max() <= 1.0


def test_rgb_to_lab_close_to_cv2(img):
    ours = np.asarray(rgb_to_lab(jnp.asarray(img)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2LAB).astype(np.float32)
    assert np.abs(ours - ref).max() <= 3.0  # 8-bit quantization differences


def test_otsu_matches_cv2(img):
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    t_ref, _ = cv2.threshold(gray, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    t_ours = float(otsu_threshold(jnp.asarray(gray)))
    assert abs(t_ours - t_ref) <= 1.0


def test_morphology_matches_cv2(img):
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    mask = (gray > 100).astype(np.uint8)
    kernel = np.ones((3, 3), np.uint8)
    for name, ours_fn, cv_op in [
        ("dilate", dilate, cv2.dilate),
        ("erode", erode, cv2.erode),
    ]:
        ours = np.asarray(ours_fn(jnp.asarray(mask.astype(bool)), 3))
        ref = cv_op(mask, kernel).astype(bool)
        assert np.array_equal(ours, ref), name
    ours = np.asarray(opening(jnp.asarray(mask.astype(bool)), 3))
    ref = cv2.morphologyEx(mask, cv2.MORPH_OPEN, kernel).astype(bool)
    assert np.array_equal(ours, ref)
    ours = np.asarray(closing(jnp.asarray(mask.astype(bool)), 3))
    ref = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel).astype(bool)
    assert np.array_equal(ours, ref)


def test_ellipse_morphology_matches_cv2():
    rng = np.random.default_rng(3)
    mask = (rng.random((48, 48)) > 0.6)
    for k in (5, 7):
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k, k))
        ref = cv2.dilate(mask.astype(np.uint8), kernel).astype(bool)
        ours = np.asarray(dilate(jnp.asarray(mask), k, shape="ellipse"))
        assert np.array_equal(ours, ref), f"ellipse dilate k={k}"


def test_fill_holes():
    mask = np.zeros((32, 32), bool)
    mask[5:25, 5:25] = True
    mask[10:18, 10:18] = False  # hole
    filled = np.asarray(fill_holes(jnp.asarray(mask)))
    assert filled[12, 12]
    assert not filled[2, 2]
    assert filled.sum() == 20 * 20


def test_connected_components():
    mask = np.zeros((40, 40), bool)
    mask[2:10, 2:10] = True       # 64 px
    mask[20:38, 20:38] = True     # 324 px — largest
    mask[15, 15] = True           # single pixel
    largest = np.asarray(largest_component(jnp.asarray(mask)))
    assert largest.sum() == 18 * 18
    assert largest[25, 25] and not largest[5, 5]
    kept = np.asarray(remove_small_components(jnp.asarray(mask), 60))
    assert kept.sum() == 64 + 324
    assert int(component_count(jnp.asarray(mask))) == 3
    assert int(component_count(jnp.asarray(mask), min_size=2)) == 2


def test_components_match_cv2_random():
    rng = np.random.default_rng(5)
    mask = cv2.dilate((rng.random((64, 64)) > 0.8).astype(np.uint8),
                      np.ones((2, 2), np.uint8)).astype(bool)
    n_ref, labels_ref, stats, _ = cv2.connectedComponentsWithStats(
        mask.astype(np.uint8), connectivity=8
    )
    ours = int(component_count(jnp.asarray(mask)))
    assert ours == n_ref - 1  # cv2 counts background
    if n_ref > 1:
        sizes = stats[1:, cv2.CC_STAT_AREA]
        big_ref = labels_ref == (1 + np.argmax(sizes))
        big_ours = np.asarray(largest_component(jnp.asarray(mask)))
        assert big_ours.sum() == big_ref.sum()
