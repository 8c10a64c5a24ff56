"""On-device GrabCut analog: quality vs ground truth and cv2, integration."""

import numpy as np
import pytest


def _case(rng, size=128):
    import cv2

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import _leafish_image

    img = _leafish_image(rng, size)
    g = (img[..., 1].astype(int)
         - (img[..., 0].astype(int) + img[..., 2].astype(int)) // 2)
    gt = g > 30
    init = cv2.dilate(gt.astype(np.uint8), np.ones((9, 9), np.uint8)) > 0
    init[:12] = True  # spurious background strip marked probable-fg
    return img, gt, init


def _iou(a, b):
    return (a & b).sum() / max((a | b).sum(), 1)


def test_device_grabcut_quality_vs_ground_truth():
    import jax.numpy as jnp

    from leaffliction_tpu.segment.grabcut import grabcut_refine

    rng = np.random.default_rng(0)
    ious = []
    for _ in range(3):
        img, gt, init = _case(rng)
        out = np.asarray(grabcut_refine(jnp.asarray(img), jnp.asarray(init)))
        assert (out & ~init).sum() == 0  # locked background never flips
        ious.append(_iou(out > 0, gt))
    assert np.mean(ious) > 0.95, ious


def test_device_grabcut_close_to_cv2():
    import cv2
    import jax.numpy as jnp

    from leaffliction_tpu.segment.grabcut import grabcut_refine

    rng = np.random.default_rng(1)
    img, gt, init = _case(rng)
    dev = np.asarray(grabcut_refine(jnp.asarray(img), jnp.asarray(init))) > 0

    gc_mask = np.zeros(img.shape[:2], np.uint8)
    gc_mask[init > 0] = cv2.GC_PR_FGD
    gc_mask[init == 0] = cv2.GC_BGD
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    cv2.grabCut(img, gc_mask, None, bgd, fgd, 1, cv2.GC_INIT_WITH_MASK)
    cvr = (gc_mask == cv2.GC_FGD) | (gc_mask == cv2.GC_PR_FGD)
    assert _iou(dev, cvr) > 0.9


def test_device_grabcut_empty_result_guard():
    import jax.numpy as jnp

    from leaffliction_tpu.segment.grabcut import grabcut_refine

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (64, 64, 3), np.uint8)
    init = np.zeros((64, 64), bool)
    init[20:30, 20:30] = True
    out = np.asarray(grabcut_refine(jnp.asarray(img), jnp.asarray(init)))
    # uniform-noise fg/bg may be indistinguishable; result must stay inside
    # the initial mask and never be all-empty
    assert out.any()
    assert (out & ~init).sum() == 0


@pytest.mark.slow
def test_make_mask_grabcut_device_mode(monkeypatch):
    """grabcut_refine path runs with NO cv2 (LEAF_GRABCUT=device)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import _leafish_image

    from leaffliction_tpu.segment.config import TransformConfig
    from leaffliction_tpu.segment.mask import make_mask

    monkeypatch.setenv("LEAF_GRABCUT", "device")
    rng = np.random.default_rng(3)
    img = _leafish_image(rng, 96)
    cfg = TransformConfig(mask_upscale_factor=1.0, mask_upscale_long_side=0,
                          grabcut_refine=True)
    mask, contour = make_mask(img, cfg)
    assert mask.shape == img.shape[:2]
    assert mask.any()


def test_make_mask_grabcut_off_mode(monkeypatch):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import _leafish_image

    from leaffliction_tpu.segment.config import TransformConfig
    from leaffliction_tpu.segment.mask import make_mask

    monkeypatch.setenv("LEAF_GRABCUT", "off")
    rng = np.random.default_rng(3)
    img = _leafish_image(rng, 96)
    cfg = TransformConfig(mask_upscale_factor=1.0, mask_upscale_long_side=0,
                          grabcut_refine=True)
    mask, _ = make_mask(img, cfg)
    assert mask.any()
