"""High-resolution (448/512px) validation — SURVEY §5's "fused preprocessing
kernels tile cleanly to 512px+" claim, previously asserted but untested.

Covers: matmul-resampler warps vs PIL at 448/512, both Pallas warp kernels
(interpret mode) vs the einsum path at the same sizes, the VMEM-driven
rotate-kernel variant selection, and the mask pipeline at 512.
"""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from leaffliction_tpu.ops.resample import scale_translate_warp, shear_warp


def _big_leafish(size: int) -> np.ndarray:
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy = cx = size / 2
    blob = (((yy - cy) / (size * 0.33)) ** 2
            + ((xx - cx) / (size * 0.4)) ** 2) < 1.0
    img = np.full((size, size, 3), 232, np.float32)
    img[..., 0][blob] = 52
    img[..., 1][blob] = 150 + 40 * np.sin(xx[blob] / 9)
    img[..., 2][blob] = 44
    img += rng.normal(0, 5, img.shape)
    return img.clip(0, 255).astype(np.uint8)


@pytest.mark.parametrize("size", [448, 512])
def test_shear_matches_pil_highres(size):
    img = _big_leafish(size)
    s = 0.15
    ref = np.asarray(Image.fromarray(img).transform(
        (size, size), Image.AFFINE, [1, s, 0, 0, 1, 0], Image.BICUBIC))
    ours = np.clip(np.round(np.asarray(shear_warp(
        jnp.asarray(img), s, True, (size, size), fill=0.0,
        kernel="bicubic", half_px=True))), 0, 255)
    d = np.abs(ours.astype(np.float32) - ref.astype(np.float32))
    assert d.mean() <= 1.2 and (d > 2).mean() <= 0.02


@pytest.mark.parametrize("size", [448, 512])
def test_crop_matches_pil_highres(size):
    img = _big_leafish(size)
    left, top = 31, 17
    nw = nh = int(size * 0.85)
    ref = np.asarray(Image.fromarray(img)
                     .crop((left, top, left + nw, top + nh))
                     .resize((size, size), Image.LANCZOS))
    ax, ay = nw / size, nh / size
    ours = np.clip(np.round(np.asarray(scale_translate_warp(
        jnp.asarray(img), jnp.array([ax, ay]),
        jnp.array([left + 0.5 * ax - 0.5, top + 0.5 * ay - 0.5]),
        (size, size), fill=None, kernel="lanczos3"))), 0, 255)
    d = np.abs(ours.astype(np.float32) - ref.astype(np.float32))
    assert d.mean() <= 0.6 and (d > 2).mean() <= 0.02


@pytest.mark.parametrize("size", [448, 512])
def test_pallas_rotate_highres_matches_einsum(size):
    """Both Pallas rotate variants at high res (interpret mode) vs the
    einsum 3-shear path — same math, so near-exact."""
    from leaffliction_tpu.ops.augment import rotate_canvas_hw
    from leaffliction_tpu.ops.pallas.rotate import (
        rotate_batch_pallas,
        rotate_batch_pallas_nhwc,
    )
    from leaffliction_tpu.ops.resample import rotate_warp

    img = _big_leafish(size)
    canvas = rotate_canvas_hw(size, size)
    angle = 23.0
    ref = np.clip(np.round(np.asarray(rotate_warp(
        jnp.asarray(img), angle, canvas, fill=255.0))), 0, 255)
    for fn in (rotate_batch_pallas, rotate_batch_pallas_nhwc):
        out = np.asarray(fn(jnp.asarray(img)[None], jnp.array([angle]),
                            canvas, fill=255.0, interpret=True))[0]
        d = np.abs(out.astype(np.float32) - ref)
        assert (d > 1).mean() < 0.002, fn.__name__


@pytest.mark.parametrize("size", [448, 512])
def test_pallas_shear_highres_matches_matmul(size):
    from leaffliction_tpu.ops.pallas.rotate import shear_batch_pallas

    img = _big_leafish(size)
    s = -0.17
    ref = np.clip(np.round(np.asarray(shear_warp(
        jnp.asarray(img), s, True, (size, size), fill=0.0,
        kernel="bicubic", half_px=True))), 0, 255)
    out = np.asarray(shear_batch_pallas(
        jnp.asarray(img)[None], jnp.array([s]), jnp.array([True]),
        fill=0.0, interpret=True))[0]
    assert np.abs(out.astype(np.float32) - ref).max() <= 1.0


def test_rotate_vmem_budget_and_variant_selection():
    """The interleaved kernel must only be chosen while its scratch fits the
    ~16 MB v5e VMEM with headroom; the per-channel fallback must fit at
    every supported size."""
    from leaffliction_tpu.ops.augment import (
        _rotate_vmem_bytes,
        rotate_canvas_hw,
    )

    budget = 8 * 1024 * 1024          # selection threshold (half of VMEM)
    hard_cap = 14 * 1024 * 1024       # leave compiler headroom below 16 MB
    for size in (64, 224, 448, 512, 640):
        canvas = rotate_canvas_hw(size, size)
        inter = _rotate_vmem_bytes(canvas, interleaved=True)
        perch = _rotate_vmem_bytes(canvas, interleaved=False)
        chosen = inter if inter <= budget else perch
        assert chosen <= hard_cap, (size, chosen)
    # 224 stays on the faster interleaved variant; 512 falls back
    assert _rotate_vmem_bytes(rotate_canvas_hw(224, 224), True) <= budget
    assert _rotate_vmem_bytes(rotate_canvas_hw(512, 512), True) > budget


@pytest.mark.slow
def test_mask_pipeline_512():
    """Full mask pipeline at 512px: segments the big leaf correctly."""
    from leaffliction_tpu.segment.config import TransformConfig
    from leaffliction_tpu.segment.mask import make_mask_batch

    img = _big_leafish(512)
    cfg = TransformConfig(mask_upscale_factor=1.0, mask_upscale_long_side=0,
                          grabcut_refine=False)
    masks, scores = make_mask_batch(jnp.asarray(img)[None], cfg)
    mask = np.asarray(masks[0]) > 0
    assert float(np.asarray(scores[0])) > 0
    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
    blob = (((yy - 256) / (512 * 0.33)) ** 2
            + ((xx - 256) / (512 * 0.4)) ** 2) < 1.0
    iou = (mask & blob).sum() / max((mask | blob).sum(), 1)
    assert iou > 0.7, f"IoU {iou:.3f}"
