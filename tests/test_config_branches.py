"""Config-branch coverage: toggles that default off in the standard flows."""

import numpy as np
import pytest

import jax.numpy as jnp

from leaffliction_tpu.segment.config import TransformConfig


@pytest.fixture(scope="module")
def leaf_img():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import _leafish_image

    rng = np.random.default_rng(3)
    img = _leafish_image(rng, 80)
    img[20:30, 30:42] = [140, 80, 35]  # brown patch
    return img


def test_shadow_suppression_path(leaf_img):
    from leaffliction_tpu.segment.mask import make_mask_core

    cfg = TransformConfig(shadow_suppression=True, mask_upscale_factor=1.0,
                          mask_upscale_long_side=0, grabcut_refine=False)
    mask, score = make_mask_core(jnp.asarray(leaf_img, jnp.float32), cfg)
    mask = np.asarray(mask)
    assert mask.any()
    assert mask[40, 40]  # leaf center survives suppression


def test_lab_brown_path(leaf_img):
    from leaffliction_tpu.segment.brown import brown_filter

    cfg = TransformConfig(use_lab_brown=True, brown_min_area_px=5,
                          mask_upscale_factor=1.0, mask_upscale_long_side=0,
                          grabcut_refine=False)
    mask = np.ones(leaf_img.shape[:2], bool)
    vis, pct, count = brown_filter(leaf_img, mask, cfg)
    assert vis.shape == leaf_img.shape
    assert 0.0 <= pct <= 100.0


def test_kmeans_bias_modes(leaf_img):
    from leaffliction_tpu.segment.mask import _cand_kmeans

    for bias in ("light_bg", "dark_bg", None):
        cfg = TransformConfig(bg_bias=bias, mask_upscale_factor=1.0,
                              mask_upscale_long_side=0, grabcut_refine=False)
        m = np.asarray(_cand_kmeans(jnp.asarray(leaf_img, jnp.float32), cfg))
        assert m.shape == leaf_img.shape[:2]
        assert 0 < m.mean() < 1  # nontrivial cluster


@pytest.mark.slow
def test_separable_model_trains():
    import jax

    from leaffliction_tpu.models.leafcnn import build_leafcnn
    from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
    from leaffliction_tpu.train.config import TrainConfig
    from leaffliction_tpu.train.steps import build_step_fns, create_train_state

    model = build_leafcnn(num_classes=3, scale="tiny", separable=True,
                          dtype=jnp.float32)
    cfg = TrainConfig.fast()
    fns = build_step_fns(model, cfg, 3, 4, make_mesh(MeshSpec()))
    state = create_train_state(model, cfg, 32, 0)
    rng = np.random.default_rng(0)
    state, metrics = fns.train_step(
        state, rng.integers(0, 255, (8, 32, 32, 3), np.uint8),
        rng.integers(0, 3, (8,)).astype(np.int32),
        np.ones((8,), np.float32), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_mask_upscale_path(leaf_img):
    from leaffliction_tpu.segment.mask import make_mask

    cfg = TransformConfig(mask_upscale_factor=1.3, mask_upscale_long_side=0,
                          grabcut_refine=False)
    mask, contour = make_mask(leaf_img, cfg)
    # results resized back to original dimensions
    assert mask.shape == leaf_img.shape[:2]
    assert contour is None or contour.reshape(-1, 2).max() < 80
