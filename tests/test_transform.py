"""Transform stack tests: mask strategies, filters, contours, CLI e2e."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from leaffliction_tpu.segment.config import TransformConfig, load_config
from leaffliction_tpu.segment.contours import (
    largest_contour_points,
    resample_contour,
)


@pytest.fixture(scope="module")
def leaf_img(rng):
    import sys

    sys.path.insert(0, str(Path(__file__).parent))
    from conftest import _leafish_image

    return _leafish_image(np.random.default_rng(5), 96)


@pytest.fixture(scope="module")
def cfg():
    return TransformConfig(mask_upscale_factor=1.0, mask_upscale_long_side=0,
                           grabcut_refine=False)


@pytest.fixture(scope="module")
def mask_and_contour(leaf_img, cfg):
    from leaffliction_tpu.segment.mask import make_mask

    return make_mask(leaf_img, cfg)


def test_config_yaml_roundtrip(tmp_path):
    from leaffliction_tpu.segment.config import default_config_path

    cfg = load_config(default_config_path())
    assert cfg.mask_strategy == "inclusive"
    assert cfg.green_hue_range == (25, 100)
    assert cfg.roi_size == (256, 256)
    assert cfg.landmarks_count == 80


def test_config_missing_field_exits(tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("gaussian_sigma: 1.0\n")
    with pytest.raises(SystemExit):
        load_config(bad)


@pytest.mark.slow
def test_mask_strategies_all_run(leaf_img, cfg):
    from leaffliction_tpu.segment.mask import make_mask_core

    for strategy in ("hsv_s", "hsv_v_dark", "hsv_h", "lab", "kmeans",
                     "enhanced", "inclusive", "auto"):
        c = TransformConfig(mask_strategy=strategy, mask_upscale_factor=1.0,
                            mask_upscale_long_side=0, grabcut_refine=False)
        mask, score = make_mask_core(jnp.asarray(leaf_img, jnp.float32), c)
        mask = np.asarray(mask)
        assert mask.shape == leaf_img.shape[:2], strategy
        assert mask.any(), strategy


def test_mask_finds_leaf(leaf_img, mask_and_contour):
    mask, contour = mask_and_contour
    assert mask.dtype == np.uint8
    frac = (mask > 0).mean()
    assert 0.2 < frac < 0.8
    assert mask[48, 48] > 0          # blob center
    assert contour is not None and len(contour) > 20


def test_blur_filter(leaf_img, mask_and_contour, cfg):
    from leaffliction_tpu.segment.blur import blur_filter

    mask, _ = mask_and_contour
    out = np.asarray(blur_filter(jnp.asarray(leaf_img, jnp.float32),
                                 jnp.asarray(mask > 0), cfg))
    assert out.shape == leaf_img.shape
    # zero outside mask
    assert out[~(mask > 0)].max() == 0


def test_brown_filter(leaf_img, mask_and_contour, cfg):
    from leaffliction_tpu.segment.brown import brown_filter

    mask, _ = mask_and_contour
    vis, pct, count = brown_filter(leaf_img, mask > 0, cfg)
    assert vis.shape == leaf_img.shape
    assert 0.0 <= pct <= 100.0
    assert count >= 0


def test_roi_filter(leaf_img, mask_and_contour, cfg):
    from leaffliction_tpu.segment.roi import roi_filter

    _, contour = mask_and_contour
    canvas, vis, rect = roi_filter(leaf_img, contour, cfg)
    assert canvas.shape == (256, 256, 3)
    assert vis.shape == leaf_img.shape
    x, y, w, h = rect
    assert w > 10 and h > 10


def test_analyze_filter(leaf_img, mask_and_contour, cfg):
    from leaffliction_tpu.segment.analyze import analyze_filter, shape_metrics

    mask, contour = mask_and_contour
    out = analyze_filter(leaf_img, mask, contour, cfg)
    assert out.shape == leaf_img.shape
    metrics = shape_metrics(mask > 0, contour)
    assert metrics["area"] > 100
    assert 0 < metrics["solidity"] <= 1.2
    assert metrics["major_axis_length"] >= metrics["minor_axis_length"]


def test_landmarks_filter(leaf_img, mask_and_contour, cfg):
    from leaffliction_tpu.segment.landmarks import landmarks_filter

    mask, contour = mask_and_contour
    out = landmarks_filter(
        leaf_img, contour, cfg,
        make_mask_func=lambda rgb: (mask, contour))
    assert out.shape == leaf_img.shape
    assert not np.array_equal(out, leaf_img)  # landmarks drawn


def test_hist_filter(leaf_img, cfg):
    from leaffliction_tpu.segment.hist import (
        color_region_percentages,
        histogram_filter,
    )

    pcts = color_region_percentages(leaf_img)
    assert set(pcts) == {"Vert Sain", "Vert Jaunâtre", "Jaune", "Brun/Orange",
                         "Rouge", "Zones Sombres", "Zones Claires",
                         "Violet/Pourpre"}
    assert pcts["Vert Sain"] > 10  # leafish image is mostly green
    out = histogram_filter(leaf_img, cfg)
    assert out.ndim == 3 and out.shape[2] == 3


def test_resample_contour_uniform():
    # square contour
    pts = np.array([[0, 0], [10, 0], [10, 10], [0, 10]]).reshape(-1, 1, 2)
    rs = resample_contour(pts, 8)
    assert rs.shape == (8, 2)
    seg = np.linalg.norm(np.diff(np.vstack([rs, rs[:1]]), axis=0), axis=1)
    assert seg.std() < 1.5  # roughly uniform arc length


@pytest.mark.slow
def test_transform_cli_single(leaf_img, tmp_path, monkeypatch):
    from PIL import Image

    from leaffliction_tpu.cli import transform as tf_cli

    monkeypatch.chdir(tmp_path)
    img_path = tmp_path / "image (7).JPG"
    Image.fromarray(leaf_img).save(img_path, quality=95)

    tf_cli.main([str(img_path)])
    out_dir = tmp_path / "artifacts" / "transformations" / "7"
    files = {p.name for p in out_dir.iterdir()}
    for t in ("Blur", "Mask", "ROI", "Analyze", "Landmarks", "Hist", "Brown"):
        assert f"image (7)__T_{t}.jpg" in files, t
    assert "image7_mosaic.jpg" in files

    # mosaic: 8 tiles → 3 rows of 300px
    mosaic = np.asarray(Image.open(out_dir / "image7_mosaic.jpg"))
    assert mosaic.shape == (900, 900, 3)


def test_transform_cli_types_filter(leaf_img, tmp_path, monkeypatch):
    from PIL import Image

    from leaffliction_tpu.cli import transform as tf_cli

    monkeypatch.chdir(tmp_path)
    img_path = tmp_path / "leaf.jpg"
    Image.fromarray(leaf_img).save(img_path, quality=95)
    tf_cli.main([str(img_path), "--types", "Mask,brown", "--out-dir",
                 str(tmp_path / "out")])
    files = {p.name for p in (tmp_path / "out").iterdir()}
    assert "leaf__T_Mask.jpg" in files
    assert "leaf__T_Brown.jpg" in files
    assert "leaf__T_Hist.jpg" not in files


def test_transform_cli_preview_forces_rewrite(leaf_img, tmp_path, monkeypatch,
                                              capsys):
    """--preview must defeat --skip-existing so a stdout-parsing consumer
    always gets fresh, valid paths (the reference's preview contract)."""
    from PIL import Image

    from leaffliction_tpu.cli import transform as tf_cli

    monkeypatch.chdir(tmp_path)
    img_path = tmp_path / "leaf.jpg"
    Image.fromarray(leaf_img).save(img_path, quality=95)
    out = tmp_path / "out"
    tf_cli.main([str(img_path), "--types", "Mask", "--out-dir", str(out)])
    capsys.readouterr()

    # skip-existing alone: mask output skipped (only the mosaic is rewritten)
    tf_cli.main([str(img_path), "--types", "Mask", "--out-dir", str(out),
                 "--skip-existing"])
    skipped = capsys.readouterr().out
    assert "leaf__T_Mask.jpg" not in skipped

    # with --preview: the mask path is printed again
    tf_cli.main([str(img_path), "--types", "Mask", "--out-dir", str(out),
                 "--skip-existing", "--preview"])
    previewed = capsys.readouterr().out
    assert "leaf__T_Mask.jpg" in previewed


def test_transform_cli_folder(leaf_img, tmp_path, monkeypatch):
    from PIL import Image

    from leaffliction_tpu.cli import transform as tf_cli

    monkeypatch.chdir(tmp_path)
    src = tmp_path / "srcdir"
    src.mkdir()
    for i in range(2):
        Image.fromarray(leaf_img).save(src / f"img{i}.jpg", quality=95)
    tf_cli.main(["-src", str(src), "-dst", str(tmp_path / "dstdir"),
                 "--types", "Mask"])
    files = {p.name for p in (tmp_path / "dstdir").iterdir()}
    assert "img0__T_Mask.jpg" in files
    assert "img1__T_Mask.jpg" in files


def test_mask_batch_matches_core(leaf_img, cfg):
    """The batched path (deferred fallback) must equal per-image core."""
    import jax.numpy as jnp

    from leaffliction_tpu.segment.mask import make_mask_batch, make_mask_core

    imgs = np.stack([leaf_img, leaf_img[::-1].copy()]).astype(np.float32)
    batch_masks, batch_scores = make_mask_batch(jnp.asarray(imgs), cfg)
    for i in range(2):
        core_mask, core_score = make_mask_core(jnp.asarray(imgs[i]), cfg)
        assert np.array_equal(np.asarray(batch_masks[i]),
                              np.asarray(core_mask)), i
        assert float(batch_scores[i]) == pytest.approx(float(core_score))
