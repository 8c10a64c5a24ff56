"""Augmentation kernel + balancer CLI tests.

Golden where deterministic (autocontrast vs PIL, PIL-expand geometry);
property-based for the stochastic kernels (determinism under fixed keys,
shape/range contracts) per SURVEY §4.
"""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image, ImageOps

import jax
import jax.numpy as jnp

from leaffliction_tpu.data.balancer import calculate_plan
from leaffliction_tpu.ops.augment import (
    AUG_OPS,
    BATCH_KERNELS,
    pil_expanded_size,
    rotate_canvas_hw,
)
from leaffliction_tpu.ops.photometric import autocontrast


@pytest.fixture(scope="module")
def imgs(rng):
    yy, xx = np.mgrid[0:48, 0:48].astype(np.float32)
    batch = []
    for i in range(4):
        img = np.stack([(xx * (i + 2)) % 255, (yy * 3) % 255,
                        ((xx + yy) * 2) % 255], -1)
        batch.append(img.astype(np.uint8))
    return np.stack(batch)


def keys_for(n, seed=0):
    return jax.random.split(jax.random.key(seed), n)


def test_flip_is_exact_transpose(imgs):
    keys = keys_for(4)
    out = np.asarray(BATCH_KERNELS["flip"](keys, imgs))
    for i in range(4):
        assert (np.array_equal(out[i], imgs[i][:, ::-1, :])
                or np.array_equal(out[i], imgs[i][::-1, :, :]))


def test_all_ops_deterministic_under_key(imgs):
    for op in AUG_OPS:
        keys = keys_for(4, seed=3)
        a = BATCH_KERNELS[op](keys, imgs)
        b = BATCH_KERNELS[op](keys, imgs)
        a = a[0] if isinstance(a, tuple) else a
        b = b[0] if isinstance(b, tuple) else b
        assert np.array_equal(np.asarray(a), np.asarray(b)), op
        keys2 = keys_for(4, seed=4)
        c = BATCH_KERNELS[op](keys2, imgs)
        c = c[0] if isinstance(c, tuple) else c
        assert not np.array_equal(np.asarray(a), np.asarray(c)), op


def test_rotate_canvas_and_pil_expand(imgs):
    keys = keys_for(4)
    out, angles = BATCH_KERNELS["rotate"](keys, imgs)
    ch, cw = rotate_canvas_hw(48, 48)
    assert out.shape == (4, ch, cw, 3)
    for a in np.asarray(angles):
        assert -30.0 <= a <= 30.0
        ew, eh = pil_expanded_size(float(a), 48, 48)
        ref = Image.fromarray(imgs[0]).rotate(float(a), expand=True)
        assert (ref.size[0], ref.size[1]) == (ew, eh)
        assert ew <= cw and eh <= ch


@pytest.mark.parametrize("hw", [(16, 400), (400, 16)])
def test_rotate_extreme_aspect_matches_pil(hw):
    """Regression: the static rotate canvas must hold the centered INPUT
    and the first shear's extent, not just the rotated bounding box — a
    16x400 strip used to crash placement (update larger than operand)."""
    h, w = hw
    rng = np.random.default_rng(5)
    img = (rng.integers(0, 200, (h, w, 3)) + 28).astype(np.uint8)
    out, angles = BATCH_KERNELS["rotate"](keys_for(1, 11), img[None])
    a = float(np.asarray(angles)[0])
    ew, eh = pil_expanded_size(a, w, h)
    canvas = np.asarray(out)[0]
    assert canvas.shape[0] >= max(h, eh) and canvas.shape[1] >= max(w, ew)
    top = max((canvas.shape[0] - eh) // 2, 0)
    left = max((canvas.shape[1] - ew) // 2, 0)
    ours = canvas[top:top + eh, left:left + ew].astype(np.float32)
    ref = np.asarray(Image.fromarray(img).rotate(
        a, resample=Image.BILINEAR, expand=True,
        fillcolor=(255, 255, 255))).astype(np.float32)
    assert ours.shape == ref.shape
    # bilinear-vs-bilinear: bulk of pixels should agree tightly
    assert (np.abs(ours - ref) <= 20).mean() >= 0.9


def test_skew_shear_crop_shapes_and_content(imgs):
    for op in ("skew", "shear", "crop"):
        out = np.asarray(BATCH_KERNELS[op](keys_for(4, 7), imgs))
        assert out.shape == imgs.shape, op
        assert out.dtype == np.uint8
        # content must actually change
        assert np.abs(out.astype(int) - imgs.astype(int)).mean() > 1.0, op


def test_distortion_adds_noise_and_stretches(imgs):
    out = np.asarray(BATCH_KERNELS["distortion"](keys_for(4, 9), imgs))
    assert out.shape == imgs.shape
    diff = np.abs(out.astype(np.float32) - imgs.astype(np.float32))
    assert diff.mean() > 1.0
    # structure preserved: strong correlation with the source
    corr = np.corrcoef(out.reshape(-1).astype(np.float32),
                       imgs.reshape(-1).astype(np.float32))[0, 1]
    assert corr > 0.8


def test_autocontrast_matches_pil():
    rng = np.random.default_rng(2)
    img = np.clip(rng.normal(128, 30, (32, 32, 3)), 40, 210).astype(np.uint8)
    for cutoff in (0.0, 1.0, 2.0):
        ref = np.asarray(ImageOps.autocontrast(Image.fromarray(img),
                                               cutoff=cutoff))
        ours = np.asarray(autocontrast(jnp.asarray(img).astype(jnp.float32),
                                       cutoff))
        assert np.abs(ours - ref.astype(np.float32)).max() <= 2.0, cutoff


def test_calculate_plan_matches_reference_semantics():
    counts = {"Apple": {"healthy": 10, "rust": 3, "scab": 10},
              "Grape": {"spot": 5}}
    plan = calculate_plan(counts)
    assert set(plan) == {"rust"}
    assert sum(plan["rust"].values()) == 7
    # 7 = 6*1 + 1 → base 1 each, remainder to first transform
    assert plan["rust"]["flip"] == 2
    assert plan["rust"]["distortion"] == 1


def test_augment_cli_single_image(tiny_dataset, tmp_path):
    from leaffliction_tpu.cli import augment as aug_cli

    img = next((tiny_dataset / "Apple" / "rust").glob("*.JPG"))
    out = tmp_path / "example"
    aug_cli.main([str(img), "--output", str(out), "--seed", "42"])
    files = sorted(p.name for p in out.iterdir())
    assert f"original_{img.name}" in files
    for t in AUG_OPS:
        assert f"{t}_{img.name}" in files
    assert len(files) == 7


def test_augment_cli_dataset_balances(tiny_dataset, tmp_path, monkeypatch):
    from leaffliction_tpu.cli import augment as aug_cli
    from leaffliction_tpu.data.scan import count_by_plant_class, scan_dataset

    monkeypatch.chdir(tmp_path)  # artifacts/ lands in tmp
    target = tmp_path / "balanced"
    aug_cli.main([str(tiny_dataset), "--output", str(target), "--seed", "42"])

    counts = count_by_plant_class(scan_dataset(target))
    # per-plant balance: every class matches the plant max
    assert counts["Apple"] == {"healthy": 12, "rust": 12, "scab": 12}
    assert counts["Grape"] == {"healthy": 9, "spot": 9}

    manifest = json.loads(
        (tmp_path / "artifacts/datasets/manifest_augmented.json").read_text())
    meta = manifest["meta"]
    assert meta["total_images"] == 12 * 3 + 9 * 2
    assert meta["augmented_images"] == (12 - 7) + (12 - 5) + (9 - 4)
    assert meta["original_images"] == 37
    aug_items = [i for i in manifest["items"] if i["augmented"]]
    assert all("_aug_" in Path(i["src"]).stem for i in aug_items)
    assert (tmp_path / "artifacts/distribution/balanced_distribution.csv").exists()


def test_balancer_mixed_extreme_sizes(tmp_path, monkeypatch):
    """Dataset balancing over a class mixing square, 16x200, and 200x16
    images: the per-shape batching plus the aspect-safe rotate canvas must
    handle every group (regression for the canvas placement crash)."""
    from leaffliction_tpu.cli import augment as aug_cli
    from leaffliction_tpu.data.scan import count_by_plant_class, scan_dataset

    rng = np.random.default_rng(3)
    sizes = [(40, 40), (16, 200), (200, 16), (40, 40), (64, 48)]
    for cls, n in {"a": 5, "b": 2}.items():
        d = tmp_path / "tree" / "Plant" / cls
        d.mkdir(parents=True)
        for i in range(n):
            h, w = sizes[i % len(sizes)]
            Image.fromarray(
                rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
            ).save(d / f"i{i}.jpg")

    monkeypatch.chdir(tmp_path)
    target = tmp_path / "balanced"
    aug_cli.main([str(tmp_path / "tree"), "--output", str(target)])
    counts = count_by_plant_class(scan_dataset(target))
    assert counts["Plant"] == {"a": 5, "b": 5}


def test_rotate_batch_matches_pil_at_sampled_angles(imgs):
    """End-to-end parity: for whatever angle the kernel sampled, the cropped
    canvas must match PIL rotate(expand=True, white) within tolerance."""
    keys = keys_for(4, seed=21)
    out, angles = BATCH_KERNELS["rotate"](keys, imgs)
    out = np.asarray(out)
    for i, angle in enumerate(np.asarray(angles)):
        ew, eh = pil_expanded_size(float(angle), 48, 48)
        ch, cw = out.shape[1], out.shape[2]
        top, left = max((ch - eh) // 2, 0), max((cw - ew) // 2, 0)
        ours = out[i, top:top + eh, left:left + ew].astype(np.float32)
        ref = np.asarray(Image.fromarray(imgs[i]).rotate(
            float(angle), resample=Image.BILINEAR, expand=True,
            fillcolor=(255, 255, 255))).astype(np.float32)
        assert ours.shape == ref.shape
        m = 6
        diff = np.abs(ours[m:-m, m:-m] - ref[m:-m, m:-m])
        frac_close = (diff <= 20).mean()
        assert frac_close > 0.93, (i, float(angle), frac_close)


def test_wrap_noise_u8_matches_numpy_reference_bytes():
    """`wrap_noise_u8` reproduces the reference's exact noise arithmetic
    byte-for-byte (`srcs/preprocessing/image_augmenter.py:121-124`):
    noise.astype(np.uint8) — C truncation + mod-256 wrap — added with
    uint8 overflow (the reference's subsequent np.clip on an already-uint8
    array is a no-op)."""
    from leaffliction_tpu.ops.augment import wrap_noise_u8

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    noise = rng.normal(0, 5, img.shape)  # float64, same as the reference

    expected = np.clip(img + noise.astype(np.uint8), 0, 255)  # verbatim math
    got = np.asarray(wrap_noise_u8(jnp.asarray(img),
                                   jnp.asarray(noise.astype(np.float32))))
    np.testing.assert_array_equal(got, expected.astype(np.uint8))

    # the boundary-wrap cases are actually exercised
    bright = np.full((8, 128, 3), 250, np.uint8)
    pos = np.full(bright.shape, 20.0, np.float32)
    wrapped = np.asarray(wrap_noise_u8(jnp.asarray(bright), jnp.asarray(pos)))
    assert (wrapped == 14).all()  # 250 + 20 wraps, no saturation


def test_distortion_strict_wrap_env(imgs, monkeypatch):
    """LEAF_STRICT_DISTORTION=1 switches distortion_batch to the wraparound
    variant; parameter stream (noise values, cutoff) is shared with the
    default clipped path."""
    from leaffliction_tpu.ops.augment import (
        distortion_batch,
        distortion_batch_wrap,
    )

    keys = keys_for(4, seed=9)
    strict = np.asarray(distortion_batch_wrap(keys, imgs))
    assert strict.dtype == np.uint8 and strict.shape == imgs.shape
    monkeypatch.setenv("LEAF_STRICT_DISTORTION", "1")
    # call the raw (unjitted) function: re-jitting the same underlying
    # function object would reuse the earlier tests' cached trace, where
    # the env flag was read as unset
    via_env = np.asarray(distortion_batch.__wrapped__(keys, imgs))
    np.testing.assert_array_equal(via_env, strict)
