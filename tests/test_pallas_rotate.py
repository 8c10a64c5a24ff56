"""Pallas barrel-shift rotate: interpret-mode parity with the einsum path.

The TPU kernel (`ops/pallas/rotate.py`) must agree with the matmul
Paeth rotation (`ops/resample.rotate_warp`) to f32 rounding — both
implement the same 3-shear decomposition with 2-tap triangle weights and
per-pass white fill. PIL-level parity is covered transitively by
`tests/test_augment.py`'s rotate golden tests against the einsum path.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from leaffliction_tpu.ops.augment import rotate_canvas_hw  # noqa: E402
from leaffliction_tpu.ops.pallas.rotate import rotate_batch_pallas  # noqa: E402
from leaffliction_tpu.ops.resample import rotate_warp  # noqa: E402


def _einsum_reference(imgs: np.ndarray, angles: np.ndarray, canvas):
    out = []
    for img, ang in zip(imgs, angles):
        o = rotate_warp(jnp.asarray(img).astype(jnp.float32), ang,
                        canvas, fill=255.0)
        out.append(np.clip(np.round(np.asarray(o)), 0, 255).astype(np.uint8))
    return np.stack(out)


@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_pallas_rotate_matches_einsum(hw):
    h, w = hw
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (3, h, w, 3), np.uint8)
    angles = np.array([-29.5, 0.0, 17.3], np.float32)
    canvas = rotate_canvas_hw(h, w)

    ref = _einsum_reference(imgs, angles, canvas)
    got = np.asarray(rotate_batch_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), canvas, interpret=True))

    assert got.shape == ref.shape
    diff = np.abs(ref.astype(int) - got.astype(int))
    # identical 2-tap weights; differences are f32 summation-order rounding
    assert diff.max() <= 2
    assert (diff > 1).mean() < 0.002


def test_pallas_rotate_zero_angle_identity():
    h = w = 32
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 256, (1, h, w, 3), np.uint8)
    canvas = rotate_canvas_hw(h, w)
    out = np.asarray(rotate_batch_pallas(
        jnp.asarray(imgs), jnp.zeros((1,), np.float32), canvas,
        interpret=True))[0]
    oh, ow = canvas
    y0, x0 = (oh - h) // 2, (ow - w) // 2
    np.testing.assert_array_equal(out[y0:y0 + h, x0:x0 + w], imgs[0])
    # the border is the white fill
    assert (out[0] == 255).all() and (out[:, 0] == 255).all()


def test_pallas_clamp_rotate_matches_einsum():
    from leaffliction_tpu.ops.pallas.rotate import rotate_batch_pallas_clamp_f32

    h, w = 48, 64
    rng = np.random.default_rng(2)
    imgs = rng.random((3, h, w, 3)).astype(np.float32)
    angles = np.array([-17.0, 0.0, 9.5], np.float32)

    ref = np.stack([
        np.asarray(rotate_warp(jnp.asarray(im), a, (h, w), fill=None))
        for im, a in zip(imgs, angles)
    ])
    got = np.asarray(rotate_batch_pallas_clamp_f32(
        jnp.asarray(imgs), jnp.asarray(angles), interpret=True))
    assert got.shape == ref.shape
    # same 2-tap weights and clamp semantics; f32 rounding only
    np.testing.assert_allclose(got, ref, atol=2e-5)
    # zero angle is the identity
    np.testing.assert_allclose(got[1], imgs[1], atol=1e-6)


@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_pallas_rotate_nhwc_matches_einsum(hw):
    from leaffliction_tpu.ops.pallas.rotate import rotate_batch_pallas_nhwc

    h, w = hw
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, (3, h, w, 3), np.uint8)
    angles = np.array([-29.5, 0.0, 17.3], np.float32)
    canvas = rotate_canvas_hw(h, w)

    ref = _einsum_reference(imgs, angles, canvas)
    got = np.asarray(rotate_batch_pallas_nhwc(
        jnp.asarray(imgs), jnp.asarray(angles), canvas, interpret=True))
    assert got.shape == ref.shape
    diff = np.abs(ref.astype(int) - got.astype(int))
    assert diff.max() <= 2
    assert (diff > 1).mean() < 0.002


@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_fused_train_aug_kernel_matches_composition(hw):
    """Fused dequant+rotate+contrast kernel == the unfused composition
    (dequant -> einsum clamp rotate -> mean/apply contrast) to f32
    rounding, including the barrel bias-trick (`max_shift`) path."""
    from leaffliction_tpu.ops.pallas.rotate import (
        train_aug_rotate_contrast_pallas,
    )

    h, w = hw
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 256, (4, h, w, 3), np.uint8)
    angles = np.array([-17.9, 0.0, 9.3, 17.5], np.float32)
    factors = np.array([0.92, 1.0, 1.07, 1.1], np.float32)

    x = jnp.asarray(imgs).astype(jnp.float32) / 255.0
    rot = jax.vmap(lambda im, a: rotate_warp(im, a, (h, w), fill=None))(
        x, jnp.asarray(angles))
    mean = jnp.mean(rot, axis=(1, 2), keepdims=True)
    ref = np.asarray(jnp.clip(
        mean + (rot - mean) * factors[:, None, None, None], 0.0, 1.0))

    got = np.asarray(train_aug_rotate_contrast_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # zero angle, unit factor: pure dequant identity
    np.testing.assert_allclose(got[1], np.asarray(x[1]), atol=1e-6)


@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
@pytest.mark.parametrize("out_dtype", ["float32", "bfloat16"])
def test_fused_train_aug_nhwc_kernel_matches_per_plane(hw, out_dtype):
    """The interleaved-channel fused train-aug kernel == the per-plane one
    (identical pass math on a lane-interleaved canvas; only the layout and
    the per-channel edge/mean selects differ)."""
    from leaffliction_tpu.ops.pallas.rotate import (
        train_aug_rotate_contrast_nhwc_pallas,
        train_aug_rotate_contrast_pallas,
    )

    h, w = hw
    dt = jnp.dtype(out_dtype)
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 256, (4, h, w, 3), np.uint8)
    angles = np.array([-17.9, 0.0, 9.3, 17.5], np.float32)
    factors = np.array([0.92, 1.0, 1.07, 1.1], np.float32)

    ref = np.asarray(train_aug_rotate_contrast_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, out_dtype=dt, interpret=True), np.float32)
    got = np.asarray(train_aug_rotate_contrast_nhwc_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, out_dtype=dt, interpret=True), np.float32)
    atol = 1e-6 if out_dtype == "float32" else 1e-2
    np.testing.assert_allclose(got, ref, atol=atol)


@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_fused_train_aug_bf16_canvas_tolerance(hw):
    """bf16 shear canvases (the train step's fast path for bf16-compute
    models) stay within a few gray levels of the f32-canvas kernel, and
    zero-angle/unit-factor stays an exact dequant up to bf16 rounding."""
    from leaffliction_tpu.ops.pallas.rotate import (
        train_aug_rotate_contrast_nhwc_pallas,
    )

    h, w = hw
    rng = np.random.default_rng(17)
    imgs = rng.integers(0, 256, (4, h, w, 3), np.uint8)
    angles = np.array([-17.9, 0.0, 9.3, 17.5], np.float32)
    factors = np.array([0.92, 1.0, 1.07, 1.1], np.float32)

    ref = np.asarray(train_aug_rotate_contrast_nhwc_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, canvas_dtype=jnp.float32, interpret=True))
    got = np.asarray(train_aug_rotate_contrast_nhwc_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, canvas_dtype=jnp.bfloat16, interpret=True))
    # three bf16 lerps + bf16 dequant: a few 1/255 levels of amplitude
    assert np.abs(got - ref).max() <= 4.5 / 255.0
    assert np.abs(got - ref).mean() <= 1.0 / 255.0
    # identity case: bf16 quantization of x/255 only
    np.testing.assert_allclose(got[1], ref[1], atol=1.0 / 255.0)


@pytest.mark.parametrize("variant", ["planar", "nhwc"])
def test_rotate_bias_trick_matches_unbounded(variant):
    """`max_angle_deg` is a pure barrel-width optimization: with angles
    inside the bound, the bounded kernels must be BIT-identical to the
    unbounded ones (the clamp never binds — the bound covers the padded
    extent)."""
    from leaffliction_tpu.ops.pallas.rotate import (
        rotate_batch_pallas,
        rotate_batch_pallas_nhwc,
    )

    h, w = 48, 80
    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, (4, h, w, 3), np.uint8)
    angles = np.array([-30.0, -11.7, 0.0, 29.9], np.float32)
    canvas = rotate_canvas_hw(h, w)
    fn = rotate_batch_pallas if variant == "planar" else (
        rotate_batch_pallas_nhwc)

    free = np.asarray(fn(jnp.asarray(imgs), jnp.asarray(angles), canvas,
                         interpret=True))
    bound = np.asarray(fn(jnp.asarray(imgs), jnp.asarray(angles), canvas,
                          max_angle_deg=30.0, interpret=True))
    np.testing.assert_array_equal(bound, free)


@pytest.mark.slow  # guards a non-production tools/ kernel (measured
# negative result); full tier only
@pytest.mark.parametrize("n", [8, 5])
def test_slab_train_aug_kernel_matches_per_plane(n):
    """The multi-image slab kernel (`train_aug_fused_pallas`, kept in
    tools/ as a measured negative result) == the per-(image, channel)
    kernel to f32 rounding, for G>1 and the G=1 odd-batch fallback; bf16
    output within bf16 quantization."""
    from leaffliction_tpu.ops.pallas.rotate import (
        train_aug_rotate_contrast_pallas,
    )
    from tools.slab_train_aug import train_aug_fused_pallas

    h = w = 32
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (n, h, w, 3), np.uint8)
    angles = rng.uniform(-18, 18, n).astype(np.float32)
    factors = rng.uniform(0.9, 1.1, n).astype(np.float32)

    ref = np.asarray(train_aug_rotate_contrast_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, interpret=True))
    got = np.asarray(train_aug_fused_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)

    got16 = np.asarray(train_aug_fused_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, out_dtype=jnp.bfloat16,
        interpret=True)).astype(np.float32)
    np.testing.assert_allclose(got16, ref, atol=4e-3)

    # per-plane kernel's bf16 output (the train-step wiring) quantizes
    # the same f32 result
    pp16 = np.asarray(train_aug_rotate_contrast_pallas(
        jnp.asarray(imgs), jnp.asarray(angles), jnp.asarray(factors),
        max_angle_deg=18.0, out_dtype=jnp.bfloat16,
        interpret=True)).astype(np.float32)
    np.testing.assert_allclose(pp16, ref, atol=4e-3)


def test_train_augment_u8_fallback_matches_f32_path():
    """On non-TPU backends `train_augment_u8` must reproduce
    `train_augment` on the dequantized batch exactly (same key stream)."""
    from leaffliction_tpu.ops.train_augment import (
        train_augment,
        train_augment_u8,
    )

    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (3, 32, 32, 3), np.uint8)
    key = jax.random.key(7)
    a = np.asarray(train_augment(key, jnp.asarray(imgs).astype(jnp.float32)
                                 / 255.0))
    b = np.asarray(train_augment_u8(key, jnp.asarray(imgs)))
    np.testing.assert_allclose(a, b, atol=1e-6)
