"""Fused Pallas distortion kernel: distributional parity with the XLA path.

`ops/pallas/distortion.py` uses the TPU-native per-core PRNG
(`pltpu.prng_random_bits`), which has no CPU interpret lowering — so this
test runs only on a real TPU backend (it self-skips under the CPU conftest).
The contract is statistical (the reference op is additive N(0,5) noise +
autocontrast, `srcs/preprocessing/image_augmenter.py:116-133`): matching
moments and per-channel autocontrast range behavior, not bit equality.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="native per-core PRNG needs a TPU backend")
def test_pallas_distortion_matches_xla_distribution():
    from leaffliction_tpu.ops.pallas.distortion import distortion_batch_pallas

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        np.clip(rng.normal(128, 30, (8, 224, 224, 3)), 40, 210)
        .astype(np.uint8))
    seeds = jnp.asarray(rng.integers(0, 2**31, (8, 3)), jnp.int32)
    cutoffs = jnp.asarray(rng.uniform(0.0, 2.0, (8,)), jnp.float32)

    out = np.asarray(distortion_batch_pallas(imgs, seeds, cutoffs))
    assert out.shape == imgs.shape and out.dtype == np.uint8

    src = np.asarray(imgs).astype(np.float32)
    got = out.astype(np.float32)
    # autocontrast stretches toward the full range
    assert got.max() >= 250 and got.min() <= 5
    # structure preserved, noise present
    corr = np.corrcoef(got.reshape(-1), src.reshape(-1))[0, 1]
    assert corr > 0.8
    assert np.abs(got - src).mean() > 1.0

    # determinism under fixed seeds
    out2 = np.asarray(distortion_batch_pallas(imgs, seeds, cutoffs))
    np.testing.assert_array_equal(out, out2)
