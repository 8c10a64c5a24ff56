"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so that mesh/sharding
paths (pjit over a `data` axis) are exercised without TPU hardware — the
standard JAX recipe (`--xla_force_host_platform_device_count`). Must be set
before jax initializes its backends, hence module scope here.
"""

import os

_ON_TPU = os.environ.get("LEAF_TEST_TPU", "") not in ("", "0")

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# The environment's axon sitecustomize force-registers the TPU backend and
# re-exports JAX_PLATFORMS=axon; config.update wins over both.
# LEAF_TEST_TPU=1 opts out of the CPU forcing so hardware-only tests
# (e.g. the native-PRNG Pallas kernels) can run against the real chip.
import jax  # noqa: E402

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

# Tests share a PERSISTENT compile cache across sessions: XLA:CPU compiles
# dominate the quick tier's wall (~11 min cold on this 1-core host), and
# JAX keys cache entries by HLO fingerprint, so edited programs recompile
# automatically while unchanged ones load in milliseconds. Safe against the
# old relay-AOT poisoning concern because core/cache.py scopes the dir by
# requested platform (cpu vs axon populations never mix); LEAF_TEST_TPU
# sessions land in their own scope for the same reason.
os.environ.setdefault(
    "LEAF_JAX_CACHE_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "leaffliction_tpu",
                 "jax-tests"))

from leaffliction_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def tiny_dataset(tmp_path_factory):
    """Synthetic root/PLANT/CLASS tree with small JPEGs (leaf-like blobs)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("dataset")
    rng = np.random.default_rng(42)
    spec = {
        "Apple": {"healthy": 12, "rust": 7, "scab": 5},
        "Grape": {"healthy": 9, "spot": 4},
    }
    for plant, classes in spec.items():
        for cls, n in classes.items():
            d = root / plant / cls
            d.mkdir(parents=True)
            for i in range(n):
                img = _leafish_image(rng, 64)
                Image.fromarray(img).save(d / f"image ({i}).JPG", quality=95)
    return root


def _leafish_image(rng, size):
    """Green blob on light background — enough structure for mask tests."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cy, cx = size / 2 + rng.normal(0, 3), size / 2 + rng.normal(0, 3)
    ry, rx = size * 0.32 + rng.normal(0, 2), size * 0.38 + rng.normal(0, 2)
    blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
    img = np.full((size, size, 3), 235, np.uint8)
    img[..., 0][blob] = 40 + (rng.random() * 40)
    img[..., 1][blob] = 120 + (rng.random() * 80)
    img[..., 2][blob] = 30 + (rng.random() * 40)
    noise = rng.normal(0, 4, img.shape)
    return np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
