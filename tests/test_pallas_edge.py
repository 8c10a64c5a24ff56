"""Pallas fused edge kernel: interpret-mode parity with the jnp path."""

import numpy as np

import jax.numpy as jnp

from leaffliction_tpu.ops.filters import _edge_nms_jnp, canny
from leaffliction_tpu.ops.pallas.edge import canny_fused, edge_nms_batch


def _gray():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    return ((xx * 3 + yy * 2) % 200 + rng.normal(0, 5, (64, 64))
            ).astype(np.float32)


def test_edge_nms_interior_matches_jnp():
    gray = _gray()
    ours = np.asarray(edge_nms_batch(jnp.asarray(gray)[None],
                                     interpret=True)[0])
    ref = np.asarray(_edge_nms_jnp(jnp.asarray(gray), l2=False))
    m = 4  # border margin: zero-pad vs reflect semantics
    a, b = ours[m:-m, m:-m], ref[m:-m, m:-m]
    assert np.abs(a - b).max() < 1e-3


def test_canny_fused_interior_matches(monkeypatch):
    gray = _gray()
    fused = np.asarray(canny_fused(jnp.asarray(gray), 50, 150,
                                   interpret=True))
    ref = np.asarray(canny(jnp.asarray(gray), 50, 150))
    m = 4
    agree = (fused[m:-m, m:-m] == ref[m:-m, m:-m]).mean()
    assert agree > 0.99
