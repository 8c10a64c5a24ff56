"""Pallas CC propagation round: interpret-mode parity with the XLA round.

One in-VMEM round (`ops/pallas/components.propagate_round_pallas`) must be
bit-equal to the packed-cummax XLA round in `ops/components._propagate` —
the convergence loop composes whichever round implementation is active, so
round-level equality gives label-level equality.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from leaffliction_tpu.ops.pallas.components import (  # noqa: E402
    propagate_round_pallas,
)


def _xla_round(lab, mask, segs, label_bits):
    low = (1 << label_bits) - 1
    grown = jax.lax.reduce_window(
        lab, jnp.int32(0), jax.lax.max, (3, 3), (1, 1), [(1, 1), (1, 1)])
    lab = jnp.where(mask, grown, 0)
    fwd = jax.lax.cummax(segs[2] | lab, axis=1) & low
    bwd = jax.lax.cummax(segs[3] | lab, axis=1, reverse=True) & low
    lab = jnp.where(mask, jnp.maximum(fwd, bwd), 0)
    fwd = jax.lax.cummax(segs[0] | lab, axis=0) & low
    bwd = jax.lax.cummax(segs[1] | lab, axis=0, reverse=True) & low
    return jnp.where(mask, jnp.maximum(fwd, bwd), 0)


@pytest.mark.parametrize("seed,density", [(0, 0.5), (1, 0.2), (2, 0.8)])
def test_pallas_round_matches_xla(seed, density):
    h, w = 48, 64
    rng = np.random.default_rng(seed)
    mask = jnp.asarray(rng.random((h, w)) < density)
    label_bits = (h * w + 1).bit_length()

    flat = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1)
    lab = jnp.where(mask, flat, 0)

    bar = (~mask).astype(jnp.int32)
    segs = [
        jnp.cumsum(bar, axis=0) << label_bits,
        jnp.cumsum(bar[::-1, :], axis=0)[::-1, :] << label_bits,
        jnp.cumsum(bar, axis=1) << label_bits,
        jnp.cumsum(bar[:, ::-1], axis=1)[:, ::-1] << label_bits,
    ]

    ref = lab
    got = lab
    for _ in range(3):  # parity must hold round-over-round
        ref = _xla_round(ref, mask, segs, label_bits)
        got = propagate_round_pallas(got, mask, segs[0], segs[1],
                                     segs[2], segs[3], label_bits,
                                     interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pallas_round_under_vmap():
    h, w = 16, 32
    rng = np.random.default_rng(3)
    masks = jnp.asarray(rng.random((4, h, w)) < 0.5)
    label_bits = (h * w + 1).bit_length()

    flat = (jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
            + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) + 1)

    def one(mask):
        lab = jnp.where(mask, flat, 0)
        bar = (~mask).astype(jnp.int32)
        segs = [
            jnp.cumsum(bar, axis=0) << label_bits,
            jnp.cumsum(bar[::-1, :], axis=0)[::-1, :] << label_bits,
            jnp.cumsum(bar, axis=1) << label_bits,
            jnp.cumsum(bar[:, ::-1], axis=1)[:, ::-1] << label_bits,
        ]
        got = propagate_round_pallas(lab, mask, segs[0], segs[1], segs[2],
                                     segs[3], label_bits, interpret=True)
        ref = _xla_round(lab, mask, segs, label_bits)
        return got, ref

    got, ref = jax.vmap(one)(masks)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
