"""Fused lane-packed BatchNorm (`ops/fused_bn.py`) vs `flax.linen.BatchNorm`.

The fused module claims flax-identical numerics (f32 fast-variance stats,
f32 elementwise normalize cast to module dtype, momentum running-average
update) with a custom VJP that matches autodiff's gradients. These tests
pin that contract across the channel widths the models actually use
(C=32 packs 4 lanes-wide, C=64 packs 2, C=128 packs 1) plus an odd width
that defeats packing entirely.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from leaffliction_tpu.ops.fused_bn import BatchNorm as FusedBN
from leaffliction_tpu.ops.fused_bn import _pack_factor


def _mk(shape, dtype, seed=0):
    x = jax.random.normal(jax.random.key(seed), shape, jnp.float32) * 2 + 0.5
    return x.astype(dtype)


def _pair(dtype, momentum=0.99, eps=1e-3, scale_init=nn.initializers.ones):
    fused = FusedBN(use_running_average=False, momentum=momentum,
                    epsilon=eps, dtype=dtype, scale_init=scale_init)
    ref = nn.BatchNorm(use_running_average=False, momentum=momentum,
                       epsilon=eps, dtype=dtype, scale_init=scale_init)
    return fused, ref


@pytest.mark.parametrize("shape", [(4, 8, 8, 32), (2, 8, 8, 64),
                                   (2, 4, 4, 128), (2, 5, 7, 32)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_and_stats_match_flax(shape, dtype):
    x = _mk(shape, dtype)
    fused, ref = _pair(dtype)
    vf = fused.init(jax.random.key(1), x)
    vr = ref.init(jax.random.key(1), x)
    # perturb scale/bias so the affine part is exercised
    scale = jnp.linspace(0.5, 1.5, shape[-1], dtype=jnp.float32)
    bias = jnp.linspace(-0.3, 0.3, shape[-1], dtype=jnp.float32)
    pf = {"params": {"scale": scale, "bias": bias},
          "batch_stats": vf["batch_stats"]}
    pr = {"params": {"scale": scale, "bias": bias},
          "batch_stats": vr["batch_stats"]}

    yf, mf = fused.apply(pf, x, mutable=["batch_stats"])
    yr, mr = ref.apply(pr, x, mutable=["batch_stats"])
    tol = 1e-6 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(yf, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=tol, atol=tol)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mf["batch_stats"][k]),
                                   np.asarray(mr["batch_stats"][k]),
                                   rtol=1e-5, atol=1e-5)
    assert yf.dtype == yr.dtype


@pytest.mark.parametrize("shape", [(4, 8, 8, 32), (2, 5, 7, 32)])
def test_gradients_match_autodiff(shape):
    dtype = jnp.float32
    x = _mk(shape, dtype, seed=3)
    fused, ref = _pair(dtype)
    stats = fused.init(jax.random.key(1), x)["batch_stats"]
    scale = jnp.linspace(0.5, 1.5, shape[-1], dtype=jnp.float32)
    bias = jnp.linspace(-0.3, 0.3, shape[-1], dtype=jnp.float32)

    def loss(mod, params, xin):
        v = {"params": params, "batch_stats": stats}
        y, _ = mod.apply(v, xin, mutable=["batch_stats"])
        # non-trivial downstream fn so dy varies per element
        return jnp.sum(jnp.sin(y) * jnp.arange(y.size).reshape(y.shape))

    p = {"scale": scale, "bias": bias}
    gf_p, gf_x = jax.grad(lambda pp, xx: loss(fused, pp, xx),
                          argnums=(0, 1))(p, x)
    gr_p, gr_x = jax.grad(lambda pp, xx: loss(ref, pp, xx),
                          argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gf_p["scale"]),
                               np.asarray(gr_p["scale"]),
                               rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gf_p["bias"]),
                               np.asarray(gr_p["bias"]),
                               rtol=2e-4, atol=2e-3)


def test_eval_path_matches_flax():
    x = _mk((2, 8, 8, 32), jnp.bfloat16, seed=5)
    fused = FusedBN(use_running_average=True, dtype=jnp.bfloat16)
    ref = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                       dtype=jnp.bfloat16)
    stats = {"mean": jnp.linspace(-1, 1, 32),
             "var": jnp.linspace(0.5, 2.0, 32)}
    p = {"params": {"scale": jnp.full((32,), 1.3),
                    "bias": jnp.full((32,), -0.2)},
         "batch_stats": stats}
    yf = fused.apply(p, x)
    yr = ref.apply(p, x)
    np.testing.assert_allclose(np.asarray(yf, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_variable_tree_paths_identical():
    """Checkpoint compatibility: identical param/batch_stats paths."""
    x = _mk((1, 4, 4, 16), jnp.float32)
    fused, ref = _pair(jnp.float32)
    vf = jax.tree_util.tree_map(lambda a: a.shape,
                                fused.init(jax.random.key(0), x))
    vr = jax.tree_util.tree_map(lambda a: a.shape,
                                ref.init(jax.random.key(0), x))
    assert vf == vr


def test_pack_factor():
    assert _pack_factor(224, 32) == 4
    assert _pack_factor(224, 64) == 2
    assert _pack_factor(224, 128) == 1
    assert _pack_factor(7, 32) == 1       # odd width: no packing
    assert _pack_factor(224, 16) == 8
    assert _pack_factor(4, 16) == 4       # W caps the factor


def test_running_average_update_semantics():
    """ra' = m*ra + (1-m)*batch, and init does NOT update stats."""
    x = _mk((4, 8, 8, 32), jnp.float32, seed=7)
    fused = FusedBN(use_running_average=False, momentum=0.9, dtype=jnp.float32)
    v = fused.init(jax.random.key(0), x)
    # init left the defaults in place
    np.testing.assert_array_equal(np.asarray(v["batch_stats"]["mean"]), 0.0)
    np.testing.assert_array_equal(np.asarray(v["batch_stats"]["var"]), 1.0)
    _, m = fused.apply(v, x, mutable=["batch_stats"])
    xf = np.asarray(x, np.float64)
    bm = xf.mean(axis=(0, 1, 2))
    bv = (xf * xf).mean(axis=(0, 1, 2)) - bm * bm
    np.testing.assert_allclose(np.asarray(m["batch_stats"]["mean"]),
                               0.9 * 0.0 + 0.1 * bm, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m["batch_stats"]["var"]),
                               0.9 * 1.0 + 0.1 * bv, rtol=1e-5, atol=1e-5)
