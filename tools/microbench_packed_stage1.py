"""Microbench: is a batch-folded (grouped) stage-1 layout faster on TPU?

Question (round-5, from the fused-BN xplane): at the reference default
leafcnn-base @224 b32, stage-1 tensors are bf16[32,224,224,32] — the
T(8,128) tile pads C=32 to 128 lanes, so every HBM touch pays ~4x
physical traffic and every VPU pass runs quarter-occupancy. Folding
G=4 images into channels ([8,224,224,128], grouped convs with tiled
weights) makes the minor dim physically full.

This times the three op classes that dominate stage-1 (xplane table in
docs/performance.md) in both layouts. Timing protocol per
docs/performance.md "Measurement methodology on the relay": R rounds
chained inside one lax.scan (output feeds next input so nothing is
DCE-able), one scalar fetch per sample.

Run: python tools/microbench_packed_stage1.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp

from leaffliction_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

N, H, W, C, G = 32, 224, 224, 32, 4
ROUNDS = 50


def chain_time(step, x0, *consts, samples=3, reps=2):
    """median ms/round of `x -> step(x, *consts)` chained ROUNDS deep."""

    @jax.jit
    def run(x):
        def body(x, _):
            y = step(x, *consts)
            # keep shape: re-center so the chain can't overflow
            return (y - jnp.mean(y).astype(y.dtype)), None
        x, _ = jax.lax.scan(body, x, None, length=ROUNDS)
        return jnp.sum(x[0, 0, 0, :2].astype(jnp.float32))

    s = run(x0)
    assert np.isfinite(float(s))
    dts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(reps):
            s = run(x0)
        assert np.isfinite(float(s))
        dts.append((time.perf_counter() - t0) / (reps * ROUNDS))
    return sorted(dts)[len(dts) // 2] * 1e3


def main():
    key = jax.random.key(0)
    x32 = jax.random.normal(key, (N, H, W, C), jnp.bfloat16)
    x128 = x32.reshape(N // G, G, H, W, C).transpose(0, 2, 3, 1, 4).reshape(
        N // G, H, W, G * C)
    w = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.06
    dn = ("NHWC", "HWIO", "NHWC")

    def conv_plain(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, dn))

    def conv_grouped(x, w):
        wg = jnp.tile(w, (1, 1, 1, G))
        return jax.lax.conv_general_dilated(
            x, wg, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, wg.shape, dn),
            feature_group_count=G)

    def bn_stats(x):
        xf = x.astype(jnp.float32)
        s1 = jnp.sum(xf, axis=(0, 1, 2))
        s2 = jnp.sum(xf * xf, axis=(0, 1, 2))
        m = s1 / (x.shape[0] * H * W)
        v = jnp.maximum(s2 / (x.shape[0] * H * W) - m * m, 0.0)
        inv = jax.lax.rsqrt(v + 1e-3)
        return ((xf - m) * inv).astype(x.dtype)

    def eltwise(x):
        return jax.nn.relu(x) * jnp.float32(1.0009).astype(x.dtype)

    for name, fn, x0, consts in (
        ("conv3x3 plain  [32,224,224,32]", conv_plain, x32, (w,)),
        ("conv3x3 group4 [8,224,224,128]", conv_grouped, x128, (w,)),
        ("bn-stats+norm  [32,224,224,32]", bn_stats, x32, ()),
        ("bn-stats+norm  [8,224,224,128]", bn_stats, x128, ()),
        ("relu*scale     [32,224,224,32]", eltwise, x32, ()),
        ("relu*scale     [8,224,224,128]", eltwise, x128, ()),
    ):
        ms = chain_time(fn, x0, *consts)
        print(f"{name}: {ms:.3f} ms", flush=True)

    # sanity: grouped conv == plain conv after unpack (bf16 tolerance)
    y_p = conv_plain(x32, w)
    y_g = conv_grouped(x128, w)
    y_gu = y_g.reshape(N // G, H, W, G, C).transpose(0, 3, 1, 2, 4).reshape(
        N, H, W, C)
    err = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)
                                - y_gu.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y_p.astype(jnp.float32)))) or 1.0
    print(f"grouped-vs-plain conv max rel err: {err / scale:.3e}")
    assert err / scale < 0.05, (err, scale)


if __name__ == "__main__":
    main()
