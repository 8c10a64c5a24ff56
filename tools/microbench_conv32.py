"""What is the real speed limit of a 3x3 conv at C=32, 224^2, b32 on TPU?

Round-5 follow-up to the fused-BN xplane: the b32 step's hot fusions
contain the stage-1 convolutions, and a standalone conv3x3
[32,224,224,32]->32 measures ~3.1 ms = 9.5 TFLOP/s (5% of v5e bf16
peak). The MXU column ceiling at C_out=32 is 128/32 -> 25% (=49 TF/s),
so XLA's conv emitter is leaving ~4x on the table IF the op is not
memory-bound. This bench separates the hypotheses:

  conv_xla        the emitter as-is
  conv_wide       same shape but C_out=128 (is the ceiling the columns?)
  matmul_32       pure [1.6M,288]x[288,32] matmul (im2col pre-done, MXU only)
  matmul_128      pure [1.6M,288]x[288,128] (column calibration)
  shift9          sum of 9 shifted [1.6M,32]x[32,32] matmuls (roll+dot)

Timing: chained lax.scan, one scalar fetch (docs/performance.md).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from leaffliction_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

N, H, W, C = 32, 224, 224, 32
ROUNDS = 30


def chain_time(step, x0, *consts, samples=3, reps=2):
    @jax.jit
    def run(x):
        def body(x, _):
            y = step(x, *consts)
            # fold a data-dependent epsilon back into the carry so the
            # chain is not DCE-able, whatever shape y has
            eps = (jnp.mean(y.astype(jnp.float32)) * 1e-12).astype(x.dtype)
            return x + eps, None
        x, _ = jax.lax.scan(body, x, None, length=ROUNDS)
        return jnp.sum(x.reshape(-1)[:2].astype(jnp.float32))

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
    x = jax.random.normal(key, (N, H, W, C), jnp.bfloat16) * 0.5
    w32 = jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.06
    w128 = jax.random.normal(key, (3, 3, C, 128), jnp.bfloat16) * 0.06
    xm = jax.random.normal(key, (N * H * W, 288), jnp.bfloat16) * 0.1
    wm32 = jax.random.normal(key, (288, C), jnp.bfloat16) * 0.06
    wm128 = jax.random.normal(key, (288, 128), jnp.bfloat16) * 0.06
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=jax.lax.conv_dimension_numbers(
                x.shape, w.shape, dn))

    def matmul(x, w):
        return jnp.dot(x, w)

    def shift9(x, w):
        acc = jnp.zeros((N, H, W, C), jnp.float32)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xs = jnp.roll(x, (dy, dx), axis=(1, 2))
                acc = acc + jnp.dot(
                    xs.reshape(-1, C), w[dy + 1, dx + 1],
                    preferred_element_type=jnp.float32).reshape(N, H, W, C)
        return acc.astype(x.dtype)

    def report(name, ms, gf):
        print(f"{name}: {ms:.3f} ms  {gf / ms:.1f} TFLOP/s", flush=True)

    gf_c32 = 2 * N * H * W * 9 * C * C / 1e9
    gf_c128 = gf_c32 * 4
    report("conv_xla  3x3 32->32 ", chain_time(conv, x, w32), gf_c32)
    report("conv_wide 3x3 32->128", chain_time(conv, x, w128), gf_c128)
    # batch-folded block-diagonal: 4 images in channels, ONE dense
    # 128->128 conv computes all four 32->32 convs (12.25x the MACs but
    # the wide emitter may not care); useful FLOPs = gf_c32
    x128 = x.reshape(N // 4, 4, H, W, C).transpose(0, 2, 3, 1, 4).reshape(
        N // 4, H, W, 4 * C)
    wbd = jnp.zeros((3, 3, 128, 128), jnp.bfloat16)
    for g in range(4):
        wbd = wbd.at[:, :, g * C:(g + 1) * C, g * C:(g + 1) * C].set(w32)
    report("conv_bdiag 3x3 128->128 (4-fold)", chain_time(conv, x128, wbd),
           gf_c32)
    x3 = jax.random.normal(key, (N, H, W, 3), jnp.bfloat16) * 0.5
    w3 = jax.random.normal(key, (3, 3, 3, C), jnp.bfloat16) * 0.06
    report("conv_stem 3x3 3->32  ", chain_time(conv, x3, w3),
           2 * N * H * W * 9 * 3 * C / 1e9)
    report("matmul    [1.6M,288]x[288,32] ",
           chain_time(matmul, xm, wm32), 2 * xm.shape[0] * 288 * 32 / 1e9)
    report("matmul    [1.6M,288]x[288,128]",
           chain_time(matmul, xm, wm128), 2 * xm.shape[0] * 288 * 128 / 1e9)
    report("shift9    9x roll+dot 32->32  ", chain_time(shift9, x, w32),
           gf_c32)

    # shift9 differs from SAME-conv only on the 1px border (roll wraps);
    # check the interior matches
    y_c = conv(x, w32).astype(jnp.float32)[:, 2:-2, 2:-2]
    y_s = shift9(x, w32).astype(jnp.float32)[:, 2:-2, 2:-2]
    err = float(jnp.max(jnp.abs(y_c - y_s)))
    ref = float(jnp.max(jnp.abs(y_c))) or 1.0
    print(f"shift9-vs-conv interior max rel err: {err / ref:.3e}")


if __name__ == "__main__":
    main()
