"""Full stage-1 (fwd+bwd) in plain vs 4-folded block-diagonal layout.

Round-5 follow-up to microbench_conv32: a dense 128->128 conv with
block-diagonal weights computes four images' 32->32 convs in ONE pass
3.0x faster than the plain [32,224,224,32] conv (1.08 vs 3.27 ms) —
the emitter's per-row cost is C_out-independent, so folding G=4 batch
images into channels turns wasted MXU columns and T(8,128) lane
padding into useful work.

This times the WHOLE leafcnn stage 1 (stem conv 3->32 + BN + relu,
residual block: 2x[conv 32->32 + BN + relu] + SE + add + relu,
2x2 maxpool) with a loss and parameter gradients, in both layouts,
sharing one parameter dict (folded builds block-diag weights in-trace
so autodiff extracts the true w-grads). Reference stage shape:
leafcnn-base @224 b32 (`srcs/cli/train.py:66-68` defaults).

Timing: chained lax.scan over the step (params perturbed by a
data-dependent epsilon so nothing is DCE-able), one scalar fetch
(docs/performance.md "Measurement methodology on the relay").
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from leaffliction_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

N, H, W, C, G = 32, 224, 224, 32, 4
ROUNDS = 20
DN = ("NHWC", "HWIO", "NHWC")


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, w.shape, DN))


def fold(x, g):
    n, h, w, c = x.shape
    x = x.reshape(n // g, g, h, w, c).transpose(0, 2, 3, 1, 4)
    return x.reshape(n // g, h, w, g * c)


def unfold(x, g):
    m, h, w, gc = x.shape
    c = gc // g
    x = x.reshape(m, h, w, g, c).transpose(0, 3, 1, 2, 4)
    return x.reshape(m * g, h, w, c)


def bdiag(w, g):
    """[3,3,ci,co] -> [3,3,g*ci,g*co] block-diagonal."""
    kh, kw, ci, co = w.shape
    eye = jnp.eye(g, dtype=w.dtype)
    out = w[:, :, None, :, None, :] * eye[None, None, :, None, :, None]
    return out.reshape(kh, kw, g * ci, g * co)


def bn_relu(x, scale, bias, groups=1):
    """BN (batch stats, f32) + relu; `groups` folds share true channels."""
    gc = x.shape[-1]
    c = gc // groups
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=(0, 1, 2))
    s2 = jnp.sum(xf * xf, axis=(0, 1, 2))
    if groups > 1:
        s1 = s1.reshape(groups, c).sum(0)
        s2 = s2.reshape(groups, c).sum(0)
    m = float(x.shape[0] * x.shape[1] * x.shape[2] * groups)
    mean = s1 / m
    var = jnp.maximum(s2 / m - mean * mean, 0.0)
    mul = jax.lax.rsqrt(var + 1e-3) * scale
    off = bias - mean * mul
    if groups > 1:
        mul, off = jnp.tile(mul, groups), jnp.tile(off, groups)
    return jax.nn.relu((xf * mul + off).astype(x.dtype))


def se_apply(x, p, groups=1):
    gc = x.shape[-1]
    c = gc // groups
    se = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # [m, g*C]
    se = se.reshape(-1, c)  # [N, C] either way
    se = jax.nn.relu(se @ p["se_w1"] + p["se_b1"])
    se = jax.nn.sigmoid(se @ p["se_w2"] + p["se_b2"])  # [N, C]
    se = se.reshape(x.shape[0], 1, 1, gc).astype(x.dtype)
    return x * se


def stage1(p, x, g):
    """g=1: plain layout; g>1: block-diag folded."""
    if g > 1:
        x = fold(x, g)

    def bd(w):
        return bdiag(w, g) if g > 1 else w

    y = conv(x, bd(p["w0"]))
    y = bn_relu(y, p["s0"], p["b0"], g)
    z = conv(y, bd(p["w1"]))
    z = bn_relu(z, p["s1"], p["b1"], g)
    z = conv(z, bd(p["w2"]))
    z = bn_relu(z, p["s2"], p["b2"], g)
    z = se_apply(z, p, g)
    z = jax.nn.relu(y + z)
    z = jax.lax.reduce_window(z, -jnp.inf, jax.lax.max,
                              (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    if g > 1:
        z = unfold(z, g)
    return z


def loss_fn(p, x, g):
    z = stage1(p, x, g).astype(jnp.float32)
    return jnp.mean(z * z)


def chain_time(g, p0, x, samples=3, reps=2):
    @jax.jit
    def run(p):
        def body(p, _):
            l, grads = jax.value_and_grad(loss_fn)(p, x, g)
            eps = (l * 1e-12).astype(jnp.float32)
            return jax.tree.map(lambda a, gr: a + eps * gr, p, grads), None
        p, _ = jax.lax.scan(body, p, None, length=ROUNDS)
        return p["s0"][0]

    s = run(p0)
    assert np.isfinite(float(s))
    dts = []
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(reps):
            s = run(p0)
        assert np.isfinite(float(s))
        dts.append((time.perf_counter() - t0) / (reps * ROUNDS))
    return sorted(dts)[len(dts) // 2] * 1e3


def main():
    k = jax.random.key(0)
    ks = jax.random.split(k, 8)
    p = {
        "w0": jax.random.normal(ks[0], (3, 3, 3, C), jnp.float32) * 0.2,
        "w1": jax.random.normal(ks[1], (3, 3, C, C), jnp.float32) * 0.06,
        "w2": jax.random.normal(ks[2], (3, 3, C, C), jnp.float32) * 0.06,
        "s0": jnp.ones((C,)), "b0": jnp.zeros((C,)),
        "s1": jnp.ones((C,)), "b1": jnp.zeros((C,)),
        "s2": jnp.ones((C,)), "b2": jnp.zeros((C,)),
        "se_w1": jax.random.normal(ks[3], (C, C // 8), jnp.float32) * 0.2,
        "se_b1": jnp.zeros((C // 8,)),
        "se_w2": jax.random.normal(ks[4], (C // 8, C), jnp.float32) * 0.2,
        "se_b2": jnp.zeros((C,)),
    }
    x = (jax.random.normal(ks[5], (N, H, W, 3), jnp.bfloat16) * 0.3)

    # numerics: loss + grads must agree between layouts
    l1, g1 = jax.value_and_grad(loss_fn)(p, x, 1)
    l4, g4 = jax.value_and_grad(loss_fn)(p, x, G)
    rel = abs(float(l1) - float(l4)) / max(abs(float(l1)), 1e-9)
    print(f"loss plain {float(l1):.6f} folded {float(l4):.6f} "
          f"rel {rel:.2e}")
    worst = 0.0
    for kk in g1:
        a, b = np.asarray(g1[kk], np.float64), np.asarray(g4[kk], np.float64)
        scale = max(np.abs(a).max(), 1e-9)
        worst = max(worst, float(np.abs(a - b).max() / scale))
    print(f"grad worst rel err: {worst:.2e}")
    assert rel < 5e-3 and worst < 5e-2, (rel, worst)

    ms1 = chain_time(1, p, x)
    ms4 = chain_time(G, p, x)
    print(f"stage1 fwd+bwd plain  (g=1): {ms1:.3f} ms")
    print(f"stage1 fwd+bwd folded (g={G}): {ms4:.3f} ms   "
          f"speedup {ms1 / ms4:.2f}x")


if __name__ == "__main__":
    main()
