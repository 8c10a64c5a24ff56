"""Train-time BatchNorm tuned for narrow-channel stages on TPU.

Why this exists (measured, round-4 xplane of the reference-default
leafcnn-base @224 batch-32 step — `docs/performance.md` "Where the
reference-default b32 step actually goes"): 72% of that step is stage-1
work at 224×224 with C=32, and the two largest line items are

- 8.7 ms/step of BN statistics/backward converts+reduces producing
  `f32[32]` from `bf16[32,224,224,32]` — the reduce's minor dimension
  fills 32 of the VPU's 128 lanes, so every pass over the 103 MB
  activation pays ~4× lane padding, and flax's `_compute_stats`
  additionally materializes a float32 copy of the input before reducing;
- 3.2 ms/step of BN-backward reduces that REMATERIALIZE the normalized
  activation (XLA chose recompute over storing it).

This module replaces `flax.linen.BatchNorm` (same math as
`srcs/model/cnn.py:21-35`'s Keras BatchNormalization: per-channel batch
stats, running-average update, learned scale/bias) with two TPU-specific
changes, neither visible in the results:

1. **Lane-packed reductions.** `[N,H,W,C]` with C<128 is viewed as
   `[N,H,W/p,p·C]` (a free, layout-preserving reshape since C is minor)
   with p chosen so p·C fills the 128 VPU lanes; the reduce runs at full
   lane occupancy to `f32[p·C]` and a final `[p,C]→[C]` fold (p rows)
   finishes on the host-side of the reduction tree. The f32 convert
   stays fused inside the reduce — no f32 copy of the activation exists.
2. **A `jax.custom_vjp` that pins the BN input as the residual.** The BN
   input is the preceding conv's output — a buffer that already exists in
   HBM — so saving it costs nothing, and the backward reconstructs
   x̂ = (x−μ)·rsqrt(σ²+ε) in f32 on the fly (a fused multiply-add inside
   the bandwidth-bound reduce pass). XLA can no longer substitute a
   rematerialization of the 224² activation, and the backward's two
   passes (dγ/dβ reduce, then dx) are its HBM floor.

Numerics match flax exactly where it matters: statistics in float32 via
the fast-variance identity Var = E[x²] − E[x]² clipped at 0
(`flax/linen/normalization.py::_compute_stats`), normalize computed
elementwise in f32 and cast to the module dtype (`_normalize`), running
stats updated as `m·ra + (1−m)·batch`. The backward reconstructs x̂ from
the f32-exact (x, μ, inv) triple, so gradients agree with flax autodiff
to float tolerance (`tests/test_fused_bn.py`).

Set ``LEAF_FUSED_BN=0`` to fall back to the un-packed, autodiff-
differentiated reference math (same variable tree — checkpoints are
interchangeable; the module class is named ``BatchNorm`` so flax
auto-naming keeps the ``BatchNorm_k`` parameter paths that
`train/keras_export.py` and saved checkpoints key on).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as flax_dtypes
from jax import lax

Array = jax.Array


def _pack_factor(w: int, c: int) -> int:
    """Largest p with p·C ≤ 128·2, W % p == 0 — fill the 128 VPU lanes."""
    p = 1
    while c * p < 128 and w % (p * 2) == 0:
        p *= 2
    return p


def _packed_moments(x: Array) -> tuple[Array, Array]:
    """One bandwidth-bound pass → (Σx, Σx²) as f32[C], full-lane reduces."""
    n, h, w, c = x.shape
    p = _pack_factor(w, c)
    xr = x.reshape(n, h, w // p, p * c).astype(jnp.float32)
    s1 = jnp.sum(xr, axis=(0, 1, 2))
    s2 = jnp.sum(xr * xr, axis=(0, 1, 2))
    if p > 1:
        s1 = s1.reshape(p, c).sum(axis=0)
        s2 = s2.reshape(p, c).sum(axis=0)
    return s1, s2


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def bn_train(x: Array, scale: Array, bias: Array, eps: float,
             fold: int = 1) -> tuple[Array, Array, Array]:
    """Batch-norm forward (training stats) → (y, mean, var).

    y is in x.dtype; mean/var are f32[C] batch statistics for the
    running-average update. The custom VJP differentiates y w.r.t.
    (x, scale, bias) with the full through-the-statistics BN backward;
    mean/var cotangents are treated as zero (they only feed the
    non-differentiated `batch_stats` state update).

    ``fold`` supports the lane-folded batch layout
    (`models/folded.py`): x's minor dim holds ``fold`` batch images'
    channels side by side (physical lanes = fold·C); statistics are
    reduced per TRUE channel (scale/bias/mean/var stay f32[C]) across
    the fold groups, exactly matching the plain layout's math.
    """
    y, mean, var, _ = _bn_train_fwd_math(x, scale, bias, eps, fold)
    return y, mean, var


def _bn_train_fwd_math(x, scale, bias, eps, fold):
    n, h, w, _ = x.shape
    c = x.shape[-1] // fold
    m = float(n * h * w * fold)
    s1, s2 = _packed_moments(x)
    if fold > 1:
        s1 = s1.reshape(-1, c).sum(axis=0)
        s2 = s2.reshape(-1, c).sum(axis=0)
    mean = s1 / m
    var = jnp.maximum(s2 / m - mean * mean, 0.0)
    inv = lax.rsqrt(var + eps)
    sf = scale.astype(jnp.float32)
    mul = inv * sf
    mean_f = jnp.tile(mean, fold) if fold > 1 else mean
    mul_f = jnp.tile(mul, fold) if fold > 1 else mul
    bias_f = (jnp.tile(bias.astype(jnp.float32), fold)
              if fold > 1 else bias.astype(jnp.float32))
    y = ((x.astype(jnp.float32) - mean_f) * mul_f + bias_f).astype(x.dtype)
    return y, mean, var, (x, mean, inv, sf)


def _bn_train_fwd(x, scale, bias, eps, fold):
    y, mean, var, res = _bn_train_fwd_math(x, scale, bias, eps, fold)
    return (y, mean, var), res


def _bn_train_bwd(eps, fold, res, cts):
    dy = cts[0]  # mean/var cotangents are zero by contract (see bn_train)
    x, mean, inv, sf = res
    n, h, w, cp = x.shape
    c = cp // fold
    m = float(n * h * w * fold)
    p = _pack_factor(w, cp)

    # pass 1: dβ = Σ dy, dγ = Σ dy·x̂ — joint full-lane reduce reading
    # dy and x once; x̂ reconstructed in f32 inside the pass (exactly
    # flax-autodiff's value: x, mean, inv are the same f32 quantities).
    dyr = dy.reshape(n, h, w // p, p * cp).astype(jnp.float32)
    xr = x.reshape(n, h, w // p, p * cp).astype(jnp.float32)
    mean_t = jnp.tile(mean, p * fold)
    inv_t = jnp.tile(inv, p * fold)
    xhat_r = (xr - mean_t) * inv_t
    db = jnp.sum(dyr, axis=(0, 1, 2))
    dg = jnp.sum(dyr * xhat_r, axis=(0, 1, 2))
    if p * fold > 1:
        db = db.reshape(p * fold, c).sum(axis=0)
        dg = dg.reshape(p * fold, c).sum(axis=0)

    # pass 2: dx = γ·inv · (dy − dβ/M − x̂·dγ/M)
    t_b = jnp.tile(db / m, fold) if fold > 1 else db / m
    t_g = jnp.tile(dg / m, fold) if fold > 1 else dg / m
    mean_f = jnp.tile(mean, fold) if fold > 1 else mean
    inv_f = jnp.tile(inv, fold) if fold > 1 else inv
    sfi_f = (jnp.tile(sf * inv, fold) if fold > 1 else sf * inv)
    xhat = (x.astype(jnp.float32) - mean_f) * inv_f
    dx = (sfi_f * (dy.astype(jnp.float32) - t_b - xhat * t_g)
          ).astype(x.dtype)
    return dx, dg.astype(jnp.float32), db.astype(jnp.float32)


bn_train.defvjp(_bn_train_fwd, _bn_train_bwd)


class BatchNorm(nn.Module):
    """Drop-in for `flax.linen.BatchNorm` over NHWC feature-last inputs.

    Same variable tree (params: scale/bias, batch_stats: mean/var — the
    class is deliberately named ``BatchNorm`` so flax auto-naming yields
    identical ``BatchNorm_k`` paths) and same numerics; the training
    path routes through the lane-packed custom-VJP `bn_train` unless
    ``LEAF_FUSED_BN=0``.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: Array,
                 use_running_average: Optional[bool] = None,
                 fold: int = 1) -> Array:
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        c = x.shape[-1] // fold
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        out_dtype = flax_dtypes.canonicalize_dtype(x, scale, bias,
                                                   dtype=self.dtype)

        if ura:
            mean, var = ra_mean.value, ra_var.value
            mul = lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
            bf = bias.astype(jnp.float32)
            if fold > 1:
                mean, mul, bf = (jnp.tile(mean, fold), jnp.tile(mul, fold),
                                 jnp.tile(bf, fold))
            y = (x.astype(jnp.float32) - mean) * mul + bf
            return y.astype(out_dtype)

        if x.ndim == 4 and os.environ.get("LEAF_FUSED_BN", "1") != "0":
            y, mean, var = bn_train(x, scale, bias, self.epsilon, fold)
        else:
            # reference math, plain autodiff (debug escape hatch; also
            # the path for non-NHWC ranks)
            red = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            if fold > 1:
                xf = xf.reshape(x.shape[:-1] + (fold, c))
                red = tuple(range(x.ndim - 1)) + (x.ndim - 1,)
            mean = jnp.mean(xf, axis=red)
            var = jnp.maximum(jnp.mean(xf * xf, axis=red) - mean * mean, 0.0)
            mul = lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
            y = ((xf - mean) * mul + bias.astype(jnp.float32)
                 ).reshape(x.shape).astype(x.dtype)

        if not self.is_initializing():
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1.0 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1.0 - self.momentum) * var)
        return y.astype(out_dtype)
