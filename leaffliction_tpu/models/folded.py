"""Lane-folded batch layout: make narrow-channel stages physically 128-wide.

Why (measured, round-5 microbenches `tools/microbench_conv32.py` /
`tools/microbench_folded_stage1.py` on the live chip): at the reference
default leafcnn-base @224 b32 (`/root/reference/srcs/cli/train.py:66-68`),
stage-1 tensors are bf16[32,224,224,32]. Two independent 4× wastes follow
from C=32 < 128:

- the TPU tile T(8,128) pads the minor dim to 128 lanes, so every HBM
  touch moves ~4× the useful bytes and every VPU pass runs at quarter
  lane occupancy;
- XLA's conv emitter at these shapes is C_out-independent: a 3×3
  32→128 conv costs the SAME 3.3 ms as 32→32 — three quarters of the
  MXU columns do nothing.

The fix is a LAYOUT, not new math: fold G batch images into the channel
dim ([N,H,W,C] → [N/G,H,W,G·C], lane = g·C + c) and run the stage's

- convs as ONE dense (G·C_in)→(G·C_out) conv with **block-diagonal
  weights** built in-trace from the true [kh,kw,C_in,C_out] parameter
  (zero blocks contribute exact zeros — outputs are bit-equal to the
  plain conv; autodiff through the construction yields the true weight
  grad). A grouped conv (`feature_group_count=G`) expresses the same
  math but measures 34% SLOWER than the plain layout — the dense
  block-diagonal form is what the emitter runs fast (1.08 vs 3.27 ms
  fwd; full stage-1 fwd+bwd 3.1× faster);
- BatchNorm statistics per TRUE channel across the fold groups
  (`ops/fused_bn.BatchNorm(..., fold=G)`) — f32-identical math,
  parameter shapes unchanged;
- spatial dropout masks drawn in the PLAIN shape [N,1,1,C] and folded,
  so masks are bit-identical to the unfolded model under the same rng.

Parameters, their flax paths (`Conv_k/kernel`, `Dropout_k`), init
values, and checkpoints are IDENTICAL to the plain model: the classes
here are deliberately named ``Conv``/``Dropout`` so flax auto-naming
produces the same variable tree as `flax.linen.Conv`/`Dropout`, and the
kernel init replicates `nn.Conv`'s lecun_normal on the same shapes.
`LEAF_LANE_FOLD=0` disables folding (bit-exact legacy path).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax, random

Array = jax.Array


def auto_fold(n: int, width: int, dp: int = 1) -> int:
    """Largest power-of-2 G with G·width ≤ 128, G | N and N/G ≥ 8 —
    but only for batches where folding measures FASTER.

    The N/G ≥ 8 floor keeps the folded leading dim large enough that a
    batch-sharded mesh run (dp ≤ 8) still folds locally on each device
    (per-device batch stays divisible by G).

    The batch cap (default 32, `LEAF_LANE_FOLD_MAX_BATCH`): the
    block-diagonal conv executes G× the useful MACs. At small batch the
    conv emitter is per-row-bound and the zero MACs ride for free
    (b32 @224: 2.11× whole-step, `docs/performance.md`); at large batch
    the convs are MXU-throughput-bound and the zero MACs cost real time
    (b128 @224 measured 62.0 vs 47.3 ms/step folded vs plain — a 0.76×
    REGRESSION, BENCH_r05 vs r04).

    `dp` is the data-parallel shard count of the batch dim. Under pjit
    the trace sees the GLOBAL batch, but the cap is a per-DEVICE
    property (MXU saturation happens on each shard's local convs), so
    it applies to n/dp — e.g. a global b256 over dp=8 is per-device
    b32, exactly the shape where folding wins 2.11×. Divisibility must
    hold per device too (G | n/dp): each folded row packs G consecutive
    images, and block sharding keeps those on one device, so the fold
    stays a local reshape (no collectives;
    `test_folded_dp_sharded_matches_plain`). The N/G ≥ 8 row floor
    stays GLOBAL — it bounds program-level row count, and shrinking it
    per-device would UN-fold small-global-batch mesh runs (b32 over
    dp=8 folded G=4 before dp-awareness and still must). A batch not
    divisible by dp cannot be dp-sharded at all, so it falls back to
    the global-batch decision. `LEAF_LANE_FOLD_MAX_BATCH` still
    overrides the (per-device) cap."""
    cap = int(os.environ.get("LEAF_LANE_FOLD_MAX_BATCH", "32"))
    p = n // dp if (dp > 1 and n % dp == 0) else n  # per-device batch
    if p > cap:
        return 1
    g = 1
    while (2 * g * width <= 128 and p % (2 * g) == 0 and n // (2 * g) >= 8):
        g *= 2
    return g


def fold(x: Array, g: int) -> Array:
    """[N,H,W,C] → [N/g,H,W,g·C]; image n'·g+i lands in lane block i."""
    if g == 1:
        return x
    n, h, w, c = x.shape
    x = x.reshape(n // g, g, h, w, c).transpose(0, 2, 3, 1, 4)
    return x.reshape(n // g, h, w, g * c)


def unfold(x: Array, g: int) -> Array:
    if g == 1:
        return x
    m, h, w, gc = x.shape
    c = gc // g
    x = x.reshape(m, h, w, g, c).transpose(0, 3, 1, 2, 4)
    return x.reshape(m * g, h, w, c)


def refold(x: Array, g_from: int, g_to: int) -> Array:
    if g_from == g_to:
        return x
    return fold(unfold(x, g_from), g_to)


def block_diag_kernel(w: Array, g: int) -> Array:
    """[kh,kw,ci,co] → [kh,kw,g·ci,g·co] block-diagonal (differentiable)."""
    kh, kw, ci, co = w.shape
    eye = jnp.eye(g, dtype=w.dtype)
    out = w[:, :, None, :, None, :] * eye[None, None, :, None, :, None]
    return out.reshape(kh, kw, g * ci, g * co)


class Conv(nn.Module):
    """`nn.Conv`-compatible conv (no bias, SAME) with a fold-aware call.

    Same param path (`Conv_k/kernel`), shape and lecun_normal init as
    `flax.linen.Conv(features, kernel_size, padding="SAME",
    use_bias=False)`; with ``fold=g>1`` the input is lane-folded and the
    conv runs dense with a block-diagonal kernel (or a lane-tiled kernel
    for depthwise, `feature_group_count == in_features`)."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    feature_group_count: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, fold: int = 1) -> Array:
        g = fold
        cin_phys = x.shape[-1]
        cin = cin_phys // g
        kshape = (tuple(self.kernel_size)
                  + (cin // self.feature_group_count, self.features))
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            kshape, jnp.float32)
        k = kernel.astype(x.dtype)
        fgc = self.feature_group_count
        if g > 1:
            if fgc == cin:  # depthwise: per-lane kernels, tile across folds
                k = jnp.tile(k, (1, 1, 1, g))
                fgc = cin_phys
            else:
                assert fgc == 1, "folded conv supports dense or depthwise"
                k = block_diag_kernel(k, g)
        dn = lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, k, tuple(self.strides), "SAME", dimension_numbers=dn,
            feature_group_count=fgc)


class Dropout(nn.Module):
    """`nn.Dropout`-equivalent with fold-aware broadcast masks.

    Plain mode reproduces `flax.linen.Dropout` exactly (same rng
    collection, same bernoulli draw, same select). With ``fold=g>1`` the
    mask is drawn in the PLAIN broadcast shape [N,1,1,C] and lane-folded,
    so the masked output is bit-identical to the unfolded model's."""

    rate: float
    broadcast_dims: Sequence[int] = ()
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: Optional[bool] = None,
                 fold: int = 1) -> Array:
        deterministic = nn.merge_param("deterministic", self.deterministic,
                                       deterministic)
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        if fold > 1:
            m, h, w, gc = x.shape
            plain = [m * fold, h, w, gc // fold]
            for d in self.broadcast_dims:
                plain[d] = 1
            mask = random.bernoulli(rng, p=keep, shape=tuple(plain))
            n, mh, mw, c = mask.shape
            mask = mask.reshape(n // fold, fold, mh, mw, c)
            mask = mask.transpose(0, 2, 3, 1, 4).reshape(
                n // fold, mh, mw, fold * c)
            mask = jnp.broadcast_to(mask, x.shape)
        else:
            shape = list(x.shape)
            for d in self.broadcast_dims:
                shape[d] = 1
            mask = jnp.broadcast_to(
                random.bernoulli(rng, p=keep, shape=tuple(shape)), x.shape)
        return lax.select(mask, x / keep, jnp.zeros_like(x))
