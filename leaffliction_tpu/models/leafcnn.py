"""LeafCNN — Flax port-equivalent of the reference architecture, TPU-first.

Capability parity with `srcs/model/cnn.py:9-131`: conv stem, per-width stages
of [residual block (2×conv3x3-BN-ReLU + SE ratio 8 + 1x1 projection shortcut)
→ spatial dropout → maxpool], GAP → dropout → Dense head; optional
depthwise-separable convs and adaptive input normalization; scale presets
tiny/small/base (`srcs/cli/train.py:266-280`).

TPU-first deltas (intentional, documented):
- the model returns **logits**; softmax lives in the loss / predict path
  (numerically better than the reference's softmax-activation Dense);
- train-time augmentation is NOT a model layer — it is a fused batched op in
  the train step (`ops/train_augment.py`), keeping the model pure;
- normalization stats are explicit variables (`norm_stats` collection), not a
  stateful Keras layer; adaptation is one jitted reduction over a sample
  batch (`ops/image.py:compute_norm_stats`);
- compute dtype is configurable (bfloat16 on TPU), params stay float32;
- narrow-channel stages (C<128) run in the lane-folded batch layout
  (`models/folded.py`: G images folded into channels, block-diagonal
  conv kernels, fold-aware BN/dropout) — same math and parameter tree,
  3.1× faster stage-1 fwd+bwd at the reference-default b32 @224
  (`tools/microbench_folded_stage1.py`). `LEAF_LANE_FOLD=0` disables.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from leaffliction_tpu.models import folded
from leaffliction_tpu.ops.fused_bn import BatchNorm

Array = jax.Array

SCALE_PRESETS: Dict[str, Dict[str, Any]] = {
    # widths, drop_block, drop_top — `srcs/cli/train.py:266-280`
    "tiny": {"widths": (16, 32, 64), "drop_block": 0.10, "drop_top": 0.30},
    "small": {"widths": (32, 64, 128), "drop_block": 0.15, "drop_top": 0.35},
    "base": {"widths": (32, 64, 128, 256), "drop_block": 0.15, "drop_top": 0.40},
}


class SEBlock(nn.Module):
    """Squeeze-and-Excitation (`srcs/model/cnn.py:9-18`), ratio 8."""

    se_ratio: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, fold: int = 1) -> Array:
        channels = x.shape[-1] // fold
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        if fold > 1:
            # [m,1,1,g·C] → [N,1,1,C]: pure reshape (lane = g·C + c)
            se = se.reshape(-1, 1, 1, channels)
        se = nn.Conv(max(channels // self.se_ratio, 1), (1, 1),
                     dtype=self.dtype)(se)
        se = nn.relu(se)
        se = nn.Conv(channels, (1, 1), dtype=self.dtype)(se)
        se = nn.sigmoid(se)
        if fold > 1:
            se = se.reshape(x.shape[0], 1, 1, fold * channels)
        return x * se


class ConvBlock(nn.Module):
    """conv3x3(no bias) → BN → ReLU (`srcs/model/cnn.py:21-35`)."""

    features: int
    separable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool, fold: int = 1) -> Array:
        cin = x.shape[-1] // fold
        if self.separable:
            x = folded.Conv(cin, (3, 3), feature_group_count=cin,
                            dtype=self.dtype)(x, fold=fold)
            x = folded.Conv(self.features, (1, 1),
                            dtype=self.dtype)(x, fold=fold)
        else:
            x = folded.Conv(self.features, (3, 3),
                            dtype=self.dtype)(x, fold=fold)
        x = BatchNorm(use_running_average=not train, momentum=0.99,
                      epsilon=1e-3, dtype=self.dtype)(x, fold=fold)
        return nn.relu(x)


class ResBlock(nn.Module):
    """Residual block w/ optional SE + projection shortcut
    (`srcs/model/cnn.py:38-49`)."""

    features: int
    separable: bool = False
    use_se: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool, fold: int = 1) -> Array:
        shortcut = x
        y = ConvBlock(self.features, self.separable,
                      self.dtype)(x, train, fold=fold)
        y = ConvBlock(self.features, self.separable,
                      self.dtype)(y, train, fold=fold)
        if self.use_se:
            y = SEBlock(dtype=self.dtype)(y, fold=fold)
        if shortcut.shape[-1] // fold != self.features:
            shortcut = folded.Conv(self.features, (1, 1),
                                   dtype=self.dtype)(shortcut, fold=fold)
            shortcut = BatchNorm(use_running_average=not train,
                                 momentum=0.99, epsilon=1e-3,
                                 dtype=self.dtype)(shortcut, fold=fold)
        return nn.relu(shortcut + y)


def space_to_depth(x: Array, block: int = 2) -> Array:
    """N×H×W×C → N×(H/b)×(W/b)×(C·b²) rearrangement (no FLOPs, pure layout).

    TPU rationale: the reference stem convolves 3 input channels at full
    resolution, which tiles terribly onto the 128×128 MXU (~10 TFLOP/s vs
    ~52 for ≥64-channel shapes). Folding a 2×2 spatial block into channels
    quarters the area and quadruples input depth before the first matmul."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // block, w // block, c * block * block)


class LeafCNN(nn.Module):
    """Full classifier. Input: N×H×W×3 float [0,1]. Output: logits N×K.

    `stem="conv"` is the reference-parity stem (full-resolution ConvBlock);
    `stem="s2d"` applies a 2× space-to-depth before the stem and skips the
    first stage's maxpool, keeping the total downsampling factor — stage 1
    then runs at quarter area with MXU-friendly channel depth.
    """

    num_classes: int
    widths: Sequence[int] = (32, 64, 128)
    drop_block: float = 0.15
    drop_top: float = 0.40
    separable: bool = False
    use_se: bool = True
    use_norm: bool = True
    stem: str = "conv"
    lane_fold: bool = True
    # data-parallel shard count of the batch dim: the fold decision acts
    # on the per-device batch (auto_fold docstring)
    fold_dp: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.use_norm:
            # Adapted stats live in the 'norm_stats' collection; identity
            # until `adapt` overwrites them (mean 0 / var 1).
            mean = self.variable("norm_stats", "mean",
                                 lambda: jnp.zeros((3,), jnp.float32))
            var = self.variable("norm_stats", "var",
                                lambda: jnp.ones((3,), jnp.float32))
            x = (x - mean.value) * jax.lax.rsqrt(var.value + 1e-7)
        x = x.astype(self.dtype)

        if self.stem == "s2d":
            x = space_to_depth(x, 2)

        use_fold = (self.lane_fold
                    and os.environ.get("LEAF_LANE_FOLD", "1") != "0")
        n = x.shape[0]

        def stage_fold(width: int) -> int:
            return (folded.auto_fold(n, width, dp=self.fold_dp)
                    if use_fold else 1)

        g = stage_fold(self.widths[0])
        x = folded.fold(x, g)
        x = ConvBlock(self.widths[0], self.separable,
                      self.dtype)(x, train, fold=g)
        for i, features in enumerate(self.widths):
            g_new = stage_fold(features)
            x, g = folded.refold(x, g, g_new), g_new
            x = ResBlock(features, self.separable, self.use_se,
                         self.dtype)(x, train, fold=g)
            if self.drop_block > 0:
                # SpatialDropout2D: drop whole channels
                x = folded.Dropout(self.drop_block,
                                   broadcast_dims=(1, 2),
                                   deterministic=not train)(x, fold=g)
            if self.stem == "s2d" and i == 0:
                continue  # the 2x downsample moved into the stem
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = jnp.mean(x, axis=(1, 2))
        if g > 1:
            # [m, g·C] → [N, C]: pure reshape (row n'·g+i ← lane block i)
            x = x.reshape(n, x.shape[-1] // g)
        if self.drop_top > 0:
            x = folded.Dropout(self.drop_top, deterministic=not train)(x)
        x = x.astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


def build_leafcnn(
    num_classes: int,
    scale: str = "base",
    separable: bool = False,
    use_norm: bool = True,
    stem: str = "conv",
    lane_fold: bool = True,
    fold_dp: int = 1,
    dtype: Any = jnp.float32,
) -> LeafCNN:
    preset = SCALE_PRESETS[scale]
    return LeafCNN(
        num_classes=num_classes,
        widths=tuple(preset["widths"]),
        drop_block=preset["drop_block"],
        drop_top=preset["drop_top"],
        separable=separable,
        use_norm=use_norm,
        stem=stem,
        lane_fold=lane_fold,
        fold_dp=fold_dp,
        dtype=dtype,
    )


def init_model(
    model: LeafCNN, img_size: int, seed: int = 0
) -> Tuple[Dict, Dict, Dict]:
    """Initialize → (params, batch_stats, norm_stats)."""
    variables = model.init(
        jax.random.key(seed),
        jnp.zeros((1, img_size, img_size, 3), jnp.float32),
        train=False,
    )
    return (
        variables["params"],
        variables.get("batch_stats", {}),
        variables.get("norm_stats", {}),
    )
