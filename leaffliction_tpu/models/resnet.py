"""ResNet-style deeper backbone — BASELINE.json config 4.

The reference has no deeper model; its `--scale base` tops out at 4 stages of
single residual blocks (`srcs/cli/train.py:266-280`). This backbone provides
the "ResNet-style deeper backbone at 224px, bf16" target: a classic
stem + [stage × blocks] layout with strided downsampling, SE blocks, and the
same logits-out contract as LeafCNN so the trainer/predictor work unchanged.

Presets:
- resnet18-ish: (2, 2, 2, 2) basic blocks, widths (64, 128, 256, 512)
- resnet10:     (1, 1, 1, 1) — fast variant

The stem and the width-64 stage run in the lane-folded batch layout
(`models/folded.py`: G=2 images folded into channels at b≥16 — full 128
lanes for every HBM touch of the 112²/56² activations, block-diagonal
convs; same math, same parameter tree). `LEAF_LANE_FOLD=0` disables.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from leaffliction_tpu.models import folded
from leaffliction_tpu.models.leafcnn import SEBlock, space_to_depth
from leaffliction_tpu.ops.fused_bn import BatchNorm

Array = jax.Array

RESNET_PRESETS: Dict[str, Dict[str, Any]] = {
    "resnet10": {"blocks": (1, 1, 1, 1), "widths": (64, 128, 256, 512)},
    "resnet18": {"blocks": (2, 2, 2, 2), "widths": (64, 128, 256, 512)},
}


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    use_se: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool, fold: int = 1) -> Array:
        shortcut = x
        y = folded.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                        dtype=self.dtype)(x, fold=fold)
        y = BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=1e-5, dtype=self.dtype)(y, fold=fold)
        y = nn.relu(y)
        y = folded.Conv(self.features, (3, 3),
                        dtype=self.dtype)(y, fold=fold)
        y = BatchNorm(use_running_average=not train, momentum=0.9,
                      epsilon=1e-5, scale_init=nn.initializers.zeros,
                      dtype=self.dtype)(y, fold=fold)
        if self.use_se:
            y = SEBlock(dtype=self.dtype)(y, fold=fold)
        if shortcut.shape[-1] // fold != self.features or self.strides != 1:
            shortcut = folded.Conv(self.features, (1, 1),
                                   strides=(self.strides,) * 2,
                                   dtype=self.dtype)(shortcut, fold=fold)
            shortcut = BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype)(shortcut, fold=fold)
        return nn.relu(shortcut + y)


class LeafResNet(nn.Module):
    """Input: N×H×W×3 float [0,1]. Output: logits N×K (LeafCNN contract).

    `stem="conv"` is the classic 7×7/2 + 3×3-maxpool/2 stem; `stem="s2d"`
    is a patchify stem — 4×4 space-to-depth then a 2×2 stride-1 conv —
    reaching the same 56² × widths[0] stage-1 shape. Measured fwd+bwd at
    b128 @224 the conv stem costs 3.5 ms/step while s2d is ~free: the cost
    is not the small-C conv itself (an exactly-equivalent s2d(2×2)+4×4
    conv rebuild measures the same 3.5 ms) but the 112²×64 intermediate
    the classic stem materializes — ~205 MB per tensor per direction of
    pure HBM traffic that the patchify stem never creates. The lane fold
    (G=2 at width 64) halves the REAL traffic of that intermediate: bf16
    C=64 rides T(8,128) tiles at half occupancy, folded C=128 at full.
    """

    num_classes: int
    blocks: Sequence[int] = (2, 2, 2, 2)
    widths: Sequence[int] = (64, 128, 256, 512)
    use_se: bool = True
    use_norm: bool = True
    drop_top: float = 0.2
    stem: str = "conv"
    lane_fold: bool = True
    # data-parallel shard count of the batch dim (see folded.auto_fold)
    fold_dp: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.use_norm:
            mean = self.variable("norm_stats", "mean",
                                 lambda: jnp.zeros((3,), jnp.float32))
            var = self.variable("norm_stats", "var",
                                lambda: jnp.ones((3,), jnp.float32))
            x = (x - mean.value) * jax.lax.rsqrt(var.value + 1e-7)
        x = x.astype(self.dtype)

        use_fold = (self.lane_fold
                    and os.environ.get("LEAF_LANE_FOLD", "1") != "0")
        n = x.shape[0]

        def stage_fold(width: int) -> int:
            return (folded.auto_fold(n, width, dp=self.fold_dp)
                    if use_fold else 1)

        g = stage_fold(self.widths[0])
        if self.stem == "s2d":
            # patchify: 224²×3 → 56²×48 → 2×2/1 conv (never touches 112²).
            # s2d BEFORE fold: the folded lane layout must be (g, c'),
            # and c' for the conv below is the s2d-expanded 48.
            x = space_to_depth(x, 4)
            x = folded.fold(x, g)
            x = folded.Conv(self.widths[0], (2, 2),
                            dtype=self.dtype)(x, fold=g)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype)(x, fold=g)
            x = nn.relu(x)
        else:
            # stem: 7x7/2 + maxpool/2 (224 → 56)
            x = folded.fold(x, g)
            x = folded.Conv(self.widths[0], (7, 7), strides=(2, 2),
                            dtype=self.dtype)(x, fold=g)
            x = BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype)(x, fold=g)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")

        for stage, (n_blocks, width) in enumerate(zip(self.blocks,
                                                      self.widths)):
            g_new = stage_fold(width)
            x, g = folded.refold(x, g, g_new), g_new
            for block in range(n_blocks):
                strides = 2 if (block == 0 and stage > 0) else 1
                x = BasicBlock(width, strides, self.use_se,
                               self.dtype)(x, train, fold=g)

        x = jnp.mean(x, axis=(1, 2))
        if g > 1:
            # [m, g·C] → [N, C]: pure reshape (row n'·g+i ← lane block i)
            x = x.reshape(n, x.shape[-1] // g)
        if self.drop_top > 0:
            x = nn.Dropout(self.drop_top, deterministic=not train)(x)
        x = x.astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32)(x)


def build_resnet(
    num_classes: int,
    preset: str = "resnet18",
    use_norm: bool = True,
    stem: str = "conv",
    lane_fold: bool = True,
    fold_dp: int = 1,
    dtype: Any = jnp.bfloat16,
) -> LeafResNet:
    spec = RESNET_PRESETS[preset]
    return LeafResNet(
        num_classes=num_classes, blocks=tuple(spec["blocks"]),
        widths=tuple(spec["widths"]), use_norm=use_norm, stem=stem,
        lane_fold=lane_fold, fold_dp=fold_dp, dtype=dtype,
    )
