"""Load a trained LeafCNN from the artifacts directory.

Equivalent of the reference `ModelLoader` (`srcs/predict/model_loader.py:12-59`):
reads `meta.json` for labels/img_size/num_classes and loads the checkpoint the
meta points at (`model_file`) — here a flax msgpack written by
`train/checkpoint.py`, with the architecture rebuilt from meta's "model" block.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax.numpy as jnp

from leaffliction_tpu.core.logging import get_logger
from leaffliction_tpu.models.leafcnn import LeafCNN
from leaffliction_tpu.train.checkpoint import load_model_msgpack

LOGGER = get_logger(__name__)


class ModelLoader:
    def __init__(self, learnings_dir: Path) -> None:
        self.learnings_dir = Path(learnings_dir)
        self.meta: Dict[str, Any] = {}
        self.model: Optional[LeafCNN] = None
        self.variables: Dict[str, Any] = {}

    def load(self) -> "ModelLoader":
        meta_path = self.learnings_dir / "meta.json"
        if not meta_path.exists():
            raise FileNotFoundError(f"Meta file not found: {meta_path}")
        self.meta = json.loads(meta_path.read_text())

        model_file = Path(self.meta["model_file"])
        if not model_file.is_absolute():
            # meta records a path relative to the TRAINING run's cwd (the
            # reference does the same, srcs/train/utils.py:95-97). Resolve
            # against the learnings dir FIRST: a same-named file under the
            # caller's cwd (e.g. artifacts/models/leaf_cnn.keras from a
            # different run) must never shadow the directory the user
            # explicitly pointed -learnings at.
            local = self.learnings_dir / model_file.name
            if local.exists():
                model_file = local
        mcfg = self.meta.get("model", {})
        training = self.meta.get("training", {})
        if model_file.suffix == ".keras":
            # reference-trained artifact dir: map the Keras graph's weights
            # into a LeafCNN (arch inferred from the graph, no meta needed).
            # Compute dtype defaults to FLOAT32 here unless meta explicitly
            # enables mixed precision: reference meta.json has no
            # training.mixed_precision key, and serving a Keras-trained
            # model in bf16 by default would silently diverge from the
            # user's own Keras predictions.
            use_bf16 = bool(training.get("mixed_precision", False))
            from leaffliction_tpu.train.keras_export import import_keras

            imported, self.variables = import_keras(model_file)
            self.model = imported.clone(
                dtype=jnp.bfloat16 if use_bf16 else jnp.float32)
            if self.labels and imported.num_classes != self.num_classes:
                raise ValueError(
                    f"meta.json lists {self.num_classes} labels but the "
                    f".keras graph's head is {imported.num_classes}-wide — "
                    "predictions would be decoded against wrong labels")
            LOGGER.info("Keras model loaded from %s (%d classes)",
                        model_file, self.num_classes)
            return self
        use_bf16 = training.get("mixed_precision", True)
        dtype = jnp.bfloat16 if use_bf16 else jnp.float32
        arch = mcfg.get("name", "leaf_cnn")
        if arch in ("resnet10", "resnet18"):
            from leaffliction_tpu.models.resnet import build_resnet

            self.model = build_resnet(
                num_classes=self.num_classes, preset=arch,
                use_norm=bool(mcfg.get("use_normalization", True)),
                stem=mcfg.get("stem", "conv"),
                dtype=dtype,
            )
        else:
            self.model = LeafCNN(
                num_classes=self.num_classes,
                widths=tuple(mcfg.get("widths", (32, 64, 128, 256))),
                drop_block=mcfg.get("drop_block", 0.15),
                drop_top=mcfg.get("drop_top", 0.40),
                separable=bool(mcfg.get("separable", False)),
                use_norm=bool(mcfg.get("use_normalization", True)),
                stem=mcfg.get("stem", "conv"),
                dtype=dtype,
            )
        restored = load_model_msgpack(model_file)
        self.variables = {
            "params": restored["params"],
            "batch_stats": restored.get("batch_stats", {}),
            "norm_stats": restored.get("norm_stats", {}),
        }
        LOGGER.info("Model loaded from %s (%d classes)", model_file,
                    self.num_classes)
        return self

    @property
    def labels(self) -> List[str]:
        return list(self.meta.get("labels", []))

    @property
    def num_classes(self) -> int:
        return len(self.labels) or int(
            self.meta.get("data", {}).get("num_classes", 0)
        )

    @property
    def img_size(self) -> int:
        return int(self.meta.get("data", {}).get("img_size", 224))
