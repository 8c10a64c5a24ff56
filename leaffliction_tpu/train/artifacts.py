"""Final training artifact set — schema parity with the reference.

Writes the same files as `save_best_variant` (`srcs/train/utils.py:95-130`):
model checkpoint, `labels.json` ({"label2idx": ...}), `history.json`,
`meta.json` (created_at / model_file / ... / saved_variant / labels + the
run/data/model/training/system blocks from `srcs/cli/train.py:332-386`),
`confusion_matrix.{json,png}`. The model file is `leaf_cnn.msgpack` (JAX
checkpoint) instead of `leaf_cnn.keras`; framework version keys record
jax/flax instead of keras/tensorflow.
"""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path
from typing import Any, Dict, List

from leaffliction_tpu.core.logging import get_logger
from leaffliction_tpu.train.checkpoint import save_model_msgpack
from leaffliction_tpu.train.steps import TrainState
from leaffliction_tpu.utils.confusion import export_confusion

LOGGER = get_logger(__name__)

MODEL_FILENAME = "leaf_cnn.msgpack"


def save_training_artifacts(
    out_dir: Path,
    state: TrainState,
    label2idx: Dict[str, int],
    history: Dict[str, List[float]],
    saved_variant: str,
    y_true,
    y_pred,
    meta: Dict[str, Any] | None = None,
) -> Path:
    import flax
    import jax

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    model_path = out_dir / MODEL_FILENAME
    save_model_msgpack(model_path, state.params, state.batch_stats,
                       state.norm_stats)

    with (out_dir / "labels.json").open("w", encoding="utf-8") as f:
        json.dump({"label2idx": label2idx}, f, indent=2)
    with (out_dir / "history.json").open("w", encoding="utf-8") as f:
        json.dump({k: [float(x) for x in v] for k, v in history.items()},
                  f, indent=2)

    labels_sorted = sorted(label2idx, key=lambda k: label2idx[k])
    meta_out: Dict[str, Any] = {
        "created_at": datetime.now(tz=timezone.utc).isoformat(),
        "model_file": str(model_path),
        "labels_file": str(out_dir / "labels.json"),
        "history_file": str(out_dir / "history.json"),
        "confusion_matrix_file": str(out_dir / "confusion_matrix.json"),
        "jax_version": jax.__version__,
        "flax_version": flax.__version__,
        "saved_variant": saved_variant,
        "labels": labels_sorted,
    }
    if meta:
        meta_out.update(meta)
    with (out_dir / "meta.json").open("w", encoding="utf-8") as f:
        json.dump(meta_out, f, indent=2)

    export_confusion(y_true, y_pred, labels_sorted, out_dir)
    LOGGER.info("Artifacts written to %s", out_dir.resolve())
    return model_path
