"""Model checkpoint serialization.

Final export: a single `leaf_cnn.msgpack` file (flax.serialization) holding
{params, batch_stats, norm_stats} — the JAX equivalent of the reference's
`leaf_cnn.keras` single-file save (`srcs/train/utils.py:95-97`). The module
hyperparameters needed to rebuild the architecture live in `meta.json`'s
"model" block, which the loader reads (see `predict/model_loader.py`).

Mid-run resume uses orbax (`save_resume_checkpoint`/`restore_resume_checkpoint`)
— a capability the reference lacks entirely (save-only, SURVEY §5).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from leaffliction_tpu.core.logging import get_logger

LOGGER = get_logger(__name__)


def save_model_msgpack(
    path: Path, params: Any, batch_stats: Any, norm_stats: Any
) -> None:
    payload = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
        "norm_stats": jax.device_get(norm_stats),
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(payload))
    LOGGER.info("Model saved: %s", path.resolve())


def load_model_msgpack(path: Path, template: Optional[Dict] = None) -> Dict:
    """Load the checkpoint; with a `template` pytree the arrays are restored
    with exact structure, otherwise a raw nested dict of numpy arrays."""
    data = Path(path).read_bytes()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)


# --- mid-run resume (orbax) ------------------------------------------------


def save_resume_checkpoint(ckpt_dir: Path, step: int, state: Any) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(ckpt_dir, options=ocp.CheckpointManagerOptions(
            max_to_keep=2, create=True)) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(jax.device_get(state)))
        mngr.wait_until_finished()


def latest_resume_step(ckpt_dir: Path) -> Optional[int]:
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    if not ckpt_dir.exists():
        return None
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        return mngr.latest_step()


def restore_resume_checkpoint(ckpt_dir: Path, step: int, template: Any) -> Any:
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        target = jax.tree_util.tree_map(np.asarray, jax.device_get(template))
        return mngr.restore(step, args=ocp.args.StandardRestore(target))
