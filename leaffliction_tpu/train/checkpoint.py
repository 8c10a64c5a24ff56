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


def _host_tree(state: Any) -> Any:
    """Materialize a (possibly sharded) state tree on the host.

    Leaves that are neither fully addressable nor fully replicated —
    tensor-parallel shards spanning processes — are first re-assembled
    replicated via a jit identity (an all-gather over the array's own mesh;
    a COLLECTIVE, so on multi-host EVERY process must call this, even the
    ones that won't write the file)."""
    def one(x):
        if isinstance(x, jax.Array) and not (
                x.is_fully_addressable or x.is_fully_replicated):
            repl = jax.sharding.NamedSharding(
                x.sharding.mesh, jax.sharding.PartitionSpec())
            x = jax.jit(lambda a: a, out_shardings=repl)(x)
        return x

    return jax.device_get(jax.tree_util.tree_map(one, state))


def save_resume_checkpoint(ckpt_dir: Path, step: int, state: Any) -> None:
    """Save a resume checkpoint. Multi-host safe: the state is gathered on
    every process (the gather is a collective), and EVERY process must also
    call `mngr.save` — orbax's save is itself a collective (it runs
    sync_global_processes barriers) and coordinates single-writer disk
    access internally (primary host writes metadata / renames the tmp dir)."""
    import orbax.checkpoint as ocp

    host_state = _host_tree(state)
    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(ckpt_dir, options=ocp.CheckpointManagerOptions(
            max_to_keep=2, create=True)) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(host_state))
        mngr.wait_until_finished()


def latest_resume_step(ckpt_dir: Path) -> Optional[int]:
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    if not ckpt_dir.exists():
        return None
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        return mngr.latest_step()


def restore_resume_checkpoint(ckpt_dir: Path, step: int, template: Any) -> Any:
    """Restore a resume checkpoint (shared filesystem: every process reads
    the same files — read-only, safe concurrently). The returned tree is
    host numpy; the training step's in_shardings re-place it on device."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    with ocp.CheckpointManager(ckpt_dir) as mngr:
        target = jax.tree_util.tree_map(np.asarray, _host_tree(template))
        return mngr.restore(step, args=ocp.args.StandardRestore(target))
