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


# --- async, step-granular checkpointing (SURVEY §5) -------------------------


def step_meta_path(ckpt_dir: Path, step: int) -> Path:
    return Path(ckpt_dir) / f"step_meta_{step}.json"


def read_step_meta(ckpt_dir: Path, step: int) -> Optional[Dict]:
    """→ {"epoch", "step_in_epoch", "history"} for a step checkpoint, or
    None for legacy epoch-granular checkpoints (whose id is the epoch)."""
    import json

    p = step_meta_path(ckpt_dir, step)
    if not p.exists():
        return None
    return json.loads(p.read_text())


class AsyncStepCheckpointer:
    """Orbax resume checkpoints every N steps, OFF the step critical path.

    The caller hands in the live (donated-next-step) TrainState; `maybe_save`
    snapshots it with an on-device `jnp.copy` — an async dispatch that the
    device stream orders BEFORE the next step's donation reuses the buffers,
    so it costs the train chain nothing — and a single background worker
    thread then pays the device→host fetch and the orbax write. If the
    previous save is still in flight when the cadence next fires, the save
    is skipped rather than queued (bounded memory; the next boundary
    retries). SURVEY §5 mandates async saves every N steps; the reference
    has no mid-run checkpointing at all (`srcs/train/utils.py:75-97` is a
    single post-training save).

    Multi-host (`jax.process_count() > 1`) is supported with two changes
    that keep every host's collective sequence IDENTICAL — the two ways an
    async checkpointer can desynchronize a multi-host run:

    - deterministic cadence: the save decision is a pure function of the
      global step (`step % N == 0`), and a still-in-flight previous save is
      WAITED on rather than skipped (skip-if-busy depends on per-host disk
      timing, so hosts could disagree about which steps saved and deadlock
      inside orbax's barriers);
    - main-thread device work: the snapshot copy, the all-gather of
      cross-process (tensor-parallel) leaves, and the device→host copy
      enqueue are all ASYNC DISPATCHES issued from the training thread, so
      they hold the same position relative to the train-step collectives
      in every host's device stream. The worker thread only WAITS on those
      already-enqueued transfers and runs the orbax write — whose
      multi-host finalization is a coordination-service barrier
      (process-level, like orbax's own async checkpointer), not an XLA
      collective, and is therefore safe off-thread.
    """

    def __init__(self, ckpt_dir: Path, every_steps: int,
                 max_to_keep: int = 2) -> None:
        import concurrent.futures as cf

        import orbax.checkpoint as ocp

        self.ckpt_dir = Path(ckpt_dir).resolve()
        self.every_steps = max(1, int(every_steps))
        self._multihost = jax.process_count() > 1
        self._mngr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True))
        self._pool = cf.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
        self._inflight = None
        self._last_saved = -1

    def maybe_save(self, global_step: int, state: Any,
                   meta: Dict) -> bool:
        """Snapshot + schedule a save if the cadence fires. → True when a
        save was scheduled. Single-process: skip-if-busy, near-instant (the
        only on-thread work is dispatching the device-side copy).
        Multi-host: modulo cadence + wait-if-busy (see class docstring)."""
        import jax.numpy as jnp

        if self._multihost:
            if global_step <= 0 or global_step % self.every_steps:
                return False
            if self._inflight is not None:
                # deterministic: every host waits here for ITS OWN previous
                # save; the sequence of saves stays identical across hosts
                self._inflight.result()
            snap = jax.tree_util.tree_map(jnp.copy, state)
            snap = self._gather_cross_process(snap)
            for leaf in jax.tree_util.tree_leaves(snap):
                if isinstance(leaf, jax.Array):
                    leaf.copy_to_host_async()
            self._last_saved = global_step
            self._inflight = self._pool.submit(
                self._save, global_step, snap, dict(meta))
            return True
        if global_step - self._last_saved < self.every_steps:
            return False
        if self._inflight is not None and not self._inflight.done():
            return False
        snap = jax.tree_util.tree_map(jnp.copy, state)
        self._last_saved = global_step
        self._inflight = self._pool.submit(
            self._save, global_step, snap, dict(meta))
        return True

    @staticmethod
    def _gather_cross_process(snap: Any) -> Any:
        """Re-assemble leaves that span processes (tensor-parallel shards)
        into replicated arrays — `_host_tree`'s collective, but dispatched
        HERE on the training thread so its stream position is identical on
        every host. Async dispatch: returns immediately."""
        def one(x):
            if isinstance(x, jax.Array) and not (
                    x.is_fully_addressable or x.is_fully_replicated):
                repl = jax.sharding.NamedSharding(
                    x.sharding.mesh, jax.sharding.PartitionSpec())
                x = jax.jit(lambda a: a, out_shardings=repl)(x)
            return x

        return jax.tree_util.tree_map(one, snap)

    def _save(self, step: int, snap: Any, meta: Dict) -> None:
        import json

        import orbax.checkpoint as ocp

        # device→host fetch, off-thread. On multi-host the cross-process
        # leaves were already gathered (and all d2h copies enqueued) on the
        # training thread, so this only WAITS — no new device collectives
        # ever run from this worker.
        host_state = _host_tree(snap)
        del snap                            # release the device copies
        self._mngr.save(step, args=ocp.args.StandardSave(host_state))
        self._mngr.wait_until_finished()    # commit before meta points at it
        if jax.process_index() == 0:
            tmp = step_meta_path(self.ckpt_dir, step).with_suffix(".tmp")
            tmp.write_text(json.dumps(meta))
            tmp.replace(step_meta_path(self.ckpt_dir, step))
            # prune meta files for checkpoints the manager garbage-collected
            live = set(self._mngr.all_steps())
            for p in self.ckpt_dir.glob("step_meta_*.json"):
                try:
                    if int(p.stem.rsplit("_", 1)[1]) not in live:
                        p.unlink(missing_ok=True)
                except ValueError:
                    pass
        LOGGER.info("Async checkpoint saved at step %d", step)

    def busy(self) -> bool:
        return self._inflight is not None and not self._inflight.done()

    def close(self) -> None:
        """Wait for the in-flight save (surfacing its exception, if any)
        and release the manager/worker."""
        try:
            if self._inflight is not None:
                self._inflight.result()
        finally:
            self._pool.shutdown(wait=True)
            self._mngr.close()
