"""Training loop with the reference's callback semantics, on-device steps.

Reproduces the behavioral contract of Keras `model.fit` + callbacks used by
the reference (`srcs/train/utils.py:60-72`, `srcs/cli/train.py:389-447`):

- history dict with keys loss/accuracy/val_loss/val_accuracy per epoch;
- ReduceLROnPlateau(monitor=val_loss, patience=3, factor=0.3) — implemented
  as a dynamic `lr_scale` scalar inside the jitted step (no recompilation);
- EarlyStopping(monitor=val_loss, patience=6, restore_best_weights=True);
- optional stop when val_accuracy ≥ target (`srcs/cli/train.py:411-430`);
- post-loop base-vs-EMA evaluation, winner selection
  (`srcs/train/utils.py:84-93`).

The loop itself is host-side control only; every FLOP runs inside the two
jitted step functions from `train/steps.py`.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from leaffliction_tpu.core.logging import get_logger
from leaffliction_tpu.data.loader import BatchIterator
from leaffliction_tpu.train.config import TrainConfig
from leaffliction_tpu.train.steps import StepFns, TrainState

LOGGER = get_logger(__name__)


def prefetch_to_device(batches, mesh, lookahead: int = 2):
    """device_put batches ahead of consumption.

    jax dispatch is async, so the host→device transfer of batch N+1 overlaps
    the compute of batch N — essential on hosts where the transfer path is
    slow (the tunneled dev chip moves ~3-70 MB/s). Multi-device meshes get
    the batch sharded over the `data` axis.
    """
    from collections import deque

    from leaffliction_tpu.data.loader import Batch
    from leaffliction_tpu.parallel.mesh import batch_sharding, chain_batch_sharding

    multi_host = jax.process_count() > 1

    def _shard(x, chained):
        ndim = x.ndim
        sharding = (chain_batch_sharding(mesh, ndim) if chained
                    else batch_sharding(mesh, ndim))
        if multi_host:
            # each host holds only its local slice of the global batch
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    def _put(b: "Batch") -> "Batch":
        if mesh.size == 1:
            return Batch(images=jax.device_put(b.images),
                         labels=jax.device_put(b.labels),
                         mask=jax.device_put(b.mask),
                         indices=b.indices)
        chained = b.images.ndim == 5  # [K, B, S, S, 3] chained chunk
        return Batch(
            images=_shard(b.images, chained),
            labels=_shard(b.labels, chained),
            mask=_shard(b.mask, chained),
            indices=b.indices,
        )

    queue: "deque" = deque()
    it = iter(batches)
    for _ in range(lookahead):
        try:
            queue.append(_put(next(it)))
        except StopIteration:
            break
    while queue:
        try:
            queue.append(_put(next(it)))
        except StopIteration:
            pass
        yield queue.popleft()


def chain_batches(batches, k: int):
    """Group a batch stream into stacked chains of k (images [k,B,S,S,3]).

    Full groups are stacked for `train_step_chain` (one dispatch, one
    transfer per k steps); the remainder is yielded as plain batches for the
    single-step program. With k<=1 the stream passes through untouched."""
    from leaffliction_tpu.data.loader import Batch

    if k <= 1:
        yield from batches
        return
    buf = []
    for b in batches:
        buf.append(b)
        if len(buf) == k:
            yield Batch(
                images=np.stack([x.images for x in buf]),
                labels=np.stack([x.labels for x in buf]),
                mask=np.stack([x.mask for x in buf]),
                indices=np.stack([x.indices for x in buf]),
            )
            buf = []
    yield from buf


@dataclasses.dataclass
class FitResult:
    state: TrainState
    history: Dict[str, List[float]]
    best_variant: str          # "base" | "ema"
    val_accuracy: float        # of the saved variant
    epochs_ran: int
    steps_ran: int
    train_time_s: float
    images_per_sec: float


def put_dataset(store, mesh) -> Tuple[jax.Array, jax.Array]:
    """Upload a decoded ImageStore to device HBM once (uint8 images +
    labels); on a multi-device mesh the dataset is replicated per device and
    gather indices shard over `data`. With the dataset resident, the per-step
    host→device traffic drops from megabytes of pixels to kilobytes of
    indices — the decisive win on bandwidth-bound links."""
    if mesh.size > 1:
        from leaffliction_tpu.parallel.mesh import replicated

        sharding = replicated(mesh)
        return (jax.device_put(store.images, sharding),
                jax.device_put(store.labels, sharding))
    return jax.device_put(store.images), jax.device_put(store.labels)


def evaluate(
    step_fns: StepFns,
    state: TrainState,
    val_iter: BatchIterator,
    use_ema: bool = False,
    collect_preds: bool = True,
    device_data: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """→ (loss, accuracy, y_true, y_pred) over the full (masked) val set.

    All batches are dispatched before any result is fetched (one sync at the
    end, not one RTT per batch). Per-epoch callers pass collect_preds=False —
    predictions are only needed for the final confusion matrix.
    `device_data=(images, labels)` switches to the gather path: batches are
    selected out of the device-resident dataset by index."""
    pending = []
    chain_fn = (step_fns.eval_chain_ema_gather if use_ema
                else step_fns.eval_chain_gather)
    if device_data is not None and chain_fn is not None:
        # whole val set in ONE program: one dispatch + one fetch per eval
        dd_img, dd_lab = device_data
        batches = list(val_iter.epoch(0))
        if not batches:
            return 0.0, 0.0, np.zeros((0,), np.int32), np.zeros((0,), np.int32)
        sel = np.stack([np.asarray(b.indices) for b in batches])
        msk = np.stack([np.asarray(b.mask) for b in batches])
        if jax.process_count() > 1:
            from jax.sharding import PartitionSpec as P

            from leaffliction_tpu.parallel.mesh import global_batch_array

            sel = global_batch_array(sel, step_fns.mesh, P(None, "data"))
            msk = global_batch_array(msk, step_fns.mesh, P(None, "data"))
        metrics, preds = chain_fn(state, dd_img, dd_lab, sel, msk)
        metrics, preds = jax.device_get((metrics, preds))
        loss_sum = float(np.sum(metrics["loss_sum"]))
        correct = float(np.sum(metrics["correct"]))
        n = max(float(np.sum(metrics["n"])), 1.0)
        ys, ps = [], []
        if collect_preds:
            for k, b in enumerate(batches):
                keep = np.asarray(b.mask) > 0
                ys.append(np.asarray(b.labels)[keep])
                ps.append(np.asarray(preds[k])[keep])
        y_true = np.concatenate(ys) if ys else np.zeros((0,), np.int32)
        y_pred = np.concatenate(ps) if ps else np.zeros((0,), np.int32)
        return loss_sum / n, correct / n, y_true, y_pred
    if device_data is not None:
        dd_img, dd_lab = device_data
        eval_fn = (step_fns.eval_step_ema_gather if use_ema
                   else step_fns.eval_step_gather)
        for batch in val_iter.epoch(0):
            metrics, preds = eval_fn(state, dd_img, dd_lab,
                                     batch.indices, batch.mask)
            pending.append((metrics, preds if collect_preds else None, batch))
    else:
        eval_fn = step_fns.eval_step_ema if use_ema else step_fns.eval_step
        # keep the HOST batch for label/mask pairing: after device placement
        # the arrays are global and (on multi-host) not fully addressable
        host_batches = list(val_iter.epoch(0))
        dev_stream = prefetch_to_device(iter(host_batches), step_fns.mesh)
        for hb, db in zip(host_batches, dev_stream):
            metrics, preds = eval_fn(state, db.images, db.labels, db.mask)
            pending.append((metrics, preds if collect_preds else None, hb))

    def _local_preds(preds) -> np.ndarray:
        """Host-local rows of the (data-sharded) preds array.

        On a multi-host slice the global preds array is not fully addressable
        per host, so `device_get` on it raises; each host's addressable
        shards are exactly its local batch rows (placed there by
        `make_array_from_process_local_data`), which is what the local
        labels/mask pair with."""
        if jax.process_count() <= 1:
            return np.asarray(jax.device_get(preds))
        shards = sorted(preds.addressable_shards,
                        key=lambda s: s.index[0].start or 0)
        return np.concatenate([np.asarray(s.data) for s in shards])

    loss_sum = 0.0
    correct = 0.0
    n = 0.0
    ys, ps = [], []
    # ONE batched fetch for all per-batch metrics (a per-batch device_get
    # pays one relay RTT each — ~13 serial RTTs per eval, ~22 evals per
    # 20-epoch run); preds likewise when single-process.
    fetched = jax.device_get([m for m, _, _ in pending])
    if collect_preds and pending and jax.process_count() <= 1:
        fetched_preds = jax.device_get([p for _, p, _ in pending])
    else:
        fetched_preds = [None if p is None else _local_preds(p)
                         for _, p, _ in pending]
    for (_, preds, batch), metrics, pnp in zip(pending, fetched,
                                               fetched_preds):
        loss_sum += float(metrics["loss_sum"])
        correct += float(metrics["correct"])
        n += float(metrics["n"])
        if preds is not None:
            keep = np.asarray(batch.mask) > 0
            ys.append(np.asarray(batch.labels)[keep])
            ps.append(np.asarray(pnp)[keep])
    n = max(n, 1.0)
    y_true = np.concatenate(ys) if ys else np.zeros((0,), np.int32)
    y_pred = np.concatenate(ps) if ps else np.zeros((0,), np.int32)
    return loss_sum / n, correct / n, y_true, y_pred


def fit(
    step_fns: StepFns,
    state: TrainState,
    train_iter: BatchIterator,
    val_iter: BatchIterator,
    cfg: TrainConfig,
    epochs: int,
    seed: int,
    target_val_acc: Optional[float] = None,
    log_every: int = 50,
    start_epoch: int = 0,
    history: Optional[Dict[str, List[float]]] = None,
    epoch_callback=None,
    chain_steps: int = 1,
    device_dataset: bool = False,
    train_device_data: Optional[Tuple[jax.Array, jax.Array]] = None,
    val_device_data: Optional[Tuple[jax.Array, jax.Array]] = None,
    step_callback=None,
    skip_steps: int = 0,
) -> FitResult:
    """Run the training loop.

    `start_epoch`/`history` support mid-run resume (orbax checkpoints — a
    capability the reference lacks, SURVEY §5); `epoch_callback(epoch, state,
    history)` fires after each epoch's eval (checkpoint saving hook).
    `step_callback(epoch, step_in_epoch, state)` fires after each dispatch
    (a chained chunk fires once, with step_in_epoch counting all its steps)
    — the async step-checkpoint hook; it must not block. `skip_steps` skips
    the first N steps of the FIRST epoch run (mid-epoch resume: the batch
    stream is deterministic per epoch seed, so the skipped prefix is exactly
    the data the interrupted run already consumed; the resumed epoch's train
    metrics then cover only the remaining steps).
    `chain_steps=k` runs k train steps per dispatch via `train_step_chain`
    (same math; amortizes per-dispatch overhead on slow links).
    `device_dataset=True` uploads the full uint8 train/val stores to HBM once
    and drives every step by gather indices — per-step host→device traffic
    becomes negligible (single-process only: each host's indices refer to its
    own local store). `train_device_data`/`val_device_data` supply an
    ALREADY-device-resident (images, labels) pair — the fused balance→train
    handoff (`data/fused_balance.py`), where the pixels were produced on
    device and never existed on the host.
    """
    root_key = jax.random.key(seed)
    # prebuilt fused data is globally replicated by the caller
    # (`parallel.mesh.replicate_global`), so the gather path works on
    # multi-host too: every process iterates the SAME full item list and
    # ships identical global sel indices. `device_dataset=True` (store
    # upload) stays single-process — its stores are per-host shards.
    prebuilt = train_device_data is not None
    gather = prebuilt or (device_dataset and jax.process_count() == 1)
    train_dd = val_dd = None
    if prebuilt:
        assert val_device_data is not None
        train_dd, val_dd = train_device_data, val_device_data
        LOGGER.info(
            "Fused device-resident dataset: %.0f MB train + %.0f MB val "
            "in HBM (no host copy ever existed)",
            train_dd[0].nbytes / 1e6, val_dd[0].nbytes / 1e6)
    elif gather:
        train_dd = put_dataset(train_iter.store, step_fns.mesh)
        val_dd = put_dataset(val_iter.store, step_fns.mesh)
        LOGGER.info(
            "Device-resident dataset: %.0f MB train + %.0f MB val in HBM",
            train_iter.store.images.nbytes / 1e6,
            val_iter.store.images.nbytes / 1e6)
    history = history if history is not None else {
        "loss": [], "accuracy": [], "val_loss": [], "val_accuracy": [],
    }

    # Snapshots must copy: the jitted train step donates the state buffers,
    # so holding the originals across steps would be use-after-donate.
    def _snapshot(st: TrainState):
        copy = lambda t: jax.tree_util.tree_map(jax.numpy.copy, t)  # noqa: E731
        return (copy(st.params), copy(st.batch_stats))

    best_val_loss = float("inf")
    best_params = _snapshot(state)
    plateau_wait = 0
    early_wait = 0
    lr_scale = 1.0
    steps_ran = 0
    images_seen = 0.0
    epochs_ran = 0
    t0 = time.perf_counter()

    for epoch in range(start_epoch, epochs):
        epochs_ran = epoch + 1
        ep_loss = 0.0
        ep_correct = 0.0
        ep_n = 0.0
        # Metrics stay on device until epoch end — fetching per step costs
        # one sync round-trip per step (30-140 ms on tunneled links) and
        # serializes the async dispatch pipeline.
        pending_metrics = []
        epoch_key = jax.random.fold_in(root_key, epoch)
        stream = chain_batches(train_iter.epoch(epoch), chain_steps)
        if not gather:
            stream = prefetch_to_device(stream, step_fns.mesh)
        steps_in_epoch = 0
        for i, batch in enumerate(stream):
            key = jax.random.fold_in(epoch_key, i)
            chained = batch.images.ndim == 5  # chained chunk [K, B, ...]
            if epoch == start_epoch and skip_steps > 0:
                width = batch.images.shape[0] if chained else 1
                if steps_in_epoch + width <= skip_steps:
                    # mid-epoch resume: this dispatch's data was consumed by
                    # the interrupted run (keys stay index-aligned via `i`)
                    steps_in_epoch += width
                    continue
            if gather:
                # ship only indices; pixels are gathered from HBM in-program.
                # Remainder batches run as a K=1 chain (same program family).
                sel = batch.indices if chained else batch.indices[None]
                mk = batch.mask if chained else batch.mask[None]
                if jax.process_count() > 1:
                    # multi-host: numpy inputs can't take the [K, B→data]
                    # sharding directly; build the global index arrays
                    # (identical on every process)
                    from jax.sharding import PartitionSpec as P

                    from leaffliction_tpu.parallel.mesh import (
                        global_batch_array,
                    )

                    sel = global_batch_array(sel, step_fns.mesh,
                                             P(None, "data"))
                    mk = global_batch_array(mk, step_fns.mesh,
                                            P(None, "data"))
                state, metrics = step_fns.train_step_gather(
                    state, train_dd[0], train_dd[1], sel, mk, key
                )
                k = sel.shape[0]
            elif chained:
                state, metrics = step_fns.train_step_chain(
                    state, batch.images, batch.labels, batch.mask, key
                )
                k = batch.images.shape[0]
            else:
                state, metrics = step_fns.train_step(
                    state, batch.images, batch.labels, batch.mask, key
                )
                k = 1
            prev = steps_ran
            steps_ran += k
            steps_in_epoch += k
            pending_metrics.append(metrics)
            if step_callback is not None:
                step_callback(epoch, steps_in_epoch, state)
            if log_every and steps_ran // log_every > prev // log_every:
                m = jax.device_get(metrics)
                LOGGER.info("step %d: loss=%.4f lr=%.2e", steps_ran,
                            float(np.ravel(m["loss"])[-1]),
                            float(np.ravel(m["lr"])[-1]))
        for metrics in jax.device_get(pending_metrics):
            # metric leaves are scalars (single step) or [K] (chained chunk)
            bn = np.asarray(metrics["n"], np.float64)
            ep_loss += float(np.sum(np.asarray(metrics["loss"]) * bn))
            ep_correct += float(np.sum(metrics["correct"]))
            ep_n += float(np.sum(bn))
            images_seen += float(np.sum(bn))

        val_loss, val_acc, _, _ = evaluate(step_fns, state, val_iter,
                                           collect_preds=False,
                                           device_data=val_dd)
        ep_n = max(ep_n, 1.0)
        history["loss"].append(ep_loss / ep_n)
        history["accuracy"].append(ep_correct / ep_n)
        history["val_loss"].append(val_loss)
        history["val_accuracy"].append(val_acc)
        LOGGER.info(
            "epoch %d/%d: loss=%.4f acc=%.4f val_loss=%.4f val_acc=%.4f",
            epoch + 1, epochs, history["loss"][-1], history["accuracy"][-1],
            val_loss, val_acc,
        )
        if epoch_callback is not None:
            epoch_callback(epoch, state, history)

        # EarlyStopping bookkeeping (min_delta=0, like Keras defaults)
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            best_params = _snapshot(state)
            early_wait = 0
            plateau_wait = 0
        else:
            early_wait += 1
            plateau_wait += 1

        if plateau_wait >= cfg.plateau_patience:
            lr_scale *= cfg.plateau_factor
            state = state.replace(
                lr_scale=jax.numpy.asarray(lr_scale, jax.numpy.float32))
            plateau_wait = 0
            LOGGER.info("ReduceLROnPlateau: lr_scale -> %.4g", lr_scale)

        if target_val_acc is not None and val_acc >= target_val_acc:
            LOGGER.info("Target val_accuracy reached: %.4f >= %.4f; stopping",
                        val_acc, target_val_acc)
            break

        if early_wait >= cfg.early_stop_patience:
            LOGGER.info("EarlyStopping: restoring best weights "
                        "(val_loss=%.4f)", best_val_loss)
            state = state.replace(params=best_params[0],
                                  batch_stats=best_params[1])
            break

    train_time = time.perf_counter() - t0

    # base-vs-EMA winner selection (`srcs/train/utils.py:84-93`)
    _, base_acc, _, _ = evaluate(step_fns, state, val_iter, use_ema=False,
                                 collect_preds=False, device_data=val_dd)
    best_variant = "base"
    best_acc = base_acc
    if cfg.ema_decay > 0:
        _, ema_acc, _, _ = evaluate(step_fns, state, val_iter, use_ema=True,
                                    collect_preds=False, device_data=val_dd)
        if float(ema_acc) > float(base_acc):
            best_variant = "ema"
            best_acc = ema_acc
            state = state.replace(params=state.ema_params,
                                  batch_stats=state.ema_batch_stats)
        LOGGER.info("Variant selection: base=%.4f ema=%.4f -> %s",
                    base_acc, ema_acc, best_variant)

    return FitResult(
        state=state,
        history=history,
        best_variant=best_variant,
        val_accuracy=float(best_acc),
        epochs_ran=epochs_ran,
        steps_ran=steps_ran,
        train_time_s=train_time,
        images_per_sec=images_seen / max(train_time, 1e-9),
    )
