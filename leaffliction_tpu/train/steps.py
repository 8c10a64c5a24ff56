"""Jitted train/eval steps — the TPU hot loop.

Replaces Keras `model.fit` internals (`srcs/cli/train.py:432-437`) with a
single fused XLA program per step: uint8 batch → float → in-graph
augmentation → forward (bf16 compute) → loss → backward → AdamW/Adam update →
EMA update, all on device. The EMA that the reference computes with a
per-batch host-side `get_weights()` copy (`srcs/train/utils.py:38-57` — its
worst hot-loop pathology) is here one fused tree-multiply inside the step.

Sharding: steps are `jax.jit`-compiled with NamedShardings over a Mesh —
batch sharded on the `data` axis; state either replicated (data
parallelism) or channel-sharded over the `model` axis (tensor
parallelism, `parallel.mesh.tp_shardings` via `state_shardings`). XLA
inserts the gradient all-reduce, global BatchNorm statistics, and the
TP boundary collectives automatically from the sharding annotations;
the same code runs single-chip or on a v5e-8 slice.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leaffliction_tpu.models.leafcnn import LeafCNN
from leaffliction_tpu.ops.train_augment import train_augment_u8
from leaffliction_tpu.train.config import TrainConfig

Array = jax.Array


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    norm_stats: Any
    opt_state: Any
    ema_params: Any          # EMA over params + batch_stats, like the
    ema_batch_stats: Any     # reference's full-weight EMA (`train/utils.py:44-57`)
    lr_scale: Array          # ReduceLROnPlateau multiplier (host-updated)


@dataclasses.dataclass(frozen=True)
class StepFns:
    """Compiled step functions + the mesh they were built against.

    Batch placement lives in `trainer.prefetch_to_device` (single-device
    `device_put`, or `parallel.mesh.batch_sharding` on a multi-device mesh).

    `train_step_chain` runs K steps over stacked batches [K, B, ...] inside
    ONE compiled program (`lax.scan` over the single step): on dispatch-bound
    links (the tunneled dev chip pays ~30-140 ms per dispatch) this amortizes
    the per-dispatch overhead K-fold, and the K batches ship in one transfer.
    """

    train_step: Callable
    train_step_chain: Callable
    train_step_gather: Callable
    eval_step: Callable
    eval_step_ema: Callable
    eval_step_gather: Callable
    eval_step_ema_gather: Callable
    mesh: Mesh
    # whole-val-set eval in ONE program (scan over [K, B] index batches
    # against the device-resident dataset): one dispatch + one fetch per
    # eval instead of K. On multi-device meshes each chunk's batch dim is
    # sharded over `data` (sel/mask [K, B] with B split across devices).
    eval_chain_gather: Optional[Callable] = None
    eval_chain_ema_gather: Optional[Callable] = None


def make_lr_schedule(cfg: TrainConfig, total_steps: int) -> Callable[[Array], Array]:
    """Cosine decay to 0 over total_steps (Keras CosineDecay alpha=0,
    `srcs/cli/train.py:312-318`), or constant."""
    if cfg.cosine_decay:
        def schedule(step: Array) -> Array:
            frac = jnp.clip(step.astype(jnp.float32) / max(total_steps, 1), 0.0, 1.0)
            return cfg.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))
        return schedule
    return lambda step: jnp.asarray(cfg.lr, jnp.float32)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam(W) minus the final LR scaling — LR is applied inside the step so
    the plateau multiplier stays a dynamic scalar (no recompilation)."""
    parts = []
    if cfg.clipnorm > 0:
        parts.append(optax.clip_by_global_norm(cfg.clipnorm))
    parts.append(optax.scale_by_adam())
    if cfg.optimizer == "adamw" and cfg.weight_decay > 0:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    return optax.chain(*parts)


def create_train_state(
    model: LeafCNN, cfg: TrainConfig, img_size: int, seed: int
) -> TrainState:
    variables = model.init(
        jax.random.key(seed),
        jnp.zeros((1, img_size, img_size, 3), jnp.float32),
        train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    norm_stats = variables.get("norm_stats", {})
    tx = make_optimizer(cfg)
    # EMA trees must be distinct buffers: the train step donates its input
    # state, and aliased leaves would be donated twice.
    copy = partial(jax.tree_util.tree_map, jnp.copy)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        norm_stats=norm_stats,
        opt_state=tx.init(params),
        ema_params=copy(params),
        ema_batch_stats=copy(batch_stats),
        lr_scale=jnp.ones((), jnp.float32),
    )


def _loss_fn(logits: Array, labels: Array, mask: Array,
             num_classes: int, label_smoothing: float) -> tuple[Array, Array]:
    """Masked mean CE (+ optional smoothing) and correct-count."""
    if label_smoothing > 0:
        targets = optax.smooth_labels(
            jax.nn.one_hot(labels, num_classes), label_smoothing
        )
        per_ex = optax.softmax_cross_entropy(logits, targets)
    else:
        per_ex = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    loss = jnp.sum(per_ex * mask) / denom
    correct = jnp.sum((jnp.argmax(logits, -1) == labels) * mask)
    return loss, correct


def build_step_fns(
    model: LeafCNN,
    cfg: TrainConfig,
    num_classes: int,
    total_steps: int,
    mesh: Mesh,
    augment: bool = True,
    state_shardings: Any = None,
) -> StepFns:
    """Build the jitted step functions for `mesh`.

    `state_shardings`: optional TrainState-shaped pytree of NamedShardings
    (see `parallel.mesh.tp_shardings`) pinning the model/optimizer state
    layout — tensor parallelism over the `model` axis. None replicates
    the state (pure data parallelism). Ignored on single-device meshes,
    which take the plain-jit fast path."""
    schedule = make_lr_schedule(cfg, total_steps)
    tx = make_optimizer(cfg)

    def train_step(state: TrainState, images: Array, labels: Array,
                   mask: Array, key: Array):
        if augment:
            k_aug, k_drop = jax.random.split(jax.random.fold_in(key, 0))
            # u8-in fused path: flip on uint8 (fuses with the batch
            # gather), dequant+rotate+contrast in multi-image Pallas
            # programs; bf16 out for bf16-compute models halves the
            # augmented batch's HBM traffic
            x = train_augment_u8(k_aug, images,
                                 out_dtype=getattr(model, "dtype",
                                                   jnp.float32))
        else:
            x = images.astype(jnp.float32) / 255.0
            k_drop = key

        def loss_fn(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats,
                 "norm_stats": state.norm_stats},
                x, train=True,
                mutable=["batch_stats"],
                rngs={"dropout": k_drop},
            )
            loss, correct = _loss_fn(outs, labels, mask, num_classes,
                                     cfg.label_smoothing)
            return loss, (correct, mutated["batch_stats"])

        (loss, (correct, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        lr = schedule(state.step) * state.lr_scale
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - lr * u, state.params, updates
        )

        if cfg.ema_decay > 0:
            d = cfg.ema_decay
            ema_params = jax.tree_util.tree_map(
                lambda e, p: d * e + (1 - d) * p, state.ema_params, new_params
            )
            ema_bs = jax.tree_util.tree_map(
                lambda e, p: d * e + (1 - d) * p,
                state.ema_batch_stats, new_batch_stats,
            )
        else:
            ema_params = state.ema_params
            ema_bs = state.ema_batch_stats

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=ema_params,
            ema_batch_stats=ema_bs,
        )
        metrics = {"loss": loss, "correct": correct, "n": jnp.sum(mask),
                   "lr": lr}
        return new_state, metrics

    def train_step_chain(state: TrainState, images: Array, labels: Array,
                         mask: Array, key: Array):
        """K chained train steps in one program. images [K,B,S,S,3] uint8;
        returns (state, metrics) with metric leaves stacked [K]. Identical
        per-step math to `train_step` (schedule advances with state.step;
        per-step PRNG keys fold the scan index into the chunk key)."""

        def body(st, xs):
            im, lb, mk, i = xs
            return train_step(st, im, lb, mk, jax.random.fold_in(key, i))

        idx = jnp.arange(images.shape[0])
        return jax.lax.scan(body, state, (images, labels, mask, idx))

    def train_step_gather(state: TrainState, data_images: Array,
                          data_labels: Array, sel: Array, mask: Array,
                          key: Array):
        """K chained steps gathering batches from a DEVICE-RESIDENT dataset.

        data_images [N,S,S,3] uint8 / data_labels [N] live in HBM for the
        whole run; only sel [K,B] int32 + mask [K,B] cross the host→device
        link per dispatch (~KB instead of ~MB of pixels). This is the
        single-chip hot path: the relay link is bandwidth-bound, so shipping
        pixels per step caps throughput regardless of compute speed."""

        def body(st, xs):
            s, mk, i = xs
            im = jnp.take(data_images, s, axis=0)
            lb = jnp.take(data_labels, s, axis=0)
            return train_step(st, im, lb, mk, jax.random.fold_in(key, i))

        idx = jnp.arange(sel.shape[0])
        return jax.lax.scan(body, state, (sel, mask, idx))

    def _eval(params, batch_stats, state, images, labels, mask):
        x = images.astype(jnp.float32) / 255.0
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats,
             "norm_stats": state.norm_stats},
            x, train=False,
        )
        loss, correct = _loss_fn(logits, labels, mask, num_classes,
                                 cfg.label_smoothing)
        preds = jnp.argmax(logits, -1)
        return {"loss_sum": loss * jnp.maximum(jnp.sum(mask), 1.0),
                "correct": correct, "n": jnp.sum(mask)}, preds

    def eval_step(state: TrainState, images, labels, mask):
        return _eval(state.params, state.batch_stats, state,
                     images, labels, mask)

    def eval_step_ema(state: TrainState, images, labels, mask):
        return _eval(state.ema_params, state.ema_batch_stats, state,
                     images, labels, mask)

    def eval_step_gather(state: TrainState, data_images, data_labels,
                         sel, mask):
        im = jnp.take(data_images, sel, axis=0)
        lb = jnp.take(data_labels, sel, axis=0)
        return _eval(state.params, state.batch_stats, state, im, lb, mask)

    def _eval_chain(params, batch_stats, state, data_images, data_labels,
                    sel, mask):
        """Whole val set in one program: sel/mask [K, B] → (metrics with
        leaves stacked [K], preds [K, B])."""

        def body(carry, xs):
            s, mk = xs
            m, preds = _eval(params, batch_stats, state,
                             jnp.take(data_images, s, axis=0),
                             jnp.take(data_labels, s, axis=0), mk)
            return carry, (m, preds)

        _, out = jax.lax.scan(body, 0, (sel, mask))
        return out

    def eval_chain_gather(state: TrainState, data_images, data_labels,
                          sel, mask):
        return _eval_chain(state.params, state.batch_stats, state,
                           data_images, data_labels, sel, mask)

    def eval_chain_ema_gather(state: TrainState, data_images, data_labels,
                              sel, mask):
        return _eval_chain(state.ema_params, state.ema_batch_stats, state,
                           data_images, data_labels, sel, mask)

    def eval_step_ema_gather(state: TrainState, data_images, data_labels,
                             sel, mask):
        im = jnp.take(data_images, sel, axis=0)
        lb = jnp.take(data_labels, sel, axis=0)
        return _eval(state.ema_params, state.ema_batch_stats, state,
                     im, lb, mask)

    if mesh.size == 1:
        # Single chip: plain jit. Sharding-annotated executables take a slow
        # dispatch path on the axon relay platform (~370 ms/step overhead
        # measured with identical step logic) and buy nothing at size 1.
        train_jit = jax.jit(train_step, donate_argnums=(0,))
        chain_jit = jax.jit(train_step_chain, donate_argnums=(0,))
        gather_jit = jax.jit(train_step_gather, donate_argnums=(0,))
        eval_jit = jax.jit(eval_step)
        eval_ema_jit = jax.jit(eval_step_ema)
        return StepFns(train_step=train_jit, train_step_chain=chain_jit,
                       train_step_gather=gather_jit,
                       eval_step=eval_jit, eval_step_ema=eval_ema_jit,
                       eval_step_gather=jax.jit(eval_step_gather),
                       eval_step_ema_gather=jax.jit(eval_step_ema_gather),
                       eval_chain_gather=jax.jit(eval_chain_gather),
                       eval_chain_ema_gather=jax.jit(eval_chain_ema_gather),
                       mesh=mesh)

    repl = NamedSharding(mesh, P())
    data4 = NamedSharding(mesh, P("data", None, None, None))
    data1 = NamedSharding(mesh, P("data"))
    chain4 = NamedSharding(mesh, P(None, "data", None, None, None))
    chain1 = NamedSharding(mesh, P(None, "data"))
    # state layout: replicated (DP) or per-leaf channel-sharded over the
    # `model` axis (TP, `tp_shardings`); the same tree pins inputs AND
    # outputs so the donated state buffers keep their layout step-to-step
    st = state_shardings if state_shardings is not None else repl

    train_jit = jax.jit(
        train_step,
        in_shardings=(st, data4, data1, data1, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,),
    )
    chain_jit = jax.jit(
        train_step_chain,
        in_shardings=(st, chain4, chain1, chain1, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,),
    )
    # gather path on a mesh: dataset replicated per device, selection
    # indices sharded over `data` → each device gathers only its rows
    gather_jit = jax.jit(
        train_step_gather,
        in_shardings=(st, repl, repl, chain1, chain1, repl),
        out_shardings=(st, repl),
        donate_argnums=(0,),
    )
    eval_gather_jit = jax.jit(
        eval_step_gather,
        in_shardings=(st, repl, repl, data1, data1),
        out_shardings=(repl, data1),
    )
    eval_ema_gather_jit = jax.jit(
        eval_step_ema_gather,
        in_shardings=(st, repl, repl, data1, data1),
        out_shardings=(repl, data1),
    )
    eval_jit = jax.jit(
        eval_step,
        in_shardings=(st, data4, data1, data1),
        out_shardings=(repl, data1),
    )
    eval_ema_jit = jax.jit(
        eval_step_ema,
        in_shardings=(st, data4, data1, data1),
        out_shardings=(repl, data1),
    )
    # Whole-val-set chained eval on the mesh: the dataset is replicated,
    # sel/mask chunks [K, B] shard their batch dim over `data` (each device
    # gathers + evaluates only its rows; XLA inserts the metric psum),
    # preds come back [K, B] sharded the same way. One dispatch + one fetch
    # per eval — the per-batch overhead the chain exists to kill is paid
    # per-epoch on exactly the configuration the north star targets.
    # preds come back REPLICATED (an in-program all-gather of [K, B] int32
    # — a few KB): on multi-host the caller device_gets them directly and
    # pairs them with its (identical) host-side batch labels; leaving them
    # data-sharded would make device_get raise on non-addressable shards
    eval_chain_jit = jax.jit(
        eval_chain_gather,
        in_shardings=(st, repl, repl, chain1, chain1),
        out_shardings=(repl, repl),
    )
    eval_chain_ema_jit = jax.jit(
        eval_chain_ema_gather,
        in_shardings=(st, repl, repl, chain1, chain1),
        out_shardings=(repl, repl),
    )
    return StepFns(train_step=train_jit, train_step_chain=chain_jit,
                   train_step_gather=gather_jit,
                   eval_step=eval_jit, eval_step_ema=eval_ema_jit,
                   eval_step_gather=eval_gather_jit,
                   eval_step_ema_gather=eval_ema_gather_jit, mesh=mesh,
                   eval_chain_gather=eval_chain_jit,
                   eval_chain_ema_gather=eval_chain_ema_jit)
