"""`leaffliction-train` — train LeafCNN on TPU from a split manifest.

Flag parity with the reference CLI (`srcs/cli/train.py:53-117`): --manifest
(with augmented→split fallback), --epochs/--batch-size/--img-size/--seed,
--no-normalization, --fast, --scale/--tiny/--small/--base, --separable,
--target-val-acc. `--no-mixed-precision` disables bfloat16 compute (the TPU
analog of the reference's mixed_float16). Artifacts land in artifacts/models/
with the reference schema.

TPU additions: --mesh-data/--mesh-model to shape the device mesh (data
parallel by default over all visible chips), --resume for orbax mid-run
checkpoints.
"""

from __future__ import annotations

import argparse
import random
import time
from pathlib import Path

import numpy as np

from leaffliction_tpu.core.logging import get_logger, setup_logging
from leaffliction_tpu.core.sysinfo import get_system_info
from leaffliction_tpu.data.loader import BatchIterator, ImageStore, sample_batch
from leaffliction_tpu.data.manifest import (
    build_label_mapping,
    load_manifest,
    select_items,
)
from leaffliction_tpu.models.leafcnn import SCALE_PRESETS, build_leafcnn
from leaffliction_tpu.train.config import TrainConfig

LOGGER = get_logger(__name__)


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        description="Train LeafCNN (JAX/TPU) using manifest_split.json"
    )
    p.add_argument("--manifest", type=Path,
                   default=Path("artifacts/datasets/manifest_augmented.json"))
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--img-size", type=int, default=224)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--lr", type=float, default=None,
                   help="override the preset base learning rate "
                        "(regularized 2e-3 / fast 3e-3); the documented "
                        "b128 throughput recipe is --batch-size 128 "
                        "--lr <2x preset> with ~4x the epoch budget")
    p.add_argument("--no-normalization", action="store_true")
    p.add_argument("--no-mixed-precision", action="store_true",
                   help="Disable bfloat16 compute (TPU mixed precision)")
    p.add_argument("--fast", action="store_true")
    p.add_argument("--scale", choices=["tiny", "small", "base"], default="base")
    mx = p.add_mutually_exclusive_group()
    mx.add_argument("--tiny", action="store_true")
    mx.add_argument("--small", action="store_true")
    mx.add_argument("--base", action="store_true")
    p.add_argument("--separable", action="store_true")
    p.add_argument("--stem", choices=["conv", "s2d"], default="conv",
                   help="Model stem: conv (reference parity) or s2d "
                        "(space-to-depth patchify; ~2.3x faster LeafCNN "
                        "steps, ~1.3x faster resnet steps on TPU)")
    p.add_argument("--arch", choices=["leafcnn", "resnet10", "resnet18"],
                   default="leafcnn",
                   help="Backbone: leafcnn (reference-parity) or a deeper "
                        "ResNet-style model (TPU bf16 target)")
    p.add_argument("--transform", action="store_true",
                   help="Apply the mask-segmentation training transform to "
                        "all images (reference training transform hook)")
    p.add_argument("--target-val-acc", type=float, default=None)
    p.add_argument("--out-dir", type=Path, default=Path("artifacts/models"))
    p.add_argument("--mesh-data", type=int, default=-1,
                   help="Devices on the data-parallel mesh axis (-1: all)")
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--checkpoint-every", type=int, default=0,
                   help="Save an orbax resume checkpoint every N epochs "
                        "(synchronous; works multi-host)")
    p.add_argument("--checkpoint-every-steps", type=int, default=0,
                   help="ASYNC orbax resume checkpoint every N steps, off "
                        "the step critical path (on-device snapshot + "
                        "background save; single-process). A killed run "
                        "resumes mid-epoch losing at most N steps")
    p.add_argument("--resume", action="store_true",
                   help="Resume from the latest checkpoint in <out-dir>/checkpoints")
    p.add_argument("--profile-dir", type=Path, default=None,
                   help="Write a jax.profiler trace of early training steps")
    p.add_argument("--steps-per-dispatch", type=int, default=-1,
                   help="Chain N train steps into one compiled program "
                        "(lax.scan) to amortize dispatch overhead; -1: auto "
                        "(8 on TPU, 1 on CPU)")
    p.add_argument("--no-device-dataset", action="store_true",
                   help="Stream pixel batches from host every step instead "
                        "of keeping the uint8 dataset resident in HBM and "
                        "gathering batches by index (the default when the "
                        "dataset fits)")
    p.add_argument("--balance-from", type=Path, default=None,
                   help="Fused balance→split→train: run the class-balancing "
                        "augmentation ON DEVICE straight into the training "
                        "dataset (no JPEG round-trip), apply the ratio "
                        "split in memory, then train. Reference workflow "
                        "balance→split→train as ONE command with zero "
                        "pixel downloads")
    p.add_argument("--val-ratio", type=float, default=0.2,
                   help="Validation ratio for the in-memory split "
                        "(--balance-from only; split CLI default)")
    p.add_argument("--split-seed", type=int, default=32,
                   help="Seed for the in-memory split shuffle "
                        "(--balance-from only; split CLI default)")
    p.add_argument("--materialize-augmented", action="store_true",
                   help="Also write the augmented JPEG tree to "
                        "augmented_directory/ (reference artifact parity; "
                        "off the training critical path)")
    kx = p.add_mutually_exclusive_group()
    kx.add_argument("--export-keras", action="store_true", default=None,
                    dest="export_keras",
                    help="Write <out-dir>/leaf_cnn.keras — the reference's "
                         "own artifact format, loadable with "
                         "keras.models.load_model (leaf_cnn arch only; "
                         "requires the keras package). DEFAULT when keras "
                         "is importable, so the artifact directory is a "
                         "drop-in superset of the reference's "
                         "(srcs/train/utils.py:95-97)")
    kx.add_argument("--no-export-keras", action="store_false", default=None,
                    dest="export_keras",
                    help="Skip the .keras export even when keras is "
                         "importable")
    args = p.parse_args(argv)
    for name in ("tiny", "small", "base"):
        if getattr(args, name, False):
            args.scale = name
    return args


def validate_manifest(manifest: Path) -> Path:
    """Augmented→split fallback (`srcs/cli/train.py:120-148`)."""
    if manifest.exists():
        return manifest
    if manifest.name == "manifest_augmented.json":
        fallback = manifest.with_name("manifest_split.json")
        if fallback.exists():
            LOGGER.warning("Augmented manifest not found, falling back to: %s",
                           fallback)
            return fallback
    raise FileNotFoundError(f"Manifest not found: {manifest}")


def main(argv=None) -> None:
    args = parse_args(argv)
    setup_logging()
    random.seed(args.seed)
    np.random.seed(args.seed)

    fused = args.balance_from is not None
    if fused:
        manifest_path = args.balance_from  # recorded in meta below
        if not args.balance_from.exists():
            LOGGER.error("Training failed: dataset directory not found: %s",
                         args.balance_from)
            return
        # Validate BEFORE the balance pipeline runs — split_fused_result
        # rejecting the ratio after minutes of decode+augment work is a
        # hostile place to learn about a bad flag.
        if not (0.0 < args.val_ratio < 1.0):
            LOGGER.error("Training failed: --val-ratio must be in (0, 1), "
                         "got %s", args.val_ratio)
            return
        train_items = val_items = None  # built by the fused path below
        label2idx = {}
    else:
        try:
            manifest_path = validate_manifest(args.manifest)
        except FileNotFoundError as exc:
            LOGGER.error("Training failed: %s", exc)
            return

        _, items = load_manifest(manifest_path)
        train_items = select_items(items, "train")
        val_items = select_items(items, "val")
        if not train_items or not val_items:
            LOGGER.error("Insufficient data (train=%d, val=%d)",
                         len(train_items), len(val_items))
            return
        label2idx = build_label_mapping(train_items)
        num_classes = len(label2idx)
        LOGGER.info("Classes: %d", num_classes)

    # Heavy imports after validation so --help stays fast
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.core.cache import enable_compilation_cache
    from leaffliction_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()
    enable_compilation_cache()

    from leaffliction_tpu.ops.image import compute_norm_stats
    from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
    from leaffliction_tpu.train.artifacts import save_training_artifacts
    from leaffliction_tpu.train.steps import build_step_fns, create_train_state
    from leaffliction_tpu.train.trainer import evaluate, fit

    cfg = TrainConfig.fast() if args.fast else TrainConfig.regularized()
    if args.lr is not None:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, lr=args.lr)
    LOGGER.info("Mode: %s -> %s", "FAST" if args.fast else "REGULARIZED",
                cfg.as_dict())

    fused_dd = None  # ((train_imgs, train_labels), (val_imgs, val_labels))
    if fused:
        # Multi-host: every process balances IDENTICALLY (decode +
        # augmentation are deterministic in the shared seed and source
        # tree), so each holds the same local pixels; only process 0
        # writes the shared-filesystem artifacts, and the dataset is
        # assembled into a globally-replicated array below
        # (`parallel.mesh.replicate_global`) — still zero pixel downloads.
        proc0 = jax.process_index() == 0
        if jax.process_count() > 1:
            LOGGER.info("Fused balancing on %d processes "
                        "(process-identical; artifacts from process 0)",
                        jax.process_count())
        import jax.numpy as jnp

        from leaffliction_tpu.data.fused_balance import (
            balance_to_device,
            split_fused_result,
        )
        from leaffliction_tpu.data.loader import DeviceImageStore

        res = balance_to_device(
            args.balance_from, args.img_size, seed=args.seed,
            materialize=args.materialize_augmented,
            write_artifacts=proc0,
        )
        train_rows, val_rows = split_fused_result(
            res, val_ratio=args.val_ratio, split_seed=args.split_seed,
            src_root=args.balance_from, write_artifacts=proc0,
        )
        if len(train_rows) == 0 or len(val_rows) == 0:
            LOGGER.error("Insufficient data (train=%d, val=%d)",
                         len(train_rows), len(val_rows))
            return
        label2idx = res.label2idx
        num_classes = len(label2idx)
        LOGGER.info("Classes: %d (fused: %d originals + %d augmented; "
                    "train=%d val=%d)", num_classes, res.n_original,
                    res.n_generated, len(train_rows), len(val_rows))

        all_imgs = res.device_images
        if args.transform:
            from leaffliction_tpu.data.loader import (
                apply_training_transform_device,
            )

            t_tf = time.perf_counter()
            all_imgs = apply_training_transform_device(all_imgs)
            LOGGER.info("Training transform applied on device in %.1fs",
                        time.perf_counter() - t_tf)
        labels_dev = jnp.asarray(res.labels)
        fused_dd = (
            (jnp.take(all_imgs, jnp.asarray(train_rows), axis=0),
             jnp.take(labels_dev, jnp.asarray(train_rows), axis=0)),
            (jnp.take(all_imgs, jnp.asarray(val_rows), axis=0),
             jnp.take(labels_dev, jnp.asarray(val_rows), axis=0)),
        )
        # Release the combined buffer(s): `del all_imgs` alone is not
        # enough — res.device_images still references the pre-transform
        # array, which would pin ~2-3x the dataset in HBM for the whole
        # run (train+val slices above are the only copies training needs).
        del all_imgs
        res.device_images = None
        train_store = DeviceImageStore(res.labels[train_rows], args.img_size)
        val_store = DeviceImageStore(res.labels[val_rows], args.img_size)
        train_items = [res.items[i] for i in train_rows]
        val_items = [res.items[i] for i in val_rows]
        pad_to_steps = None
    else:
        pad_to_steps = None
        if jax.process_count() > 1:
            from leaffliction_tpu.data.loader import (
                global_steps_per_epoch,
                items_for_process,
            )

            # Same collective step count on every host regardless of shard
            # size (stride shards differ by up to 1 item; decode failures
            # vary too).
            pad_to_steps = global_steps_per_epoch(len(train_items),
                                                  args.batch_size)
            train_items = items_for_process(train_items)
            LOGGER.info("Host %d/%d loads %d train items (%d steps/epoch)",
                        jax.process_index(), jax.process_count(),
                        len(train_items), pad_to_steps)

        t_load = time.perf_counter()
        train_store = ImageStore(train_items, label2idx, args.img_size)
        val_store = ImageStore(val_items, label2idx, args.img_size)
        LOGGER.info("Decoded %d train + %d val images in %.1fs",
                    len(train_store), len(val_store),
                    time.perf_counter() - t_load)

        if args.transform:
            from leaffliction_tpu.data.loader import apply_training_transform

            t_tf = time.perf_counter()
            apply_training_transform(train_store)
            apply_training_transform(val_store)
            LOGGER.info("Training transform applied in %.1fs",
                        time.perf_counter() - t_tf)

    # --batch-size means PER-PROCESS batch on multi-host (the streamed path
    # assembles B rows from each host into a B×P global batch). The fused
    # path iterates the full replicated item list on every process and ships
    # GLOBAL index batches, so its iterator batch must be B×P to keep the
    # same effective batch, step count, and optimization dynamics.
    iter_batch = args.batch_size
    if (jax.default_backend() == "tpu" and args.batch_size <= 32
            and args.img_size >= 160):
        # reference-default b32 leaves the MXU batch-starved at 224px:
        # b128 measures ~2.6x img/s and MFU, but needs sqrt-scaled lr and
        # ~4x the epoch budget to hold accuracy (A/B table in
        # docs/performance.md; early stopping picks the real endpoint).
        # Scale the suggestion from the USER's lr/epochs, not the defaults:
        # sqrt(128/32) = 2x the lr they actually passed.
        LOGGER.info("Note: --batch-size %d underutilizes the TPU at %dpx; "
                    "--batch-size 128 --lr %g --epochs %d measures ~2.6x "
                    "images/sec at matched val accuracy",
                    args.batch_size, args.img_size, cfg.lr * 2.0,
                    args.epochs * 4)
    if fused and jax.process_count() > 1:
        iter_batch = args.batch_size * jax.process_count()
        LOGGER.info("Fused multi-host: global batch %d (%d per process x %d "
                    "processes)", iter_batch, args.batch_size,
                    jax.process_count())
    train_iter = BatchIterator(train_store, iter_batch, shuffle=True,
                               seed=args.seed, pad_to_steps=pad_to_steps)
    val_iter = BatchIterator(val_store, iter_batch, shuffle=False)

    try:
        mesh = make_mesh(MeshSpec(data=args.mesh_data, model=args.mesh_model))
    except ValueError as exc:
        LOGGER.error("Invalid mesh for %d visible device(s): %s",
                     len(jax.devices()), exc)
        return
    LOGGER.info("Mesh: %s over %d %s device(s)", dict(mesh.shape),
                mesh.size, jax.devices()[0].device_kind)

    dtype = jnp.float32 if args.no_mixed_precision else jnp.bfloat16
    # the lane-fold decision acts on the PER-DEVICE batch: a dp-sharded
    # global batch folds on each shard (folded.auto_fold)
    fold_dp = mesh.shape.get("data", 1)
    if args.arch == "leafcnn":
        model = build_leafcnn(
            num_classes=num_classes, scale=args.scale,
            separable=args.separable,
            use_norm=not args.no_normalization, stem=args.stem,
            fold_dp=fold_dp, dtype=dtype,
        )
    else:
        from leaffliction_tpu.models.resnet import build_resnet

        model = build_resnet(num_classes=num_classes, preset=args.arch,
                             use_norm=not args.no_normalization,
                             stem=args.stem, fold_dp=fold_dp, dtype=dtype)

    if fused_dd is not None and mesh.size > 1:
        from leaffliction_tpu.parallel.mesh import replicate_global

        # single-host: device_put to every mesh device; multi-host: each
        # process contributes its (identical) local copy device-to-device
        fused_dd = jax.tree_util.tree_map(
            lambda x: replicate_global(x, mesh), fused_dd)

    total_steps = train_iter.steps_per_epoch() * args.epochs
    state = create_train_state(model, cfg, args.img_size, args.seed)

    # adaptive normalization on ≤2048 train samples (`srcs/model/cnn.py:107-131`)
    if not args.no_normalization:
        if fused_dd is not None:
            sample = fused_dd[0][0][:2048]  # stays on device
        else:
            sample = jnp.asarray(sample_batch(train_store, 2048))
        mean, var = compute_norm_stats(sample)
        state = state.replace(norm_stats={"mean": mean, "var": var})
        LOGGER.info("Adapted normalization: mean=%s", np.asarray(mean))

    # tensor parallelism: with a model axis, channel-shard the state over
    # it (conv/dense out-features + matching stats/moments); computed from
    # the FINAL state tree (norm_stats above changed its structure)
    state_sh = None
    if mesh.size > 1 and mesh.shape.get("model", 1) > 1:
        from leaffliction_tpu.parallel.mesh import tp_shardings

        state_sh = tp_shardings(state, mesh)
        state = jax.device_put(state, state_sh)
        n_sharded = sum(
            int(s.spec != jax.sharding.PartitionSpec())
            for s in jax.tree_util.tree_leaves(state_sh))
        LOGGER.info("Tensor parallelism: %d state leaves sharded over "
                    "model=%d", n_sharded, mesh.shape["model"])
    step_fns = build_step_fns(model, cfg, num_classes, total_steps, mesh,
                              state_shardings=state_sh)

    preset = SCALE_PRESETS[args.scale]
    meta = {
        "run": {"seed": args.seed, "epochs": args.epochs,
                "batch_size": args.batch_size},
        "data": {"manifest": str(manifest_path.resolve()),
                 "img_size": args.img_size, "num_classes": num_classes,
                 "train_items": len(train_items),
                 "val_items": len(val_items)},
        "model": {"name": ("leaf_cnn" if args.arch == "leafcnn"
                           else args.arch),
                  "scale": args.scale,
                  "separable": bool(args.separable),
                  "stem": args.stem,
                  "use_normalization": not args.no_normalization,
                  "widths": list(preset["widths"]),
                  "drop_block": preset["drop_block"],
                  "drop_top": preset["drop_top"],
                  "l2": cfg.weight_decay},
        "training": {"optimizer": cfg.optimizer, "base_lr": cfg.lr,
                     "cosine_decay": bool(cfg.cosine_decay),
                     "label_smoothing": cfg.label_smoothing,
                     "ema_decay": cfg.ema_decay, "clipnorm": cfg.clipnorm,
                     "mixed_precision": not args.no_mixed_precision},
        "system": dict(get_system_info(),
                       mesh={"data": int(mesh.shape["data"]),
                             "model": int(mesh.shape["model"])}),
    }

    # mid-run checkpoint/resume (orbax) — absent from the reference entirely
    ckpt_dir = args.out_dir / "checkpoints"
    start_epoch = 0
    skip_steps = 0
    history = None
    if args.resume:
        import json as _json

        from leaffliction_tpu.train.checkpoint import (
            latest_resume_step,
            read_step_meta,
            restore_resume_checkpoint,
        )

        latest = latest_resume_step(ckpt_dir)
        if latest is not None:
            state = restore_resume_checkpoint(ckpt_dir, latest, state)
            ck_meta = read_step_meta(ckpt_dir, latest)
            if ck_meta is not None:
                # step-granular checkpoint: resume mid-epoch, skipping the
                # prefix of the deterministic batch stream already consumed
                start_epoch = int(ck_meta["epoch"])
                skip_steps = int(ck_meta["step_in_epoch"])
                history = ck_meta.get("history")
                LOGGER.info("Resumed from step checkpoint: epoch %d, "
                            "step %d", start_epoch + 1, skip_steps)
            else:
                start_epoch = latest + 1
                hist_file = ckpt_dir / "history.json"
                if hist_file.exists():
                    history = _json.loads(hist_file.read_text())
                LOGGER.info("Resumed from checkpoint at epoch %d", latest + 1)
        else:
            LOGGER.warning("No checkpoint found in %s; training from scratch",
                           ckpt_dir)

    epoch_callback = None
    if args.checkpoint_every > 0:
        import json as _json

        from leaffliction_tpu.train.checkpoint import save_resume_checkpoint

        def epoch_callback(epoch, st, hist):
            if (epoch + 1) % args.checkpoint_every == 0:
                # collective on multi-host (TP state is all-gathered inside);
                # only process 0 writes the checkpoint dir + history
                save_resume_checkpoint(ckpt_dir, epoch, st)
                if jax.process_index() == 0:
                    ckpt_dir.mkdir(parents=True, exist_ok=True)
                    (ckpt_dir / "history.json").write_text(_json.dumps(hist))
                    LOGGER.info("Checkpoint saved at epoch %d", epoch + 1)

    # async step-granular checkpointing (SURVEY §5): snapshot on device,
    # save in a background worker — the train chain never blocks on it
    step_callback = None
    async_ckpt = None
    if args.checkpoint_every_steps > 0:
        from leaffliction_tpu.train.checkpoint import (
            AsyncStepCheckpointer,
        )

        # multi-host: the checkpointer runs a deterministic modulo cadence
        # and keeps every device collective on this (training) thread, so
        # all hosts issue the same sequence — see AsyncStepCheckpointer
        async_ckpt = AsyncStepCheckpointer(ckpt_dir,
                                           args.checkpoint_every_steps)
        if history is None:
            history = {"loss": [], "accuracy": [],
                       "val_loss": [], "val_accuracy": []}
        _steps_per_epoch = train_iter.steps_per_epoch()
        _live_history = history

        def step_callback(epoch, step_in_epoch, st):
            async_ckpt.maybe_save(
                epoch * _steps_per_epoch + step_in_epoch, st,
                {"epoch": epoch, "step_in_epoch": step_in_epoch,
                 "history": _live_history})

    profile_ctx = None
    if args.profile_dir is not None:
        args.profile_dir.mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(str(args.profile_dir))
        profile_ctx = True
        LOGGER.info("Profiler trace started -> %s", args.profile_dir)

    chain_steps = args.steps_per_dispatch
    if chain_steps < 0:
        # Dispatch overhead dominates small steps on the TPU relay
        # (~30-140 ms RTT per program); chain 8 steps per dispatch there.
        # On CPU (tests) dispatch is cheap — keep single steps.
        chain_steps = 8 if jax.default_backend() != "cpu" else 1
    chain_steps = max(1, min(chain_steps, train_iter.steps_per_epoch()))
    if chain_steps > 1:
        LOGGER.info("Chaining %d train steps per dispatch", chain_steps)

    # Device-resident dataset: the whole uint8 store lives in HBM; steps
    # gather batches by index. Decisive on bandwidth-bound host↔device
    # links. Cap at 6 GB to leave HBM room for model/activations.
    # (The fused path's dataset is ALREADY device-resident.)
    dataset_bytes = train_store.images.nbytes + val_store.images.nbytes
    device_dataset = (fused_dd is None
                      and not args.no_device_dataset
                      and jax.process_count() == 1
                      and dataset_bytes < 6e9)
    if device_dataset:
        LOGGER.info("Device-resident dataset enabled (%.0f MB)",
                    dataset_bytes / 1e6)

    try:
        result = fit(step_fns, state, train_iter, val_iter, cfg,
                     epochs=args.epochs, seed=args.seed,
                     target_val_acc=args.target_val_acc,
                     start_epoch=start_epoch, history=history,
                     epoch_callback=epoch_callback, chain_steps=chain_steps,
                     device_dataset=device_dataset,
                     train_device_data=fused_dd[0] if fused_dd else None,
                     val_device_data=fused_dd[1] if fused_dd else None,
                     step_callback=step_callback, skip_steps=skip_steps)
    finally:
        if async_ckpt is not None:
            async_ckpt.close()  # flush the in-flight save (kill-safe resume)

    if profile_ctx:
        jax.profiler.stop_trace()
        LOGGER.info("Profiler trace written to %s", args.profile_dir)
    LOGGER.info("Training done: %d steps in %.1fs (%.1f images/sec), "
                "val_acc=%.4f (%s)", result.steps_ran, result.train_time_s,
                result.images_per_sec, result.val_accuracy,
                result.best_variant)

    _, _, y_true, y_pred = evaluate(
        step_fns, result.state, val_iter,
        device_data=fused_dd[1] if fused_dd else None)
    if jax.process_index() == 0:  # shared out-dir: one writer on multi-host
        save_training_artifacts(
            args.out_dir, result.state, label2idx, result.history,
            result.best_variant, y_true, y_pred, meta=meta,
        )
        if args.export_keras is not False:
            _export_keras_artifact(model, result.state, args)


def _export_keras_artifact(model, state, args) -> None:
    """Write the reference's `.keras` artifact next to the msgpack and
    record it in meta.json (`keras_file`). Runs by DEFAULT when keras is
    importable (`--no-export-keras` opts out) so the artifact directory is
    a drop-in superset of the reference's (`srcs/train/utils.py:95-97`).
    Never fails the run: every failure mode — keras absence, unsupported
    architecture, a weight-shape mismatch inside export_keras, a meta.json
    rewrite error — logs a warning and returns (training already
    succeeded; losing its artifacts to an optional interop step is never
    acceptable)."""
    import json

    import jax

    from leaffliction_tpu.train.keras_export import (
        export_keras,
        keras_available,
    )

    explicit = args.export_keras is True
    if args.arch != "leafcnn":
        if explicit:
            LOGGER.warning("--export-keras supports the leaf_cnn "
                           "architecture only; skipping for %s", args.arch)
        return
    if not keras_available():
        # only warn when the user asked for it; the default-on path just
        # quietly lacks the optional artifact on keras-free installs
        if explicit:
            LOGGER.warning("--export-keras requested but the keras package "
                           "is not importable; skipping")
        return
    try:
        variables = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "norm_stats": jax.device_get(state.norm_stats),
        }
        kpath = export_keras(model, variables, args.img_size,
                             Path(args.out_dir) / "leaf_cnn.keras")
        meta_path = Path(args.out_dir) / "meta.json"
        meta_json = json.loads(meta_path.read_text())
        meta_json["keras_file"] = str(kpath)
        meta_path.write_text(json.dumps(meta_json, indent=2))
        LOGGER.info("Keras artifact exported: %s", kpath)
    except Exception as exc:
        LOGGER.warning(".keras export failed (run artifacts are intact): %s",
                       exc)


if __name__ == "__main__":
    main()
