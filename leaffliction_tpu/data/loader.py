"""Host-side input pipeline: decode once, cache, stream uint8 batches.

TPU-native redesign of the reference's `ManifestSequence`
(`srcs/dataio/sequence.py:16-176`), which re-decodes + LANCZOS-resizes +
float-converts every image on every epoch in per-batch Python. Here:

- each image is decoded + resized ONCE into a pinned uint8 cache (RAM is
  plentiful; the cache is the entire dataset at img_size — e.g. 8k images at
  224px ≈ 1.2 GB);
- per epoch, batches are fancy-indexed out of the cache (cheap) and shipped
  to device as uint8 (4x less PCIe/ICI traffic than float32); the /255 and
  augmentation happen inside the jitted train step;
- the final partial batch is padded to the static batch size with a validity
  mask — XLA never sees a dynamic shape;
- decode uses a small thread pool (PIL releases the GIL during JPEG decode;
  a native libjpeg decoder can be swapped in via `decode_fn`).

Shuffling is seeded per epoch (reference `sequence.py:98-114` semantics:
deterministic under a fixed seed, reshuffled each epoch).
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Callable, Iterator, NamedTuple, Optional, Sequence

import numpy as np

from leaffliction_tpu.core.logging import get_logger
from leaffliction_tpu.data.manifest import ManifestItem

LOGGER = get_logger(__name__)


def decode_resize_pil(path: str, img_size: int) -> np.ndarray:
    """PIL decode → RGB → LANCZOS resize → uint8 HWC.

    Matches reference preprocessing (`sequence.py:74-88`: RGB-ensure +
    LANCZOS). `Image.draft` lets libjpeg do cheap DCT-domain downscaling
    before the final LANCZOS pass when the source is much larger.
    """
    from PIL import Image

    with Image.open(path) as im:
        im.draft("RGB", (img_size * 2, img_size * 2))
        im = im.convert("RGB")
        if im.size != (img_size, img_size):
            im = im.resize((img_size, img_size), Image.LANCZOS)
        return np.asarray(im, np.uint8)


def default_decode_fn() -> Callable[[str, int], np.ndarray]:
    """Native libjpeg decoder when built (≈2x PIL on this host), else PIL.
    Set LEAF_NATIVE_DECODE=0 to force the PIL path (exact LANCZOS parity)."""
    import os

    if os.environ.get("LEAF_NATIVE_DECODE", "1") != "0":
        try:
            from leaffliction_tpu.data import native

            if native.native_available():
                return native.decode_resize_native
        except Exception:  # pragma: no cover - build toolchain missing
            pass
    return decode_resize_pil


class Batch(NamedTuple):
    images: np.ndarray   # [B, S, S, 3] uint8
    labels: np.ndarray   # [B] int32
    mask: np.ndarray     # [B] float32, 0 for padding
    indices: np.ndarray  # [B] int32 source row in the store for EVERY slot,
    #                      including padding rows (mask is the sole validity
    #                      signal) — the device-resident dataset path gathers
    #                      batches by these indices instead of shipping pixels


class ImageStore:
    """Decoded-image cache for a list of manifest items at a fixed size."""

    def __init__(
        self,
        items: Sequence[ManifestItem],
        label2idx: dict,
        img_size: int,
        decode_fn: Optional[Callable[[str, int], np.ndarray]] = None,
        workers: int = 4,
    ) -> None:
        self.items = list(items)
        self.img_size = img_size
        self.labels = np.asarray(
            [label2idx[it.label] for it in self.items], np.int32
        )
        n = len(self.items)

        if decode_fn is None:
            # The shared decode sequence (also the predictor's and fused
            # balancer's): one batched C++ call on the library's own
            # thread pool (GIL released for the batch), threaded PIL
            # fallback per failure.
            from leaffliction_tpu.data.native import (
                decode_batch_with_fallback,
            )

            self.images, self.valid = decode_batch_with_fallback(
                [it.src for it in self.items], img_size,
                workers=max(workers, 2))
        else:
            self.valid = np.zeros((n,), bool)
            self.images = np.zeros((n, img_size, img_size, 3), np.uint8)

            def _load(i: int) -> None:
                try:
                    self.images[i] = decode_fn(self.items[i].src, img_size)
                    self.valid[i] = True
                except Exception as exc:  # skip unreadable images
                    LOGGER.warning("Skipping unreadable image %s (%s)",
                                   self.items[i].src, exc)

            if workers > 1 and n > 1:
                with cf.ThreadPoolExecutor(max_workers=workers) as pool:
                    list(pool.map(_load, range(n)))
            else:
                for i in range(n):
                    _load(i)
        n_bad = int(n - self.valid.sum())
        if n_bad:
            LOGGER.warning("%d/%d images failed to decode", n_bad, n)

    def __len__(self) -> int:
        return len(self.items)

    @property
    def valid_indices(self) -> np.ndarray:
        return np.nonzero(self.valid)[0].astype(np.int32)


class DeviceImageStore:
    """ImageStore-shaped view whose pixels live ONLY in device HBM.

    Used by the fused balance→train path (`data/fused_balance.py`): the
    trainer's gather step selects rows out of a device-resident uint8 array
    by index, so the host never holds the augmented pixels at all.
    `images` is a zero-filled placeholder (never-written numpy zeros are
    copy-on-write virtual pages — no real RAM) that satisfies
    `BatchIterator`'s fancy-indexing; training MUST run the gather path
    (`fit(train_device_data=...)`), which ignores host batch pixels."""

    def __init__(self, labels: np.ndarray, img_size: int) -> None:
        self.items: list = []
        self.img_size = img_size
        self.labels = np.asarray(labels, np.int32)
        n = len(self.labels)
        self.images = np.zeros((n, img_size, img_size, 3), np.uint8)
        self.valid = np.ones((n,), bool)
        self.host_pixels = False

    def __len__(self) -> int:
        return len(self.labels)

    @property
    def valid_indices(self) -> np.ndarray:
        return np.nonzero(self.valid)[0].astype(np.int32)


class BatchIterator:
    """Static-shape batch stream over an ImageStore."""

    def __init__(
        self,
        store: ImageStore,
        batch_size: int,
        shuffle: bool,
        seed: int = 0,
        drop_remainder: bool = False,
        pad_to_steps: Optional[int] = None,
    ) -> None:
        """`pad_to_steps` fixes the number of batches per epoch regardless of
        local data volume, padding with zero-mask batches. Multi-host training
        requires it: the jitted train step is a global collective, so every
        host MUST execute the same step count per epoch — stride-sharded item
        lists can differ by one item across hosts, and a per-host ceil-divide
        would hang the slice (one host enters a collective the others skip).
        Derive it from the GLOBAL item count via `global_steps_per_epoch`."""
        self.store = store
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.pad_to_steps = pad_to_steps

    def steps_per_epoch(self) -> int:
        if self.pad_to_steps is not None:
            return self.pad_to_steps
        n = len(self.store.valid_indices)
        if self.drop_remainder:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _pixels(self, sel: np.ndarray) -> np.ndarray:
        """Host pixel rows for a batch — or a token-sized zero array when the
        store's pixels live only in device HBM (`DeviceImageStore`): the
        gather train/eval paths consume only labels/mask/indices, so copying
        [B, S, S, 3] of placeholder zeros per batch (~20 MB at 224/b128)
        would burn host memcpy bandwidth on the hot loop for nothing. The
        (B, 1, 1, 3) stand-in keeps `Batch.images.ndim` (the chained-chunk
        discriminant) and `np.stack` chaining working."""
        if getattr(self.store, "host_pixels", True):
            return self.store.images[sel]
        return np.zeros((len(sel), 1, 1, 3), np.uint8)

    def epoch(self, epoch_idx: int = 0) -> Iterator[Batch]:
        bs = self.batch_size
        yielded = 0
        for batch in self._local_epoch(epoch_idx):
            if self.pad_to_steps is not None and yielded >= self.pad_to_steps:
                break
            yielded += 1
            yield batch
        if self.pad_to_steps is not None:
            size = self.store.img_size
            if not getattr(self.store, "host_pixels", True):
                size = 1
            while yielded < self.pad_to_steps:
                yielded += 1
                yield Batch(
                    images=np.zeros((bs, size, size, 3), np.uint8),
                    labels=np.zeros((bs,), np.int32),
                    mask=np.zeros((bs,), np.float32),
                    indices=np.zeros((bs,), np.int32),
                )

    def _local_epoch(self, epoch_idx: int = 0) -> Iterator[Batch]:
        idx = self.store.valid_indices.copy()
        if self.shuffle:
            rng = np.random.default_rng(self.seed + epoch_idx)
            rng.shuffle(idx)
        bs = self.batch_size
        n_full = len(idx) // bs
        end = n_full * bs
        for s in range(0, end, bs):
            sel = idx[s:s + bs]
            yield Batch(
                images=self._pixels(sel),
                labels=self.store.labels[sel],
                mask=np.ones((bs,), np.float32),
                indices=sel,
            )
        if not self.drop_remainder and end < len(idx):
            sel = idx[end:]
            pad = bs - len(sel)
            # Pad with wrap-around items from this epoch's permutation rather
            # than repeats of one image: padding is masked out of the loss but
            # still enters BatchNorm batch statistics, and bs-1 copies of a
            # single image would bias the running stats on small datasets.
            sel_pad = np.concatenate([sel, np.resize(idx, pad)]).astype(np.int32)
            mask = np.concatenate(
                [np.ones((len(sel),), np.float32), np.zeros((pad,), np.float32)]
            )
            yield Batch(
                images=self._pixels(sel_pad),
                labels=self.store.labels[sel_pad],
                mask=mask,
                indices=sel_pad,
            )


def apply_training_transform(store: ImageStore, cfg=None,
                             device_batch: int = 64) -> None:
    """Replace cached images with mask-segmented versions (leaf on white).

    On-device batched equivalent of the reference's per-image training
    transform hook (`srcs/cli/Transformation.py:709-1053`: full mask pipeline
    + white-background apply, cached per image). Running it once over the
    RAM cache reproduces the reference's cache semantics; the light
    brightness/contrast jitter the hook adds per epoch is covered by the
    in-graph train augmentation.
    """
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.segment.config import TransformConfig
    from leaffliction_tpu.segment.mask import (
        finalize_mask_batch,
        make_mask_batch_async,
    )

    cfg = cfg or TransformConfig(mask_upscale_factor=1.0,
                                 mask_upscale_long_side=0,
                                 grabcut_refine=False)

    @jax.jit
    def _pack(masks):
        # ship the MASK as packed bits (24x less than the masked uint8
        # image: B×224×28 vs B×224×224×3) and apply the white background
        # on host — `apply_mask_white` over uint8 is a pure select, so the
        # host numpy `where` is bit-identical
        return jnp.packbits(masks.astype(jnp.uint8), axis=-1)

    # Dispatch every chunk before collecting any result: uint8 uploads (4x
    # less than float32) overlap the previous chunk's segmentation compute,
    # and nothing syncs until the whole dataset is in flight.
    n = len(store.images)
    pending = []
    for start in range(0, n, device_batch):
        chunk = store.images[start:start + device_batch]
        pad = device_batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
        dev = jnp.asarray(chunk)
        masks, scores = make_mask_batch_async(dev, cfg)
        pending.append((start, pad, dev, masks, scores))
    w = store.images.shape[2]
    for start, pad, dev, masks, scores in pending:
        masks = finalize_mask_batch(dev, masks, scores, cfg)
        used = device_batch - pad if pad else device_batch
        packed = np.asarray(jax.device_get(_pack(masks)))[:used]
        m = np.unpackbits(packed, axis=-1, count=w) > 0
        src = store.images[start:start + used]
        store.images[start:start + used] = np.where(
            m[..., None], src, 255).astype(np.uint8)
    LOGGER.info("Applied training transform (masked, white bg) to %d images",
                n)

    # env-gated previews (reference LEAF_SAVE_TRANSFORMS,
    # `srcs/cli/Transformation.py:879-938`)
    import os

    if os.environ.get("LEAF_SAVE_TRANSFORMS"):
        from pathlib import Path

        from PIL import Image

        out_dir = Path(os.environ.get("LEAF_SAVE_TRANSFORMS_DIR",
                                      "artifacts/transform_previews"))
        out_dir.mkdir(parents=True, exist_ok=True)
        for i in range(min(8, n)):
            Image.fromarray(store.images[i]).save(
                out_dir / f"preview_{i}.jpg", quality=95)
        LOGGER.info("Saved transform previews to %s", out_dir)


def apply_training_transform_device(images_dev, cfg=None,
                                    device_batch: int = 64):
    """Device-to-device variant of `apply_training_transform` for the fused
    balance→train path: uint8 [N, S, S, 3] in HBM → mask-segmented (leaf on
    white) uint8 in HBM. Pixels never visit the host — only the per-chunk
    mask scores are fetched (bytes) for the rare Otsu-fallback resolution."""
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.segment.config import TransformConfig
    from leaffliction_tpu.segment.mask import (
        finalize_mask_batch,
        make_mask_batch_async,
    )

    cfg = cfg or TransformConfig(mask_upscale_factor=1.0,
                                 mask_upscale_long_side=0,
                                 grabcut_refine=False)

    @jax.jit
    def _apply(chunk, masks):
        return jnp.where(masks[..., None], chunk,
                         jnp.uint8(255)).astype(jnp.uint8)

    def _finalize(entry):
        chunk, masks, scores, used = entry
        masks = finalize_mask_batch(chunk, masks, scores, cfg)
        return _apply(chunk, masks)[:used]

    # Bounded dispatch window: dispatching EVERY chunk before finalizing any
    # would hold a device copy of the whole dataset (chunk slices + masks)
    # alongside `images_dev` and the accumulating outputs — ~3x the dataset
    # in HBM at peak. A few chunks of lookahead keeps finalize's score fetch
    # overlapped with later dispatches while capping the transient at
    # ~dataset + window.
    from collections import deque

    n = images_dev.shape[0]
    window = 4
    pending: "deque" = deque()
    outs = []
    for start in range(0, n, device_batch):
        chunk = images_dev[start:start + device_batch]
        used = chunk.shape[0]
        if used < device_batch:  # pad to the static batch (one program)
            pad = jnp.repeat(chunk[:1], device_batch - used, axis=0)
            chunk = jnp.concatenate([chunk, pad], axis=0)
        masks, scores = make_mask_batch_async(chunk, cfg)
        pending.append((chunk, masks, scores, used))
        if len(pending) > window:
            outs.append(_finalize(pending.popleft()))
    while pending:
        outs.append(_finalize(pending.popleft()))
    out = jnp.concatenate(outs, axis=0) if outs else images_dev
    LOGGER.info("Applied training transform on device to %d images "
                "(no pixel downloads)", n)
    return out


def global_steps_per_epoch(global_item_count: int, batch_size: int,
                           process_count: Optional[int] = None) -> int:
    """Steps per epoch every host must run, from the GLOBAL item count.

    With stride sharding (`items_for_process`) the largest per-host shard is
    ceil(N / P); each host then needs ceil(ceil(N/P) / B) padded batches.
    Hosts whose shard (or decode-valid subset) is smaller pad with zero-mask
    batches via `BatchIterator(pad_to_steps=...)`, keeping the collective
    step count — and the cosine schedule's total_steps — identical on every
    host."""
    import math

    pc = process_count
    if pc is None:
        import jax

        pc = jax.process_count()
    per_host = math.ceil(global_item_count / max(pc, 1))
    return max(1, math.ceil(per_host / batch_size))


def items_for_process(items, process_index: Optional[int] = None,
                      process_count: Optional[int] = None):
    """Shard manifest items across hosts for multi-process data loading.

    Each host decodes only its stride of the dataset (the reference loads
    everything on one host; multi-host TPU slices need per-host shards so the
    global batch assembles across processes)."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc <= 1:
        return list(items)
    return [it for i, it in enumerate(items) if i % pc == pi]


def sample_batch(store: ImageStore, n: int, seed: int = 0) -> np.ndarray:
    """Up to `n` images for normalization adaptation
    (reference `adapt_normalization`, `srcs/model/cnn.py:107-131`)."""
    idx = store.valid_indices[:n]
    return store.images[idx]
