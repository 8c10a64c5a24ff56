"""Regression tests for the round-3 review findings.

Covers: DeviceImageStore batches must not materialize placeholder pixels
on the hot loop; the fused CLI must reject a bad --val-ratio BEFORE the
balance pipeline runs; the windowed device transform must equal the
unwindowed per-chunk computation.
"""

import numpy as np

from tests.conftest import _leafish_image


def test_device_store_batches_skip_pixels():
    """Gather-path batches from a DeviceImageStore carry token (B, 1, 1, 3)
    pixel stand-ins — not full [B, S, S, 3] copies of the zero placeholder —
    while labels/indices/mask stay exact and chaining still stacks."""
    from leaffliction_tpu.data.loader import BatchIterator, DeviceImageStore
    from leaffliction_tpu.train.trainer import chain_batches

    labels = np.arange(10, dtype=np.int32) % 3
    store = DeviceImageStore(labels, img_size=224)
    assert not store.host_pixels
    it = BatchIterator(store, batch_size=4, shuffle=False)

    batches = list(it.epoch(0))
    assert len(batches) == 3  # 2 full + 1 wrap-padded remainder
    for b in batches:
        assert b.images.shape == (4, 1, 1, 3)  # token, not (4, 224, 224, 3)
        assert b.images.dtype == np.uint8
        np.testing.assert_array_equal(b.labels, labels[b.indices])
    # remainder: 2 real rows + 2 wrap-padded, masked out
    np.testing.assert_array_equal(batches[-1].mask, [1, 1, 0, 0])

    # chained chunks keep the ndim-5 discriminant the trainer relies on
    chained = list(chain_batches(it.epoch(0), k=2))
    assert chained[0].images.ndim == 5
    assert chained[0].indices.shape == (2, 4)

    # pad_to_steps padding is token-sized too
    padded = list(BatchIterator(store, 4, shuffle=False,
                                pad_to_steps=5).epoch(0))
    assert len(padded) == 5
    assert padded[-1].images.shape == (4, 1, 1, 3)
    assert float(padded[-1].mask.sum()) == 0.0

    # an ImageStore-shaped store (host_pixels absent/True) still ships pixels
    class _HostStore:
        img_size = 8
        images = np.arange(10 * 8 * 8 * 3, dtype=np.uint8).reshape(
            10, 8, 8, 3)
        labels = np.arange(10, dtype=np.int32) % 3
        valid_indices = np.arange(10, dtype=np.int32)

    hb = next(iter(BatchIterator(_HostStore(), 4, shuffle=False).epoch(0)))
    assert hb.images.shape == (4, 8, 8, 3)
    np.testing.assert_array_equal(hb.images, _HostStore.images[:4])


def test_fused_val_ratio_validated_early(tmp_path, capsys):
    """A bad --val-ratio fails fast with a logged error — before decode,
    upload, or augmentation spend minutes — and writes nothing."""
    from leaffliction_tpu.cli import train as train_cli

    tree = tmp_path / "tree"
    tree.mkdir()
    for bad in ("1.0", "0", "-0.2"):
        train_cli.main(["--balance-from", str(tree),
                        "--val-ratio", bad,
                        "--out-dir", str(tmp_path / "models")])
        assert "--val-ratio must be in (0, 1)" in capsys.readouterr().out, bad
    assert not (tmp_path / "models").exists()
    assert not list(tmp_path.glob("artifacts/**/*"))


def test_transform_device_windowed_equivalence():
    """The bounded-window dispatch in apply_training_transform_device yields
    the same masked images as finalizing each chunk directly (window-size
    independent), including the padded final partial chunk."""
    import jax.numpy as jnp

    from leaffliction_tpu.data.loader import apply_training_transform_device
    from leaffliction_tpu.segment.config import TransformConfig
    from leaffliction_tpu.segment.mask import (
        finalize_mask_batch,
        make_mask_batch_async,
    )

    rng = np.random.default_rng(3)
    imgs = np.stack([_leafish_image(rng, 64) for _ in range(7)])
    imgs_dev = jnp.asarray(imgs)
    cfg = TransformConfig(mask_upscale_factor=1.0, mask_upscale_long_side=0,
                          grabcut_refine=False)

    # 7 images at device_batch=2 -> 4 chunks (last one padded) > window
    out = apply_training_transform_device(imgs_dev, cfg=cfg, device_batch=2)
    assert out.shape == imgs.shape and out.dtype == jnp.uint8

    expect = []
    for start in range(0, 7, 2):
        chunk = imgs_dev[start:start + 2]
        used = chunk.shape[0]
        if used < 2:
            chunk = jnp.concatenate(
                [chunk, jnp.repeat(chunk[:1], 2 - used, axis=0)], axis=0)
        masks, scores = make_mask_batch_async(chunk, cfg)
        masks = finalize_mask_batch(chunk, masks, scores, cfg)
        expect.append(np.where(np.asarray(masks)[..., None],
                               np.asarray(chunk),
                               np.uint8(255))[:used])
    np.testing.assert_array_equal(np.asarray(out),
                                  np.concatenate(expect, axis=0))
