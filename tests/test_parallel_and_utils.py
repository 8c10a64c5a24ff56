"""Multichip dry run (8 virtual devices) + utility API parity tests."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.mark.slow  # the driver re-runs dryrun_multichip every round and
# the full tier keeps this; the quick inner loop skips the 2-min duplicate
def test_dryrun_multichip_8():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_compiles():
    import jax

    from __graft_entry__ import entry

    fn, (variables, images) = entry()
    probs = jax.jit(fn)(variables, images)
    probs = np.asarray(probs)
    assert probs.shape == (8, 8)
    assert np.allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_mesh_spec_resolution():
    from leaffliction_tpu.parallel.mesh import MeshSpec

    assert MeshSpec().resolve(8) == MeshSpec(data=8, model=1)
    assert MeshSpec(model=2).resolve(8) == MeshSpec(data=4, model=2)
    with pytest.raises(ValueError):
        MeshSpec(data=3, model=2).resolve(8)


def test_apply_mask_parity():
    from leaffliction_tpu.utils.mask_utils import apply_mask

    img = np.full((4, 4, 3), 100, np.uint8)
    mask = np.zeros((4, 4), np.uint8)
    mask[1:3, 1:3] = 255
    white = apply_mask(img, mask, "white")
    assert white[0, 0, 0] == 255 and white[1, 1, 0] == 100
    black = apply_mask(img, mask, "black")
    assert black[0, 0, 0] == 0 and black[2, 2, 0] == 100
    with pytest.raises(ValueError):
        apply_mask(img, mask, "purple")


def test_mask_utils_helpers():
    from leaffliction_tpu.utils.mask_utils import (
        apply_morphological_operations,
        combine_masks,
        create_binary_mask,
        get_mask_area,
        get_mask_bbox,
        invert_mask,
        mask_to_contours,
    )

    gray = np.zeros((8, 8), np.uint8)
    gray[2:6, 2:6] = 200
    mask = create_binary_mask(gray)
    assert get_mask_area(mask) == 16
    assert get_mask_bbox(mask) == (2, 2, 4, 4)
    inv = invert_mask(mask)
    assert get_mask_area(inv) == 64 - 16
    both = combine_masks([mask, inv], "or")
    assert get_mask_area(both) == 64
    neither = combine_masks([mask, inv], "and")
    assert get_mask_area(neither) == 0
    dil = apply_morphological_operations(mask, "dilate", 3)
    assert get_mask_area(dil) > 16
    cnts = mask_to_contours(mask)
    assert len(cnts) == 1 and cnts[0].shape[1:] == (1, 2)


def test_image_io_helpers(tmp_path):
    from leaffliction_tpu.utils.image_io import ImageLoader, ImageTransforms

    arr = np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    path = tmp_path / "x.jpg"
    ImageLoader.save_array(arr, path)
    assert ImageLoader.validate_image_path(path)
    assert not ImageLoader.validate_image_path(tmp_path / "x.png")
    loaded = ImageLoader.load_as_array(path)
    assert loaded.shape == (32, 32, 3)
    files = ImageLoader.get_image_files(tmp_path)
    assert files == [path]
    norm = ImageTransforms.normalize_array(arr)
    assert norm.dtype == np.float32 and norm.max() <= 1.0


@pytest.mark.slow
def test_dryrun_multichip_4():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(4)


def test_batch_larger_than_dataset(tiny_dataset):
    from leaffliction_tpu.data.loader import BatchIterator, ImageStore
    from leaffliction_tpu.data.manifest import build_label_mapping
    from leaffliction_tpu.data.scan import scan_dataset

    items = scan_dataset(tiny_dataset)[:5]
    store = ImageStore(items, build_label_mapping(items), 32)
    it = BatchIterator(store, batch_size=64, shuffle=True, seed=0)
    assert it.steps_per_epoch() == 1
    batches = list(it.epoch(0))
    assert len(batches) == 1
    assert batches[0].images.shape[0] == 64  # padded to static batch
    assert batches[0].mask.sum() == 5
