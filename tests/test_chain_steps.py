"""train_step_chain: K steps per dispatch must match K single steps exactly.

The chained program is `lax.scan` over the identical single-step body with
per-step keys folded from the chunk key, so params/opt-state/metrics must be
bit-identical (same platform, same math) to running the single-step program
K times with the same folded keys.
"""

import jax
import numpy as np
import pytest

from leaffliction_tpu.models.leafcnn import build_leafcnn
from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
from leaffliction_tpu.train.config import TrainConfig
from leaffliction_tpu.train.steps import build_step_fns, create_train_state

pytestmark = pytest.mark.slow  # e2e-scale; inner loop: -m 'not slow'


def _data(k, batch, img, classes, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (k, batch, img, img, 3), np.uint8)
    labels = rng.integers(0, classes, (k, batch)).astype(np.int32)
    mask = np.ones((k, batch), np.float32)
    return images, labels, mask


@pytest.mark.parametrize("n_devices", [1, 8])
def test_chain_matches_sequential(n_devices):
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(MeshSpec(data=n_devices, model=1), devices=devices)
    classes, img, batch, k = 4, 16, 2 * n_devices, 3

    model = build_leafcnn(num_classes=classes, scale="tiny")
    cfg = TrainConfig.regularized()
    fns = build_step_fns(model, cfg, classes, total_steps=k, mesh=mesh)

    images, labels, mask = _data(k, batch, img, classes)
    key = jax.random.key(7)

    state_seq = create_train_state(model, cfg, img_size=img, seed=0)
    seq_metrics = []
    for i in range(k):
        state_seq, m = fns.train_step(
            state_seq, images[i], labels[i], mask[i],
            jax.random.fold_in(key, i))
        seq_metrics.append(jax.device_get(m))

    state_chain = create_train_state(model, cfg, img_size=img, seed=0)
    state_chain, chain_metrics = fns.train_step_chain(
        state_chain, images, labels, mask, key)
    chain_metrics = jax.device_get(chain_metrics)

    # metrics stacked [K] and equal per step (first-step loss is computed on
    # identical params, so it matches tightly; later steps see the tiny
    # fusion-order drift in params)
    assert np.asarray(chain_metrics["loss"]).shape == (k,)
    np.testing.assert_allclose(
        np.asarray(chain_metrics["loss"])[0], seq_metrics[0]["loss"],
        rtol=1e-6)
    for i in range(1, k):
        np.testing.assert_allclose(
            np.asarray(chain_metrics["loss"])[i], seq_metrics[i]["loss"],
            rtol=1e-3)

    # final params equal up to XLA fusion-order float drift (the scan body
    # compiles with different fusion choices than the standalone step; ~1e-6
    # per step on f32)
    flat_seq = jax.tree_util.tree_leaves(jax.device_get(state_seq.params))
    flat_chain = jax.tree_util.tree_leaves(jax.device_get(state_chain.params))
    for a, b in zip(flat_seq, flat_chain):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)
    assert int(jax.device_get(state_chain.step)) == k


def test_chain_batches_grouping(tiny_dataset):
    from leaffliction_tpu.data.loader import BatchIterator, ImageStore
    from leaffliction_tpu.data.manifest import build_label_mapping
    from leaffliction_tpu.data.scan import scan_dataset
    from leaffliction_tpu.train.trainer import chain_batches

    items = scan_dataset(tiny_dataset)[:10]
    store = ImageStore(items, build_label_mapping(items), 32)
    it = BatchIterator(store, batch_size=2, shuffle=False)  # 5 batches
    out = list(chain_batches(it.epoch(0), 2))
    # 2 chained chunks of 2 + 1 remainder single batch
    assert len(out) == 3
    assert out[0].images.shape == (2, 2, 32, 32, 3)
    assert out[1].images.shape == (2, 2, 32, 32, 3)
    assert out[2].images.shape == (2, 32, 32, 3)
    # passthrough with k=1
    out1 = list(chain_batches(it.epoch(0), 1))
    assert len(out1) == 5 and out1[0].images.ndim == 4


@pytest.mark.parametrize("n_devices", [1, 8])
def test_gather_step_matches_pixel_step(n_devices):
    """train_step_gather on a device-resident dataset must equal
    train_step_chain fed the same pixels."""
    devices = jax.devices()[:n_devices]
    mesh = make_mesh(MeshSpec(data=n_devices, model=1), devices=devices)
    classes, img, batch, k, n_data = 4, 16, 2 * n_devices, 2, 20

    model = build_leafcnn(num_classes=classes, scale="tiny")
    cfg = TrainConfig.regularized()
    fns = build_step_fns(model, cfg, classes, total_steps=k, mesh=mesh)

    rng = np.random.default_rng(3)
    data_images = rng.integers(0, 255, (n_data, img, img, 3), np.uint8)
    data_labels = rng.integers(0, classes, (n_data,)).astype(np.int32)
    sel = rng.integers(0, n_data, (k, batch)).astype(np.int32)
    mask = np.ones((k, batch), np.float32)
    key = jax.random.key(11)

    s_pix = create_train_state(model, cfg, img_size=img, seed=0)
    s_pix, m_pix = fns.train_step_chain(
        s_pix, data_images[sel], data_labels[sel], mask, key)

    s_gat = create_train_state(model, cfg, img_size=img, seed=0)
    dd_img = jax.device_put(data_images)
    dd_lab = jax.device_put(data_labels)
    s_gat, m_gat = fns.train_step_gather(s_gat, dd_img, dd_lab, sel, mask, key)

    np.testing.assert_allclose(
        np.asarray(jax.device_get(m_pix["loss"])),
        np.asarray(jax.device_get(m_gat["loss"])), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s_pix.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s_gat.params))):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)

    # eval gather agrees with streaming eval
    me, pe = fns.eval_step(s_gat, data_images[sel[0]], data_labels[sel[0]],
                           mask[0])
    mg, pg = fns.eval_step_gather(s_gat, dd_img, dd_lab, sel[0], mask[0])
    np.testing.assert_allclose(float(jax.device_get(me["loss_sum"])),
                               float(jax.device_get(mg["loss_sum"])),
                               rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(jax.device_get(pe)),
                                  np.asarray(jax.device_get(pg)))


def test_fit_device_dataset_runs(tiny_dataset):
    from leaffliction_tpu.data.loader import BatchIterator, ImageStore
    from leaffliction_tpu.data.manifest import build_label_mapping
    from leaffliction_tpu.data.scan import scan_dataset
    from leaffliction_tpu.train.trainer import fit

    items = scan_dataset(tiny_dataset)
    label2idx = build_label_mapping(items)
    store = ImageStore(items, label2idx, 32)
    train_iter = BatchIterator(store, batch_size=8, shuffle=True, seed=0)
    val_iter = BatchIterator(store, batch_size=8, shuffle=False)

    model = build_leafcnn(num_classes=len(label2idx), scale="tiny")
    cfg = TrainConfig.fast()
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    fns = build_step_fns(model, cfg, len(label2idx),
                         total_steps=train_iter.steps_per_epoch() * 2,
                         mesh=mesh)
    state = create_train_state(model, cfg, img_size=32, seed=0)
    result = fit(fns, state, train_iter, val_iter, cfg, epochs=2, seed=0,
                 chain_steps=2, device_dataset=True)
    assert result.steps_ran == train_iter.steps_per_epoch() * 2
    assert np.isfinite(result.history["loss"]).all()
    assert np.isfinite(result.history["val_loss"]).all()


def test_fit_with_chaining_runs(tiny_dataset):
    from leaffliction_tpu.data.loader import BatchIterator, ImageStore
    from leaffliction_tpu.data.manifest import build_label_mapping
    from leaffliction_tpu.data.scan import scan_dataset
    from leaffliction_tpu.train.trainer import fit

    items = scan_dataset(tiny_dataset)
    label2idx = build_label_mapping(items)
    store = ImageStore(items, label2idx, 32)
    train_iter = BatchIterator(store, batch_size=8, shuffle=True, seed=0)
    val_iter = BatchIterator(store, batch_size=8, shuffle=False)

    model = build_leafcnn(num_classes=len(label2idx), scale="tiny")
    cfg = TrainConfig.fast()
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    fns = build_step_fns(model, cfg, len(label2idx),
                         total_steps=train_iter.steps_per_epoch() * 2,
                         mesh=mesh)
    state = create_train_state(model, cfg, img_size=32, seed=0)
    result = fit(fns, state, train_iter, val_iter, cfg, epochs=2, seed=0,
                 chain_steps=3)
    assert result.steps_ran == train_iter.steps_per_epoch() * 2
    assert np.isfinite(result.history["loss"]).all()
    assert len(result.history["loss"]) == 2


def test_eval_chain_matches_per_batch():
    """eval_chain_gather (whole val set in one scan program) must agree
    with K separate eval_step_gather calls on the same index batches."""
    import jax.numpy as jnp

    classes, img, batch, k, n = 4, 16, 8, 3, 40
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    model = build_leafcnn(num_classes=classes, scale="tiny")
    cfg = TrainConfig.regularized()
    fns = build_step_fns(model, cfg, classes, total_steps=4, mesh=mesh)
    state = create_train_state(model, cfg, img_size=img, seed=0)

    rng = np.random.default_rng(3)
    data_images = jnp.asarray(rng.integers(0, 255, (n, img, img, 3), np.uint8))
    data_labels = jnp.asarray(rng.integers(0, classes, (n,)).astype(np.int32))
    sel = rng.integers(0, n, (k, batch)).astype(np.int32)
    mask = (rng.random((k, batch)) < 0.9).astype(np.float32)

    chained_m, chained_p = fns.eval_chain_gather(
        state, data_images, data_labels, sel, mask)
    chained_m = jax.device_get(chained_m)
    chained_p = np.asarray(chained_p)

    for i in range(k):
        m, p = fns.eval_step_gather(state, data_images, data_labels,
                                    sel[i], mask[i])
        m = jax.device_get(m)
        for key_ in ("loss_sum", "correct", "n"):
            np.testing.assert_allclose(chained_m[key_][i], m[key_],
                                       rtol=1e-6)
        np.testing.assert_array_equal(chained_p[i], np.asarray(p))
