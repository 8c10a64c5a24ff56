"""ResNet backbone + training-transform hook tests."""

import numpy as np

import jax
import jax.numpy as jnp


def test_resnet_forward_and_grad():
    from leaffliction_tpu.models.resnet import build_resnet

    model = build_resnet(num_classes=8, preset="resnet10",
                         dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 8)
    assert logits.dtype == jnp.float32

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"],
             "norm_stats": variables.get("norm_stats", {})},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)},
        )[0]
        return jnp.sum(out ** 2)

    grads = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_resnet_trains_with_step_fns():
    from leaffliction_tpu.models.resnet import build_resnet
    from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
    from leaffliction_tpu.train.config import TrainConfig
    from leaffliction_tpu.train.steps import build_step_fns, create_train_state

    model = build_resnet(num_classes=4, preset="resnet10", dtype=jnp.float32)
    cfg = TrainConfig.fast()
    mesh = make_mesh(MeshSpec())
    fns = build_step_fns(model, cfg, 4, total_steps=4, mesh=mesh)
    state = create_train_state(model, cfg, img_size=32, seed=0)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (16, 32, 32, 3), np.uint8)
    labels = rng.integers(0, 4, (16,)).astype(np.int32)
    mask = np.ones((16,), np.float32)
    state, metrics = fns.train_step(state, imgs, labels, mask,
                                    jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))


def test_training_transform_hook(tiny_dataset):
    from leaffliction_tpu.data.loader import ImageStore, apply_training_transform
    from leaffliction_tpu.data.manifest import build_label_mapping
    from leaffliction_tpu.data.scan import scan_dataset

    items = scan_dataset(tiny_dataset)[:6]
    label2idx = build_label_mapping(items)
    store = ImageStore(items, label2idx, 48)
    before = store.images.copy()
    apply_training_transform(store, device_batch=4)
    after = store.images
    assert after.shape == before.shape
    assert not np.array_equal(after, before)
    # leaf kept, background whitened → mean should increase toward white
    assert after.mean() >= before.mean() - 5
