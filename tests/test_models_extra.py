"""ResNet backbone + training-transform hook tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_space_to_depth_layout():
    from leaffliction_tpu.models.leafcnn import space_to_depth

    x = jnp.arange(2 * 4 * 4 * 3).reshape(2, 4, 4, 3).astype(jnp.float32)
    y = space_to_depth(x, 2)
    assert y.shape == (2, 2, 2, 12)
    # block (0,0) of image 0 = pixels (0,0),(0,1),(1,0),(1,1) channel-stacked
    np.testing.assert_array_equal(
        np.asarray(y[0, 0, 0]),
        np.concatenate([np.asarray(x[0, 0, 0]), np.asarray(x[0, 0, 1]),
                        np.asarray(x[0, 1, 0]), np.asarray(x[0, 1, 1])]))


def test_leafcnn_s2d_stem_shapes_and_grad():
    from leaffliction_tpu.models.leafcnn import build_leafcnn

    model = build_leafcnn(num_classes=5, scale="tiny", stem="s2d")
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 5)

    # same total downsampling as the conv stem: final GAP input matches
    conv = build_leafcnn(num_classes=5, scale="tiny", stem="conv")
    vc = conv.init(jax.random.key(0), x, train=False)
    logits_c = conv.apply(vc, x, train=False)
    assert logits_c.shape == (2, 5)

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"],
             "norm_stats": variables["norm_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)})[0]
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(v).all() for v in jax.tree_util.tree_leaves(
        jax.device_get(g)))


def test_model_loader_rebuilds_s2d(tmp_path):
    import json

    from leaffliction_tpu.models.leafcnn import build_leafcnn
    from leaffliction_tpu.predict.model_loader import ModelLoader
    from leaffliction_tpu.train.checkpoint import save_model_msgpack

    model = build_leafcnn(num_classes=3, scale="tiny", stem="s2d")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    save_model_msgpack(tmp_path / "leaf_cnn.msgpack", variables["params"],
                       variables.get("batch_stats", {}),
                       variables.get("norm_stats", {}))
    (tmp_path / "meta.json").write_text(json.dumps({
        "model_file": "leaf_cnn.msgpack",
        "labels": ["a", "b", "c"],
        "data": {"img_size": 32, "num_classes": 3},
        "model": {"name": "leaf_cnn", "widths": [16, 32, 64],
                  "scale": "tiny", "stem": "s2d", "separable": False,
                  "use_normalization": True,
                  "drop_block": 0.1, "drop_top": 0.3},
        "training": {"mixed_precision": False},
    }))
    loader = ModelLoader(tmp_path).load()
    logits = loader.model.apply(loader.variables, x, train=False)
    assert logits.shape == (1, 3)


@pytest.mark.slow
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


@pytest.mark.slow  # doubly opt-in path (resnet family + s2d stem); the
# quick tier keeps the leafcnn s2d variant
def test_resnet_s2d_stem_shapes_and_grad():
    from leaffliction_tpu.models.resnet import build_resnet

    model = build_resnet(num_classes=6, preset="resnet10", stem="s2d",
                         dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    logits = model.apply(variables, x, train=False)
    assert logits.shape == (2, 6)

    # same total downsampling as the conv stem: stage-1 input is H/4
    conv = build_resnet(num_classes=6, preset="resnet10", stem="conv",
                        dtype=jnp.float32)
    vc = conv.init(jax.random.key(0), x, train=False)
    assert model.apply(variables, x, train=False).shape == \
        conv.apply(vc, x, train=False).shape

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"],
             "norm_stats": variables.get("norm_stats", {})},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.key(1)})[0]
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


def test_model_loader_rebuilds_resnet_s2d(tmp_path):
    import json

    from leaffliction_tpu.models.resnet import build_resnet
    from leaffliction_tpu.predict.model_loader import ModelLoader
    from leaffliction_tpu.train.checkpoint import save_model_msgpack

    model = build_resnet(num_classes=3, preset="resnet10", stem="s2d",
                         dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    save_model_msgpack(tmp_path / "leaf_cnn.msgpack", variables["params"],
                       variables.get("batch_stats", {}),
                       variables.get("norm_stats", {}))
    (tmp_path / "meta.json").write_text(json.dumps({
        "model_file": "leaf_cnn.msgpack",
        "labels": ["a", "b", "c"],
        "data": {"img_size": 64, "num_classes": 3},
        "model": {"name": "resnet10", "stem": "s2d",
                  "use_normalization": True},
        "training": {"mixed_precision": False},
    }))
    loader = ModelLoader(tmp_path).load()
    logits = loader.model.apply(loader.variables, x, train=False)
    assert logits.shape == (1, 3)


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
