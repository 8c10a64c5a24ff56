"""Tensor parallelism (`model` mesh axis): sharding rule + step numerics.

Sharding is layout, not math: the channel-sharded (TP) train/eval steps
must reproduce the replicated (DP) steps on identical inputs up to
reduction order. Runs on the conftest-forced 8-virtual-CPU-device
platform. The reference has no model parallelism at all (host process
pools only, `srcs/preprocessing/dataset_balancer.py:137-162`); this is
the TPU-native scale-out path for backbones too wide for one chip.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from leaffliction_tpu.models.leafcnn import build_leafcnn  # noqa: E402
from leaffliction_tpu.parallel.mesh import (  # noqa: E402
    MeshSpec,
    make_mesh,
    tp_shardings,
)
from leaffliction_tpu.train.config import TrainConfig  # noqa: E402
from leaffliction_tpu.train.steps import (  # noqa: E402
    build_step_fns,
    create_train_state,
)


def test_tp_sharding_rule_shapes():
    mesh = make_mesh(MeshSpec(data=4, model=2), devices=jax.devices()[:8])
    tree = {
        "conv": jnp.zeros((3, 3, 16, 64)),    # HWIO → out-features sharded
        "dense": jnp.zeros((128, 64)),        # IO → out-features sharded
        "scale": jnp.zeros((64,)),            # BN/bias channels sharded
        "head_bias": jnp.zeros((8,)),         # below min_size → replicated
        "odd": jnp.zeros((65,)),              # not divisible → replicated
        "scalar": jnp.zeros(()),              # replicated
    }
    sh = tp_shardings(tree, mesh, min_size=64)
    assert sh["conv"].spec == P(None, None, None, "model")
    assert sh["dense"].spec == P(None, "model")
    assert sh["scale"].spec == P("model")
    assert sh["head_bias"].spec == P()
    assert sh["odd"].spec == P()
    assert sh["scalar"].spec == P()

    # model=1: everything replicates (always safe to apply)
    dp_mesh = make_mesh(MeshSpec(data=8, model=1),
                        devices=jax.devices()[:8])
    for s in jax.tree_util.tree_leaves(tp_shardings(tree, dp_mesh)):
        assert s.spec == P()


@pytest.mark.slow
def test_tp_matches_dp_train_and_eval():
    devices = jax.devices()[:8]
    dp_mesh = make_mesh(MeshSpec(data=8, model=1), devices=devices)
    tp_mesh = make_mesh(MeshSpec(data=4, model=2), devices=devices)

    num_classes, img, batch = 5, 32, 16
    model = build_leafcnn(num_classes=num_classes, scale="tiny")
    cfg = TrainConfig.regularized()

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (2, batch, img, img, 3), np.uint8)
    labels = rng.integers(0, num_classes, (2, batch)).astype(np.int32)
    mask = np.ones((2, batch), np.float32)
    key = jax.random.key(3)

    def run(mesh, state_sh):
        fns = build_step_fns(model, cfg, num_classes, total_steps=10,
                             mesh=mesh, state_shardings=state_sh)
        state = create_train_state(model, cfg, img_size=img, seed=0)
        if state_sh is not None:
            state = jax.device_put(state, state_sh)
        # two chained steps (scan body under the sharding), then eval
        state, metrics = fns.train_step_chain(state, images, labels, mask,
                                              key)
        em, preds = fns.eval_step(state, images[0], labels[0], mask[0])
        return (np.asarray(jax.device_get(metrics["loss"])),
                jax.device_get(em), np.asarray(preds))

    dp_losses, dp_eval, dp_preds = run(dp_mesh, None)

    tp_template = create_train_state(model, cfg, img_size=img, seed=0)
    state_sh = tp_shardings(tp_template, tp_mesh, min_size=32)
    n_sharded = sum(int(s.spec != P())
                    for s in jax.tree_util.tree_leaves(state_sh))
    assert n_sharded > 0, "tiny backbone must have sharded leaves"
    tp_losses, tp_eval, tp_preds = run(tp_mesh, state_sh)

    np.testing.assert_allclose(tp_losses, dp_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(tp_eval["loss_sum"], dp_eval["loss_sum"],
                               rtol=2e-4, atol=2e-5)
    assert (tp_preds == dp_preds).mean() > 0.95  # argmax ties only


@pytest.mark.slow
def test_tp_cli_train_e2e(tiny_dataset, tmp_path):
    """The real train CLI on a data=4 x model=2 mesh: TP state sharding is
    logged, training completes, artifacts land."""
    from leaffliction_tpu.cli import split as split_cli
    from leaffliction_tpu.cli import train as train_cli

    out = tmp_path / "datasets"
    models = tmp_path / "models"
    split_cli.main(["--src", str(tiny_dataset), "--out", str(out),
                    "--val-ratio", "0.25", "--seed", "32"])
    train_cli.main([
        "--manifest", str(out / "manifest_split.json"),
        "--epochs", "1", "--batch-size", "8", "--img-size", "32",
        "--scale", "tiny", "--fast", "--no-mixed-precision",
        "--mesh-data", "4", "--mesh-model", "2",
        "--out-dir", str(models),
    ])
    assert (models / "leaf_cnn.msgpack").exists()
