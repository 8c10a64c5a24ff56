"""`.keras` export/import parity (`train/keras_export.py`).

The reference ships `leaf_cnn.keras` (`srcs/train/utils.py:95-97`); these
tests pin that our exported file predicts identically to the Flax model
under Keras itself, and that importing a Keras file — including one built
by the REFERENCE's own `build_leafcnn` — reproduces the same probabilities
in Flax. Skipped when the keras package is unavailable.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaffliction_tpu.models.leafcnn import build_leafcnn, init_model
from leaffliction_tpu.train.keras_export import (
    export_keras,
    import_keras,
    keras_available,
)

pytestmark = pytest.mark.skipif(not keras_available(),
                                reason="keras not importable")


def _randomized_variables(model, img_size: int, seed: int = 0):
    """Init variables, then give every leaf a distinct non-trivial value so
    a mis-mapped weight cannot cancel out (fresh BN stats are 0/1 and would
    mask swaps)."""
    params, batch_stats, norm_stats = init_model(model, img_size, seed)
    rng = np.random.default_rng(seed + 1)

    def jitter(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = [jnp.asarray(rng.normal(0.1, 0.5, leaf.shape), jnp.float32)
               for leaf in leaves]
        return jax.tree_util.tree_unflatten(treedef, out)

    # variances must stay positive
    def fix_vars(tree):
        if isinstance(tree, dict):
            return {k: (jnp.abs(v) + 0.1 if k == "var" else fix_vars(v))
                    for k, v in tree.items()}
        return tree

    variables = {
        "params": jitter(params),
        "batch_stats": fix_vars(jitter(batch_stats)),
        "norm_stats": {
            "mean": jnp.asarray(rng.normal(0.4, 0.1, (3,)), jnp.float32),
            "var": jnp.asarray(np.abs(rng.normal(0.05, 0.02, (3,)))
                               + 0.01, jnp.float32),
        },
    }
    return variables


def _flax_probs(model, variables, x):
    logits = model.apply(variables, jnp.asarray(x), train=False)
    return np.asarray(jax.nn.softmax(logits, axis=-1))


@pytest.mark.parametrize("separable,stem", [(False, "conv"), (True, "conv"),
                                            (False, "s2d")])
def test_export_matches_flax_and_roundtrips(tmp_path, separable, stem):
    img = 32
    model = build_leafcnn(num_classes=5, scale="tiny", separable=separable,
                          stem=stem)
    variables = _randomized_variables(model, img)
    x = np.random.default_rng(3).uniform(0, 1, (4, img, img, 3)).astype(
        np.float32)
    want = _flax_probs(model, variables, x)

    path = export_keras(model, variables, img, tmp_path / "leaf_cnn.keras")

    import keras

    kmodel = keras.models.load_model(path, compile=False)
    got = np.asarray(kmodel.predict(x, verbose=0))
    np.testing.assert_allclose(got, want, atol=2e-5)

    # round-trip back into Flax: identical architecture + probabilities
    imported, ivars = import_keras(path)
    assert imported.widths == model.widths
    assert imported.separable == model.separable
    assert imported.use_se == model.use_se
    assert imported.stem == model.stem
    assert imported.num_classes == model.num_classes
    back = _flax_probs(imported, ivars, x)
    np.testing.assert_allclose(back, want, atol=1e-6)


def test_model_loader_reads_keras_artifact_dirs(tmp_path):
    """An artifact dir whose meta.json `model_file` is a `.keras` (the
    reference's own layout, `srcs/train/utils.py:95-130`) loads through
    ModelLoader with identical probabilities."""
    import json

    from leaffliction_tpu.predict.model_loader import ModelLoader

    img = 32
    model = build_leafcnn(num_classes=3, scale="tiny")
    variables = _randomized_variables(model, img)
    x = np.random.default_rng(9).uniform(0, 1, (2, img, img, 3)).astype(
        np.float32)
    want = _flax_probs(model, variables, x)

    kpath = export_keras(model, variables, img, tmp_path / "leaf_cnn.keras")
    (tmp_path / "meta.json").write_text(json.dumps({
        "model_file": str(kpath),
        "labels": ["a", "b", "c"],
        "data": {"img_size": img, "num_classes": 3},
        "training": {"mixed_precision": False},
    }))

    loader = ModelLoader(tmp_path).load()
    assert loader.num_classes == 3 and loader.img_size == img
    got = _flax_probs(loader.model, loader.variables, x)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_import_of_reference_built_keras_model(tmp_path):
    """Build a model with the REFERENCE's own `srcs/model/cnn.py` (imported
    from /root/reference, not copied), adapt its Normalization, save it the
    reference way, and check our importer reproduces Keras's probabilities
    exactly — the drop-in path for users with existing trained models."""
    sys.path.insert(0, "/root/reference")
    try:
        from srcs.model.cnn import build_leafcnn as ref_build
    except Exception as exc:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference model not importable: {exc}")
    finally:
        sys.path.remove("/root/reference")

    img = 32
    ref_model, norm_layer = ref_build(num_classes=4, img_size=img,
                                      widths=[16, 32], separable=False)
    rng = np.random.default_rng(5)
    sample = rng.uniform(0, 1, (64, img, img, 3)).astype(np.float32)
    norm_layer.adapt(sample)
    path = tmp_path / "leaf_cnn.keras"
    ref_model.save(path)

    x = rng.uniform(0, 1, (4, img, img, 3)).astype(np.float32)
    want = np.asarray(ref_model.predict(x, verbose=0))

    imported, ivars = import_keras(path)
    assert imported.widths == (16, 32)
    got = _flax_probs(imported, ivars, x)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_model_file_resolution_prefers_learnings_dir(tmp_path, monkeypatch):
    """A relative `model_file` in meta.json must resolve against the
    learnings dir, not the caller's cwd: a same-named artifact under cwd
    (here a DIFFERENT model at artifacts/models/leaf_cnn.keras) must not
    shadow the directory the user pointed -learnings at. Regression: the
    predict CLI run from a training workspace silently served the
    workspace's own model instead of the reference-trained one."""
    import json

    from leaffliction_tpu.predict.model_loader import ModelLoader

    img = 32
    x = np.random.default_rng(9).uniform(0, 1, (2, img, img, 3)).astype(
        np.float32)

    def make_dir(root, seed):
        model = build_leafcnn(num_classes=3, scale="tiny")
        variables = _randomized_variables(model, img, seed=seed)
        root.mkdir(parents=True, exist_ok=True)
        export_keras(model, variables, img, root / "leaf_cnn.keras")
        (root / "meta.json").write_text(json.dumps({
            "model_file": "artifacts/models/leaf_cnn.keras",  # relative
            "labels": ["a", "b", "c"],
            "data": {"img_size": img, "num_classes": 3},
            "training": {"mixed_precision": False},
        }))
        return _flax_probs(model, variables, x)

    make_dir(tmp_path / "cwd" / "artifacts" / "models", seed=1)  # decoy
    want = make_dir(tmp_path / "learnings", seed=2)

    monkeypatch.chdir(tmp_path / "cwd")
    loader = ModelLoader(tmp_path / "learnings").load()
    got = _flax_probs(loader.model, loader.variables, x)
    np.testing.assert_allclose(got, want, atol=1e-6)
