"""Data-parallel serving: sharding the serving batch over a mesh is layout,
not math — probabilities must match the single-device path bit-for-bit-ish.

The reference serves on whatever single device Keras picks
(`/root/reference/srcs/predict/predictor.py:82-147`); multi-chip serving is
a TPU-native addition (`predict.predictor._build_infer`).
"""

import numpy as np

import jax

from leaffliction_tpu.models.leafcnn import build_leafcnn
from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
from leaffliction_tpu.predict.predictor import Predictor

IMG = 16
CLASSES = 4
LABELS = [f"Plant__c{i}" for i in range(CLASSES)]


def _model_and_vars():
    model = build_leafcnn(num_classes=CLASSES, scale="tiny")
    variables = model.init(
        jax.random.key(0), np.zeros((1, IMG, IMG, 3), np.float32),
        train=False)
    return model, variables


def test_mesh_serving_matches_single_device():
    model, variables = _model_and_vars()
    rng = np.random.default_rng(3)
    # 70 images: crosses one SERVING_BATCH boundary, exercises the pad path
    images = rng.integers(0, 255, (70, IMG, IMG, 3), np.uint8)

    single = Predictor.from_model(model, variables, LABELS, IMG)
    mesh = make_mesh(MeshSpec(data=8, model=1))
    sharded = Predictor.from_model(model, variables, LABELS, IMG, mesh=mesh)

    p_single = single._probs_for_arrays(images)
    p_mesh = sharded._probs_for_arrays(images)
    assert p_mesh.shape == (70, CLASSES)
    np.testing.assert_allclose(p_mesh, p_single, rtol=1e-5, atol=1e-6)


def test_mesh_serving_output_sharded_over_data():
    model, variables = _model_and_vars()
    mesh = make_mesh(MeshSpec(data=8, model=1))
    pred = Predictor.from_model(model, variables, LABELS, IMG, mesh=mesh)
    out = pred._infer(np.zeros((64, IMG, IMG, 3), np.uint8))
    # the forward really ran sharded: 8 single-device shards, 8 rows each
    assert len(out.sharding.device_set) == 8
    assert out.addressable_shards[0].data.shape[0] == 64 // 8
