"""A/B: production train step with LEAF_PALLAS_TRAIN_AUG=plane vs nhwc."""
import os
import sys
import time

import numpy as np

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

mode = sys.argv[1] if len(sys.argv) > 1 else "plane"
os.environ["LEAF_PALLAS_TRAIN_AUG"] = mode

import jax
import jax.numpy as jnp

from leaffliction_tpu.core.cache import enable_compilation_cache
from leaffliction_tpu.models.leafcnn import build_leafcnn
from leaffliction_tpu.models.resnet import build_resnet
from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
from leaffliction_tpu.train.config import TrainConfig
from leaffliction_tpu.train.steps import build_step_fns, create_train_state

enable_compilation_cache()
IMG = 224
mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
cfg = TrainConfig.regularized()

configs = (
    ("resnet18_b128",
     lambda: build_resnet(num_classes=8, preset="resnet18",
                          dtype=jnp.bfloat16), 128, 4),
    ("leafcnn_b128",
     lambda: build_leafcnn(num_classes=8, scale="base",
                           dtype=jnp.bfloat16), 128, 4),
    ("leafcnn_b32",
     lambda: build_leafcnn(num_classes=8, scale="base",
                           dtype=jnp.bfloat16), 32, 8),
)
for tag, make_model, batch, chain in configs:
    model = make_model()
    fns = build_step_fns(model, cfg, 8, total_steps=1000, mesh=mesh)
    state = create_train_state(model, cfg, img_size=IMG, seed=0)

    @jax.jit
    def gen_batches(chain=chain, batch=batch):
        n = chain * batch * IMG * IMG * 3
        imgs = (jnp.arange(n, dtype=jnp.int32) % 251).astype(
            jnp.uint8).reshape(chain, batch, IMG, IMG, 3)
        labels = (jnp.arange(chain * batch, dtype=jnp.int32) % 8
                  ).reshape(chain, batch)
        return imgs, labels, jnp.ones((chain, batch), jnp.float32)

    imgs, labels, mask = gen_batches()
    key = jax.random.key(1)
    state, metrics = fns.train_step_chain(state, imgs, labels, mask, key)
    assert np.isfinite(float(jnp.sum(metrics["loss"])))
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(3):
            state, metrics = fns.train_step_chain(state, imgs, labels,
                                                  mask, key)
        assert np.isfinite(float(jnp.sum(metrics["loss"])))
        best = min(best, (time.perf_counter() - t0) / (3 * chain))
    print(f"{mode} {tag}: {best*1e3:.2f} ms/step ({batch/best:.0f} img/s)",
          flush=True)
