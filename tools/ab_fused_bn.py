"""A/B the lane-packed custom-VJP BatchNorm (`ops/fused_bn.py`) on the
live chip: production train step, leafcnn-base @224 b32 (the reference
default, `/root/reference/srcs/cli/train.py:66-68`) plus resnet18 b128.

Run twice — the flag is read at trace time:

    LEAF_FUSED_BN=0 python tools/ab_fused_bn.py   # flax-math baseline
    LEAF_FUSED_BN=1 python tools/ab_fused_bn.py   # fused (default)

Prints one JSON line: ms/step, img/s, MFU per config. Measurement
protocol is bench.py's: chain-16 steps, 3 async dispatches per sample,
one sync; FLOPs from XLA cost analysis of the un-chained step.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()  # remote compiles are 0.5s-7min uncached

    from leaffliction_tpu.models.leafcnn import build_leafcnn
    from leaffliction_tpu.models.resnet import build_resnet
    from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
    from leaffliction_tpu.train.config import TrainConfig
    from leaffliction_tpu.train.flops import (compiled_flops,
                                              device_peak_flops)
    from leaffliction_tpu.train.steps import (build_step_fns,
                                              create_train_state)

    IMG = 224
    peak = device_peak_flops()
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    cfg = TrainConfig.regularized()
    out = {"fused_bn": os.environ.get("LEAF_FUSED_BN", "1"),
           "backend": jax.default_backend()}

    configs = (
        ("leafcnn_b32",
         lambda **kw: build_leafcnn(num_classes=8, scale="base",
                                    dtype=jnp.bfloat16, **kw), 32, 16),
        ("resnet18_b128",
         lambda **kw: build_resnet(num_classes=8, preset="resnet18",
                                   dtype=jnp.bfloat16, **kw), 128, 16),
        ("resnet18_b32",
         lambda **kw: build_resnet(num_classes=8, preset="resnet18",
                                   dtype=jnp.bfloat16, **kw), 32, 16),
    )
    only = sys.argv[1] if len(sys.argv) > 1 else None
    for tag, make_model, batch, chain in configs:
        if only and only != tag:
            continue
        model = make_model()
        fns = build_step_fns(model, cfg, 8, total_steps=1000, mesh=mesh)
        state = create_train_state(model, cfg, img_size=IMG, seed=0)
        # useful-FLOPs cost model from the plain layout (bench.py rationale:
        # the folded layout's block-diagonal convs execute zero MACs that
        # cost_analysis counts as work)
        model_plain = make_model(lane_fold=False)
        flops_fns = build_step_fns(model_plain, cfg, 8,
                                   total_steps=1000, mesh=mesh)
        flops_state = create_train_state(model_plain, cfg,
                                         img_size=IMG, seed=0)

        @jax.jit
        def gen(chain=chain, batch=batch):
            n = chain * batch * IMG * IMG * 3
            imgs = (jnp.arange(n, dtype=jnp.int32) % 251).astype(
                jnp.uint8).reshape(chain, batch, IMG, IMG, 3)
            labels = (jnp.arange(chain * batch, dtype=jnp.int32) % 8
                      ).reshape(chain, batch)
            return imgs, labels, jnp.ones((chain, batch), jnp.float32)

        imgs, labels, mask = gen()
        key = jax.random.key(1)
        flops_step = compiled_flops(flops_fns.train_step, flops_state,
                                    imgs[0], labels[0], mask[0], key)
        state, metrics = fns.train_step_chain(state, imgs, labels, mask, key)
        assert np.isfinite(float(jnp.sum(metrics["loss"])))
        reps = 3
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                state, metrics = fns.train_step_chain(state, imgs, labels,
                                                      mask, key)
            assert np.isfinite(float(jnp.sum(metrics["loss"])))
            dts.append((time.perf_counter() - t0) / (reps * chain))
        d = sorted(dts)[len(dts) // 2]
        out[f"ms_per_step_{tag}"] = round(d * 1e3, 2)
        out[f"img_per_sec_{tag}"] = round(batch / d, 1)
        if flops_step and peak:
            out[f"mfu_pct_{tag}"] = round(100.0 * flops_step / (d * peak), 2)
        out[f"loss_{tag}"] = round(float(jnp.mean(metrics["loss"])), 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
