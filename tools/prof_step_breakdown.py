"""On-chip step decomposition + augment-canvas A/B (run on the real TPU).

Usage:
  python tools/prof_step_breakdown.py resnet18   # step A/B: aug on/off, canvas f32/bf16
  python tools/prof_step_breakdown.py b32        # leafcnn-base b32 xplane trace -> top ops
  python tools/prof_step_breakdown.py augab      # augment kernel alone: f32 vs bf16 canvas

Timing rules per docs/performance.md (relay): thread donated state through
reps, sync once per sample by fetching a scalar.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from leaffliction_tpu.models.leafcnn import build_leafcnn
from leaffliction_tpu.models.resnet import build_resnet
from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
from leaffliction_tpu.train.config import TrainConfig
from leaffliction_tpu.train.flops import compiled_flops, device_peak_flops
from leaffliction_tpu.train.steps import build_step_fns, create_train_state

IMG = 224
CHAIN = int(os.environ.get("AB_CHAIN", "4"))
REPS = int(os.environ.get("AB_STEP_REPS", "3"))


def gen(batch):
    @jax.jit
    def _g():
        n = CHAIN * batch * IMG * IMG * 3
        imgs = (jnp.arange(n, dtype=jnp.int32) % 251).astype(
            jnp.uint8).reshape(CHAIN, batch, IMG, IMG, 3)
        labels = (jnp.arange(CHAIN * batch, dtype=jnp.int32) % 8
                  ).reshape(CHAIN, batch)
        return imgs, labels, jnp.ones((CHAIN, batch), jnp.float32)

    return _g()


def time_step(make_model, batch, augment=True, samples=4):
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    cfg = TrainConfig.regularized()
    model = make_model()
    fns = build_step_fns(model, cfg, 8, total_steps=1000, mesh=mesh,
                         augment=augment)
    state = create_train_state(model, cfg, img_size=IMG, seed=0)
    imgs, labels, mask = gen(batch)
    key = jax.random.key(1)
    flops = compiled_flops(fns.train_step, state, imgs[0], labels[0],
                           mask[0], key)
    state, metrics = fns.train_step_chain(state, imgs, labels, mask, key)
    assert np.isfinite(float(jnp.sum(metrics["loss"])))
    best = 1e9
    for _ in range(samples):
        t0 = time.perf_counter()
        for _ in range(REPS):
            state, metrics = fns.train_step_chain(state, imgs, labels,
                                                  mask, key)
        assert np.isfinite(float(jnp.sum(metrics["loss"])))
        best = min(best, (time.perf_counter() - t0) / (REPS * CHAIN))
    peak = device_peak_flops()
    mfu = 100.0 * flops / (best * peak) if flops and peak else float("nan")
    return best * 1e3, mfu, (flops or 0) / 1e9


def main_resnet18():
    r18 = lambda: build_resnet(num_classes=8, preset="resnet18",  # noqa: E731
                               dtype=jnp.bfloat16)
    # NOTE: LEAF_AUG_CANVAS is trace-time — A/B-ing it inside one process
    # hits the jit cache and silently re-times the first variant. (bf16
    # canvases don't compile on current Mosaic anyway.)
    for label, aug in (("with augment", True), ("no augment", False)):
        ms, mfu, gf = time_step(r18, 128, augment=aug)
        print(f"resnet18 b128 {label}: {ms:.2f} ms/step  {mfu:.1f}% MFU"
              f"  ({gf:.0f} GF)", flush=True)


def main_b32():
    import glob

    lc = lambda: build_leafcnn(num_classes=8, scale="base",  # noqa: E731
                               dtype=jnp.bfloat16)
    ms, mfu, gf = time_step(lc, 32, samples=2)
    print(f"leafcnn b32 warm: {ms:.2f} ms/step {mfu:.1f}% MFU", flush=True)

    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    cfg = TrainConfig.regularized()
    model = lc()
    fns = build_step_fns(model, cfg, 8, total_steps=1000, mesh=mesh)
    state = create_train_state(model, cfg, img_size=IMG, seed=0)
    imgs, labels, mask = gen(32)
    key = jax.random.key(1)
    state, m = fns.train_step_chain(state, imgs, labels, mask, key)
    float(jnp.sum(m["loss"]))
    trace_dir = "/tmp/b32_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            state, m = fns.train_step_chain(state, imgs, labels, mask, key)
        float(jnp.sum(m["loss"]))
    print("trace:", glob.glob(trace_dir + "/**/*.xplane.pb",
                              recursive=True), flush=True)


def main_augab():
    """Augment kernel alone, f32 vs bf16 canvases. RTT amortization for
    terrible relay days: R rounds of CHAIN batches inside ONE scan (the
    chain output feeds the next round's key so nothing is DCE-able),
    REPS dispatches per sample, one scalar fetch."""
    from leaffliction_tpu.ops.train_augment import train_augment_u8

    rounds = int(os.environ.get("AB_ROUNDS", "64"))
    reps = int(os.environ.get("AB_REPS", "4"))
    imgs, _, _ = gen(128)

    def run(canvas):
        os.environ["LEAF_AUG_CANVAS"] = canvas

        @jax.jit
        def aug_rounds(seed, imgs):
            def body(c, i):
                x = train_augment_u8(
                    jax.random.fold_in(jax.random.key(c), i),
                    imgs[i % CHAIN], out_dtype=jnp.bfloat16)
                return c + jnp.sum(x[0, 0, 0, :2].astype(jnp.int32)), None
            c, _ = jax.lax.scan(body, seed, jnp.arange(rounds))
            return c

        c = aug_rounds(jnp.int32(0), imgs)
        assert np.isfinite(float(c))   # scalar fetch: the only honest sync
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(reps):
                c = aug_rounds(c, imgs)
            assert np.isfinite(float(c))
            best = min(best, (time.perf_counter() - t0) / (reps * rounds))
        print(f"augment b128 canvas={canvas}: {best*1e3:.2f} ms/batch"
              f"  ({reps}x{rounds} batches/sample)", flush=True)

    run("f32")
    run("bf16")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "resnet18"
    {"resnet18": main_resnet18, "b32": main_b32,
     "augab": main_augab}[mode]()
