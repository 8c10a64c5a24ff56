"""Benchmark: augmented images/sec/chip at 224px (BASELINE.json north-star).

Honest numbers, most important first:

1. **Kernel throughput** (the headline `value`): the fused on-device
   augmentation kernels (all six ops per round), device-resident loop —
   what the chip can do when fed. Compared against the single-core PIL
   per-image pipeline (reference op semantics).
2. **End-to-end pipeline** (`e2e_img_per_sec` vs
   `ref_pipeline_img_per_sec`): raw unbalanced tree → balanced dataset
   resident in device HBM, ready to train — the reference's own
   balance→split→train workflow end state. Fused path (`--balance-from`):
   decode originals once → upload once → augment on device, zero pixel
   downloads. Reference-style path: ProcessPool PIL balancer at the
   reference's own worker fan-out
   (`srcs/preprocessing/dataset_balancer.py:137-162`) + decode the
   balanced tree + upload. `e2e_vs_pool_baseline` is their ratio.
3. **JPEG-materializing balancer** (`e2e_jpeg_img_per_sec`): the classic
   `leaffliction-augment <dir>` path that downloads every augmented image
   and encodes JPEGs — relay-transfer-bound on this host; tracked so any
   regression is visible.
4. **Train MFU** (`train_mfu_pct`, `mfu_pct_*`): measured FLOPs (XLA cost
   analysis of the compiled step) / (step time · bf16 peak) for
   leafcnn-base @ b32/b128 and resnet18 @ b128, all 224px bf16.

Measurement design for a tunneled TPU: host↔device I/O rides a relay
(~3-70 MB/s, ~140 ms sync RTT), so the kernel loop runs entirely on device —
the batch is generated on device, R rounds of all six ops run inside one
jitted `lax.scan`, and only a float32 checksum crosses back. The e2e numbers
include all relay transfer costs (a real TPU host's PCIe is >100x faster).

Every headline runs N_RUNS times and is quoted as the MEDIAN, with `_min`/
`_max` spread keys beside it; a `bandwidth_*`/`link_rtt_ms` block (direct
device_put/device_get probe) and per-phase `*_bytes_*` keys record what the
relay was doing, so a bad driver day is visible in the JSON itself rather
than masquerading as a regression.

Output contract (round-5 fix — the round-4 all-keys line outgrew the
driver's ~2 KB tail capture and the authoritative record lost the headline):
the FULL result dict is written to `bench_results.json` beside this script
and echoed to stderr; stdout carries exactly ONE compact (<1.5 KB) JSON line
holding the headline keys the driver must record — metric/value(+spread),
vs_baseline, e2e ratio, serving e2e + stage rates, MFU set, north-star
walls, link probes. `_COMPACT_KEYS` is the curated list.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import numpy as np

IMG = 224
DEVICE_BATCH = 128
ROUNDS = 20         # scan length; 20 * 6 ops * 128 imgs = 15,360 images/call
PIL_SAMPLES = 36    # PIL baseline images (slow; measured then extrapolated)
E2E_CLASS_IMGS = (260, 60)  # synthetic tree: big class vs small class
#                             → 200 generated images (amortizes fixed costs)
E2E_POOL_TASKS = 48         # tasks for the process-pool PIL baseline
N_RUNS = 3          # samples per benchmark → med/min/max spread keys
_DEGRADED = False   # set after the bandwidth probe on slow-link days


# Keys the driver's record must contain, in priority order: if the line
# somehow exceeds the budget, keys are dropped from the END of this list
# (the metric/value headline always survives). Everything else still lands
# in bench_results.json + stderr.
_COMPACT_KEYS = (
    "metric", "value", "value_min", "value_max", "unit", "vs_baseline",
    "e2e_img_per_sec", "e2e_vs_pool_baseline",
    "serving_img_per_sec", "serving_img_per_sec_min", "serving_img_per_sec_max",
    "serving_decode_img_per_sec", "serving_upload_img_per_sec",
    "serving_infer_img_per_sec",
    "mfu_pct_resnet18_b128", "mfu_pct_resnet18_s2d_b128",
    "mfu_pct_resnet18_b32",
    "mfu_pct_leafcnn_b32", "mfu_pct_leafcnn_s2d_b32", "mfu_pct_leafcnn_b128",
    "north_star_train_s_b32", "north_star_train_s_b128", "north_star_e2e_s",
    "bandwidth_h2d_mbps", "bandwidth_d2h_mbps", "link_rtt_ms",
    "ref_pipeline_img_per_sec", "e2e_jpeg_img_per_sec",
    "ms_per_step_leafcnn_b32", "ms_per_step_resnet18_b128",
    "degraded_link",
)
_COMPACT_BUDGET = 1500  # bytes; driver tail capture is ~2 KB


def emit_final(result: dict) -> None:
    """The ONE stdout line + the full record. Full dict → bench_results.json
    (beside this script) and stderr; stdout gets only the compact headline
    line, trimmed to `_COMPACT_BUDGET` so the driver's tail window always
    holds a complete, parseable JSON object."""
    import os

    full = json.dumps(result)
    try:
        out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "bench_results.json")
        with open(out_path, "w") as f:
            f.write(full + "\n")
    except OSError as exc:
        result = {**result, "full_results_error": str(exc)[:80]}
    print(full, file=sys.stderr, flush=True)
    compact = {k: result[k] for k in _COMPACT_KEYS if k in result}
    # error keys are rare but must reach the driver record when present
    for k, v in result.items():
        if "error" in k:
            compact[k] = v
    compact["full_results"] = "bench_results.json"
    line = json.dumps(compact)
    while len(line) > _COMPACT_BUDGET and len(compact) > 4:
        for k in reversed(list(compact)):
            if k not in ("metric", "value", "unit", "vs_baseline"):
                del compact[k]
                break
        line = json.dumps(compact)
    print(line)
    sys.stdout.flush()


def _n_runs() -> int:
    """Samples for LINK-BOUND phases: 1 when the probe saw a degraded link
    (<5 MB/s d2h) so the compute-bound sections (MFU) still fit inside the
    watchdog budget; device-resident phases always take N_RUNS."""
    return 1 if _DEGRADED else N_RUNS


def spread(key: str, samples, nd: int = 1) -> dict:
    """→ {key: median, key_min, key_max} — every headline ships its spread
    so a driver-day number can be told apart from relay weather (the tunnel
    bandwidth swings 3-70 MB/s run to run)."""
    vals = [float(v) for v in samples if np.isfinite(v)]
    if not vals:
        return {key: 0.0}
    out = {key: round(statistics.median(vals), nd)}
    if len(vals) > 1:
        out[f"{key}_min"] = round(min(vals), nd)
        out[f"{key}_max"] = round(max(vals), nd)
    return out


def bench_bandwidth(samples: int = 3, mb: int = 8) -> dict:
    """Direct host↔device link probe: device_put / device_get of an `mb` MB
    buffer plus a tiny scalar round-trip, each `samples` times → achieved
    MB/s and sync RTT with spread. Run before the phases so every BENCH
    JSON records what the relay was doing that day."""
    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(0).integers(
        0, 255, (mb * 1024 * 1024,), np.uint8)
    h2d, d2h, rtts = [], [], []
    # warm the dispatch path once
    _ = float(jnp.sum(jax.device_put(buf[:1024]).astype(jnp.int32)))
    for _ in range(samples):
        t0 = time.perf_counter()
        dev = jax.device_put(buf)
        # sync via a scalar fetch (block_until_ready lies on the relay)
        assert int(jnp.sum(dev[:16].astype(jnp.int32))) >= 0
        h2d.append(mb / (time.perf_counter() - t0))
        t0 = time.perf_counter()
        host = jax.device_get(dev)
        d2h.append(mb / (time.perf_counter() - t0))
        assert host.shape == buf.shape
        t0 = time.perf_counter()
        assert np.isfinite(float(jnp.sum(jnp.ones((8, 8)))))
        rtts.append((time.perf_counter() - t0) * 1e3)
    return {**spread("bandwidth_h2d_mbps", h2d),
            **spread("bandwidth_d2h_mbps", d2h),
            **spread("link_rtt_ms", rtts)}


def bench_device() -> float:
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.core.cache import enable_compilation_cache
    from leaffliction_tpu.ops.augment import (
        crop_batch,
        distortion_batch,
        flip_batch,
        rotate_batch,
        shear_batch,
        skew_batch,
    )

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    base = np.stack([xx % 251, yy % 241, (xx + yy) % 253], -1)
    images = (base[None] + rng.normal(0, 8, (DEVICE_BATCH, IMG, IMG, 3))
              ).clip(0, 255).astype(np.uint8)

    @jax.jit
    def fused_rounds(imgs, seed):
        """R rounds × 6 ops inside ONE program (lax.scan) → one dispatch,
        one scalar out. Relay RTT is paid once, not per kernel call.

        Each op's output feeds the next op (rotate's expanded canvas is
        center-cropped back to IMG²), so every kernel's full output is
        data-consumed — nothing for XLA to dead-code-eliminate — while the
        checksum is paid once per call, not per op. (The previous
        per-op strided-slice checksums cost ~3 ms each on the relay chip,
        half the reported per-op time.)"""
        base_key = jax.random.wrap_key_data(seed)

        def round_fn(x, i):
            keys = jax.random.split(jax.random.fold_in(base_key, i),
                                    DEVICE_BATCH)
            x = flip_batch(keys, x)
            x = skew_batch(keys, x)
            x = shear_batch(keys, x)
            x = crop_batch(keys, x)
            x = distortion_batch(keys, x)
            rot = rotate_batch(keys, x)[0]
            oy = (rot.shape[1] - IMG) // 2
            ox = (rot.shape[2] - IMG) // 2
            return rot[:, oy:oy + IMG, ox:ox + IMG, :], None

        out, _ = jax.lax.scan(round_fn, imgs, jnp.arange(ROUNDS))
        return jnp.sum(out.astype(jnp.float32))

    imgs_dev = jax.device_put(images)
    seed = jax.random.key_data(jax.random.key(42))
    # warmup/compile (persistently cached). Sync via scalar device_get —
    # block_until_ready is unreliable on the relay platform. N samples →
    # med/min/max: the median is the headline (reproducible on a bad relay
    # day); the max shows the kernel's ceiling when the link cooperates.
    assert np.isfinite(float(fused_rounds(imgs_dev, seed)))
    samples = []
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        assert np.isfinite(float(fused_rounds(imgs_dev, seed)))
        dt = time.perf_counter() - t0
        samples.append((ROUNDS * 6 * DEVICE_BATCH) / dt)
    return samples


def bench_pil_baseline() -> float:
    """Reference-equivalent per-image PIL pipeline (transform cost only)."""
    import random

    from PIL import Image, ImageOps

    rng = random.Random(0)
    rng_np = np.random.default_rng(0)
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    base = np.stack([xx % 251, yy % 241, (xx + yy) % 253], -1)
    images = (base[None] + rng_np.normal(0, 8, (PIL_SAMPLES, IMG, IMG, 3))
              ).clip(0, 255).astype(np.uint8)
    pils = [Image.fromarray(a) for a in images]
    ops_done = 0
    t0 = time.perf_counter()
    for img in pils:
        w, h = img.size
        img.transpose(Image.FLIP_LEFT_RIGHT)
        img.rotate(rng.uniform(-30, 30), expand=True, fillcolor="white")
        s = rng.uniform(0.05, 0.15)
        img.transform((w, h), Image.PERSPECTIVE,
                      [1 + s, 0, -s * w, 0, 1 + s, -s * h, 0, 0],
                      Image.BICUBIC)
        sh = rng.uniform(-0.2, 0.2)
        img.transform((w, h), Image.AFFINE, [1, sh, 0, 0, 1, 0], Image.BICUBIC)
        ratio = rng.uniform(0.8, 0.95)
        nw, nh = int(w * ratio), int(h * ratio)
        left = rng.randint(0, w - nw)
        top = rng.randint(0, h - nh)
        img.crop((left, top, left + nw, top + nh)).resize((w, h), Image.LANCZOS)
        arr = np.asarray(img)
        noise = np.random.normal(0, 5, arr.shape).astype(np.uint8)
        noisy = np.clip(arr + noise, 0, 255).astype(np.uint8)
        ImageOps.autocontrast(Image.fromarray(noisy),
                              cutoff=rng.uniform(0, 2))
        ops_done += 6
    dt = time.perf_counter() - t0
    return ops_done / dt


def _make_synthetic_tree(root, rng) -> int:
    """Unbalanced PLANT/CLASS tree → number of augmentations the plan will
    generate (big-class count − small-class count)."""
    from PIL import Image

    big, small = E2E_CLASS_IMGS
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    base = np.stack([xx % 251, yy % 241, (xx + yy) % 253], -1)
    for cls, n in (("healthy", big), ("rust", small)):
        d = root / "Apple" / cls
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            arr = (base + rng.normal(0, 8, (IMG, IMG, 3))).clip(0, 255)
            Image.fromarray(arr.astype(np.uint8)).save(
                d / f"img{i}.jpg", quality=95)
    return big - small


def bench_e2e_balancer() -> list:
    """Real balancer end-to-end (decode → device → encode, incl. manifest):
    generated images/sec, one sample per run."""
    import shutil
    import tempfile
    from pathlib import Path

    from leaffliction_tpu.data.balancer import DatasetBalancer

    tmp = Path(tempfile.mkdtemp(prefix="bench-e2e-"))
    try:
        rng = np.random.default_rng(7)
        n_gen = _make_synthetic_tree(tmp / "src", rng)
        samples = []
        for run in range(_n_runs()):
            shutil.rmtree(tmp / "out", ignore_errors=True)
            bal = DatasetBalancer(source_dir=tmp / "src",
                                  target_dir=tmp / "out", seed=42,
                                  manifest_out_dir=tmp / "datasets")
            t0 = time.perf_counter()
            bal.run()
            dt = time.perf_counter() - t0
            samples.append(n_gen / dt)
        return samples
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _pil_pool_task(args) -> float:
    """One reference-style task: JPEG decode → one PIL op → JPEG encode q95.
    Mirrors `_process_single_transformation` work per task."""
    import random

    from PIL import Image, ImageOps

    src, dst, transform, seed = args
    rng = random.Random(seed)
    with Image.open(src) as im:
        img = im.convert("RGB")
    w, h = img.size
    if transform == "flip":
        img = img.transpose(Image.FLIP_LEFT_RIGHT if rng.random() < 0.5
                            else Image.FLIP_TOP_BOTTOM)
    elif transform == "rotate":
        img = img.rotate(rng.uniform(-30, 30), expand=True, fillcolor="white")
    elif transform == "skew":
        s = rng.uniform(0.05, 0.15)
        img = img.transform((w, h), Image.PERSPECTIVE,
                            [1 + s, 0, -s * w, 0, 1 + s, -s * h, 0, 0],
                            Image.BICUBIC)
    elif transform == "shear":
        img = img.transform((w, h), Image.AFFINE,
                            [1, rng.uniform(-0.2, 0.2), 0, 0, 1, 0],
                            Image.BICUBIC)
    elif transform == "crop":
        ratio = rng.uniform(0.8, 0.95)
        nw, nh = int(w * ratio), int(h * ratio)
        left, top = rng.randint(0, w - nw), rng.randint(0, h - nh)
        img = img.crop((left, top, left + nw, top + nh)).resize(
            (w, h), Image.LANCZOS)
    else:  # distortion
        arr = np.asarray(img)
        noisy = np.clip(arr + np.random.default_rng(seed).normal(0, 5, arr.shape),
                        0, 255).astype(np.uint8)
        img = ImageOps.autocontrast(Image.fromarray(noisy),
                                    cutoff=rng.uniform(0, 2))
    img.save(dst, quality=95)
    return 1.0


def bench_pil_pool_baseline() -> tuple[float, int]:
    """Reference fan-out: ProcessPool of PIL tasks at the reference's own
    worker heuristic → (tasks/sec, workers)."""
    import concurrent.futures as cf
    import shutil
    import tempfile
    from pathlib import Path

    from leaffliction_tpu.core.sysinfo import get_optimal_worker_count

    workers = get_optimal_worker_count()
    tmp = Path(tempfile.mkdtemp(prefix="bench-pool-"))
    try:
        rng = np.random.default_rng(7)
        _make_synthetic_tree(tmp / "src", rng)
        srcs = sorted((tmp / "src" / "Apple" / "rust").glob("*.jpg"))
        transforms = ("flip", "rotate", "skew", "shear", "crop", "distortion")
        tasks = [
            (str(srcs[i % len(srcs)]),
             str(tmp / f"out{i}.jpg"),
             transforms[i % 6], i)
            for i in range(E2E_POOL_TASKS)
        ]
        import multiprocessing as mp

        # spawn: forking after JAX initialized its thread pools can deadlock
        with cf.ProcessPoolExecutor(
                max_workers=workers,
                mp_context=mp.get_context("spawn")) as pool:
            # warm the workers first so spawn startup doesn't punish the
            # baseline (the reference's long-lived pool pays it once)
            list(pool.map(_pil_pool_task, tasks[:workers]))
            t0 = time.perf_counter()
            list(pool.map(_pil_pool_task, tasks))
            dt = time.perf_counter() - t0
        return len(tasks) / dt, workers
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_train_mfu() -> dict:
    """Measured MFU + throughput of the jitted train step (bf16, 224px).

    FLOPs come from XLA's compiled-step cost analysis (optimized HLO); time
    from chained steps with device-generated batches (zero host→device pixel
    traffic) synced by a scalar fetch. MFU = flops/step / (t_step · peak).
    Configs: leafcnn-base @ the reference's default b32, leafcnn-base @ b128
    (throughput mode), resnet18 @ b128 (BASELINE config 4 shape).
    """
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return {}

    from leaffliction_tpu.models.leafcnn import build_leafcnn
    from leaffliction_tpu.models.resnet import build_resnet
    from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
    from leaffliction_tpu.train.config import TrainConfig
    from leaffliction_tpu.train.flops import compiled_flops, device_peak_flops
    from leaffliction_tpu.train.steps import build_step_fns, create_train_state

    peak = device_peak_flops()
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    cfg = TrainConfig.regularized()
    out: dict = {}

    # chain=16 everywhere: per-dispatch client overhead on the relay is
    # 30-140+ ms, so shallow chains inflate ms/step (chain-4 measured
    # resnet18 at 18.7 ms/step where chain-16 measures 16.6 — the
    # difference is dispatch time, not model compute). 16 batches of
    # uint8 pixels per config stay ~100-310 MB in HBM.
    configs = (
        ("leafcnn_b32",
         lambda **kw: build_leafcnn(num_classes=8, scale="base",
                                    dtype=jnp.bfloat16, **kw), 32, 16),
        ("leafcnn_b128",
         lambda **kw: build_leafcnn(num_classes=8, scale="base",
                                    dtype=jnp.bfloat16, **kw), 128, 16),
        ("resnet18_b128",
         lambda **kw: build_resnet(num_classes=8, preset="resnet18",
                                   dtype=jnp.bfloat16, **kw), 128, 16),
        ("resnet18_s2d_b128",
         lambda **kw: build_resnet(num_classes=8, preset="resnet18",
                                   stem="s2d", dtype=jnp.bfloat16,
                                   **kw), 128, 16),
        # engineering datapoint for the b32 wall (72% of the b32 step is
        # stage-1 work at 224² — xplane breakdown in docs/performance.md):
        # the opt-in s2d stem (--stem s2d) quarters stage-1 area
        ("leafcnn_s2d_b32",
         lambda **kw: build_leafcnn(num_classes=8, scale="base", stem="s2d",
                                    dtype=jnp.bfloat16, **kw), 32, 16),
        # deep backbone at the reference-default batch: the lane fold's
        # G=2 stem/stage-1 win (docs/performance.md "The direct fix")
        ("resnet18_b32",
         lambda **kw: build_resnet(num_classes=8, preset="resnet18",
                                   dtype=jnp.bfloat16, **kw), 32, 16),
    )
    for tag, make_model, batch, chain in configs:
        try:
            model = make_model()
            fns = build_step_fns(model, cfg, 8, total_steps=1000, mesh=mesh)
            state = create_train_state(model, cfg, img_size=IMG, seed=0)
            # MFU counts USEFUL model FLOPs: the lane-folded layout's
            # block-diagonal convs execute 4x zero MACs that XLA's cost
            # analysis counts as work, so the cost model is traced from
            # the plain (lane_fold=False) layout — identical math — while
            # the TIMED step is the production (folded) one.
            model_plain = make_model(lane_fold=False)
            flops_fns = build_step_fns(model_plain, cfg, 8,
                                       total_steps=1000, mesh=mesh)
            flops_state = create_train_state(model_plain, cfg,
                                             img_size=IMG, seed=0)

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
            # FLOPs from the SINGLE step: HLO cost analysis counts a scan
            # body once regardless of trip count (verified: chain(K) and
            # single-step programs report identical flops), so the chained
            # program's count IS the per-step count — but take it from the
            # un-chained step to make that invariant explicit.
            flops_step = compiled_flops(flops_fns.train_step, flops_state,
                                        imgs[0], labels[0], mask[0], key)
            # warm (compile is persistently cached across rounds)
            state, metrics = fns.train_step_chain(state, imgs, labels, mask,
                                                  key)
            assert np.isfinite(float(jnp.sum(metrics["loss"])))
            reps = 3  # async dispatches per sample, ONE sync at the end —
            #           amortizes the ~140 ms relay fetch RTT over reps*chain
            #           steps instead of paying it per dispatch
            dts = []
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                for _ in range(reps):
                    state, metrics = fns.train_step_chain(state, imgs,
                                                          labels, mask, key)
                assert np.isfinite(float(jnp.sum(metrics["loss"])))  # sync
                dts.append((time.perf_counter() - t0) / (reps * chain))
            out.update(spread(f"ms_per_step_{tag}",
                              [d * 1e3 for d in dts], nd=2))
            out.update(spread(f"img_per_sec_{tag}", [batch / d for d in dts]))
            if flops_step and peak:
                out[f"gflops_per_step_{tag}"] = round(flops_step / 1e9, 1)
                out.update(spread(
                    f"mfu_pct_{tag}",
                    [100.0 * flops_step / (d * peak) for d in dts]))
        except Exception as exc:  # relay hiccups must not sink the bench
            out[f"error_{tag}"] = str(exc)[:120]
    if "mfu_pct_resnet18_b128" in out:
        out["train_mfu_pct"] = out["mfu_pct_resnet18_b128"]
        out["train_img_per_sec"] = out["img_per_sec_resnet18_b128"]
    return out


def bench_north_star_train() -> dict:
    """North-star TRAIN-side wall time, device-resident (link-independent).

    leafcnn-base @224 bf16, 20 epochs incl. per-epoch whole-val-set eval
    over a balanced 8-class 2080-image dataset born in device HBM (the
    fused `--balance-from` end state), driven by the PRODUCTION `fit()`
    loop (gather steps, chained dispatch, EMA, plateau logic) — at the
    reference-default b32 and at b128, the documented throughput recipe
    (which needs sqrt-scaled lr + an update-matched epoch budget to hold
    accuracy: tools/parity_b128.py table in docs/performance.md).
    Compiles are warmed by a 1-epoch run first so
    the number is steady-state train wall, not compile weather.
    """
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return {}

    from leaffliction_tpu.data.loader import BatchIterator, DeviceImageStore
    from leaffliction_tpu.models.leafcnn import build_leafcnn
    from leaffliction_tpu.parallel.mesh import MeshSpec, make_mesh
    from leaffliction_tpu.train.config import TrainConfig
    from leaffliction_tpu.train.steps import build_step_fns, create_train_state
    from leaffliction_tpu.train.trainer import fit

    N_TRAIN, N_VAL, EPOCHS = 2080, 320, 20

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def gen(seed, n):
        key = jax.random.key(seed)
        labels = jnp.arange(n, dtype=jnp.int32) % 8
        yy = jax.lax.broadcasted_iota(jnp.float32, (IMG, IMG), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (IMG, IMG), 1)
        base = jnp.stack([xx % 251, yy % 241, (xx + yy) % 253], -1)
        shift = (labels % 8 * 13).astype(jnp.float32)[:, None, None, None]
        noise = jax.random.normal(key, (n, IMG, IMG, 3)) * 8.0
        imgs = jnp.clip(base[None] + shift + noise, 0, 255).astype(jnp.uint8)
        return imgs, labels

    out: dict = {}
    mesh = make_mesh(MeshSpec(data=1, model=1), devices=jax.devices()[:1])
    cfg = TrainConfig.regularized()
    train_dd = jax.block_until_ready(gen(0, N_TRAIN))
    val_dd = jax.block_until_ready(gen(1, N_VAL))
    train_store = DeviceImageStore(np.arange(N_TRAIN, dtype=np.int32) % 8,
                                   IMG)
    val_store = DeviceImageStore(np.arange(N_VAL, dtype=np.int32) % 8, IMG)

    for batch in (32, 128):
        try:
            model = build_leafcnn(num_classes=8, scale="base",
                                  dtype=jnp.bfloat16)
            train_iter = BatchIterator(train_store, batch, shuffle=True,
                                       seed=42)
            val_iter = BatchIterator(val_store, batch, shuffle=False)
            total = train_iter.steps_per_epoch() * EPOCHS
            fns = build_step_fns(model, cfg, 8, total_steps=total, mesh=mesh)
            # warm every program (train chains, remainder chain, eval chain)
            state = create_train_state(model, cfg, img_size=IMG, seed=0)
            fit(fns, state, train_iter, val_iter, cfg, epochs=1, seed=42,
                chain_steps=8, train_device_data=train_dd,
                val_device_data=val_dd)
            state = create_train_state(model, cfg, img_size=IMG, seed=0)
            t0 = time.perf_counter()
            res = fit(fns, state, train_iter, val_iter, cfg, epochs=EPOCHS,
                      seed=42, chain_steps=8, train_device_data=train_dd,
                      val_device_data=val_dd)
            wall = time.perf_counter() - t0
            out[f"north_star_train_s_b{batch}"] = round(wall, 1)
            out[f"north_star_img_per_sec_b{batch}"] = round(
                N_TRAIN * res.epochs_ran / wall, 1)
        except Exception as exc:
            out[f"error_north_star_b{batch}"] = str(exc)[:120]
    if "north_star_train_s_b32" in out and "north_star_train_s_b128" in out:
        out["north_star_b128_speedup"] = round(
            out["north_star_train_s_b32"] / out["north_star_train_s_b128"], 2)
        out["north_star_b128_note"] = (
            "b128 + sqrt-scaled lr at an update-matched epoch budget "
            "matches b32 val accuracy in 0.64x the wall; epoch-matched "
            "b128 undertrains, so b32 stays the default "
            "(tools/parity_b128.py; docs/performance.md parity table)")
    return out


def bench_north_star_e2e() -> dict:
    """The ONE-COMMAND north star, timed end-to-end (round-4 weak #6: the
    whole `--balance-from` command was last timed in round 3 at 221 s).

    Synthesizes the BASELINE north-star tree shape — an unbalanced 8-class
    tree, 1530 originals → 1760 after balancing, 256² natives (the
    reference dataset's native resolution) — then runs the real CLI
    in-process, once:

        leaffliction-train --balance-from <tree> --epochs 20
                           --img-size 224 --scale base

    The wall includes everything the user pays: decode, relay upload,
    on-device augmentation, split, 20 epochs with per-epoch eval, artifact
    writes, and the default-on `.keras` export. Single sample (it is a
    multi-minute phase); the link probe block beside it tells a slow-relay
    day from a code regression. Skipped when the probe saw a degraded link.
    """
    import os
    import shutil
    import tempfile
    from pathlib import Path

    import jax

    if jax.default_backend() != "tpu" or _DEGRADED:
        return {}

    from PIL import Image

    NATIVE = 256
    # 8 classes, sum 1530, max 220 → balanced 8*220 = 1760
    counts = (220, 200, 200, 195, 190, 185, 180, 160)
    tmp = Path(tempfile.mkdtemp(prefix="bench-ns-e2e-"))
    cwd = os.getcwd()
    try:
        rng = np.random.default_rng(5)
        yy, xx = np.mgrid[0:NATIVE, 0:NATIVE].astype(np.float32)
        base = np.stack([xx % 251, yy % 241, (xx + yy) % 253], -1)
        for plant, offset in (("Apple", 0), ("Grape", 4)):
            for ci in range(4):
                d = tmp / "tree" / plant / f"class{offset + ci}"
                d.mkdir(parents=True, exist_ok=True)
                shift = (offset + ci) * 13.0
                for i in range(counts[offset + ci]):
                    arr = (base + shift
                           + rng.normal(0, 8, (NATIVE, NATIVE, 3))
                           ).clip(0, 255)
                    Image.fromarray(arr.astype(np.uint8)).save(
                        d / f"img{i}.jpg", quality=95)

        from leaffliction_tpu.cli.train import main as train_main

        os.chdir(tmp)  # artifact writes (datasets/, plots/) stay in tmp
        t0 = time.perf_counter()
        train_main(["--balance-from", str(tmp / "tree"),
                    "--epochs", "20", "--img-size", str(IMG),
                    "--scale", "base", "--out-dir", str(tmp / "models")])
        wall = time.perf_counter() - t0
        if not (tmp / "models" / "leaf_cnn.msgpack").exists():
            return {"error_north_star_e2e": "train produced no model"}
        return {"north_star_e2e_s": round(wall, 1),
                "north_star_e2e_note":
                    "one command, unbalanced 1530-img 8-class 256px tree -> "
                    "balanced 1760 on device -> 20-epoch b32 train w/ "
                    "per-epoch eval + artifacts + .keras export"}
    except Exception as exc:
        return {"error_north_star_e2e": str(exc)[:120]}
    finally:
        os.chdir(cwd)
        shutil.rmtree(tmp, ignore_errors=True)


def bench_fused_pipeline() -> tuple[list, int, int]:
    """Fused balance→train handoff: raw tree → balanced dataset RESIDENT IN
    DEVICE HBM (decode originals once → upload once → augment on device →
    manifests). → (samples of generated images/sec, n_generated,
    bytes_uploaded)."""
    import shutil
    import tempfile
    from pathlib import Path

    from leaffliction_tpu.data.fused_balance import balance_to_device

    tmp = Path(tempfile.mkdtemp(prefix="bench-fused-"))
    try:
        rng = np.random.default_rng(7)
        n_gen = _make_synthetic_tree(tmp / "src", rng)
        n_orig = sum(E2E_CLASS_IMGS)
        samples = []
        for run in range(_n_runs()):
            res = balance_to_device(
                tmp / "src", img_size=IMG, seed=42,
                target_dir=tmp / f"aug{run}",
                manifest_out_dir=tmp / f"ds{run}")
            assert res.n_generated == n_gen
            samples.append(n_gen / res.balance_time_s)
        # host→device traffic of the fused path: the decoded originals ship
        # up once; augmented pixels are born on device and never downloaded
        bytes_up = n_orig * IMG * IMG * 3
        return samples, n_gen, bytes_up
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_ref_pipeline() -> list:
    """Reference-style path to the same end state: ProcessPool PIL balancer
    (decode → op → JPEG encode per task, reference fan-out) followed by what
    the trainer must then do with the balanced tree — decode every image at
    img_size and upload the dataset to device HBM. → generated images/sec
    over the whole pipeline."""
    import concurrent.futures as cf
    import multiprocessing as mp
    import shutil
    import tempfile
    from pathlib import Path

    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.core.sysinfo import get_optimal_worker_count

    workers = get_optimal_worker_count()
    tmp = Path(tempfile.mkdtemp(prefix="bench-refpipe-"))
    try:
        rng = np.random.default_rng(7)
        n_gen = _make_synthetic_tree(tmp / "src", rng)
        big_dir = tmp / "src" / "Apple" / "healthy"
        small_dir = tmp / "src" / "Apple" / "rust"
        srcs = sorted(small_dir.glob("*.jpg"))
        transforms = ("flip", "rotate", "skew", "shear", "crop", "distortion")
        per_t, rem = divmod(n_gen, 6)
        tasks = []
        i = 0
        for ti, t in enumerate(transforms):
            for _ in range(per_t + (1 if ti < rem else 0)):
                tasks.append((str(srcs[i % len(srcs)]),
                              str(small_dir / f"gen_aug_{t}_{i}.jpg"), t, i))
                i += 1

        samples = []
        for run in range(_n_runs()):
            for _, dst, _, _ in tasks:
                Path(dst).unlink(missing_ok=True)
            with cf.ProcessPoolExecutor(
                    max_workers=workers,
                    mp_context=mp.get_context("spawn")) as pool:
                list(pool.map(_pil_pool_task, tasks[:workers]))  # warm spawn
                t0 = time.perf_counter()
                list(pool.map(_pil_pool_task, tasks))
                t_pool = time.perf_counter() - t0
            # trainer side: decode the whole balanced tree + upload to HBM
            from leaffliction_tpu.data.loader import ImageStore
            from leaffliction_tpu.data.manifest import ManifestItem
            from leaffliction_tpu.data.scan import scan_dataset

            t0 = time.perf_counter()
            items = scan_dataset(tmp / "src")
            label2idx = {lab: i for i, lab in enumerate(
                sorted({it.label for it in items}))}
            store = ImageStore(items, label2idx, IMG)
            dev = jax.device_put(store.images)
            assert int(jnp.sum(dev[0].astype(jnp.int32))) >= 0  # sync
            t_train_prep = time.perf_counter() - t0
            samples.append(n_gen / (t_pool + t_train_prep))
        return samples
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_serving() -> dict:
    """Serving throughput: decode→preprocess→infer over a directory of
    JPEGs — the reference's batch-predict semantics
    (`srcs/predict/predictor.py:82-147`), via the real `Predictor` pipeline
    (chunked batched C++ decode overlapping device dispatch).

    Besides the link-sensitive end-to-end number, emits two link-INDEPENDENT
    stage keys — `serving_decode_img_per_sec` (host C++ JPEG decode) and
    `serving_infer_img_per_sec` (device forward on an HBM-resident chunk) —
    so a drop in the e2e headline can be attributed to code vs relay
    weather from the JSON alone."""
    import shutil
    import tempfile
    from pathlib import Path

    import jax.numpy as jnp

    from leaffliction_tpu.models.leafcnn import build_leafcnn
    from leaffliction_tpu.predict.predictor import Predictor

    tmp = Path(tempfile.mkdtemp(prefix="bench-serve-"))
    try:
        rng = np.random.default_rng(11)
        from PIL import Image

        yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
        base = np.stack([xx % 251, yy % 241, (xx + yy) % 253], -1)
        n = 256
        paths = []
        for i in range(n):
            arr = (base + rng.normal(0, 8, base.shape)).clip(0, 255)
            p = tmp / f"img{i}.jpg"
            Image.fromarray(arr.astype(np.uint8)).save(p, quality=95)
            paths.append(p)

        import jax

        model = build_leafcnn(num_classes=8, scale="base",
                              dtype=jnp.bfloat16)
        variables = model.init(jax.random.key(0),
                               jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                               train=False)
        pred = Predictor.from_model(model, variables,
                                    [f"c{i}" for i in range(8)], IMG)
        pred.predict_batch(paths[:8])  # warm/compile
        samples = []
        for _ in range(_n_runs()):
            t0 = time.perf_counter()
            results = pred.predict_batch(paths)
            dt = time.perf_counter() - t0
            assert len(results) == n
            samples.append(n / dt)
        # Stage decomposition, link-INDEPENDENT (round-3 weak #7: the e2e
        # number alone cannot tell a code regression from a bad relay day;
        # these two keys pin the host and device stages separately):
        # 1. host C++ JPEG decode throughput over the same 256 paths
        decode_samples = []
        for _ in range(_n_runs()):
            t0 = time.perf_counter()
            arrays, ok = Predictor._decode_chunk(paths, IMG)
            dt = time.perf_counter() - t0
            assert arrays.shape[0] == n and bool(np.all(ok))
            decode_samples.append(n / dt)
        # 2. pure device inference on an ALREADY-UPLOADED serving chunk
        #    (uint8 [64,S,S,3] resident in HBM; only the [64,8] probs ride
        #    the link back — sync by fetching them, block_until_ready lies
        #    on the relay)
        from leaffliction_tpu.predict.predictor import SERVING_BATCH

        dev_chunk = jax.device_put(arrays[:SERVING_BATCH])
        np.asarray(jax.device_get(pred._infer(dev_chunk)))  # warm
        infer_samples = []
        n_disp = max(1, n // SERVING_BATCH)
        for _ in range(_n_runs()):
            t0 = time.perf_counter()
            pend = [pred._infer(dev_chunk) for _ in range(n_disp)]
            for p in pend:
                np.asarray(jax.device_get(p))
            dt = time.perf_counter() - t0
            infer_samples.append(n_disp * SERVING_BATCH / dt)
        # 3. h2d UPLOAD stage: device_put of the decoded u8 chunks at the
        #    measured link — the dominant term the round-4 decomposition
        #    omitted (e2e 251.7 vs decode 1,650 / infer 2,200: nothing
        #    explained the gap). Fresh noise is XORed into each chunk so the
        #    relay client's host-side array cache (see verify SKILL.md trap)
        #    cannot short-circuit the transfer. With this key, e2e should
        #    reconcile against the pipelined stage model: e2e ≈ slowest
        #    stage when overlap works (docs/performance.md has the
        #    round-5 reconciliation paragraph).
        upload_samples = []
        rng_u = np.random.default_rng(3)
        for _ in range(_n_runs()):
            chunks = [arrays[i:i + SERVING_BATCH]
                      ^ rng_u.integers(0, 255, (1, 1, 1, 3), dtype=np.uint8)
                      for i in range(0, n, SERVING_BATCH)]
            t0 = time.perf_counter()
            devs = [jax.device_put(c) for c in chunks]
            # sync: one scalar per chunk (block_until_ready lies on relay)
            for d in devs:
                assert int(jnp.sum(d[0, :4, :4].astype(jnp.int32))) >= 0
            dt = time.perf_counter() - t0
            upload_samples.append(n / dt)
        # host→device pixel traffic per run (what rides the relay)
        return {**spread("serving_img_per_sec", samples),
                **spread("serving_decode_img_per_sec", decode_samples),
                **spread("serving_upload_img_per_sec", upload_samples),
                **spread("serving_infer_img_per_sec", infer_samples),
                "serving_bytes_up": n * IMG * IMG * 3}
    except Exception as exc:
        return {"serving_error": str(exc)[:120]}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _await_device(deadline_s: float = 900.0, probe_timeout_s: float = 120.0):
    """Block until the accelerator answers a trivial computation, retrying
    through transient relay outages (the tunneled TPU goes dark for
    1-10 min at a time; even `jax.devices()` then hangs rather than
    erroring). Probes run in daemon threads so a hung probe can't wedge
    the process. Returns True when the device responded, False if the
    deadline expired — callers should then emit an error JSON instead of
    hanging the driver."""
    import threading

    t0 = time.monotonic()
    attempt = 0
    while time.monotonic() - t0 < deadline_s:
        attempt += 1
        ok = threading.Event()

        def probe():
            import jax
            import jax.numpy as jnp

            if np.isfinite(float(jnp.sum(jnp.ones((8, 8))))):
                ok.set()

        th = threading.Thread(target=probe, daemon=True)
        th.start()
        th.join(probe_timeout_s)
        if ok.is_set():
            return True
        print(f"bench: device probe {attempt} unanswered after "
              f"{probe_timeout_s:.0f}s (relay outage?); retrying",
              file=sys.stderr, flush=True)
    return False


_partial: dict = {
    "metric": "augmented images/sec/chip at 224px",
    "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
}


def _arm_watchdog(deadline_s: float = 2700.0) -> None:
    """The start-of-run probe can't help if the relay goes dark MID-run (any
    device_get then hangs forever). If the bench hasn't printed within the
    deadline, emit whatever sections completed (each merges into `_partial`
    as it finishes) and exit rather than hanging the driver."""
    import threading

    def fire():
        _partial.setdefault(
            "error", f"bench exceeded {deadline_s:.0f}s (relay outage "
                     "mid-run?); partial results")
        emit_final(_partial)
        import os
        os._exit(0)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()


def main() -> None:
    _arm_watchdog()
    if not _await_device():
        # Parseable failure beats a hung driver: record WHY there is no
        # number this round. os._exit avoids waiting on the stuck probe
        # thread blocked inside the relay client.
        emit_final({
            "metric": "augmented images/sec/chip at 224px",
            "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
            "error": "accelerator unreachable (relay outage) for 15 min; "
                     "no measurement possible this run",
        })
        import os
        os._exit(0)
    # link weather first: every other number reads against these
    bw = bench_bandwidth()
    _partial.update(bw)
    global _DEGRADED
    _DEGRADED = bw.get("bandwidth_d2h_mbps", 0.0) < 5.0
    if _DEGRADED:
        _partial["degraded_link"] = True
    device_samples = bench_device()
    device_ips = statistics.median(device_samples)
    # best-of-2 stabilizes the noisy single-core PIL denominator
    pil_ips = max(bench_pil_baseline(), bench_pil_baseline())
    _partial.update(spread("value", device_samples))
    _partial["vs_baseline"] = round(device_ips / pil_ips, 2)
    # MFU next: device-resident, weather-independent, and the most
    # regression-sensitive keys — land them in _partial before the
    # link-bound phases can eat the watchdog budget on a slow day
    mfu_keys = bench_train_mfu()
    _partial.update(mfu_keys)
    # north-star train wall (device-resident, production fit() loop):
    # the b32-vs-b128 A/B the default-config decision rests on
    ns_keys = bench_north_star_train()
    _partial.update(ns_keys)
    fused_samples, n_gen, fused_bytes_up = bench_fused_pipeline()
    fused_ips = statistics.median(fused_samples)
    _partial.update(spread("e2e_img_per_sec", fused_samples))
    ref_pipe_samples = bench_ref_pipeline()
    ref_pipe_ips = statistics.median(ref_pipe_samples)
    jpeg_samples = bench_e2e_balancer()
    jpeg_e2e_ips = statistics.median(jpeg_samples)
    pool_ips, pool_workers = bench_pil_pool_baseline()
    result = {
        "metric": "augmented images/sec/chip at 224px",
        # every headline carries _min/_max spread over N_RUNS samples:
        # medians are the quoted numbers (reproducible on the driver's
        # worst day); the spread + the bandwidth block above separate code
        # regressions from relay weather
        **spread("value", device_samples),
        "unit": "images/sec",
        "vs_baseline": round(device_ips / pil_ips, 2),
        **bw,
        # END-TO-END, same end state both sides: raw unbalanced tree →
        # balanced dataset resident in device HBM ready to train.
        # Fused path: decode originals once → upload once → augment on
        # device (zero pixel downloads, `--balance-from`). Reference-style:
        # ProcessPool PIL balancer (its own fan-out) + decode balanced tree
        # + upload. Rate = generated images / pipeline seconds.
        **spread("e2e_img_per_sec", fused_samples),
        "e2e_bytes_up": fused_bytes_up,
        **spread("ref_pipeline_img_per_sec", ref_pipe_samples),
        "e2e_vs_pool_baseline": round(fused_ips / ref_pipe_ips, 2),
        # the JPEG-materializing balancer (leaffliction-augment <dir>) —
        # honest number: downloads every augmented image over the relay and
        # stays transfer-bound on this host; kept for tracking
        **spread("e2e_jpeg_img_per_sec", jpeg_samples),
        "e2e_jpeg_bytes_down": n_gen * IMG * IMG * 3,
        "pil_pool_img_per_sec": round(pool_ips, 1),
        "pil_pool_workers": pool_workers,
        "jpeg_e2e_vs_pool": round(jpeg_e2e_ips / pool_ips, 2),
    }
    if _DEGRADED:
        result["degraded_link"] = True  # link-bound phases ran 1 sample
    # which executor the auto backend picked for the JPEG balancer runs
    from leaffliction_tpu.data.host_augment import last_decision

    if last_decision:
        result["jpeg_balance_backend"] = last_decision.get("backend")
        if last_decision.get("link_mbps") is not None:
            result["jpeg_balance_link_mbps"] = last_decision["link_mbps"]
        if last_decision.get("host_ips") is not None:
            result["jpeg_balance_host_ips"] = last_decision["host_ips"]
    _partial.update(result)
    result.update(bench_serving())
    _partial.update(result)
    # the one-command e2e LAST: it is the longest single phase, so every
    # other headline is already in _partial if the watchdog fires mid-run
    result.update(bench_north_star_e2e())
    _partial.update(result)
    result.update(mfu_keys)
    result.update(ns_keys)
    emit_final(result)


if __name__ == "__main__":
    sys.exit(main())
