"""Host-pool balancer backend: param-stream parity, backend picker, e2e.

The host backend (`data/host_augment.py`) exists for narrow host<->device
links where the device path's pixel download is the throughput floor
(VERDICT r3 weak #4). Contract: identical task plan and output names, and
transform parameters drawn from the device kernels' exact jax PRNG streams.
"""

import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from leaffliction_tpu.data.host_augment import (
    draw_params_batch,
    execute_tasks_host,
    pick_balance_backend,
)


def test_pick_balance_backend_thresholds():
    # fast link (PCIe-class): device wins regardless of workers
    assert pick_balance_backend(10_000.0, 0.2, 8) == "device"
    # relay-class link, 0.2 MB images: 10 MB/s -> 50 img/s device vs
    # 150 img/s for one host worker
    assert pick_balance_backend(10.0, 0.2, 1) == "host"
    # tie goes to device (encode offload + upload dedup)
    assert pick_balance_backend(30.0, 0.2, 1) == "device"
    # more workers raise the host side
    assert pick_balance_backend(50.0, 0.2, 4) == "host"


def test_measure_host_ips(tmp_path):
    """Real sample → measured rate; unreadable sample → the constant
    fallback (the auto decision must never crash on a bad first task)."""
    from leaffliction_tpu.data.host_augment import (PER_WORKER_IPS,
                                                    measure_host_ips)

    p = tmp_path / "s.jpg"
    Image.fromarray(np.random.default_rng(1).integers(
        0, 255, (64, 64, 3)).astype(np.uint8)).save(p, quality=95)
    ips = measure_host_ips(p)
    assert ips > 0 and np.isfinite(ips)
    assert measure_host_ips(tmp_path / "missing.jpg") == PER_WORKER_IPS


def test_execute_tasks_host_survives_broken_pool(tmp_path, monkeypatch):
    """spawn re-imports __main__; when that import fails (stdin scripts,
    embedded interpreters) every worker dies at startup. The host backend
    must fall back to a thread pool instead of failing the balance run."""
    import concurrent.futures as cf

    from leaffliction_tpu.data import host_augment
    from leaffliction_tpu.data.balancer import AugTask

    src = tmp_path / "img.jpg"
    Image.fromarray(np.random.default_rng(3).integers(
        0, 255, (32, 32, 3)).astype(np.uint8)).save(src, quality=95)
    tasks = [AugTask(source_img=src, output_path=tmp_path / f"o{i}.jpg",
                     transform="flip", task_seed=100 + i) for i in range(3)]

    class _BrokenPool:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def map(self, *a, **k):
            raise cf.process.BrokenProcessPool("worker died at startup")

    monkeypatch.setattr(cf, "ProcessPoolExecutor", _BrokenPool)
    done, failed = host_augment.execute_tasks_host(tasks, root_seed=42,
                                                   workers=2)
    assert (done, failed) == (3, 0)
    for t in tasks:
        assert t.output_path.exists()


def test_probe_d2h_mbps_is_median_of_probes(monkeypatch):
    """One fast burst must not flip the backend decision: the probe takes
    the MEDIAN of its samples (the relay link is bimodal; a single probe
    catching 32 MB/s once picked the device path for a run that then rode
    the 10 MB/s median and lost 4x to the host pool)."""
    import time

    from leaffliction_tpu.data import host_augment

    # fake clock: probe dts of 0.004 s, 0.4 s, 0.333 s over 4 MiB
    # -> bandwidths [1000, 10, ~12] MB/s -> median ~12 (mean would be ~341,
    # first-sample would be 1000)
    ticks = iter([0.0, 0.004, 10.0, 10.4, 20.0, 20.333])
    monkeypatch.setattr(time, "perf_counter", lambda: next(ticks))
    mbps = host_augment.probe_d2h_mbps()
    assert mbps == pytest.approx(4 / 0.333, rel=1e-3)


def test_param_stream_matches_device_kernels():
    """Angles/shears drawn by the host backend equal the device kernels'
    draws for the same root seed + task seeds."""
    from leaffliction_tpu.ops.augment import BATCH_KERNELS

    seeds = [7, 123, 999_983, 42]
    params = draw_params_batch(42, ["rotate"] * 4, seeds)

    root = jax.random.key(42)
    keys = jax.vmap(lambda s: jax.random.fold_in(root, s))(
        jnp.asarray(seeds, jnp.uint32))
    imgs = jnp.zeros((4, 16, 16, 3), jnp.uint8)
    _, angles = BATCH_KERNELS["rotate"](keys, imgs)
    np.testing.assert_allclose(
        np.asarray([p.angle_deg for p in params], np.float32),
        np.asarray(angles), rtol=0, atol=0)

    # shear: same split order as `_shear_one`
    p_shear = draw_params_batch(42, ["shear"] * 4, seeds)
    for key, p in zip(keys, p_shear):
        k_dir, k_s = jax.random.split(key)
        s = jax.random.uniform(k_s, (), jnp.float32, -0.2, 0.2)
        assert float(s) == pytest.approx(p.shear_s, abs=0)
        assert bool(jax.random.bernoulli(k_dir)) == p.shear_horizontal

    # flip: bernoulli straight off the task key
    p_flip = draw_params_batch(42, ["flip"] * 4, seeds)
    for key, p in zip(keys, p_flip):
        assert bool(jax.random.bernoulli(key)) == p.flip_horizontal


def test_strict_distortion_host_byte_identical_to_device(tmp_path,
                                                         monkeypatch):
    """VERDICT r4 item 7: under LEAF_STRICT_DISTORTION=1 the host backend
    must produce BYTE-identical outputs to the device backend — the worker
    evaluates the device op (`distortion_batch_wrap`) on jax-CPU with the
    same threefry key, so noise bytes, wrap arithmetic, autocontrast and
    u8 rounding are one code path. Asserted at both the pixel level and
    the JPEG file level (same PIL codec on both sides)."""
    from leaffliction_tpu.data.balancer import AugTask
    from leaffliction_tpu.ops.augment import distortion_batch_wrap

    rng = np.random.default_rng(17)
    src = tmp_path / "leaf.jpg"
    Image.fromarray(rng.integers(0, 255, (40, 56, 3)).astype(np.uint8)
                    ).save(src, quality=95)

    root_seed, task_seeds = 42, [7, 999_983]
    tasks = [AugTask(source_img=src,
                     output_path=tmp_path / f"host_{s}.jpg",
                     transform="distortion", task_seed=s)
             for s in task_seeds]
    monkeypatch.setenv("LEAF_STRICT_DISTORTION", "1")
    done, failed = execute_tasks_host(tasks, root_seed=root_seed, workers=2)
    assert (done, failed) == (2, 0)

    # device backend reference: same decode, vmapped batch kernel (batch=2,
    # exercising batch-size independence vs the worker's batch=1 call),
    # same PIL q95 encode as `balancer.write_jpeg`'s PIL fallback
    with Image.open(src) as im:
        arr = np.asarray(im.convert("RGB"), np.uint8)
    root = jax.random.key(root_seed)
    keys = jax.vmap(lambda s: jax.random.fold_in(root, s))(
        jnp.asarray(task_seeds, jnp.uint32))
    dev = np.asarray(distortion_batch_wrap(
        keys, jnp.asarray(np.stack([arr, arr]))))
    for i, t in enumerate(tasks):
        with Image.open(t.output_path) as im:
            host_px = np.asarray(im.convert("RGB"))
        dev_path = tmp_path / f"dev_{task_seeds[i]}.jpg"
        Image.fromarray(dev[i]).save(dev_path, quality=95)
        with Image.open(dev_path) as im:
            dev_px = np.asarray(im.convert("RGB"))
        np.testing.assert_array_equal(host_px, dev_px)
        assert (t.output_path.read_bytes() == dev_path.read_bytes()), \
            f"JPEG bytes diverge for seed {task_seeds[i]}"


def test_execute_tasks_host_tiny_tree(tmp_path):
    from leaffliction_tpu.data.balancer import AugTask

    rng = np.random.default_rng(11)
    src_dir = tmp_path / "cls"
    src_dir.mkdir()
    srcs = []
    for i in range(2):
        p = src_dir / f"img{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 48, 3)).astype(np.uint8)
                        ).save(p, quality=95)
        srcs.append(p)

    transforms = ["flip", "rotate", "skew", "shear", "crop", "distortion"]
    tasks = [
        AugTask(source_img=srcs[i % 2],
                output_path=src_dir / f"img_aug_{t}_{i}.jpg",
                transform=t, task_seed=1000 + i)
        for i, t in enumerate(transforms)
    ]
    done, failed = execute_tasks_host(tasks, root_seed=42, workers=2)
    assert (done, failed) == (6, 0)
    for t in tasks:
        assert t.output_path.exists()
        with Image.open(t.output_path) as im:
            assert im.size[0] > 0
    # rotate output expanded beyond the 48x40 source
    with Image.open(src_dir / "img_aug_rotate_1.jpg") as im:
        assert im.size[0] >= 48 and im.size[1] >= 40


def test_balancer_host_backend_e2e(tmp_path, monkeypatch):
    """Full balancer run forced onto the host backend: balanced counts,
    reference naming, manifest schema."""
    from leaffliction_tpu.data.balancer import DatasetBalancer
    from leaffliction_tpu.data.scan import count_by_plant_class, scan_dataset

    rng = np.random.default_rng(5)
    for cls, n in {"healthy": 8, "rust": 3}.items():
        d = tmp_path / "tree" / "Apple" / cls
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
                            ).save(d / f"i{i}.jpg")

    monkeypatch.setenv("LEAF_BALANCE_BACKEND", "host")
    target = tmp_path / "balanced"
    balancer = DatasetBalancer(
        source_dir=tmp_path / "tree", target_dir=target, seed=42,
        manifest_out_dir=tmp_path / "artifacts")
    balancer.run()

    counts = count_by_plant_class(scan_dataset(target))
    assert counts["Apple"] == {"healthy": 8, "rust": 8}
    aug_files = sorted((target / "Apple" / "rust").glob("*_aug_*.jpg"))
    assert len(aug_files) == 5
    manifest = json.loads(
        (tmp_path / "artifacts" / "manifest_augmented.json").read_text())
    assert manifest["meta"]["augmented_images"] == 5
