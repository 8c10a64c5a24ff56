"""Host-pool execution backend for the JPEG-materializing balancer.

Why this exists: the classic balancer (`data/balancer.py`) augments on
device and downloads uint8 pixels for JPEG encode. On hosts whose
host↔device link is fast (PCIe/datacenter TPU-VM, >10 GB/s) that path wins
outright; on a *narrow* link (this dev relay swings 3–70 MB/s) the d2h
download is the hard floor — a single-core PIL pool beats it 5×
(`BENCH_r03.json: jpeg_e2e_vs_pool 0.21`). A framework that insists on the
device path regardless of link weather is slower than the reference it
replaces on exactly one axis: materializing an augmented tree.

This module is the fix: a process-pool backend that executes the SAME task
plan (same `AugTask` list, same output names, same per-task seeds) with
PIL/NumPy on the host, plus a probe-driven `pick_balance_backend` that
chooses device vs host per run from the measured d2h bandwidth.

Parameter parity: every transform parameter (flip direction, rotation
angle, skew/shear factors, crop window fractions, autocontrast cutoff) is
drawn from the IDENTICAL `jax.random` stream as the device kernels
(`ops/augment.py` — same `fold_in(root_key, task_seed)` keys, same split
order, same uniform bounds imported from that module) in ONE batched call
in the parent process, so both backends produce the same geometry for the
same task. Pixel-level interpolation is PIL's (the reference
implementation the device kernels are golden-tested against,
`srcs/preprocessing/image_augmenter.py:12-133`).

Distortion parity has two tiers:

- default: noise is distribution-identical (NumPy Gaussian per task seed,
  rounded-to-nearest on the uint8 cast like the device `_to_u8`) — the
  classic tolerance contract.
- `LEAF_STRICT_DISTORTION=1`: the worker evaluates the device op itself
  (`_distortion_one_wrap` → `_to_u8`) on jax-CPU with the same
  `fold_in(root_key, task_seed)` key, so the noise bytes, wrap arithmetic
  and autocontrast are the SAME threefry stream and math as the device
  backend — byte-identical pixels, golden-tested device-vs-host
  (`tests/test_host_balance.py`). File-level byte equality additionally
  requires both executors to use the same JPEG codec (the device path
  prefers the native libjpeg helper when built; the host pool encodes with
  PIL).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from leaffliction_tpu.core.logging import get_logger

LOGGER = get_logger(__name__)

# Fallback per-worker PIL throughput (img/s) at ~256px for the `auto`
# backend decision, used only when `measure_host_ips` cannot sample a real
# task (unreadable first source). Conservative on purpose: ~half of what
# one worker measured on this host (268 img/s).
PER_WORKER_IPS = 150.0


@dataclass(frozen=True)
class TaskParams:
    """Host-side transform parameters for one task (already drawn from the
    device kernels' jax PRNG stream)."""

    transform: str
    flip_horizontal: bool = False
    angle_deg: float = 0.0
    skew_s: float = 0.0
    shear_s: float = 0.0
    shear_horizontal: bool = False
    crop_ratio: float = 0.0
    crop_u_left: float = 0.0
    crop_u_top: float = 0.0
    cutoff: float = 0.0


def draw_params_batch(root_seed: int, transforms: Sequence[str],
                      task_seeds: Sequence[int]) -> List[TaskParams]:
    """Draw every task's parameters in ONE jitted call, from the exact
    streams the device kernels use (`ops/augment.py`):

    - flip:  bernoulli(key)                      (`_flip_one`)
    - rotate: U(key, -30, 30)                    (`_rotate_one`)
    - skew:  U(key, 0.05, 0.15)                  (`_skew_one`)
    - shear: k_dir,k_s = split(key); U(k_s,-.2,.2), bern(k_dir) (`_shear_one`)
    - crop:  k_r,k_l,k_t = split(key,3); U(k_r,.8,.95), U(k_l), U(k_t)
    - distortion: k_n,k_c = split(key); U(k_c, 0, 2)  (noise drawn per
      worker — see module docstring)
    """
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.ops.augment import (
        CROP_RATIO_RANGE,
        CUTOFF_MAX,
        MAX_ROTATE_DEG,
        SHEAR_MAX,
        SKEW_RANGE,
    )

    def draw_all(key):
        # draw every op's params from the op's own stream; the caller picks
        # the relevant fields per task (unused draws cost nothing at this
        # scale and keep each op's stream byte-identical to its kernel).
        # Bounds are imported from ops/augment so a kernel bound change
        # can never silently desync the two backends.
        flip_h = jax.random.bernoulli(key)
        angle = jax.random.uniform(key, (), jnp.float32,
                                   -MAX_ROTATE_DEG, MAX_ROTATE_DEG)
        skew_s = jax.random.uniform(key, (), jnp.float32, *SKEW_RANGE)
        k_dir, k_s = jax.random.split(key)
        shear_s = jax.random.uniform(k_s, (), jnp.float32,
                                     -SHEAR_MAX, SHEAR_MAX)
        shear_h = jax.random.bernoulli(k_dir)
        k_r, k_l, k_t = jax.random.split(key, 3)
        ratio = jax.random.uniform(k_r, (), jnp.float32, *CROP_RATIO_RANGE)
        u_left = jax.random.uniform(k_l, ())
        u_top = jax.random.uniform(k_t, ())
        k_noise, k_cut = jax.random.split(key)
        del k_noise
        cutoff = jax.random.uniform(k_cut, (), jnp.float32, 0.0, CUTOFF_MAX)
        return (flip_h, angle, skew_s, shear_s, shear_h, ratio, u_left,
                u_top, cutoff)

    root_key = jax.random.key(root_seed)
    keys = jax.vmap(lambda s: jax.random.fold_in(root_key, s))(
        jnp.asarray(task_seeds, jnp.uint32))
    cols = [np.asarray(c) for c in jax.jit(jax.vmap(draw_all))(keys)]
    out = []
    for i, transform in enumerate(transforms):
        out.append(TaskParams(
            transform=transform,
            flip_horizontal=bool(cols[0][i]),
            angle_deg=float(cols[1][i]),
            skew_s=float(cols[2][i]),
            shear_s=float(cols[3][i]),
            shear_horizontal=bool(cols[4][i]),
            crop_ratio=float(cols[5][i]),
            crop_u_left=float(cols[6][i]),
            crop_u_top=float(cols[7][i]),
            cutoff=float(cols[8][i]),
        ))
    return out


def _strict_distortion_u8(arr: np.ndarray, root_seed: int,
                          task_seed: int) -> np.ndarray:
    """Evaluate the DEVICE strict-wrap distortion op on this image with the
    device balancer's exact key derivation (`balancer.py` fold_in) so the
    output pixels are byte-identical to what `distortion_batch_wrap`
    produces for the same task — same threefry noise bytes, same wrap
    arithmetic, same autocontrast, same round-to-u8.

    Runs on jax-CPU in a spawned worker (`_worker_init` pins the platform
    before first backend use — an `import jax` guard is NOT enough because
    environment sitecustomize hooks can import jax into every fresh
    interpreter). In the thread-pool fallback jax is already initialized
    in the parent — reuse its backend; the strict op's noise and wrap
    arithmetic are backend-bit-identical (`ops/augment._noise_strict`), so
    either backend produces the same bytes."""
    import jax
    import jax.numpy as jnp

    from leaffliction_tpu.ops.augment import distortion_batch_wrap

    key = jax.random.fold_in(jax.random.key(root_seed),
                             jnp.uint32(task_seed))
    out = distortion_batch_wrap(key[None], jnp.asarray(arr)[None])
    return np.asarray(out[0])


def _worker_init() -> None:
    """Spawn-pool worker initializer: pin jax to the CPU backend BEFORE any
    task touches it (strict-mode distortion evaluates the device op on
    jax-CPU). Without this, the environment's `JAX_PLATFORMS`/sitecustomize
    would aim every worker at the accelerator — one device dial per task
    and, on a relayed TPU, a different erfinv rounding than the test
    harness. `config.update` wins over the env even when a sitecustomize
    hook has already imported jax, as long as no backend is initialized."""
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - worker must still run PIL tasks
        pass


def _apply_host_task(args) -> bool:
    """Worker: JPEG decode → one PIL/NumPy transform (explicit params) →
    JPEG encode q95. Pure host (no jax in the worker), except strict-mode
    distortion which evaluates the device op on jax-CPU for byte parity."""
    src, dst, p, task_seed, strict_wrap, root_seed = args
    try:
        from PIL import Image, ImageOps

        with Image.open(src) as im:
            img = im.convert("RGB")
        w, h = img.size
        t = p.transform
        if t == "flip":
            img = img.transpose(Image.FLIP_LEFT_RIGHT if p.flip_horizontal
                                else Image.FLIP_TOP_BOTTOM)
        elif t == "rotate":
            # device path is bilinear into the expanded canvas
            # (`ops/augment.rotate_batch`); PIL expand=True crops identically
            img = img.rotate(p.angle_deg, expand=True, fillcolor="white",
                             resample=Image.BILINEAR)
        elif t == "skew":
            s = p.skew_s
            img = img.transform(
                (w, h), Image.PERSPECTIVE,
                [1 + s, 0, -s * w, 0, 1 + s, -s * h, 0, 0], Image.BICUBIC)
        elif t == "shear":
            coeffs = ([1, p.shear_s, 0, 0, 1, 0] if p.shear_horizontal
                      else [1, 0, 0, p.shear_s, 1, 0])
            img = img.transform((w, h), Image.AFFINE, coeffs, Image.BICUBIC)
        elif t == "crop":
            # same f32 window math as `_crop_one` (floor in float32)
            ratio = np.float32(p.crop_ratio)
            new_w = int(np.floor(np.float32(w) * ratio))
            new_h = int(np.floor(np.float32(h) * ratio))
            left = int(np.floor(np.float32(p.crop_u_left)
                                * np.float32(w - new_w + 1)))
            top = int(np.floor(np.float32(p.crop_u_top)
                               * np.float32(h - new_h + 1)))
            img = img.crop((left, top, left + new_w, top + new_h)).resize(
                (w, h), Image.LANCZOS)
        elif t == "distortion":
            arr = np.asarray(img)
            if strict_wrap:
                # bit-parity tier: run the device op itself on jax-CPU
                img = Image.fromarray(
                    _strict_distortion_u8(arr, root_seed, task_seed))
            else:
                noise = np.random.default_rng(task_seed).normal(
                    0.0, 5.0, arr.shape)
                # round like the device `_to_u8` (a bare cast truncates,
                # a systematic ~0.5-grey darkening vs the device backend)
                noisy = np.clip(np.rint(arr + noise), 0, 255
                                ).astype(np.uint8)
                img = ImageOps.autocontrast(Image.fromarray(noisy),
                                            cutoff=p.cutoff)
        else:
            raise ValueError(f"unknown transform: {t}")
        img.save(dst, quality=95)
        return True
    except Exception as exc:  # pragma: no cover - worker-side IO errors
        LOGGER.error("Host augment failed: %s (%s)", dst, exc)
        return False


def execute_tasks_host(tasks, root_seed: int,
                       workers: Optional[int] = None) -> Tuple[int, int]:
    """Run the balancer's task list on a host process pool.

    `tasks`: the balancer's `AugTask` list (source/output paths, transform,
    per-task seed). Returns (completed, failed). Same artifact names and
    geometry as the device path; see module docstring for the parity
    contract.
    """
    import concurrent.futures as cf
    import multiprocessing as mp
    from concurrent.futures.process import BrokenProcessPool

    from leaffliction_tpu.core.sysinfo import get_optimal_worker_count

    strict_wrap = os.environ.get("LEAF_STRICT_DISTORTION", "") not in (
        "", "0", "false")
    workers = workers or get_optimal_worker_count()
    params = draw_params_batch(root_seed, [t.transform for t in tasks],
                               [t.task_seed for t in tasks])
    args = [(str(t.source_img), str(t.output_path), p, t.task_seed,
             strict_wrap, root_seed) for t, p in zip(tasks, params)]
    completed = failed = 0
    try:
        # spawn: forking after JAX initialized its thread pools can deadlock
        with cf.ProcessPoolExecutor(
                max_workers=workers,
                mp_context=mp.get_context("spawn"),
                initializer=_worker_init) as pool:
            for i, ok in enumerate(pool.map(_apply_host_task, args,
                                            chunksize=16)):
                if ok:
                    completed += 1
                else:
                    failed += 1
                if (i + 1) % 500 == 0:
                    LOGGER.info("Progress: %d/%d (%.1f%%)", i + 1, len(args),
                                100.0 * (i + 1) / max(len(args), 1))
    except BrokenProcessPool:
        # spawn re-imports __main__; an unimportable parent (stdin script,
        # embedded interpreter, frozen app) kills every worker at startup.
        # The tasks are pure PIL/NumPy — rerun them in a thread pool (PIL
        # decode/encode release the GIL) rather than failing the balance.
        LOGGER.warning(
            "Host augment process pool broke (unimportable __main__?); "
            "retrying the %d tasks on a thread pool", len(args))
        completed = failed = 0
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            for ok in pool.map(_apply_host_task, args):
                if ok:
                    completed += 1
                else:
                    failed += 1
    return completed, failed


def probe_d2h_mbps(nbytes: int = 4 * 1024 * 1024, n_probes: int = 3) -> float:
    """Measure device→host bandwidth (MB/s): median of `n_probes` fetches
    of an INCOMPRESSIBLE random buffer.

    Three probe traps, all measured on the relay before this shape:
    - The relay client caches an array's value host-side after its FIRST
      fetch: re-fetching the same buffer measures 19-34 GB/s on a link
      whose real download bandwidth is ~12-25 MB/s (a median over repeat
      fetches of one array is therefore the cache, not the link, and made
      `auto` pick the device path for a run that lost 4x to the host
      pool). Every sample here fetches a FRESH computed array.
    - An all-zeros buffer is compressible by the transport; augmented
      pixels are JPEG-grade entropy. Probe with random bytes.
    - The link is bimodal (9-32 MB/s swings within one bench run); a
      single probe catching a fast burst flips the decision for a run that
      then rides the slow median. Median-of-3 costs ~1 s extra on a
      10 MB/s link and tracks what the bulk download will actually see.
    """
    import statistics
    import time

    import jax
    import jax.numpy as jnp

    buf = np.random.default_rng(0).integers(0, 255, (nbytes,), np.uint8)
    x = jax.device_put(buf)
    # force the upload with a scalar round trip (block_until_ready lies on
    # the relay) so queued async work doesn't pollute the first sample
    assert int(jnp.sum(x[:16].astype(jnp.int32))) >= 0
    samples = []
    for i in range(max(n_probes, 1)):
        # fresh value each round — same entropy, never fetched before —
        # synced the same way so the timed region is download only
        y = x ^ jnp.uint8(i + 1)
        assert int(jnp.sum(y[:16].astype(jnp.int32))) >= 0
        t0 = time.perf_counter()
        np.asarray(jax.device_get(y))
        dt = time.perf_counter() - t0
        samples.append(nbytes / (1024.0 * 1024.0) / max(dt, 1e-9))
    return statistics.median(samples)


def measure_host_ips(sample_path, n_samples: int = 3) -> float:
    """Measure THIS host's single-worker PIL throughput (img/s) with one
    real task shape: decode `sample_path` → rotate-expand → JPEG-encode.

    A constant estimate can't be honest across hosts (this box measures
    ~300 img/s/worker at 224px; a loaded or slower one much less), and the
    backend decision is only as good as both sides of the comparison —
    the link probe is measured, so the host side must be too. Costs a few
    ms per sample; median of `n_samples` (the first warms the file cache).
    Falls back to PER_WORKER_IPS when the sample can't be processed.
    """
    import io
    import statistics
    import time

    try:
        from PIL import Image

        samples = []
        for _ in range(max(n_samples, 1)):
            t0 = time.perf_counter()
            with Image.open(sample_path) as im:
                img = im.convert("RGB")
            img = img.rotate(17.0, expand=True, fillcolor="white")
            buf = io.BytesIO()
            img.save(buf, "JPEG", quality=95)
            samples.append(1.0 / max(time.perf_counter() - t0, 1e-9))
        return statistics.median(samples)
    except Exception as exc:
        LOGGER.warning("host-throughput sample failed (%s); assuming "
                       "%.0f img/s/worker", exc, PER_WORKER_IPS)
        return PER_WORKER_IPS


def pick_balance_backend(
    link_mbps: float,
    avg_img_mb: float,
    host_workers: int,
    per_worker_ips: float = PER_WORKER_IPS,
) -> str:
    """'device' or 'host' from measured link bandwidth (pure, unit-tested).

    The device path is download-bound on narrow links: predicted throughput
    = link_MBps / avg output image MB. The host pool scales with workers.
    Ties go to the device path (wins on encode offload + upload dedup).
    """
    device_ips = link_mbps / max(avg_img_mb, 1e-9)
    host_ips = per_worker_ips * max(host_workers, 1)
    return "device" if device_ips >= host_ips else "host"


# Last resolve_backend decision, for observability (bench.py records which
# executor a balancer run actually used): {"backend", "link_mbps"}.
last_decision: Dict[str, object] = {}


def resolve_backend(tasks, decoded_shapes,
                    workers: Optional[int] = None) -> str:
    """Resolve LEAF_BALANCE_BACKEND (device|host|auto; default auto).

    `decoded_shapes`: source path → (h, w, c) for estimating the average
    output image size the device path would download — either the dict
    itself or a zero-arg callable producing it. Pass a callable when
    building the dict costs I/O (the balancer opens every unique source's
    header): it is only invoked on the auto+TPU path, so an explicit
    backend choice or a non-TPU run never pays the scan.
    """
    choice = os.environ.get("LEAF_BALANCE_BACKEND", "auto").lower()
    if choice in ("device", "host"):
        last_decision.update(backend=choice, link_mbps=None)
        return choice
    if choice != "auto":
        LOGGER.warning("Unknown LEAF_BALANCE_BACKEND=%r; using auto", choice)
    from leaffliction_tpu.core.sysinfo import get_optimal_worker_count

    import jax

    if jax.default_backend() != "tpu":
        # no host<->device link to lose to: keep the in-process jax path
        last_decision.update(backend="device", link_mbps=None)
        return "device"
    if callable(decoded_shapes):
        decoded_shapes = decoded_shapes()
    sizes = []
    for t in tasks:
        shape = decoded_shapes.get(t.source_img)
        if shape is None:
            continue
        h, w = shape[0], shape[1]
        if t.transform == "rotate":
            # expanded canvas downloads larger than the source
            from leaffliction_tpu.ops.augment import rotate_canvas_hw

            h, w = rotate_canvas_hw(h, w)
        sizes.append(h * w * 3 / (1024.0 * 1024.0))
    avg_mb = float(np.mean(sizes)) if sizes else 0.2
    try:
        link = probe_d2h_mbps()
    except Exception as exc:
        LOGGER.warning("d2h probe failed (%s); using host pool", exc)
        last_decision.update(backend="host", link_mbps=0.0)
        return "host"
    # measure the host side with one real task shape too — a constant
    # per-worker estimate was off 2x on this host and biased every
    # borderline decision toward the slower path
    host_ips = PER_WORKER_IPS
    for t in tasks:
        if t.source_img in decoded_shapes or os.path.exists(t.source_img):
            host_ips = measure_host_ips(t.source_img)
            break
    n_workers = workers or get_optimal_worker_count()
    backend = pick_balance_backend(link, avg_mb, n_workers, host_ips)
    LOGGER.info("Balance backend auto: d2h %.1f MB/s, avg img %.2f MB, "
                "host %.0f img/s x %d workers -> %s",
                link, avg_mb, host_ips, n_workers, backend)
    last_decision.update(backend=backend, link_mbps=round(link, 1),
                         host_ips=round(host_ips, 1))
    return backend
