"""Per-stage timings for the segmentation stack on the live chip.

Times each mask-candidate strategy, the postprocess/score/refine phases,
and the landmarks-filter device ops (CLAHE / Canny / Sobel / Shi-Tomasi)
to rank the next kernel-optimization targets. Sync is a scalar fetch
(relay-safe); each op is timed best-of-3 after a compile warmup.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

_REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

import jax
import jax.numpy as jnp

from leaffliction_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()

IMG = 224
BATCH = 64


def _leafy_batch(rng) -> np.ndarray:
    """Synthetic leaf-ish images: green blob on tan background + noise."""
    yy, xx = np.mgrid[0:IMG, 0:IMG].astype(np.float32)
    cy, cx = IMG / 2, IMG / 2
    blob = (((yy - cy) / (IMG * 0.33)) ** 2
            + ((xx - cx) / (IMG * 0.26)) ** 2) < 1.0
    img = np.empty((IMG, IMG, 3), np.float32)
    img[..., 0] = np.where(blob, 60, 180)
    img[..., 1] = np.where(blob, 140, 160)
    img[..., 2] = np.where(blob, 50, 130)
    out = (img[None] + rng.normal(0, 10, (BATCH, IMG, IMG, 3))).clip(0, 255)
    return out.astype(np.uint8)


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    chk = jax.tree_util.tree_leaves(out)[0]
    assert np.isfinite(float(jnp.sum(chk.astype(jnp.float32))))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        chk = jax.tree_util.tree_leaves(out)[0]
        assert np.isfinite(float(jnp.sum(chk.astype(jnp.float32))))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:42s} {best * 1e3:8.2f} ms/batch-{BATCH} "
          f"({BATCH / best:8.0f} img/s)", flush=True)
    return best


def main() -> None:
    from leaffliction_tpu.ops.clahe import clahe
    from leaffliction_tpu.ops.filters import (
        canny,
        gaussian_blur,
        good_features_to_track,
        sobel_xy,
    )
    from leaffliction_tpu.ops.colorspace import rgb_to_hsv, rgb_to_lab
    from leaffliction_tpu.ops.kmeans import kmeans_segment_greenest
    from leaffliction_tpu.segment import mask as m
    from leaffliction_tpu.segment.config import load_config
    from leaffliction_tpu.cli.transform import default_config_path

    cfg = load_config(default_config_path())
    rng = np.random.default_rng(3)
    imgs = jax.device_put(_leafy_batch(rng))
    imgs_f = imgs.astype(jnp.float32)
    gray = jnp.mean(imgs_f, axis=-1)

    print(f"== mask candidates (batch {BATCH} @ {IMG}px) ==")
    for name, fn in (
        ("hsv_s", lambda x, h, l: m._cand_hsv_s(x, h, cfg)),
        ("hsv_v_dark", lambda x, h, l: m._cand_hsv_v_dark(x, h, cfg)),
        ("hsv_h", lambda x, h, l: m._cand_hsv_h(x, h, cfg)),
        ("lab", lambda x, h, l: m._cand_lab(l)),
        ("kmeans", lambda x, h, l: m._cand_kmeans(x, cfg)),
        ("enhanced", lambda x, h, l: m._cand_enhanced(x, h, l, cfg)),
        ("inclusive", lambda x, h, l: m._cand_inclusive(x, h, l, cfg)),
    ):
        f = jax.jit(jax.vmap(
            lambda x, fn=fn: fn(x, rgb_to_hsv(x), rgb_to_lab(x))))
        timeit(f"cand_{name}", f, imgs_f)

    print("== whole pipeline ==")
    timeit("make_mask_batch(auto)", lambda x: m.make_mask_batch(x, cfg), imgs)

    print("== landmarks device ops (vmapped) ==")
    timeit("clahe", jax.jit(jax.vmap(lambda g: clahe(g, 2.0, 8))), gray)
    timeit("canny(l2)", jax.jit(jax.vmap(
        lambda g: canny(g, 30, 90, l2=True))), gray)
    timeit("sobel_xy", jax.jit(jax.vmap(sobel_xy)), gray)
    timeit("gaussian_blur", jax.jit(jax.vmap(
        lambda g: gaussian_blur(g, 5, 1.0))), gray)
    timeit("kmeans_greenest", jax.jit(jax.vmap(
        lambda x: kmeans_segment_greenest(x, 3, 10))), imgs_f)
    ones = jnp.ones_like(gray, dtype=bool)
    timeit("good_features(40)", jax.jit(jax.vmap(
        lambda g, mk: good_features_to_track(g, mk, 40, 0.3, 7))),
        gray, ones)


if __name__ == "__main__":
    main()
