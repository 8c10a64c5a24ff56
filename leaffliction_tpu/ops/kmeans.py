"""Small-k k-means over pixels, on device with a fixed iteration count.

Replaces the seeded cv2.kmeans leaf/background clustering
(`srcs/transform/filters/mask.py:109-140`). Fixed iterations (no
data-dependent convergence test) keep the program static for XLA; k-means on
a few-hundred-K pixel image converges well within 10 rounds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_pixels(img: Array, k: int = 3, iters: int = 10,
                  seed: int = 42) -> tuple[Array, Array]:
    """→ (labels HW int32, centers k×C). Deterministic under `seed`."""
    x = img.astype(jnp.float32).reshape(-1, img.shape[-1])  # [P, C]
    n = x.shape[0]
    key = jax.random.key(seed)
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centers = x[init_idx]

    def assign(centers):
        # [P, k] squared distances via (x-c)^2 expansion (matmul-friendly)
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        c2 = jnp.sum(centers * centers, axis=1)[None, :]
        xc = x @ centers.T
        return jnp.argmin(x2 - 2 * xc + c2, axis=1)

    def body(_, centers):
        labels = assign(centers)
        onehot = jax.nn.one_hot(labels, k, dtype=jnp.float32)  # [P, k]
        counts = jnp.sum(onehot, axis=0)[:, None]
        sums = onehot.T @ x
        new_centers = sums / jnp.maximum(counts, 1.0)
        # keep old center for empty clusters
        return jnp.where(counts > 0, new_centers, centers)

    centers = jax.lax.fori_loop(0, iters, body, centers)
    labels = assign(centers)
    return labels.reshape(img.shape[:-1]), centers


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_segment_greenest(img: Array, k: int = 3, iters: int = 10) -> Array:
    """Boolean mask of the cluster with the highest green dominance
    (`mask.py:109-140` picks the most-plant-like cluster)."""
    labels, centers = kmeans_pixels(img, k=k, iters=iters)
    greenness = centers[:, 1] - 0.5 * (centers[:, 0] + centers[:, 2])
    best = jnp.argmax(greenness)
    return labels == best
