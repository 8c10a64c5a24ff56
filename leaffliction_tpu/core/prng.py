"""PRNG key discipline.

The framework uses counter-based JAX PRNG everywhere on device: a single root
key per run, `fold_in` for stable per-task / per-image / per-step streams.
This preserves the reference's "derived seed per task" semantics
(`srcs/preprocessing/dataset_balancer.py:127`) while staying functional and
jit-friendly. Host-side decisions that must match the reference byte-for-byte
(split shuffling, source-image sampling) deliberately use Python `random`
instead — see `data/split.py`.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def task_key(key: jax.Array, *ids: int) -> jax.Array:
    """Stable derived stream: fold each integer id into the key in order."""
    for i in ids:
        key = jax.random.fold_in(key, i)
    return key


def epoch_keys(key: jax.Array, epoch: int, n: int) -> jax.Array:
    """`n` per-example keys for one epoch, shaped (n,) for vmap."""
    k = jax.random.fold_in(key, epoch)
    return jax.random.split(k, n)


def key_stream(key: jax.Array) -> Iterator[jax.Array]:
    """Infinite stream of fresh keys (host-side convenience)."""
    count = 0
    while True:
        yield jax.random.fold_in(key, count)
        count += 1


def uniform_scalar(key: jax.Array, lo: float, hi: float) -> jax.Array:
    return jax.random.uniform(key, (), jnp.float32, lo, hi)
