"""Connected components on device via iterative label propagation.

Replaces `cv2.connectedComponentsWithStats` / largest-contour selection
(`srcs/transform/filters/mask.py:53-69,446-462`, `brown.py:64-74`). The
algorithm: seed every foreground pixel with its flat index, then propagate
the max label through each component until convergence (lax.while_loop with
early exit); each component ends up labeled by its maximum flat index.
Component sizes come from one scatter-add; "largest component" is an argmax.

Propagation round = one 3×3 max step (8-connectivity, covers diagonal
links) + a segmented max-SCAN along rows and columns (associative_scan with
background pixels as segment barriers). The scans give unbounded reach
along axis-aligned runs per round, so convex/blobby masks converge in 2-3
rounds; the per-round cost is elementwise/log-depth work with NO gather
(measured on TPU: a pointer-jump gather costs ~9 ms per round at 16×224²,
the full scan round ~2 ms). Worst case (spiral) stays exact via the h+w
round bound.

Static shapes, no host sync — usable inside larger jitted pipelines.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def _seg_max_op(a, b):
    """Associative op for a segmented running max: (value, barrier-flag).
    A barrier restarts the segment, so the max never crosses background."""
    av, af = a
    bv, bf = b
    return jnp.where(bf, bv, jnp.maximum(av, bv)), af | bf


def _axis_pass(lab: Array, mask: Array, axis: int) -> Array:
    """Spread each run's max label along `axis` (both directions)."""
    barrier = ~mask
    fwd, _ = jax.lax.associative_scan(_seg_max_op, (lab, barrier), axis=axis)
    bwd, _ = jax.lax.associative_scan(_seg_max_op, (lab, barrier), axis=axis,
                                      reverse=True)
    return jnp.where(mask, jnp.maximum(fwd, bwd), 0)


def _propagate(labels: Array, mask: Array, limit: int) -> Array:
    h, w = labels.shape[-2], labels.shape[-1]
    limit = min(limit, h + w)

    def step(lab):
        grown = jax.lax.reduce_window(
            lab, jnp.int32(0), jax.lax.max, (3, 3), (1, 1), [(1, 1), (1, 1)]
        )
        lab = jnp.where(mask, grown, 0)
        lab = _axis_pass(lab, mask, 0)
        return _axis_pass(lab, mask, 1)

    def cond(carry):
        prev, cur, i = carry
        return (i < limit) & jnp.any(prev != cur)

    def body(carry):
        _, cur, i = carry
        return cur, step(cur), i + 1

    first = step(labels)
    _, out, _ = jax.lax.while_loop(
        cond, body, (labels, first, jnp.zeros((), jnp.int32))
    )
    return out


@partial(jax.jit, static_argnames=("max_iters",))
def label_components(mask: Array, max_iters: int | None = None) -> Array:
    """int32 label image: 0 = background, components share a unique id."""
    m = mask.astype(jnp.bool_)
    h, w = m.shape[-2], m.shape[-1]
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w
        + jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        + 1
    )
    labels = jnp.where(m, flat, 0)
    limit = max_iters if max_iters is not None else (h + w)
    return _propagate(labels, m, limit)


@partial(jax.jit, static_argnames=("max_iters",))
def largest_component(mask: Array, max_iters: int | None = None) -> Array:
    """Boolean mask of the largest connected component (empty-safe)."""
    labels = label_components(mask, max_iters)
    h, w = labels.shape[-2], labels.shape[-1]
    sizes = jnp.zeros((h * w + 1,), jnp.int32).at[labels.reshape(-1)].add(1)
    sizes = sizes.at[0].set(0)  # background doesn't compete
    best = jnp.argmax(sizes)
    return (labels == best) & (best > 0)


@partial(jax.jit, static_argnames=("min_size", "max_iters"))
def remove_small_components(
    mask: Array, min_size: int, max_iters: int | None = None
) -> Array:
    """Drop components smaller than `min_size` px (PlantCV `fill` /
    `brown.py:64-74` min-area filtering)."""
    labels = label_components(mask, max_iters)
    h, w = labels.shape[-2], labels.shape[-1]
    sizes = jnp.zeros((h * w + 1,), jnp.int32).at[labels.reshape(-1)].add(1)
    keep = sizes >= min_size
    keep = keep.at[0].set(False)
    return keep[labels]


def component_count(mask: Array, min_size: int = 1) -> Array:
    """Number of distinct components with ≥ min_size pixels."""
    labels = label_components(mask)
    h, w = labels.shape[-2], labels.shape[-1]
    sizes = jnp.zeros((h * w + 1,), jnp.int32).at[labels.reshape(-1)].add(1)
    sizes = sizes.at[0].set(0)
    return jnp.sum(sizes >= min_size)
