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


def _axis_pass_tuple(lab: Array, mask: Array, axis: int) -> Array:
    """Segmented scan via (value, flag) tuples — fallback for label spaces
    too large for the packed encoding below."""
    barrier = ~mask
    fwd, _ = jax.lax.associative_scan(_seg_max_op, (lab, barrier), axis=axis)
    bwd, _ = jax.lax.associative_scan(_seg_max_op, (lab, barrier), axis=axis,
                                      reverse=True)
    return jnp.where(mask, jnp.maximum(fwd, bwd), 0)


def _use_pallas_cc() -> bool:
    """In-VMEM Pallas propagation rounds on TPU (LEAF_PALLAS_CC=0/1
    overrides). The XLA round streams the label canvas through HBM once
    per scan step; the kernel keeps it in VMEM for the whole round."""
    import os

    flag = os.environ.get("LEAF_PALLAS_CC")
    if flag is not None:
        return flag not in ("0", "false", "")
    return jax.default_backend() == "tpu"


def _propagate(labels: Array, mask: Array, limit: int) -> Array:
    """Spread each component's max label to every pixel of the component.

    The segmented max-scan is done as a PLAIN `cummax` over a packed int32:
    `segment_id << label_bits | label`, where segment_id counts barriers
    (background pixels) up to each position along the scan axis. Segment
    ids are monotone along the scan, so any pixel of a later segment
    outranks the whole earlier prefix — the prefix max restarts at every
    barrier for free. Labels never cross background, exactly like the
    (value, flag) associative scan, but with half the scan traffic and NO
    tuple carries; and the four segment-id cumsums depend only on the mask,
    so they hoist out of the convergence loop entirely (the scanned labels
    change per round; the barrier pattern does not)."""
    h, w = labels.shape[-2], labels.shape[-1]
    limit = min(limit, h + w)

    label_bits = (h * w + 1).bit_length()
    seg_bits = max(h + 1, w + 1).bit_length()
    if label_bits + seg_bits > 31:  # int32 sign bit must stay clear
        def step(lab):
            grown = jax.lax.reduce_window(
                lab, jnp.int32(0), jax.lax.max, (3, 3), (1, 1),
                [(1, 1), (1, 1)]
            )
            lab = jnp.where(mask, grown, 0)
            lab = _axis_pass_tuple(lab, mask, 0)
            return _axis_pass_tuple(lab, mask, 1)
    elif _use_pallas_cc() and labels.ndim == 2:
        # Mosaic masks padded sublanes/lanes of non-aligned logical shapes
        # correctly — hardware-verified bit-exact at 291x291 (h % 8 = 3)
        from leaffliction_tpu.ops.pallas.components import (
            propagate_round_pallas,
        )

        bar = (~mask).astype(jnp.int32)
        segs = [
            jnp.cumsum(bar, axis=0) << label_bits,
            jnp.cumsum(bar[::-1, :], axis=0)[::-1, :] << label_bits,
            jnp.cumsum(bar, axis=1) << label_bits,
            jnp.cumsum(bar[:, ::-1], axis=1)[:, ::-1] << label_bits,
        ]

        interp = jax.default_backend() != "tpu"  # forced-on CPU testing

        def step(lab):
            return propagate_round_pallas(lab, mask, segs[0], segs[1],
                                          segs[2], segs[3], label_bits,
                                          interpret=interp)
    else:
        bar = (~mask).astype(jnp.int32)
        segs = [
            jnp.cumsum(bar, axis=0) << label_bits,
            jnp.cumsum(bar[::-1, :], axis=0)[::-1, :] << label_bits,
            jnp.cumsum(bar, axis=1) << label_bits,
            jnp.cumsum(bar[:, ::-1], axis=1)[:, ::-1] << label_bits,
        ]
        low = (1 << label_bits) - 1

        def axis_pass(lab, axis):
            seg_f, seg_b = segs[0 if axis == 0 else 2], \
                segs[1 if axis == 0 else 3]
            fwd = jax.lax.cummax(seg_f | lab, axis=axis) & low
            bwd = jax.lax.cummax(seg_b | lab, axis=axis, reverse=True) & low
            return jnp.where(mask, jnp.maximum(fwd, bwd), 0)

        def step(lab):
            grown = jax.lax.reduce_window(
                lab, jnp.int32(0), jax.lax.max, (3, 3), (1, 1),
                [(1, 1), (1, 1)]
            )
            lab = jnp.where(mask, grown, 0)
            lab = axis_pass(lab, 0)
            return axis_pass(lab, 1)

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


def _sizes_2d(labels: Array) -> Array:
    """Per-component pixel counts as an [h, w] f32 grid indexed by the
    component representative's (row, col) — SCATTER-FREE.

    A scatter-add histogram over h·w bins costs ~25 ms per 64×224² batch on
    TPU (scatters serialize), and the matching `sizes[labels]` gather
    another ~35 ms. Instead: each label is `rep_flat + 1`, so decompose it
    into (rep_row, rep_col) and accumulate counts with an on-the-fly
    one-hot einsum — the same compare-and-matmul trick the histogram ops
    use. The [P, h] / [P, w] one-hots are bf16 (0/1 exact) fused into MXU
    tiles; f32 accumulation keeps counts exact (< 2^24). Background
    (label 0 → rep −1) one-hots to all-zero rows and never counts.
    """
    h, w = labels.shape[-2], labels.shape[-1]
    v = labels.reshape(-1) - 1                       # [P]; −1 for background
    q = v // w
    r = v % w                                        # (−1) % w = w−1, but q=−1
    oq = (q[:, None] == jnp.arange(h)[None, :]).astype(jnp.bfloat16)
    orr = ((r[:, None] == jnp.arange(w)[None, :]) & (q >= 0)[:, None]
           ).astype(jnp.bfloat16)
    return jnp.einsum("pq,pr->qr", oq, orr,
                      preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("max_iters",))
def largest_component(mask: Array, max_iters: int | None = None) -> Array:
    """Boolean mask of the largest connected component (empty-safe).

    Ties break toward the smallest label — identical to the previous
    argmax-over-label-bins order, because labels sort row-major by
    representative (q, r)."""
    labels = label_components(mask, max_iters)
    h, w = labels.shape[-2], labels.shape[-1]
    sizes = _sizes_2d(labels)
    best = jnp.argmax(sizes)
    best_label = (best // w) * w + (best % w) + 1
    return (labels == best_label) & (jnp.max(sizes) > 0)


def _spread_keep(keep_table: Array, mask: Array, h: int, w: int) -> Array:
    """Per-pixel keep mask from a (rep-row, rep-col)-indexed 0/1 table.

    `keep_table[y, x]` is only ever 1 where (y, x) is a component
    REPRESENTATIVE (other bins count zero pixels), i.e. it is already an
    image seeded at reps — so propagating its max over each component
    (the same `_propagate` machinery, ~1 ms/batch with the Pallas rounds)
    replaces the two lookup matmuls of `_lookup_2d`."""
    seed = jnp.where(keep_table, 1, 0).astype(jnp.int32)
    m = mask.astype(jnp.bool_)
    return _propagate(jnp.where(m, seed, 0), m, h + w) > 0


@partial(jax.jit, static_argnames=("min_size", "max_iters"))
def remove_small_components(
    mask: Array, min_size: int, max_iters: int | None = None
) -> Array:
    """Drop components smaller than `min_size` px (PlantCV `fill` /
    `brown.py:64-74` min-area filtering)."""
    labels = label_components(mask, max_iters)
    h, w = labels.shape[-2], labels.shape[-1]
    keep = _sizes_2d(labels) >= min_size
    return _spread_keep(keep, mask, h, w) & (labels > 0)


def component_count(mask: Array, min_size: int = 1) -> Array:
    """Number of distinct components with ≥ min_size pixels."""
    labels = label_components(mask)
    return jnp.sum(_sizes_2d(labels) >= min_size)
