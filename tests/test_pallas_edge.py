"""Pallas fused edge kernel: interpret-mode parity with the jnp path."""

import numpy as np

import jax.numpy as jnp

from leaffliction_tpu.ops.filters import _edge_nms_jnp, canny
from leaffliction_tpu.ops.pallas.edge import canny_fused, edge_nms_batch


def _gray():
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    return ((xx * 3 + yy * 2) % 200 + rng.normal(0, 5, (64, 64))
            ).astype(np.float32)


def test_edge_nms_interior_matches_jnp():
    gray = _gray()
    ours = np.asarray(edge_nms_batch(jnp.asarray(gray)[None],
                                     interpret=True)[0])
    ref = np.asarray(_edge_nms_jnp(jnp.asarray(gray), l2=False))
    m = 4  # border margin: zero-pad vs reflect semantics
    a, b = ours[m:-m, m:-m], ref[m:-m, m:-m]
    assert np.abs(a - b).max() < 1e-3


def test_canny_fused_interior_matches(monkeypatch):
    gray = _gray()
    fused = np.asarray(canny_fused(jnp.asarray(gray), 50, 150,
                                   interpret=True))
    ref = np.asarray(canny(jnp.asarray(gray), 50, 150))
    m = 4
    agree = (fused[m:-m, m:-m] == ref[m:-m, m:-m]).mean()
    assert agree > 0.99


def test_hysteresis_fixpoint_matches_bfs_oracle():
    """The while_loop flood must keep exactly the weak pixels 8-connected
    to a strong pixel — checked against an independent NumPy BFS over the
    same weak/strong masks the front end produces."""
    gray = _gray()
    nms = np.asarray(_edge_nms_jnp(jnp.asarray(gray), l2=False))
    low, high = 50.0, 150.0
    strong, weak = nms > high, nms > low
    # BFS from every strong pixel through the weak mask (8-connectivity)
    keep = strong.copy()
    frontier = list(zip(*np.nonzero(strong)))
    h, w = weak.shape
    while frontier:
        y, x = frontier.pop()
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and weak[ny, nx] \
                        and not keep[ny, nx]:
                    keep[ny, nx] = True
                    frontier.append((ny, nx))
    ours = np.asarray(canny(jnp.asarray(gray), low, high, hysteresis=True))
    assert (ours == keep).all()


def test_hysteresis_batched_matches_single():
    """vmapped canny (batched while_loop, shared early-exit cond) must
    equal the per-image result even when images converge at different
    round counts."""
    import jax

    g0 = _gray()
    g1 = np.zeros_like(g0)  # converges in 0 rounds
    g1[10, 5:60] = 255.0    # one long straight edge
    batch = jnp.asarray(np.stack([g0, g1]))
    batched = np.asarray(jax.vmap(lambda g: canny(g, 50, 150))(batch))
    singles = np.stack([np.asarray(canny(jnp.asarray(g), 50, 150))
                        for g in (g0, g1)])
    assert (batched == singles).all()


def test_hysteresis_serpentine_chain_fully_kept():
    """A serpentine weak chain ~h·w/2 pixels long (far beyond h+w rounds)
    must be flooded to the end: the uncapped bound is h·w, and the
    convergence exit, not the cap, is what normally stops the loop."""
    from leaffliction_tpu.ops.filters import hysteresis_flood

    h = w = 24
    weak = np.zeros((h, w), bool)
    # boustrophedon: every other row fully weak, connected at alternating ends
    for y in range(0, h, 2):
        weak[y, :] = True
        if y + 2 < h:
            weak[y + 1, w - 1 if (y // 2) % 2 == 0 else 0] = True
    strong = np.zeros_like(weak)
    strong[0, 0] = True
    chain_len = int(weak.sum())
    assert chain_len > 2 * (h + w)  # the old h+w cap would truncate it

    out = np.asarray(hysteresis_flood(jnp.asarray(strong), jnp.asarray(weak)))
    np.testing.assert_array_equal(out, weak)  # every weak pixel reached

    # an explicit small cap DOES truncate — the knob still works
    capped = np.asarray(hysteresis_flood(jnp.asarray(strong),
                                         jnp.asarray(weak), iters=5))
    assert capped.sum() < chain_len
