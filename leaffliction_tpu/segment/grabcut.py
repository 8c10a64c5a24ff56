"""On-device GrabCut-equivalent mask refinement (no cv2).

Replaces the one host-side compute step left in the mask pipeline —
`cv2.grabCut(..., iterCount=1, GC_INIT_WITH_MASK)` at
`/root/reference/srcs/transform/filters/mask.py:307-332` — with a
fixed-iteration, fully jittable analog:

1. Fit two diagonal-covariance color GMMs (k components each) to the
   probable-foreground and background pixels with weighted EM, on a
   downsampled image (GrabCut's Orchard-Bouman fit, simplified).
2. Per-pixel unary = log-likelihood ratio fg vs bg at full resolution.
3. Smoothness via ICM sweeps: each pixel flips toward the side favored by
   unary + an edge-aware neighborhood agreement term (the min-cut step
   replaced by iterated conditional modes — same energy family, fixed
   iterations, XLA-friendly).
4. cv2 semantics kept: pixels outside the initial mask are LOCKED
   background (GC_BGD); only probable-foreground pixels may flip.

Everything is static-shaped; usable inside larger jitted pipelines and
under vmap.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array

_LOG2PI = 1.8378770664093453


def _weighted_kmeans(x: Array, w: Array, k: int, iters: int) -> Array:
    """Weighted k-means centers over pixels x [P,C] with weights w [P]."""
    # deterministic init: spread along the luminance ordering of weighted
    # pixels (quantile seeding — stable, no RNG needed)
    lum = x @ jnp.asarray([0.299, 0.587, 0.114])
    order = jnp.argsort(jnp.where(w > 0, lum, jnp.inf))
    n_valid = jnp.maximum(jnp.sum(w > 0).astype(jnp.int32), 1)
    qs = ((jnp.arange(k, dtype=jnp.float32) + 0.5) / k
          * n_valid.astype(jnp.float32)).astype(jnp.int32)
    centers = x[order[jnp.clip(qs, 0, x.shape[0] - 1)]]

    def body(_, centers):
        x2 = jnp.sum(x * x, axis=1, keepdims=True)
        c2 = jnp.sum(centers * centers, axis=1)[None, :]
        d = x2 - 2.0 * (x @ centers.T) + c2
        onehot = jax.nn.one_hot(jnp.argmin(d, axis=1), k) * w[:, None]
        counts = jnp.sum(onehot, axis=0)[:, None]
        new = (onehot.T @ x) / jnp.maximum(counts, 1e-3)
        return jnp.where(counts > 1e-3, new, centers)

    return jax.lax.fori_loop(0, iters, body, centers)


def _fit_gmm(x: Array, w: Array, k: int, km_iters: int = 6,
             em_iters: int = 4):
    """→ (means [k,C], var [k,C], log_pi [k]) by weighted EM from a
    weighted-k-means init."""
    centers = _weighted_kmeans(x, w, k, km_iters)
    var0 = jnp.full((k, x.shape[1]), 100.0)
    log_pi0 = jnp.full((k,), -jnp.log(float(k)))

    def log_prob(means, var, log_pi):
        # [P,k] per-component log density (diagonal gaussians)
        inv = 1.0 / var
        quad = ((x ** 2) @ inv.T - 2.0 * x @ (means * inv).T
                + jnp.sum(means * means * inv, axis=1)[None, :])
        logdet = jnp.sum(jnp.log(var), axis=1)[None, :]
        return log_pi[None, :] - 0.5 * (quad + logdet
                                        + x.shape[1] * _LOG2PI)

    def em(_, carry):
        means, var, log_pi = carry
        lp = log_prob(means, var, log_pi)
        resp = jax.nn.softmax(lp, axis=1) * w[:, None]     # [P,k]
        nk = jnp.sum(resp, axis=0)                         # [k]
        means = (resp.T @ x) / jnp.maximum(nk[:, None], 1e-3)
        ex2 = (resp.T @ (x * x)) / jnp.maximum(nk[:, None], 1e-3)
        var = jnp.clip(ex2 - means * means, 4.0, 1e4)
        log_pi = jnp.log(jnp.maximum(nk / jnp.maximum(jnp.sum(nk), 1e-3),
                                     1e-6))
        return means, var, log_pi

    means, var, log_pi = jax.lax.fori_loop(
        0, em_iters, em, (centers, var0, log_pi0))
    return means, var, log_pi


def _gmm_loglik(pixels: Array, means: Array, var: Array,
                log_pi: Array) -> Array:
    """Pixels [...,C] → log p(x) under the mixture, shape [...]."""
    x = pixels.reshape(-1, pixels.shape[-1])
    inv = 1.0 / var
    quad = ((x ** 2) @ inv.T - 2.0 * x @ (means * inv).T
            + jnp.sum(means * means * inv, axis=1)[None, :])
    logdet = jnp.sum(jnp.log(var), axis=1)[None, :]
    lp = log_pi[None, :] - 0.5 * (quad + logdet + x.shape[-1] * _LOG2PI)
    return jax.nn.logsumexp(lp, axis=1).reshape(pixels.shape[:-1])


@partial(jax.jit, static_argnames=("gmm_k", "icm_iters", "fit_long_side"))
def grabcut_refine(rgb: Array, mask: Array, gmm_k: int = 5,
                   icm_iters: int = 10, fit_long_side: int = 160,
                   smooth_gamma: float = 2.0) -> Array:
    """GrabCut-style refinement: → refined bool mask (subset of `mask`).

    `mask` marks probable foreground (cv2 GC_PR_FGD); everything else is
    locked background, matching the reference's initialization.
    """
    rgb = rgb.astype(jnp.float32)
    m = mask.astype(jnp.bool_)
    h, w = m.shape

    # --- fit GMMs on a downsampled image (Orchard-Bouman analog) ----------
    scale = fit_long_side / max(h, w)
    sh, sw = max(1, int(h * scale)), max(1, int(w * scale))
    small = jax.image.resize(rgb, (sh, sw, 3), "linear")
    small_m = jax.image.resize(m.astype(jnp.float32), (sh, sw), "nearest")
    xs = small.reshape(-1, 3)
    w_fg = small_m.reshape(-1)
    w_bg = 1.0 - w_fg

    fg = _fit_gmm(xs, w_fg, gmm_k)
    bg = _fit_gmm(xs, w_bg, gmm_k)

    # --- unary at full resolution ------------------------------------------
    llr = _gmm_loglik(rgb, *fg) - _gmm_loglik(rgb, *bg)   # >0 → foreground

    # edge-aware smoothness weight: weak across strong color gradients
    diff = jnp.mean(jnp.abs(rgb - jax.image.resize(
        jax.image.resize(rgb, (h // 2 or 1, w // 2 or 1, 3), "linear"),
        (h, w, 3), "linear")), axis=-1)
    edge_w = jnp.exp(-diff / 20.0)                         # [0,1]

    # --- ICM sweeps ----------------------------------------------------------
    def sweep(_, labels):
        neigh = jax.lax.reduce_window(
            labels.astype(jnp.float32), 0.0, jax.lax.add,
            (3, 3), (1, 1), [(1, 1), (1, 1)]) / 9.0
        field = llr + smooth_gamma * edge_w * (2.0 * neigh - 1.0)
        new = field > 0.0
        return new & m                                     # locked background

    labels = jax.lax.fori_loop(0, icm_iters, sweep, m)
    # cv2 keeps PR_FGD when the cut is degenerate; guard empty results
    return jnp.where(jnp.any(labels), labels, m)
