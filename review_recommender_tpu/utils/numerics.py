"""Numeric primitives, implemented in JAX for device execution.

Each function reproduces the exact semantics of the reference numpy kernels
(/root/reference/utils.py:40-132) but is jittable and shape-polymorphic over
static shapes. These are the building blocks the fused query engine (ops/
fusion.py) composes; they are also exposed standalone for tests and parity
checks against the numpy oracle in tests/oracle.py.

Design notes (TPU):
  - No data-dependent Python control flow: the reference's early-exits on
    empty/degenerate inputs become jnp.where masks so everything stays inside
    one compiled program.
  - minmax_normalize handles the degenerate hi-lo < 1e-12 and non-finite
    cases with masks (reference utils.py:46-55 returns zeros there).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def l2_normalize(x: jax.Array, axis: int = 1, eps: float = 1e-12) -> jax.Array:
    """L2 normalize along `axis` with an epsilon floor (utils.py:40-44)."""
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    n = jnp.maximum(n, eps)
    return x / n


def minmax_normalize(x: jax.Array) -> jax.Array:
    """Min-max normalize to [0, 1]; zeros on degenerate input (utils.py:46-55).

    Degenerate cases (all equal within 1e-12, or non-finite min/max) map to an
    all-zeros output, matching the reference exactly.
    """
    if x.size == 0:
        return x.astype(jnp.float32)
    xf = x.astype(jnp.float32)
    lo = jnp.min(xf)
    hi = jnp.max(xf)
    good = jnp.isfinite(lo) & jnp.isfinite(hi) & ((hi - lo) >= 1e-12)
    scaled = (xf - lo) / (hi - lo + 1e-12)
    return jnp.where(good, scaled, jnp.zeros_like(xf)).astype(jnp.float32)


def minmax_normalize_masked(x: jax.Array, valid: jax.Array) -> jax.Array:
    """Min-max over only the `valid` positions; invalid positions produce 0.

    Needed when the candidate pool is padded to a static size: statistics
    must ignore padding lanes to match the reference's dynamic-length pools.
    """
    xf = x.astype(jnp.float32)
    big = jnp.float32(3.4e38)
    lo = jnp.min(jnp.where(valid, xf, big))
    hi = jnp.max(jnp.where(valid, xf, -big))
    any_valid = jnp.any(valid)
    good = any_valid & jnp.isfinite(lo) & jnp.isfinite(hi) & ((hi - lo) >= 1e-12)
    scaled = (xf - lo) / (hi - lo + 1e-12)
    out = jnp.where(good, scaled, jnp.zeros_like(xf))
    return jnp.where(valid, out, 0.0).astype(jnp.float32)


def bayesian_prior(
    avg_ratings: jax.Array,
    review_counts: jax.Array,
    prior_strength: float | jax.Array = 20.0,
    global_mean: jax.Array | None = None,
) -> jax.Array:
    """Bayesian-shrunk average rating (utils.py:103-109).

    If global_mean is None it is the nanmean of `avg_ratings` — over the
    candidate pool, exactly as the reference computes it per query
    (app/app_product_search.py:197-199).
    """
    if global_mean is None:
        global_mean = jnp.nanmean(avg_ratings)
    return ((avg_ratings * review_counts) + (global_mean * prior_strength)) / (
        review_counts + prior_strength + 1e-9
    )


def trust_score_from_reviews(
    review_counts: jax.Array, min_reviews: int = 8, saturation: int = 50
) -> jax.Array:
    """Trust: 0.6 * linear ramp + 0.4 * log saturation (utils.py:126-132)."""
    ramp = jnp.clip(review_counts / max(min_reviews, 1), 0, 1)
    satv = jnp.minimum(1.0, jnp.log1p(review_counts) / jnp.log1p(max(saturation, 1)))
    return (0.6 * ramp + 0.4 * satv).astype(jnp.float32)


def cosine_similarity_search(
    query_vector: jax.Array, embeddings_matrix: jax.Array, top_k: int
) -> tuple[jax.Array, jax.Array]:
    """Brute-force cosine top-k (utils.py:111-124), MXU matmul + lax.top_k.

    Returns (indices, scores) sorted by descending similarity. top_k is
    clamped to N. Accumulation is f32 regardless of storage dtype.
    """
    sims = jnp.dot(
        embeddings_matrix, query_vector.astype(embeddings_matrix.dtype),
        preferred_element_type=jnp.float32,
    )
    k = min(int(top_k), sims.shape[0])
    scores, idx = jax.lax.top_k(sims, k)
    return idx, scores


def device_fetch(*arrays):
    """Fetch device arrays to host with ASYNC copies started up front.

    Measured on the tunneled TPU: the FIRST device-blocking operation per
    dispatched program costs ~31 ms regardless of kind (a tunnel polling
    interval) — sync-reading k arrays serially costs ~31 ms EACH, and an
    explicit block_until_ready spends one stall before the read spends
    another. Starting async copies for everything and then materializing
    pays the stall once for the whole set (~31 ms + ~1.6 ms/array).
    Throughput paths amortize the stall by fetching whole chunks/batches
    (bench.py chunked streaming, serve/api micro-batching). Returns numpy
    arrays in argument order (non-device inputs pass through np.asarray).
    """
    import numpy as np

    for a in arrays:
        f = getattr(a, "copy_to_host_async", None)
        if f is not None:
            try:
                f()
            except Exception:  # backend without async copies: sync fallback
                pass
    return [np.asarray(a) for a in arrays]
