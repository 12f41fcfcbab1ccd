"""Fused candidate scoring: the tail of the query path as one jitted program.

Reproduces, in one fused device computation, what the reference does with a
pandas dataflow over the candidate DataFrame
(app/app_product_search.py:256-312):

  dense   = minmax(pool cosine scores)
  bm25    = minmax(bm25 raw)
  prior   = minmax(bayes(avg_stars, n, C)) * 0.7 + 0.3 * log1p(n)/max(log1p(n))
  rerank  = zeros; rerank[:rr_k] = minmax(cross-encoder scores)
  best    = minmax(best-snippet sims) if snippets were computed else zeros
  trust   = 0.6*ramp(n/min_reviews) + 0.4*log-saturation(n, 80)
  gate    = penalty^(#missed attribute groups)
  final   = (w·signals) * trust * gate        -> top-k

All statistics (min/max, nanmean for the Bayesian global mean, max log-volume)
are computed over *valid* candidate lanes only, so the statically-padded pool
matches the reference's dynamically-sized pool exactly.

NaN semantics are preserved: if any candidate's avg_stars is NaN, the Bayesian
prior's minmax degenerates to zeros — same as the reference's
minmax guard on non-finite bounds (utils.py:52).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from review_recommender_tpu.utils.numerics import minmax_normalize_masked


class FusionWeights(NamedTuple):
    w_dense: jax.Array
    w_bm25: jax.Array
    w_rerank: jax.Array
    w_prior: jax.Array
    w_best: jax.Array
    prior_c: jax.Array
    min_reviews: jax.Array  # f32 (reference uses an int slider; math is float)
    gate_penalty: jax.Array

    @classmethod
    def make(cls, w_dense=0.55, w_bm25=0.20, w_rerank=0.20, w_prior=0.20,
             w_best=0.10, prior_c=20.0, min_reviews=8, gate_penalty=0.5):
        """Device-scalar weights, cached by value: repeated requests with the
        same knobs (the overwhelmingly common serving case) reuse the same
        committed device buffers instead of paying 8 tiny host->device
        transfers per request."""
        key = (float(w_dense), float(w_bm25), float(w_rerank), float(w_prior),
               float(w_best), float(prior_c), float(min_reviews),
               float(gate_penalty))
        hit = _WEIGHTS_CACHE.get(key)
        if hit is not None:
            return hit
        w = cls(*(jnp.float32(v) for v in key))
        if len(_WEIGHTS_CACHE) >= 256:
            _WEIGHTS_CACHE.clear()
        _WEIGHTS_CACHE[key] = w
        return w


_WEIGHTS_CACHE: dict = {}


class FusionResult(NamedTuple):
    final: jax.Array  # (P,) f32, -inf on invalid lanes
    dense: jax.Array
    bm25: jax.Array
    rerank: jax.Array
    prior: jax.Array
    best: jax.Array
    trust: jax.Array
    gate: jax.Array


def _trust(n: jax.Array, min_reviews: jax.Array, sat: float = 80.0) -> jax.Array:
    """Trust with the engine's sat=80 (app/app_product_search.py:303)."""
    ramp = jnp.clip(n / jnp.maximum(min_reviews, 1.0), 0.0, 1.0)
    satv = jnp.minimum(1.0, jnp.log1p(n) / jnp.log1p(jnp.float32(sat)))
    return (0.6 * ramp + 0.4 * satv).astype(jnp.float32)


def fuse_candidates(
    dense_raw: jax.Array,  # (P,) pool cosine scores (descending)
    bm25_raw: jax.Array,  # (P,)
    rerank_raw: jax.Array,  # (P,) raw cross-encoder scores (first rr_k lanes)
    rerank_mask: jax.Array,  # (P,) bool: lanes holding real rerank scores
    best_raw: jax.Array,  # (P,) best-snippet sims (0 where none)
    has_snippets: jax.Array,  # scalar bool
    n_reviews: jax.Array,  # (P,) f32
    avg_stars: jax.Array,  # (P,) f32, NaN allowed
    gate: jax.Array,  # (P,) f32 — from gate_factors_device or host gate
    cand_valid: jax.Array,  # (P,) bool
    w: FusionWeights,
) -> FusionResult:
    P = dense_raw.shape[0]
    valid = cand_valid

    dense = minmax_normalize_masked(dense_raw, valid)
    bm25 = minmax_normalize_masked(bm25_raw, valid)

    # Bayesian prior: global mean = nanmean of avg_stars over valid lanes
    stars_masked = jnp.where(valid, avg_stars, jnp.nan)
    gmean = jnp.nanmean(stars_masked)
    prior_rating = ((avg_stars * n_reviews) + (gmean * w.prior_c)) / (
        n_reviews + w.prior_c + 1e-9
    )
    log_n = jnp.log1p(n_reviews)
    max_log_n = jnp.max(jnp.where(valid, log_n, 0.0))
    prior_volume = log_n / (max_log_n + 1e-9)
    prior = minmax_normalize_masked(prior_rating, valid) * 0.7 + 0.3 * prior_volume
    prior = jnp.where(valid, prior, 0.0).astype(jnp.float32)

    # rerank: minmax over the rr_k lanes only, zeros elsewhere
    rr = minmax_normalize_masked(rerank_raw, rerank_mask & valid)
    rerank = jnp.where(rerank_mask & valid, rr, 0.0)

    # best snippet: minmax over the whole pool *including* zero lanes
    # (reference minmaxes best_contrib with zeros in place, app:288-293)
    best = jnp.where(
        has_snippets, minmax_normalize_masked(best_raw, valid), jnp.zeros(P)
    ).astype(jnp.float32)

    trust = _trust(n_reviews, w.min_reviews)

    final = (
        w.w_dense * dense
        + w.w_bm25 * bm25
        + w.w_rerank * rerank
        + w.w_prior * prior
        + w.w_best * best
    ).astype(jnp.float32)
    final = final * trust * gate
    final = jnp.where(valid, final, -jnp.inf)

    return FusionResult(final, dense, bm25, rerank, prior, best, trust, gate)


def final_topk(result: FusionResult, k: int) -> tuple[jax.Array, jax.Array]:
    """Stable-descending top-k over the fused scores.

    The reference's pandas sort_values is a stable sort (app:312): ties keep
    pool order (i.e. dense-score order). lax.top_k is likewise stable in the
    input index, and the pool is already sorted by dense score.
    """
    kk = min(int(k), result.final.shape[0])
    scores, pos = jax.lax.top_k(result.final, kk)
    return scores, pos
