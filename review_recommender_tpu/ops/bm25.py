"""BM25 Okapi scoring on device.

Scores are numerically identical to the reference's rank_bm25.BM25Okapi path
(k1=1.5, b=0.75, idf with epsilon floor computed at index build —
see index/build.py:compute_idf and the oracle in tests/oracle.py), provided
DOC_TERMS_CAP did not truncate the document's unique-term list.

Two variants:
  - bm25_candidate_scores: scores only the P candidates of the dense pool.
    Parity-exact with the reference engine, which scores the whole corpus
    and then selects candidates (app/app_product_search.py:201-208) — per-doc
    BM25 scores are independent, so candidate-only scoring gives identical
    values at ~1/300th the work.
  - bm25_full_scores: scores the entire corpus (the standalone BM25 retrieval
    mode, BASELINE.json config 2). Scans over query terms with lax.scan so
    the (N, L) postings arrays are read once per term without materializing
    an (N, L, Q) intermediate. A fused Pallas kernel (ops/pallas/bm25.py)
    reads the postings exactly once total.

Inputs use the index-bundle layout: per-doc padded unique-term ids
(PAD_TERM_ID=0) and term frequencies; the query side is (Q,) padded term ids
with per-term idf (0 for PAD / out-of-vocab, which zeroes their
contribution, matching rank_bm25's skip of unknown tokens).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

K1 = 1.5
B = 0.75


def _tf_norm(doc_len: jax.Array, avgdl: jax.Array) -> jax.Array:
    """k1 * (1 - b + b * dl/avgdl) — the Okapi length normalization."""
    return K1 * (1.0 - B + B * doc_len / avgdl)


def bm25_candidate_scores(
    doc_terms: jax.Array,  # (P, L) int32
    doc_tf: jax.Array,  # (P, L) f32
    doc_len: jax.Array,  # (P,) f32
    q_terms: jax.Array,  # (Q,) int32, 0 = pad
    q_idf: jax.Array,  # (Q,) f32, 0 for pad / unknown
    avgdl: jax.Array,  # scalar f32
) -> jax.Array:
    """BM25 scores for a small candidate pool. O(P*L*Q) elementwise on VPU."""
    # (P, L, Q) match is fine at pool sizes (150*512*32 ≈ 2.4M lanes)
    match = doc_terms[:, :, None] == q_terms[None, None, :]
    tf = jnp.sum(jnp.where(match, doc_tf[:, :, None], 0.0), axis=1)  # (P, Q)
    norm = _tf_norm(doc_len, avgdl)[:, None]  # (P, 1)
    contrib = q_idf[None, :] * tf * (K1 + 1.0) / (tf + norm)
    return jnp.sum(contrib, axis=1).astype(jnp.float32)


def bm25_full_scores(
    doc_terms: jax.Array,  # (N, L) int32
    doc_tf: jax.Array,  # (N, L) f32
    doc_len: jax.Array,  # (N,) f32
    q_terms: jax.Array,  # (Q,) int32
    q_idf: jax.Array,  # (Q,) f32
    avgdl: jax.Array,
) -> jax.Array:
    """BM25 scores over the whole corpus: scan over query terms."""
    norm = _tf_norm(doc_len, avgdl)  # (N,)

    def step(scores, qi):
        tid, idf = qi
        tf = jnp.sum(jnp.where(doc_terms == tid, doc_tf, 0.0), axis=1)  # (N,)
        scores = scores + idf * tf * (K1 + 1.0) / (tf + norm)
        return scores, None

    init = jnp.zeros(doc_terms.shape[0], dtype=jnp.float32)
    scores, _ = jax.lax.scan(step, init, (q_terms, q_idf))
    return scores


def bm25_candidate_scores_eager(
    doc_terms: jax.Array,  # (P, L) int32
    doc_bm25: jax.Array,  # (P, L) f32 precomputed idf*tf*(k1+1)/(tf+norm)
    q_terms: jax.Array,  # (Q,) int32, 0 = pad
) -> jax.Array:
    """Eager-scored BM25 (BM25S, arXiv:2407.03618): the whole per-(term,doc)
    Okapi contribution is baked into the index at build time
    (index/build.py:eager_bm25_scores), so query scoring is a masked SUM —
    no division, no idf gather, and doc_tf/doc_len never ship to the device.
    Identical values to bm25_candidate_scores by construction. PAD query
    slots (id 0) match only PAD doc lanes, whose contribution is 0."""
    match = doc_terms[:, :, None] == q_terms[None, None, :]
    return jnp.sum(
        jnp.where(match, doc_bm25[:, :, None], 0.0), axis=(1, 2)
    ).astype(jnp.float32)


def bm25_full_scores_eager(
    doc_terms: jax.Array,  # (N, L) int32
    doc_bm25: jax.Array,  # (N, L) f32
    q_terms: jax.Array,  # (Q,) int32
) -> jax.Array:
    """Full-corpus eager BM25: scan over query terms, one masked sum each."""

    def step(scores, tid):
        s = jnp.sum(jnp.where(doc_terms == tid, doc_bm25, 0.0), axis=1)
        return scores + s, None

    init = jnp.zeros(doc_terms.shape[0], dtype=jnp.float32)
    scores, _ = jax.lax.scan(step, init, q_terms)
    return scores


def bm25_topk(
    doc_terms: jax.Array,
    doc_tf: jax.Array,
    doc_len: jax.Array,
    valid: jax.Array,
    q_terms: jax.Array,
    q_idf: jax.Array,
    avgdl: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Standalone sparse retrieval: full-corpus BM25 + top-k."""
    scores = bm25_full_scores(doc_terms, doc_tf, doc_len, q_terms, q_idf, avgdl)
    scores = jnp.where(valid, scores, -jnp.inf)
    kk = min(int(k), scores.shape[0])
    top_scores, idx = jax.lax.top_k(scores, kk)
    return top_scores, idx
