"""Dense cosine retrieval: one MXU matmul + lax.top_k.

Replaces the reference's numpy argpartition path
(/root/reference/utils.py:111-124, app/app_product_search.py:192-195).

The corpus matrix is stored in bf16 (halves HBM traffic — the matmul reads
N x D bytes per query and is bandwidth-bound at batch 1); accumulation is
always f32 via preferred_element_type. Padding rows are masked to -inf so
they can never enter the pool.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = jnp.float32(-jnp.inf)


def dense_scores(emb: jax.Array, qvec: jax.Array, valid: jax.Array) -> jax.Array:
    """Cosine scores (N_pad,) f32; padding lanes are -inf."""
    sims = jnp.dot(emb, qvec.astype(emb.dtype), preferred_element_type=jnp.float32)
    return jnp.where(valid, sims, NEG_INF)


def dense_topk(
    emb: jax.Array, qvec: jax.Array, valid: jax.Array, pool: int
) -> tuple[jax.Array, jax.Array]:
    """Top-`pool` candidates by cosine similarity.

    Returns (scores (P,), idx (P,)) sorted descending. If fewer than P valid
    rows exist the tail scores are -inf (callers derive a candidate-valid
    mask from that).
    """
    sims = dense_scores(emb, qvec, valid)
    k = min(int(pool), sims.shape[0])
    scores, idx = jax.lax.top_k(sims, k)
    return scores, idx


def dense_topk_batched(
    emb: jax.Array, qvecs: jax.Array, valid: jax.Array, pool: int
) -> tuple[jax.Array, jax.Array]:
    """Batched variant: qvecs (B, D) -> (B, P) scores and indices.

    One (N, D) x (D, B) matmul keeps the MXU busy across a query batch —
    this is the high-QPS serving path (the reference can only do one query
    at a time).
    """
    sims = jnp.dot(emb, qvecs.T.astype(emb.dtype), preferred_element_type=jnp.float32)
    sims = jnp.where(valid[:, None], sims, NEG_INF).T  # (B, N)
    k = min(int(pool), sims.shape[1])
    scores, idx = jax.lax.top_k(sims, k)
    return scores, idx
