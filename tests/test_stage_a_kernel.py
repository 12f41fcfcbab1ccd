"""Fused stage-A Pallas kernel (ops/pallas/stage_a_kernel.py) — interpret-
mode correctness vs the exact XLA reference. Compiled-mode timing runs on
the real chip in bench.py (BENCH_STAGEA=1)."""
import numpy as np
import pytest

import jax.numpy as jnp

from review_recommender_tpu.ops.pallas.stage_a_kernel import (
    M_PER_TILE,
    TILE_N,
    stage_a_fused_pallas,
)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    N, D, B, L, Q = 2 * TILE_N, 64, 4, 16, 8
    emb = rng.standard_normal((N, D)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    valid = np.ones(N, bool)
    valid[-5:] = False
    terms = rng.integers(1, 500, (N, L)).astype(np.int32)
    bm25v = rng.random((N, L)).astype(np.float32)
    qvecs = rng.standard_normal((B, D)).astype(np.float32)
    q_terms = rng.integers(1, 500, Q).astype(np.int32)
    return emb, valid, terms, bm25v, qvecs, q_terms


def test_winner_scores_ids_and_bm25_exact(data):
    emb, valid, terms, bm25v, qvecs, q_terms = data
    pool = 24
    dense, idx, bm = stage_a_fused_pallas(
        jnp.asarray(emb), jnp.asarray(valid), jnp.asarray(terms),
        jnp.asarray(bm25v), jnp.asarray(qvecs), jnp.asarray(q_terms),
        pool=pool, interpret=True,
    )
    dense, idx, bm = np.asarray(dense), np.asarray(idx), np.asarray(bm)
    sims = qvecs @ emb.T
    sims[:, ~valid] = -np.inf
    for b in range(qvecs.shape[0]):
        # every returned id's dense score and BM25 value are EXACT
        np.testing.assert_allclose(dense[b], sims[b][idx[b]], rtol=1e-5,
                                   atol=1e-5)
        for j in range(pool):
            row = idx[b, j]
            want = bm25v[row][np.isin(terms[row], q_terms)].sum()
            assert abs(bm[b, j] - want) < 1e-4


def test_per_query_term_sets(data):
    """(B, Q) q_terms: each query's BM25 gather uses its own term set."""
    emb, valid, terms, bm25v, qvecs, _ = data
    rng = np.random.default_rng(7)
    B = qvecs.shape[0]
    qt = rng.integers(1, 500, (B, 8)).astype(np.int32)
    pool = 12
    _dense, idx, bm = stage_a_fused_pallas(
        jnp.asarray(emb), jnp.asarray(valid), jnp.asarray(terms),
        jnp.asarray(bm25v), jnp.asarray(qvecs), jnp.asarray(qt),
        pool=pool, interpret=True,
    )
    idx, bm = np.asarray(idx), np.asarray(bm)
    for b in range(B):
        for j in range(pool):
            row = idx[b, j]
            want = bm25v[row][np.isin(terms[row], qt[b])].sum()
            assert abs(bm[b, j] - want) < 1e-4


def test_recall_vs_exact_topk(data):
    """Approximation contract: with pool <= M_PER_TILE * n_tiles the recall
    against the exact top-pool is high; at pool <= M_PER_TILE it is exact
    unless one tile holds more than M of the true top."""
    emb, valid, terms, bm25v, qvecs, q_terms = data
    pool = M_PER_TILE  # 16 over 2 tiles: exact unless >16 cluster in a tile
    dense, idx, _bm = stage_a_fused_pallas(
        jnp.asarray(emb), jnp.asarray(valid), jnp.asarray(terms),
        jnp.asarray(bm25v), jnp.asarray(qvecs), jnp.asarray(q_terms),
        pool=pool, interpret=True,
    )
    idx = np.asarray(idx)
    sims = qvecs @ emb.T
    sims[:, ~valid] = -np.inf
    recalls = []
    for b in range(qvecs.shape[0]):
        ref = set(np.argsort(-sims[b])[:pool].tolist())
        recalls.append(len(ref & set(idx[b].tolist())) / pool)
    assert np.mean(recalls) >= 0.9, recalls
