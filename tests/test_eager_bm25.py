"""Eager-scored BM25 (BM25S-style precomputed contributions): numerical
identity with the classic tf/len path across every consumer."""
import numpy as np
import pytest

import jax.numpy as jnp

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import (
    attach_eager_bm25,
    build_bundle_from_products,
    eager_bm25_scores,
)
from review_recommender_tpu.ops.bm25 import (
    bm25_candidate_scores,
    bm25_candidate_scores_eager,
    bm25_full_scores,
    bm25_full_scores_eager,
)
from review_recommender_tpu.ops.fusion import FusionWeights
from tests.test_engine_parity import make_corpus


@pytest.fixture(scope="module")
def bundles():
    products, emb, _r, _re = make_corpus(n=64, dim=32, seed=41)
    classic = build_bundle_from_products(products, emb, pad_multiple=16,
                                         doc_terms_cap=64)
    eager = build_bundle_from_products(products, emb, pad_multiple=16,
                                       doc_terms_cap=64)
    attach_eager_bm25(eager.products)
    return classic, eager


def test_op_identity(bundles):
    classic, _ = bundles
    p = classic.products
    bm = eager_bm25_scores(p.doc_terms, p.doc_tf, p.doc_len, p.idf, p.avgdl)
    rng = np.random.default_rng(0)
    qt = rng.integers(1, len(p.vocab) + 1, 8).astype(np.int32)
    qi = p.idf[qt]
    full_c = bm25_full_scores(
        jnp.asarray(p.doc_terms), jnp.asarray(p.doc_tf),
        jnp.asarray(p.doc_len), jnp.asarray(qt), jnp.asarray(qi),
        jnp.float32(p.avgdl),
    )
    full_e = bm25_full_scores_eager(
        jnp.asarray(p.doc_terms), jnp.asarray(bm), jnp.asarray(qt)
    )
    np.testing.assert_allclose(np.asarray(full_e), np.asarray(full_c),
                               rtol=1e-5, atol=1e-5)

    cand_c = bm25_candidate_scores(
        jnp.asarray(p.doc_terms[:10]), jnp.asarray(p.doc_tf[:10]),
        jnp.asarray(p.doc_len[:10]), jnp.asarray(qt), jnp.asarray(qi),
        jnp.float32(p.avgdl),
    )
    cand_e = bm25_candidate_scores_eager(
        jnp.asarray(p.doc_terms[:10]), jnp.asarray(bm[:10]), jnp.asarray(qt)
    )
    np.testing.assert_allclose(np.asarray(cand_e), np.asarray(cand_c),
                               rtol=1e-5, atol=1e-5)


def test_engine_identity(bundles):
    classic, eager = bundles
    ec = SearchEngine(classic, emb_dtype="float32", gate_mode="device")
    ee = SearchEngine(eager, emb_dtype="float32", gate_mode="device")
    assert "doc_bm25" in ee.arrays and "doc_tf" not in ee.arrays
    rng = np.random.default_rng(1)
    w = FusionWeights.make(w_dense=0.4, w_bm25=0.5, w_prior=0.1,
                           min_reviews=5, gate_penalty=0.5)
    for seed, q in [(1, "wireless bluetooth headphones"),
                    (2, "yellow cat socks"), (3, "kitchen knife steel")]:
        qv = rng.standard_normal(32).astype(np.float32)
        qv /= np.linalg.norm(qv)
        rc, sc = ec.query_fused(qv, q, w, pool=32, k=10)
        re_, se = ee.query_fused(qv, q, w, pool=32, k=10)
        np.testing.assert_array_equal(np.asarray(rc), np.asarray(re_))
        np.testing.assert_allclose(np.asarray(se), np.asarray(sc),
                                   rtol=1e-5, atol=1e-6)

    # standalone sparse retrieval
    ic, scc = ec.search_bm25("wireless headphones noise", k=10)
    ie, sce = ee.search_bm25("wireless headphones noise", k=10)
    np.testing.assert_allclose(np.asarray(sce), np.asarray(scc),
                               rtol=1e-5, atol=1e-5)


def test_sharded_identity(bundles):
    from review_recommender_tpu.parallel.sharded import ShardedSearchEngine

    classic, eager = bundles
    sc = ShardedSearchEngine(classic, n_shards=8, emb_dtype="float32")
    se = ShardedSearchEngine(eager, n_shards=8, emb_dtype="float32")
    rng = np.random.default_rng(2)
    qv = rng.standard_normal(32).astype(np.float32)
    qv /= np.linalg.norm(qv)
    w = FusionWeights.make(w_dense=0.4, w_bm25=0.5, w_prior=0.1)
    r1, s1 = sc.query_fused(qv, "wireless headphones", w, pool=32, k=8)
    r2, s2 = se.query_fused(qv, "wireless headphones", w, pool=32, k=8)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                               rtol=1e-5, atol=1e-6)
    i1, b1 = sc.bm25_topk("wireless headphones noise", k=10)
    i2, b2 = se.bm25_topk("wireless headphones noise", k=10)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b1),
                               rtol=1e-5, atol=1e-5)


def test_io_roundtrip(bundles, tmp_path):
    from review_recommender_tpu.index.io import load_bundle, save_bundle

    _c, eager = bundles
    save_bundle(eager, tmp_path / "idx")
    loaded = load_bundle(tmp_path / "idx")
    np.testing.assert_array_equal(loaded.products.doc_bm25,
                                  eager.products.doc_bm25)
