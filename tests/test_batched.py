"""Batched fused-query path: parity with the single-query path.

On CPU the two paths are numerically identical; on TPU hardware the batched
matmul takes a different MXU path than the single matvec and scores can
drift ~1e-3 (near-tie ranks may swap) — the tolerance here reflects the CPU
test environment.
"""
import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.ops.fusion import FusionWeights
from tests.test_engine_parity import make_corpus


@pytest.fixture(scope="module")
def engine():
    products, emb, _r, _re = make_corpus(n=64, dim=32, seed=13)
    bundle = build_bundle_from_products(
        products, emb, pad_multiple=16, doc_terms_cap=64
    )
    return SearchEngine(bundle, emb_dtype="float32", gate_mode="device")


def test_batched_matches_single(engine):
    rng = np.random.default_rng(0)
    queries = ["yellow cat socks", "wireless headphones", "kitchen knife",
               "running shoes"]
    qvecs = rng.standard_normal((4, 32)).astype(np.float32)
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
    w = FusionWeights.make(w_dense=0.5, w_bm25=0.3, w_prior=0.2,
                           min_reviews=5, gate_penalty=0.5)

    rb, sb = engine.query_fused_batched(qvecs, queries, w, pool=48, k=10)
    rb, sb = np.asarray(rb), np.asarray(sb)
    assert rb.shape == (4, 10) and sb.shape == (4, 10)

    for i, q in enumerate(queries):
        r1, s1 = engine.query_fused(qvecs[i], q, w, pool=48, k=10)
        np.testing.assert_allclose(sb[i], np.asarray(s1), rtol=1e-4, atol=1e-5)
        s1 = np.asarray(s1)
        for j, (a, b) in enumerate(zip(np.asarray(r1), rb[i])):
            if a != b:  # rank swap only between near-ties
                assert abs(s1[j] - sb[i][j]) < 1e-3


def test_batched_with_snippets_matches_single():
    from tests.test_engine_parity import make_corpus

    products, emb, reviews, remb = make_corpus(n=32, dim=32, seed=19)
    bundle = build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=8, doc_terms_cap=32,
    )
    eng = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
    rng = np.random.default_rng(2)
    qvecs = rng.standard_normal((3, 32)).astype(np.float32)
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
    queries = ["yellow socks", "wireless headphones", "kitchen knife"]
    w = FusionWeights.make(w_dense=0.6, w_best=0.3, w_bm25=0.1,
                           min_reviews=1, gate_penalty=1.0)
    rb, sb = eng.query_fused_batched(qvecs, queries, w, pool=32, k=8,
                                     use_snips=True)
    for i, q in enumerate(queries):
        r1, s1 = eng.query_fused(qvecs[i], q, w, pool=32, k=8, use_snips=True)
        np.testing.assert_allclose(np.asarray(sb)[i], np.asarray(s1),
                                   rtol=1e-4, atol=1e-5)


def test_stage_timing_in_debug(engine):
    rng = np.random.default_rng(3)
    qv = rng.standard_normal(32).astype(np.float32)
    _df, _s, dbg = engine.run_search("wireless keyboard", qvec=qv, k=5,
                                     rerank_k=0)
    assert "stage_ms" in dbg
    stages = set(dbg["stage_ms"])
    # single-program fast path reports one fused stage; the general path
    # reports the per-stage breakdown
    assert "featurize" in stages
    assert "fused_query" in stages or {"retrieve", "fuse"} <= stages
    assert all(v >= 0 for v in dbg["stage_ms"].values())


def test_batched_sorted_and_valid(engine):
    rng = np.random.default_rng(1)
    qvecs = rng.standard_normal((2, 32)).astype(np.float32)
    rb, sb = engine.query_fused_batched(
        qvecs, ["a b", "c d"], FusionWeights.make(), pool=32, k=8
    )
    sb = np.asarray(sb)
    assert (np.diff(sb, axis=1) <= 1e-9).all()
    assert (np.asarray(rb) < 64).all() and (np.asarray(rb) >= 0).all()


def test_per_query_weights_batch_matches_single(engine):
    """query_fused_batched_pw: a coalesced batch where every query carries
    DIFFERENT fusion weights must match per-query query_fused with those
    weights (the serve/api micro-batcher contract)."""
    rng = np.random.default_rng(7)
    queries = ["yellow cat socks", "wireless headphones", "kitchen knife",
               "running shoes"]
    qvecs = rng.standard_normal((4, 32)).astype(np.float32)
    qvecs /= np.linalg.norm(qvecs, axis=1, keepdims=True)
    knob_sets = [
        (1.0, 0.0, 0.0, 0.0, 0.0, 20.0, 1.0, 1.0),
        (0.0, 1.0, 0.0, 0.0, 0.0, 20.0, 1.0, 1.0),
        (0.5, 0.3, 0.0, 0.2, 0.0, 20.0, 5.0, 0.3),
        (0.4, 0.2, 0.0, 0.1, 0.0, 10.0, 8.0, 0.5),
    ]
    rb, sb, bd = engine.query_fused_batched_pw(
        qvecs, queries, knob_sets, pool=48, k=10)
    rb, sb, bd = np.asarray(rb), np.asarray(sb), np.asarray(bd)
    assert bd.shape == (4, 10, 7)

    for i, q in enumerate(queries):
        w = FusionWeights.make(*knob_sets[i])
        r1, s1 = engine.query_fused(qvecs[i], q, w, pool=48, k=10)
        np.testing.assert_allclose(sb[i], np.asarray(s1), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_array_equal(rb[i], np.asarray(r1))
    # breakdown sanity: blend * trust * gate reproduces the final score
    wmat = np.asarray(knob_sets, np.float32)
    blend = (bd[..., 0] * wmat[:, None, 0] + bd[..., 1] * wmat[:, None, 1]
             + bd[..., 2] * wmat[:, None, 2] + bd[..., 3] * wmat[:, None, 3]
             + bd[..., 4] * wmat[:, None, 4]) * bd[..., 5] * bd[..., 6]
    finite = np.isfinite(sb)
    np.testing.assert_allclose(blend[finite], sb[finite], rtol=1e-4,
                               atol=1e-5)


def test_all_negative_snippet_sims_match_split_path():
    """Corner the fused path's has_snips predicate: when EVERY pool
    candidate's best review sim is negative, the host split path still
    treats the lane as computed ((best_raw != 0).any()) and minmaxes it —
    the device predicate must agree (regression: it used best_raw > 0,
    which zeroed the lane only on the fused path)."""
    products, emb, reviews, remb = make_corpus(n=32, dim=32, seed=23)
    bundle = build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=8, doc_terms_cap=32,
    )
    eng = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
    # anti-correlate the query with every review embedding: sims all < 0
    remb_n = remb / np.linalg.norm(remb, axis=1, keepdims=True)
    qvec = -remb_n.mean(axis=0)
    qvec /= np.linalg.norm(qvec)
    sims = remb_n @ qvec
    assume_all_neg = (sims < 0).all()
    if not assume_all_neg:  # construction failed for this seed: make it so
        qvec = -remb_n[0]
        sims = remb_n @ qvec
        assert (sims < 0).any()
    w = FusionWeights.make(w_dense=0.5, w_best=0.4, w_bm25=0.1,
                           w_rerank=0.0, w_prior=0.0,
                           min_reviews=1, gate_penalty=1.0)
    query = "wireless headphones"

    rf, sf = eng.query_fused(qvec, query, w, pool=32, k=8, use_snips=True)
    df, _snips, _dbg = eng.run_search(
        query, k=8, w_dense=0.5, w_best=0.4, w_bm25=0.1, w_rerank=0.0,
        w_prior=0.0, min_reviews=1, gate_penalty=1.0, use_snips=True,
        rerank_k=0, qvec=qvec,
    )
    np.testing.assert_allclose(
        np.asarray(sf)[: len(df)], df["_final"].to_numpy(),
        rtol=1e-4, atol=1e-5,
    )
    if assume_all_neg:
        # the lane was genuinely computed: minmaxed values, not all zeros
        assert df["_best"].to_numpy().max() > 0
