"""Pallas kernel tests (interpret mode on the CPU test mesh) + profiling
utilities. Compiled-mode parity/perf is exercised on real TPU by bench runs.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from review_recommender_tpu.ops.bm25 import bm25_full_scores
from review_recommender_tpu.ops.pallas.bm25_kernel import (
    TILE_N,
    bm25_full_scores_pallas,
)


def _postings(rng, n, l, v):
    terms = rng.integers(0, v, (n, l)).astype(np.int32)
    tf = rng.integers(1, 5, (n, l)).astype(np.float32)
    tf[terms == 0] = 0
    return terms, tf, tf.sum(1)


class TestBM25Kernel:
    @pytest.mark.parametrize("n,l,q", [(256, 128, 8), (512, 256, 32)])
    def test_interpret_parity(self, n, l, q):
        rng = np.random.default_rng(n + l)
        terms, tf, dl = _postings(rng, n, l, 500)
        qt = rng.integers(1, 500, q).astype(np.int32)
        qi = rng.uniform(0.5, 3, q).astype(np.float32)
        avgdl = jnp.float32(dl.mean())
        ref = bm25_full_scores(
            jnp.asarray(terms), jnp.asarray(tf), jnp.asarray(dl),
            jnp.asarray(qt), jnp.asarray(qi), avgdl,
        )
        pal = bm25_full_scores_pallas(
            jnp.asarray(terms), jnp.asarray(tf), jnp.asarray(dl),
            jnp.asarray(qt), jnp.asarray(qi), avgdl, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_pad_terms_contribute_nothing(self):
        rng = np.random.default_rng(0)
        terms, tf, dl = _postings(rng, TILE_N, 128, 100)
        qt = np.array([5, 0, 0, 0], np.int32)  # 3 PAD slots
        qi = np.array([1.0, 0.0, 0.0, 0.0], np.float32)
        pal = bm25_full_scores_pallas(
            jnp.asarray(terms), jnp.asarray(tf), jnp.asarray(dl),
            jnp.asarray(qt), jnp.asarray(qi), jnp.float32(dl.mean()),
            interpret=True,
        )
        only = bm25_full_scores_pallas(
            jnp.asarray(terms), jnp.asarray(tf), jnp.asarray(dl),
            jnp.asarray(qt[:1]), jnp.asarray(qi[:1]), jnp.float32(dl.mean()),
            interpret=True,
        )
        np.testing.assert_allclose(np.asarray(pal), np.asarray(only),
                                   rtol=1e-6, atol=1e-6)

    def test_tile_misalignment_rejected(self):
        rng = np.random.default_rng(1)
        terms, tf, dl = _postings(rng, 100, 64, 50)  # 100 % 256 != 0
        with pytest.raises(AssertionError):
            bm25_full_scores_pallas(
                jnp.asarray(terms), jnp.asarray(tf), jnp.asarray(dl),
                jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.float32),
                jnp.float32(1.0), interpret=True,
            )


class TestEngineSparseRetrieval:
    def test_search_bm25_full_corpus(self):
        from review_recommender_tpu.engine.search import SearchEngine
        from review_recommender_tpu.index.build import build_bundle_from_products
        from review_recommender_tpu.utils.text import tokenize_document, tokenize_query
        from tests.test_engine_parity import make_corpus
        from tests import oracle

        products, emb, _r, _re = make_corpus(n=40, dim=16, seed=21)
        bundle = build_bundle_from_products(products, emb, pad_multiple=8,
                                            doc_terms_cap=64)
        engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
        query = "wireless bluetooth headphones noise cancelling"
        idx, scores = engine.search_bm25(query, k=10)
        texts = [p["agg_text"] for p in products]
        bm = oracle.BM25OkapiOracle([tokenize_document(t) for t in texts])
        ref = bm.get_scores(tokenize_query(query))
        order = np.argsort(-ref, kind="stable")[:10]
        np.testing.assert_allclose(
            np.sort(np.asarray(scores))[::-1], np.sort(ref[order])[::-1],
            rtol=1e-4, atol=1e-5,
        )

    def test_search_dense(self):
        from review_recommender_tpu.engine.search import SearchEngine
        from review_recommender_tpu.index.build import build_bundle_from_products
        from tests.test_engine_parity import make_corpus
        from tests import oracle

        products, emb, _r, _re = make_corpus(n=40, dim=16, seed=22)
        bundle = build_bundle_from_products(products, emb, pad_multiple=8,
                                            doc_terms_cap=32)
        engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
        q = np.random.default_rng(3).standard_normal(16).astype(np.float32)
        idx, scores = engine.search_dense(q, k=5)
        V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        ref_i, ref_s = oracle.cosine_topk_np(q, V, 5)
        np.testing.assert_allclose(np.asarray(scores), ref_s, rtol=1e-5,
                                   atol=1e-6)


class TestProfiling:
    def test_stage_timer(self):
        import time

        from review_recommender_tpu.utils.profiling import StageTimer

        t = StageTimer()
        with t.stage("a"):
            time.sleep(0.01)
        with t.stage("a"):
            pass
        with t.stage("b"):
            pass
        s = t.summary()
        assert s["a"]["count"] == 2 and s["a"]["total_ms"] >= 10
        t.reset()
        assert t.summary() == {}

    def test_latency_stats(self):
        from review_recommender_tpu.utils.profiling import LatencyStats

        ls = LatencyStats(capacity=16)
        assert ls.summary() == {"count": 0}
        for v in [0.01, 0.02, 0.03]:
            ls.record(v)
        s = ls.summary()
        assert s["count"] == 3
        assert 9 < s["p50_ms"] < 31
