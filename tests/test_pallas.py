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


class TestBM25PackedKernel:
    @pytest.mark.parametrize("n,l,q", [(256, 64, 8), (700, 96, 16)])
    def test_packed_parity_including_odd_n(self, n, l, q):
        from review_recommender_tpu.ops.pallas.bm25_kernel import (
            bm25_full_scores_packed_pallas,
            pack_postings,
        )

        rng = np.random.default_rng(n * 3 + l)
        terms, tf, dl = _postings(rng, n, l, 500)
        # exercise the sign-bit path: tf >= 128 sets bit 31 of the packed
        # word, which an unmasked arithmetic shift would sign-extend
        tf[0, 0] = 255.0
        tf[1, :2] = 200.0
        dl = tf.sum(1)
        qt = rng.integers(1, 500, q).astype(np.int32)
        qt[0] = terms[0, 0]  # make sure a tf=255 lane is actually scored
        qi = rng.uniform(0.5, 3, q).astype(np.float32)
        avgdl = jnp.float32(dl.mean())

        pk = pack_postings(terms, tf)
        assert pk is not None and pk.shape[0] == l and pk.shape[1] % 512 == 0
        n_pad = pk.shape[1]
        dl_p = np.pad(dl, (0, n_pad - n))
        pal = bm25_full_scores_packed_pallas(
            jnp.asarray(pk), jnp.asarray(dl_p), jnp.asarray(qt),
            jnp.asarray(qi), avgdl, interpret=True,
        )
        ref = bm25_full_scores(
            jnp.asarray(terms), jnp.asarray(tf), jnp.asarray(dl),
            jnp.asarray(qt), jnp.asarray(qi), avgdl,
        )
        np.testing.assert_allclose(np.asarray(pal[:n]), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        # alignment pad rows (term 0, tf 0) score exactly 0
        assert not np.any(np.asarray(pal[n:]))

    def test_pack_postings_guards(self):
        from review_recommender_tpu.ops.pallas.bm25_kernel import pack_postings

        terms = np.array([[1, 2, 0]], np.int32)
        assert pack_postings(terms, np.array([[256.0, 1, 0]], np.float32)) \
            is None  # tf > 255
        assert pack_postings(terms, np.array([[1.5, 1, 0]], np.float32)) \
            is None  # non-integer tf
        big = np.array([[1 << 24, 2, 0]], np.int32)
        assert pack_postings(big, np.array([[1.0, 1, 0]], np.float32)) \
            is None  # term id overflows 24 bits
        ok = pack_postings(terms, np.array([[255.0, 1, 0]], np.float32))
        assert ok is not None

    def test_engine_packed_path_matches_oracle(self, monkeypatch):
        """Force the packed kernel on (interpret-mode) through the engine's
        search_bm25 and check against the rank_bm25 oracle."""
        from review_recommender_tpu.engine.search import SearchEngine
        from review_recommender_tpu.index.build import (
            build_bundle_from_products,
        )
        from review_recommender_tpu.utils.text import (
            tokenize_document,
            tokenize_query,
        )
        from tests import oracle
        from tests.test_engine_parity import make_corpus

        products, emb, _r, _re = make_corpus(n=40, dim=16, seed=23)
        bundle = build_bundle_from_products(products, emb, pad_multiple=8,
                                            doc_terms_cap=64)
        engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
        monkeypatch.setattr(engine, "_pallas_ok", lambda: True)
        # run the kernel in interpret mode on CPU: wrap the topk entry the
        # engine imports from the package namespace at call time
        import review_recommender_tpu.ops.pallas as ppkg

        orig = ppkg.bm25_topk_packed_pallas

        def interp(*a, **kw):
            kw["interpret"] = True
            return orig(*a, **kw)

        monkeypatch.setattr(ppkg, "bm25_topk_packed_pallas", interp)
        query = "wireless bluetooth headphones noise cancelling"
        idx, scores = engine.search_bm25(query, k=10)
        assert engine._bm25_packed_cache is not None  # packed path taken
        texts = [p["agg_text"] for p in products]
        bm = oracle.BM25OkapiOracle([tokenize_document(t) for t in texts])
        ref = bm.get_scores(tokenize_query(query))
        order = np.argsort(-ref, kind="stable")[:10]
        np.testing.assert_allclose(
            np.sort(np.asarray(scores))[::-1],
            np.sort(ref[order])[::-1], rtol=1e-4, atol=1e-5,
        )
        assert int(np.asarray(idx).max()) < bundle.products.n_padded


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
