"""Unit tests for the device ops against the numpy oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

from review_recommender_tpu.index.build import build_product_index
from review_recommender_tpu.ops.bm25 import (
    bm25_candidate_scores,
    bm25_full_scores,
    bm25_topk,
)
from review_recommender_tpu.ops.dense import dense_topk, dense_topk_batched
from review_recommender_tpu.ops.gate import gate_factors_device
from review_recommender_tpu.ops.segment import best_review_scores
from review_recommender_tpu.utils.text import tokenize_document, tokenize_query
from tests import oracle


def _build(texts, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    n = len(texts)
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    return build_product_index(
        [f"S{i}" for i in range(n)], texts,
        rng.integers(0, 100, n).astype(float),
        rng.uniform(1, 5, n),
        emb, doc_terms_cap=32, pad_multiple=8,
    )


TEXTS = [
    "yellow socks with cats and kittens great socks",
    "wireless bluetooth headphones noise cancelling headphones",
    "mechanical keyboard rgb gaming keyboard keyboard",
    "red running shoes comfortable shoes",
    "stainless steel kitchen knife set knife knife knife",
    "green tea organic tea tea tea tea",
]


class TestBM25:
    @pytest.mark.parametrize("query", [
        "socks cats", "wireless headphones", "kitchen knife",
        "tea", "keyboard gaming rgb", "nonexistent tokens here",
        "knife knife",  # duplicate query tokens must double-count
    ])
    def test_full_scores_match_oracle(self, query):
        idx = _build(TEXTS)
        ref = oracle.BM25OkapiOracle([tokenize_document(t) for t in TEXTS])
        toks = tokenize_query(query)
        ref_scores = ref.get_scores(toks)

        Q = 8
        q_terms = np.zeros(Q, np.int32)
        q_idf = np.zeros(Q, np.float32)
        for i, t in enumerate(toks[:Q]):
            tid = idx.vocab.get(t, 0)
            q_terms[i] = tid
            q_idf[i] = idx.idf[tid] if tid else 0.0

        got = np.asarray(
            bm25_full_scores(
                jnp.asarray(idx.doc_terms), jnp.asarray(idx.doc_tf),
                jnp.asarray(idx.doc_len), jnp.asarray(q_terms),
                jnp.asarray(q_idf), jnp.float32(idx.avgdl),
            )
        )[: len(TEXTS)]
        np.testing.assert_allclose(got, ref_scores, rtol=1e-4, atol=1e-6)

    def test_candidate_scores_equal_full(self):
        idx = _build(TEXTS)
        toks = tokenize_query("wireless headphones knife")
        Q = 8
        q_terms = np.zeros(Q, np.int32)
        q_idf = np.zeros(Q, np.float32)
        for i, t in enumerate(toks[:Q]):
            tid = idx.vocab.get(t, 0)
            q_terms[i] = tid
            q_idf[i] = idx.idf[tid] if tid else 0.0
        cand = np.array([1, 4, 2], np.int32)
        full = np.asarray(
            bm25_full_scores(
                jnp.asarray(idx.doc_terms), jnp.asarray(idx.doc_tf),
                jnp.asarray(idx.doc_len), jnp.asarray(q_terms),
                jnp.asarray(q_idf), jnp.float32(idx.avgdl),
            )
        )
        got = np.asarray(
            bm25_candidate_scores(
                jnp.asarray(idx.doc_terms[cand]), jnp.asarray(idx.doc_tf[cand]),
                jnp.asarray(idx.doc_len[cand]), jnp.asarray(q_terms),
                jnp.asarray(q_idf), jnp.float32(idx.avgdl),
            )
        )
        np.testing.assert_allclose(got, full[cand], rtol=1e-5)

    def test_bm25_topk_excludes_padding(self):
        idx = _build(TEXTS)
        toks = tokenize_query("tea")
        tid = idx.vocab["tea"]
        q_terms = np.array([tid] + [0] * 7, np.int32)
        q_idf = np.array([idx.idf[tid]] + [0.0] * 7, np.float32)
        scores, top = bm25_topk(
            jnp.asarray(idx.doc_terms), jnp.asarray(idx.doc_tf),
            jnp.asarray(idx.doc_len), jnp.asarray(idx.valid),
            jnp.asarray(q_terms), jnp.asarray(q_idf),
            jnp.float32(idx.avgdl), 3,
        )
        assert int(top[0]) == 5  # the tea doc


class TestDense:
    def test_topk_masks_padding(self, rng):
        emb = np.zeros((16, 8), np.float32)
        emb[:4] = rng.standard_normal((4, 8))
        valid = np.zeros(16, bool)
        valid[:4] = True
        q = rng.standard_normal(8).astype(np.float32)
        scores, idx = dense_topk(jnp.asarray(emb), jnp.asarray(q),
                                 jnp.asarray(valid), 8)
        assert np.isfinite(np.asarray(scores)[:4]).all()
        assert np.all(np.asarray(idx)[:4] < 4)
        assert not np.isfinite(np.asarray(scores)[4:]).any()

    def test_batched_matches_single(self, rng):
        emb = rng.standard_normal((32, 16)).astype(np.float32)
        valid = np.ones(32, bool)
        qs = rng.standard_normal((4, 16)).astype(np.float32)
        bs, bi = dense_topk_batched(jnp.asarray(emb), jnp.asarray(qs),
                                    jnp.asarray(valid), 5)
        for b in range(4):
            ss, si = dense_topk(jnp.asarray(emb), jnp.asarray(qs[b]),
                                jnp.asarray(valid), 5)
            np.testing.assert_array_equal(np.asarray(bi)[b], np.asarray(si))


class TestGateDevice:
    def test_phrase_and_term_hits(self):
        idx = _build(TEXTS)
        from review_recommender_tpu.engine.featurize import QueryFeaturizer

        qf = QueryFeaturizer(idx).featurize("yellow cat socks")
        P = len(TEXTS)
        factor, hits = gate_factors_device(
            jnp.asarray(idx.gate_bits[:P]), jnp.asarray(idx.doc_terms[:P]),
            jnp.asarray(qf.group_phrase_mask), jnp.asarray(qf.group_term_ids),
            jnp.asarray(qf.group_valid), jnp.float32(0.5),
        )
        factor = np.asarray(factor)
        # doc 0 has yellow+cats+socks -> all 3 groups hit -> factor 1
        assert factor[0] == pytest.approx(1.0)
        # doc 1 (headphones) misses all 4 groups (color set, {yellow},
        # cat synonyms, {socks}) -> 0.5^4
        assert factor[1] == pytest.approx(0.0625)
        # parity with the exact host gate on these texts
        from review_recommender_tpu.utils.text import calculate_gate_factor

        for i, t in enumerate(TEXTS):
            f, _, _ = calculate_gate_factor(t, qf.groups, 0.5)
            assert factor[i] == pytest.approx(f), (i, t)

    def test_zero_penalty_zero_miss(self):
        idx = _build(TEXTS)
        from review_recommender_tpu.engine.featurize import QueryFeaturizer

        qf = QueryFeaturizer(idx).featurize("socks")
        factor, _ = gate_factors_device(
            jnp.asarray(idx.gate_bits[:1]), jnp.asarray(idx.doc_terms[:1]),
            jnp.asarray(qf.group_phrase_mask), jnp.asarray(qf.group_term_ids),
            jnp.asarray(qf.group_valid), jnp.float32(0.0),
        )
        assert np.asarray(factor)[0] == pytest.approx(1.0)  # 0^0 == 1


class TestSegmentMax:
    def test_best_review_scores(self, rng):
        M, D, N = 40, 16, 5
        emb = rng.standard_normal((M, D)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        seg = rng.integers(0, N, M).astype(np.int32)
        q = rng.standard_normal(D).astype(np.float32)
        valid = np.ones(M, bool)
        best = np.asarray(
            best_review_scores(jnp.asarray(emb), jnp.asarray(seg),
                               jnp.asarray(valid), jnp.asarray(q), N)
        )
        sims = emb @ q
        for p in range(N):
            mask = seg == p
            if mask.any():
                assert best[p] == pytest.approx(sims[mask].max(), rel=1e-5)
