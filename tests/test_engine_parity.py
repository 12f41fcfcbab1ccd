"""End-to-end parity: SearchEngine vs the numpy oracle of the reference.

Builds a small random corpus (f32 embeddings, real texts for BM25/gates),
runs both the JAX engine (GATE_MODE=host for exact gate semantics, f32
embeddings for exact matmul parity) and the oracle, and checks ranking and
per-signal score parity across the reference's four benchmark configs.
"""
import numpy as np
import pytest

from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.engine.search import SearchEngine
from tests import oracle
from review_recommender_tpu.utils.text import tokenize_document


WORDS = (
    "yellow blue red sock socks kitten cat headphone headphones wireless "
    "bluetooth keyboard gaming mouse rgb usb cable charger knife kitchen "
    "steel stainless shoe shoes running comfortable soft cotton shirt tea "
    "green organic leather wallet men phone case waterproof noise anc "
    "cancelling battery long quality great good bad excellent design"
).split()


def make_corpus(n=64, dim=64, seed=0, n_reviews_per=4):
    rng = np.random.default_rng(seed)
    products = []
    reviews = []
    for i in range(n):
        n_words = int(rng.integers(8, 40))
        text = " ".join(rng.choice(WORDS, size=n_words))
        products.append(
            {
                "sku": f"SKU{i:04d}",
                "agg_text": text,
                "n_reviews": float(rng.integers(0, 300)),
                "avg_stars": float(rng.uniform(1, 5)),
            }
        )
        for _ in range(n_reviews_per):
            reviews.append(
                {
                    "sku": f"SKU{i:04d}",
                    "text": " ".join(rng.choice(WORDS, size=10)),
                    "stars": float(rng.integers(1, 6)),
                }
            )
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    remb = rng.standard_normal((len(reviews), dim)).astype(np.float32)
    return products, emb, reviews, remb


@pytest.fixture(scope="module")
def corpus():
    return make_corpus()


@pytest.fixture(scope="module")
def bundle(corpus):
    products, emb, reviews, remb = corpus
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=16, doc_terms_cap=64,
    )


@pytest.fixture(scope="module")
def engine(bundle):
    return SearchEngine(bundle, emb_dtype="float32", gate_mode="host")


def _oracle_inputs(corpus):
    products, emb, _r, _re = corpus
    V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
    skus = [p["sku"] for p in products]
    texts = [p["agg_text"] for p in products]
    n = np.array([p["n_reviews"] for p in products])
    stars = np.array([p["avg_stars"] for p in products])
    bm25 = oracle.BM25OkapiOracle([tokenize_document(t) for t in texts])
    return V, skus, texts, n, stars, bm25


CONFIGS = {
    "dense_only": dict(k=20, rerank_k=0, w_dense=1.0, w_bm25=0.0, w_rerank=0.0,
                       w_prior=0.0, w_best=0.0, prior_C=20.0, min_reviews=1,
                       gate_penalty=0.0),
    "bm25_only": dict(k=20, rerank_k=0, w_dense=0.0, w_bm25=1.0, w_rerank=0.0,
                      w_prior=0.0, w_best=0.0, prior_C=20.0, min_reviews=1,
                      gate_penalty=0.0),
    "hybrid": dict(k=20, rerank_k=0, w_dense=0.5, w_bm25=0.3, w_rerank=0.0,
                   w_prior=0.2, w_best=0.0, prior_C=20.0, min_reviews=5,
                   gate_penalty=0.3),
    "hybrid_rerank": dict(k=50, rerank_k=20, w_dense=0.4, w_bm25=0.2,
                          w_rerank=0.3, w_prior=0.1, w_best=0.0, prior_C=20.0,
                          min_reviews=5, gate_penalty=0.5),
}

QUERIES = [
    "yellow cat socks",
    "wireless bluetooth headphones noise cancelling",
    "stainless steel kitchen knife",
    "comfortable running shoes",
    "usb charging cable long",
]


@pytest.mark.integration
@pytest.mark.parametrize("cfg_name", list(CONFIGS))
@pytest.mark.parametrize("query", QUERIES)
def test_engine_matches_oracle(engine, corpus, cfg_name, query):
    cfg = CONFIGS[cfg_name]
    V, skus, texts, n, stars, bm25 = _oracle_inputs(corpus)

    rng = np.random.default_rng(hash(query) % (2**32))
    qvec = rng.standard_normal(V.shape[1]).astype(np.float32)
    qvec /= np.linalg.norm(qvec)

    # deterministic fake cross-encoder: hash-free, depends on text length
    def fake_ce(q, texts_):
        return np.array([len(t) % 97 / 97.0 for t in texts_], np.float32)

    engine.cross_encoder = fake_ce
    pool = max(cfg["k"], cfg["rerank_k"], 150)
    rr_k = min(cfg["rerank_k"], min(pool, len(skus)))
    # oracle needs the rerank scores aligned to ITS candidate order; compute
    # after we know the oracle pool (identical dense pool by construction)
    cand_idx, _ = oracle.cosine_topk_np(qvec, V, min(pool, len(skus)))
    rr_scores = (
        fake_ce(query, [texts[i][:2000] for i in cand_idx[:rr_k]])
        if rr_k > 0 else None
    )

    ref_skus, ref_final, ref_sig = oracle.reference_search_oracle(
        qvec, query, V, skus, texts, n, stars, bm25, skus,
        rerank_scores=rr_scores, best_scores_by_sku=None, **cfg,
    )

    df, snips, debug = engine.run_search(query, qvec=qvec, use_snips=False, **cfg)

    got_skus = df["sku"].tolist()
    got_final = df["_final"].to_numpy()

    np.testing.assert_allclose(got_final, ref_final, rtol=2e-4, atol=2e-5)
    # ranking parity: allow swaps only between near-ties
    for i, (a, b) in enumerate(zip(got_skus, ref_skus)):
        if a != b:
            assert abs(got_final[i] - ref_final[i]) < 1e-4, (
                f"rank {i}: {a} vs {b} with scores "
                f"{got_final[i]} vs {ref_final[i]}"
            )


@pytest.mark.integration
def test_engine_snippets(engine, corpus):
    _V, skus, *_ = _oracle_inputs(corpus)
    rng = np.random.default_rng(7)
    qvec = rng.standard_normal(64).astype(np.float32)
    qvec /= np.linalg.norm(qvec)
    df, snips, debug = engine.run_search(
        "yellow cat socks", qvec=qvec, k=5, rerank_k=0, w_dense=1.0,
        w_bm25=0.0, w_rerank=0.0, w_prior=0.0, w_best=0.3,
        prior_C=20.0, min_reviews=1, gate_penalty=0.5, use_snips=True,
    )
    assert len(snips) > 0
    # snippet scores must equal the max review sim for that product
    products, emb, reviews, remb = corpus
    remb_n = remb / np.linalg.norm(remb, axis=1, keepdims=True)
    by_sku = {}
    for r, e in zip(reviews, remb_n):
        by_sku.setdefault(r["sku"], []).append(float(e @ qvec))
    for sku, s in snips.items():
        assert s["score"] == pytest.approx(max(by_sku[sku]), rel=1e-4)
    assert (df["_best"].to_numpy() >= 0).all()


@pytest.mark.integration
def test_engine_debug_and_columns(engine, corpus):
    rng = np.random.default_rng(3)
    qvec = rng.standard_normal(64).astype(np.float32)
    df, snips, debug = engine.run_search(
        "wireless keyboard", qvec=qvec, k=10, rerank_k=0, w_dense=1.0,
        w_bm25=0.2, w_rerank=0.0, w_prior=0.1, w_best=0.0, prior_C=20.0,
        min_reviews=8, gate_penalty=0.5,
    )
    for col in ["sku", "_dense", "_bm25", "_rerank", "_prior", "_best",
                "_trust", "_gate", "_final"]:
        assert col in df.columns
    assert debug["tokens"] == ["wireless", "keyboard"]
    assert debug["pool"] >= 64
    assert (np.diff(df["_final"].to_numpy()) <= 1e-9).all()  # sorted desc
