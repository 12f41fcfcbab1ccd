"""Randomized parity fuzzing: SearchEngine vs the numpy oracle.

The fixed-config parity suite (tests/test_engine_parity.py) pins the four
reference benchmark configs; this suite drives the SAME contract through
randomized corpora and knob combinations — uniform random fusion weights,
extreme prior_C / gate_penalty values, degenerate documents (empty text,
stopword-only, single repeated token), adversarial queries (stopword-only,
unknown vocabulary, color + synonym mixes) — and asserts score parity with
the oracle on every draw (reference semantics: run_search,
/root/reference/app/app_product_search.py:245-317).

Seeds are fixed, so failures reproduce; corpus shapes are drawn from a
small set so jit programs are shared across trials (compile cost stays
bounded on the single-core CPU test box).
"""
import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.utils.text import tokenize_document
from tests import oracle

WORDS = (
    "yellow blue red green black sock socks kitten cat headphone headphones "
    "wireless bluetooth keyboard gaming mouse rgb usb cable charger knife "
    "kitchen steel stainless shoe shoes running comfortable soft cotton "
    "shirt tea organic leather wallet men phone case waterproof noise anc "
    "cancelling battery long quality great good bad excellent design 123 "
    "ultra-light 4k"
).split()

STOPWORDS_ONLY = "the a an and or of to in on for with"
DEGENERATE_TEXTS = [
    "",                     # empty doc
    "the and of to a",      # stopword-only doc
    "cable " * 30,          # single repeated token
]

# few distinct (n, dim) shapes so compiled programs are reused across trials
SHAPES = [(48, 32), (64, 32), (100, 32)]


def _make_corpus(rng, n):
    products = []
    for i in range(n):
        if i < len(DEGENERATE_TEXTS):
            text = DEGENERATE_TEXTS[i]
        else:
            text = " ".join(rng.choice(WORDS, size=int(rng.integers(4, 40))))
        products.append({
            "sku": f"F{i:04d}",
            "agg_text": text,
            # include n_reviews=0 and large-volume extremes
            "n_reviews": float(rng.choice([0, 1, 7, 80, 500])),
            "avg_stars": float(rng.uniform(1, 5)),
        })
    return products


def _random_query(rng):
    kind = rng.integers(0, 4)
    if kind == 0:
        return STOPWORDS_ONLY          # tokenizes to nothing -> bm25 zeros
    if kind == 1:
        return "zzzunknown qqqtoken"   # out-of-vocabulary terms
    if kind == 2:                      # color + synonym + free tokens
        return "yellow " + " ".join(rng.choice(WORDS, size=3))
    return " ".join(rng.choice(WORDS, size=int(rng.integers(1, 6))))


def _random_knobs(rng):
    return dict(
        k=int(rng.choice([5, 20, 60])),
        rerank_k=int(rng.choice([0, 10, 30])),
        w_dense=float(rng.uniform(0, 1)),
        w_bm25=float(rng.uniform(0, 1)),
        w_rerank=float(rng.uniform(0, 1)),
        w_prior=float(rng.uniform(0, 1)),
        w_best=0.0,  # snippet signal covered by test_engine_parity
        prior_C=float(rng.choice([1.0, 20.0, 200.0])),
        min_reviews=int(rng.choice([1, 5, 25])),
        gate_penalty=float(rng.choice([0.0, 0.3, 0.9, 1.0])),
    )


def _fake_ce(q, texts_):
    # deterministic stand-in for the cross-encoder forward
    return np.array([len(t) % 97 / 97.0 for t in texts_], np.float32)


@pytest.fixture(scope="module")
def engines():
    """One (engine, oracle inputs) pair per corpus shape, built once."""
    out = {}
    for si, (n, dim) in enumerate(SHAPES):
        rng = np.random.default_rng(1000 + si)
        products = _make_corpus(rng, n)
        emb = rng.standard_normal((n, dim)).astype(np.float32)
        bundle = build_bundle_from_products(
            products, emb, pad_multiple=16, doc_terms_cap=64)
        eng = SearchEngine(bundle, emb_dtype="float32", gate_mode="host")
        eng.cross_encoder = _fake_ce
        V = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        skus = [p["sku"] for p in products]
        texts = [p["agg_text"] for p in products]
        nrev = np.array([p["n_reviews"] for p in products])
        stars = np.array([p["avg_stars"] for p in products])
        bm25 = oracle.BM25OkapiOracle([tokenize_document(t) for t in texts])
        out[(n, dim)] = (eng, V, skus, texts, nrev, stars, bm25)
    return out


@pytest.mark.integration
@pytest.mark.parametrize("trial", range(24))
def test_fuzz_engine_matches_oracle(engines, trial):
    rng = np.random.default_rng(5000 + trial)
    n, dim = SHAPES[trial % len(SHAPES)]
    eng, V, skus, texts, nrev, stars, bm25 = engines[(n, dim)]

    cfg = _random_knobs(rng)
    query = _random_query(rng)
    qvec = rng.standard_normal(dim).astype(np.float32)
    qvec /= np.linalg.norm(qvec)

    pool = max(cfg["k"], cfg["rerank_k"], 150)
    rr_k = min(cfg["rerank_k"], min(pool, len(skus)))
    cand_idx, _ = oracle.cosine_topk_np(qvec, V, min(pool, len(skus)))
    rr_scores = (
        _fake_ce(query, [texts[i][:2000] for i in cand_idx[:rr_k]])
        if rr_k > 0 else None
    )

    ref_skus, ref_final, _sig = oracle.reference_search_oracle(
        qvec, query, V, skus, texts, nrev, stars, bm25, skus,
        rerank_scores=rr_scores, best_scores_by_sku=None, **cfg,
    )

    df, _snips, _debug = eng.run_search(
        query, qvec=qvec, use_snips=False, **cfg)

    got_final = df["_final"].to_numpy()
    np.testing.assert_allclose(got_final, ref_final, rtol=2e-4, atol=2e-5)
    # rank parity up to near-tie swaps (float assoc. differences)
    for i, (a, b) in enumerate(zip(df["sku"].tolist(), ref_skus)):
        if a != b:
            assert abs(got_final[i] - ref_final[i]) < 1e-4, (
                f"trial {trial} rank {i}: {a} vs {b} "
                f"({got_final[i]} vs {ref_final[i]}) cfg={cfg} q={query!r}"
            )


@pytest.mark.integration
def test_fuzz_k_exceeds_corpus(engines):
    """k > N clamps to the corpus size, matching the oracle."""
    n, dim = SHAPES[0]
    eng, V, skus, texts, nrev, stars, bm25 = engines[(n, dim)]
    rng = np.random.default_rng(77)
    qvec = rng.standard_normal(dim).astype(np.float32)
    qvec /= np.linalg.norm(qvec)
    cfg = dict(k=5 * n, rerank_k=0, w_dense=1.0, w_bm25=0.5, w_rerank=0.0,
               w_prior=0.2, w_best=0.0, prior_C=20.0, min_reviews=1,
               gate_penalty=0.5)
    ref_skus, ref_final, _ = oracle.reference_search_oracle(
        qvec, "usb cable", V, skus, texts, nrev, stars, bm25, skus, **cfg)
    df, _s, _d = eng.run_search("usb cable", qvec=qvec, use_snips=False,
                                **cfg)
    assert len(df) == len(ref_skus) == n
    np.testing.assert_allclose(df["_final"].to_numpy(), ref_final,
                               rtol=2e-4, atol=2e-5)


@pytest.mark.integration
class TestFuzzSharded:
    """Sharding must never change scores (merge-then-fuse invariant):
    the mesh engine's run_search is fuzzed against the single-chip
    engine's over random knob draws — host-gate split path (fake
    cross-encoder riders) and device-gate fused fast path both."""

    @pytest.fixture(scope="class")
    def pair(self):
        import jax

        from review_recommender_tpu.parallel.sharded import (
            ShardedSearchEngine,
        )

        assert len(jax.devices()) == 8
        n, dim = SHAPES[1]
        rng = np.random.default_rng(2000)
        products = _make_corpus(rng, n)
        emb = rng.standard_normal((n, dim)).astype(np.float32)
        bundle = build_bundle_from_products(
            products, emb, pad_multiple=16, doc_terms_cap=64)
        single = SearchEngine(bundle, emb_dtype="float32", gate_mode="host")
        single.cross_encoder = _fake_ce
        mesh = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32",
                                   gate_mode="host",
                                   cross_encoder=_fake_ce)
        return single, mesh, dim

    @pytest.mark.parametrize("trial", range(8))
    def test_mesh_matches_single_chip(self, pair, trial):
        single, mesh, dim = pair
        rng = np.random.default_rng(9000 + trial)
        cfg = _random_knobs(rng)
        query = _random_query(rng)
        qvec = rng.standard_normal(dim).astype(np.float32)
        qvec /= np.linalg.norm(qvec)

        df_s, _x, _y = single.run_search(query, qvec=qvec, use_snips=False,
                                         **cfg)
        df_m, _x, _y = mesh.run_search(query, qvec=qvec, use_snips=False,
                                       **cfg)
        fs, fm = df_s["_final"].to_numpy(), df_m["_final"].to_numpy()
        assert len(fs) == len(fm), (trial, cfg, query)
        np.testing.assert_allclose(fm, fs, rtol=2e-4, atol=2e-5)
        for i, (a, b) in enumerate(zip(df_m["sku"], df_s["sku"])):
            if a != b:  # near-tie swaps only
                assert abs(fm[i] - fs[i]) < 1e-4, (trial, i, a, b, cfg)

    def test_mesh_fast_path_matches_single_chip(self, pair):
        """Device-gate, no rerank: both engines route to their ONE-program
        fused fast path."""
        single, mesh, dim = pair
        s2 = SearchEngine(single.bundle, emb_dtype="float32",
                          gate_mode="device")
        from review_recommender_tpu.parallel.sharded import (
            ShardedSearchEngine,
        )

        m2 = ShardedSearchEngine(single.bundle, n_shards=8,
                                 emb_dtype="float32", gate_mode="device")
        rng = np.random.default_rng(31)
        qvec = rng.standard_normal(dim).astype(np.float32)
        qvec /= np.linalg.norm(qvec)
        cfg = dict(k=12, rerank_k=0, w_dense=0.6, w_bm25=0.3, w_rerank=0.0,
                   w_prior=0.1, w_best=0.0, prior_C=20.0, min_reviews=5,
                   gate_penalty=0.4)
        df_s, _x, dbg_s = s2.run_search("yellow kitten socks", qvec=qvec,
                                        **cfg)
        df_m, _x, dbg_m = m2.run_search("yellow kitten socks", qvec=qvec,
                                        **cfg)
        assert dbg_m.get("fused") and dbg_s.get("fused")  # fast paths hit
        np.testing.assert_allclose(df_m["_final"].to_numpy(),
                                   df_s["_final"].to_numpy(),
                                   rtol=2e-4, atol=2e-5)
