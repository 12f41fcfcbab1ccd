"""Cross-engine knob contract: ONE canonical parameter surface.

VERDICT r2 item 3: the single-chip SearchEngine and the mesh
ShardedSearchEngine must accept the SAME run_search payload — same knob
spelling (`prior_C`, `rerank_k`, `max_scan`, `use_snips`, ...), same
defaults, same semantics — so any caller (HTTP service, CLI, eval harness)
can drive either engine with the same request. Every test here sends one
payload to both engines on the same bundle and compares results.

Runs on the 8-virtual-device CPU mesh (conftest.py).
"""
import inspect

import numpy as np
import pytest

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.parallel.sharded import ShardedSearchEngine
from tests.test_engine_parity import make_corpus


@pytest.fixture(scope="module")
def bundle():
    products, emb, reviews, remb = make_corpus(n=96, dim=64, seed=7)
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=16, doc_terms_cap=64,
    )


def _fake_cross_encoder(query, texts):
    """Deterministic stand-in scoring: depends only on (query, text)."""
    return np.asarray(
        [((hash((query, t[:50])) % 1000) / 1000.0) for t in texts],
        np.float32,
    )


@pytest.fixture(scope="module")
def single(bundle):
    return SearchEngine(bundle, emb_dtype="float32", gate_mode="device",
                        cross_encoder=_fake_cross_encoder)


@pytest.fixture(scope="module")
def sharded(bundle):
    return ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32",
                               gate_mode="device",
                               cross_encoder=_fake_cross_encoder)


def _qvec(seed, dim=64):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _compare(df_s, df_m, rtol=2e-4, atol=2e-5):
    assert df_s["sku"].tolist() == df_m["sku"].tolist()
    for col in ("_dense", "_bm25", "_rerank", "_prior", "_best", "_trust",
                "_gate", "_final"):
        np.testing.assert_allclose(
            df_s[col].to_numpy(), df_m[col].to_numpy(), rtol=rtol, atol=atol,
            err_msg=f"column {col}",
        )


class TestSignatureParity:
    def test_same_parameter_names(self):
        """The two run_search signatures are literally identical."""
        ps = inspect.signature(SearchEngine.run_search).parameters
        pm = inspect.signature(ShardedSearchEngine.run_search).parameters
        assert list(ps) == list(pm)

    def test_same_defaults(self):
        ps = inspect.signature(SearchEngine.run_search).parameters
        pm = inspect.signature(ShardedSearchEngine.run_search).parameters
        for name in ps:
            assert ps[name].default == pm[name].default, name


# one payload per knob (and combinations), sent verbatim to BOTH engines
KNOB_PAYLOADS = [
    {},  # all defaults
    {"k": 5},
    {"k": 20, "rerank_k": 0},
    {"w_dense": 0.9, "w_bm25": 0.05},
    {"w_rerank": 0.0, "w_prior": 0.5, "w_best": 0.0},
    {"prior_C": 50.0},
    {"prior_C": 1.0, "min_reviews": 2},
    {"gate_penalty": 0.25},
    {"min_reviews": 20},
    {"use_snips": True, "k": 8},
    {"use_snips": True, "max_scan": 40, "k": 8},   # exact host snippets
    {"use_snips": True, "max_scan": -1, "k": 8},   # MAX_REVIEWS_SCAN cap
    {"rerank_k": 12, "w_rerank": 0.4, "k": 8},     # live cross-encoder
    {"rerank_k": 12, "w_rerank": 0.4, "prior_C": 35.0, "use_snips": True,
     "max_scan": 60, "min_reviews": 3, "gate_penalty": 0.4, "k": 6},
]


class TestKnobContract:
    @pytest.mark.parametrize("payload", KNOB_PAYLOADS,
                             ids=[str(sorted(p)) for p in KNOB_PAYLOADS])
    def test_same_payload_same_results(self, single, sharded, payload):
        q = "wireless bluetooth headphones"
        qv = _qvec(21)
        df_s, snips_s, dbg_s = single.run_search(q, qvec=qv, **payload)
        df_m, snips_m, dbg_m = sharded.run_search(q, qvec=qv, **payload)
        assert len(df_s) == len(df_m)
        _compare(df_s, df_m)
        # snippet texts recovered for the same SKUs with the same content —
        # including WITHOUT max_scan (regression: the sharded fast path used
        # to return top-k-only snippets where the single-chip split path
        # returns the pool-wide dict)
        if payload.get("use_snips"):
            assert set(snips_s) == set(snips_m)
            for sku in snips_s:
                assert snips_s[sku]["text"] == snips_m[sku]["text"]

    def test_host_gate_mode(self, bundle):
        """gate_mode='host' (exact substring semantics) works on the mesh."""
        qv = _qvec(33)
        eng_s = SearchEngine(bundle, emb_dtype="float32", gate_mode="host")
        eng_m = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32",
                                    gate_mode="host")
        q = "yellow socks with cats"
        df_s, _, dbg_s = eng_s.run_search(q, qvec=qv, k=8, rerank_k=0,
                                          gate_penalty=0.3)
        df_m, _, dbg_m = eng_m.run_search(q, qvec=qv, k=8, rerank_k=0,
                                          gate_penalty=0.3)
        assert dbg_s["gate_mode"] == dbg_m["gate_mode"] == "host"
        _compare(df_s, df_m)

    def test_rerank_zero_scores_without_model(self, bundle):
        """rerank_k>0 with no cross-encoder degrades identically (zero
        scores occupy the lanes — reference app:275,279)."""
        qv = _qvec(44)
        eng_s = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
        eng_m = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")
        payload = dict(k=6, rerank_k=10, w_rerank=0.3)
        df_s, _, _ = eng_s.run_search("usb cable", qvec=qv, **payload)
        df_m, _, _ = eng_m.run_search("usb cable", qvec=qv, **payload)
        _compare(df_s, df_m)


class TestBatchedPwContract:
    def test_query_fused_batched_pw_matches_single_chip(self, single, sharded):
        queries = ["wireless headphones", "yellow socks", "usb cable", "mug"]
        qvecs = np.stack([_qvec(50 + i) for i in range(len(queries))])
        weights = [
            (0.55, 0.2, 0.0, 0.2, 0.1, 20.0, 8.0, 0.5),
            (0.9, 0.05, 0.0, 0.0, 0.0, 10.0, 1.0, 1.0),
            (0.3, 0.6, 0.0, 0.1, 0.0, 30.0, 4.0, 0.25),
            (0.5, 0.2, 0.0, 0.2, 0.1, 20.0, 8.0, 0.5),
        ]
        rs, ss, bs = single.query_fused_batched_pw(
            qvecs, queries, weights, pool=64, k=8)
        rm, sm, bm = sharded.query_fused_batched_pw(
            qvecs, queries, weights, pool=64, k=8)
        rs, ss, bs = np.asarray(rs), np.asarray(ss), np.asarray(bs)
        rm, sm, bm = np.asarray(rm), np.asarray(sm), np.asarray(bm)
        assert bm.shape == bs.shape  # (B, k, 7)
        np.testing.assert_array_equal(rs, rm)
        np.testing.assert_allclose(ss, sm, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(bs, bm, rtol=2e-4, atol=2e-5)
