"""Feature-flag degradation, exact max_scan mode, last_ts meta, fsspec
loading, and the restricted artifact unpickler (round-2 VERDICT items 3, 4,
7, 9, 10 + ADVICE pickle hardening).

Reference behaviors under test: per-signal gating
(reference config.py:58-61 gating app_product_search.py:119-149,275),
max_scan truncation (app:320-346), result-row meta (app:255), hf:// artifact
transport (reference config.py:34-35).
"""
import pickle

import numpy as np
import pandas as pd
import pytest

from review_recommender_tpu.config import config
from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import (
    build_bundle_from_products,
    build_product_index,
)
from review_recommender_tpu.index.io import load_bundle, save_bundle


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    products, reviews = [], []
    words = ("yellow socks cat kitten wireless headphones keyboard knife "
             "steel running shoes cable usb battery quality great blue red "
             "green leather wallet phone case waterproof noise cancelling "
             "cotton soft shirt tea organic mouse gaming charger long short "
             "bright dark heavy light cheap").split()
    for i in range(24):
        products.append({
            "sku": f"P{i:03d}",
            "agg_text": " ".join(rng.choice(words, size=12)),
            "n_reviews": float(rng.integers(1, 200)),
            "avg_stars": float(rng.uniform(1, 5)),
        })
        for _ in range(3):
            reviews.append({
                "sku": f"P{i:03d}",
                "text": " ".join(rng.choice(words, size=8)),
                "stars": float(rng.integers(1, 6)),
            })
    emb = rng.standard_normal((24, 32)).astype(np.float32)
    remb = rng.standard_normal((len(reviews), 32)).astype(np.float32)
    return products, emb, reviews, remb


@pytest.fixture(scope="module")
def engine(corpus):
    products, emb, reviews, remb = corpus
    bundle = build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=8, doc_terms_cap=32,
    )
    return SearchEngine(bundle, emb_dtype="float32", gate_mode="host")


def _qvec(dim=32, seed=3):
    v = np.random.default_rng(seed).standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


class TestFeatureFlags:
    def test_enable_bm25_false_zeroes_signal(self, engine, monkeypatch):
        df_on, _, dbg_on = engine.run_search(
            "yellow cat socks", qvec=_qvec(), k=5, rerank_k=0, w_bm25=1.0)
        assert dbg_on["bm25_active"]
        assert df_on["_bm25"].abs().sum() > 0
        monkeypatch.setattr(config, "ENABLE_BM25", False, raising=False)
        engine.featurizer._expand_cache.clear()
        df, _, dbg = engine.run_search(
            "yellow cat socks", qvec=_qvec(), k=5, rerank_k=0, w_bm25=1.0)
        assert not dbg["bm25_active"]
        assert float(df["_bm25"].abs().sum()) == 0.0

    def test_enable_reranking_false_skips_cross_encoder(self, engine, monkeypatch):
        calls = []

        def ce(q, texts):
            calls.append(q)
            return np.ones(len(texts), np.float32)

        engine.cross_encoder = ce
        try:
            engine.run_search("socks", qvec=_qvec(), k=5, rerank_k=5)
            assert calls  # flag on: cross-encoder invoked
            calls.clear()
            monkeypatch.setattr(config, "ENABLE_RERANKING", False,
                                raising=False)
            df, _, _ = engine.run_search("socks", qvec=_qvec(), k=5, rerank_k=5)
            assert not calls  # flag off: degraded to zero-score lanes
            assert float(df["_rerank"].abs().sum()) == 0.0
        finally:
            engine.cross_encoder = None

    def test_enable_snippets_false_disables_signal(self, engine, monkeypatch):
        _, snips_on, _ = engine.run_search(
            "steel knife", qvec=_qvec(), k=5, rerank_k=0, use_snips=True)
        assert snips_on
        monkeypatch.setattr(config, "ENABLE_SNIPPETS", False, raising=False)
        df, snips, _ = engine.run_search(
            "steel knife", qvec=_qvec(), k=5, rerank_k=0, use_snips=True)
        assert snips == {}
        assert float(df["_best"].abs().sum()) == 0.0

    def test_metrics_tab_flag_strips_ui(self):
        from review_recommender_tpu.serve.ui import page

        on = page(metrics_tab=True)
        off = page(metrics_tab=False)
        assert "tab-metrics" in on
        assert "tab-metrics" not in off
        assert "tab-search" in off and "tab-how" in off


class TestExactMaxScan:
    def test_exact_matches_device_when_all_rows_fit(self, engine):
        q = _qvec(seed=11)
        df_dev, snips_dev, _ = engine.run_search(
            "socks", qvec=q, k=8, rerank_k=0, use_snips=True, w_best=1.0)
        df_ex, snips_ex, _ = engine.run_search(
            "socks", qvec=q, k=8, rerank_k=0, use_snips=True, w_best=1.0,
            max_scan=10**9)
        assert df_dev["sku"].tolist() == df_ex["sku"].tolist()
        np.testing.assert_allclose(
            df_dev["_best"].to_numpy(), df_ex["_best"].to_numpy(), atol=1e-5)
        assert set(snips_dev) == set(snips_ex)
        for sku in snips_dev:
            assert snips_dev[sku]["text"] == snips_ex[sku]["text"]

    def test_truncation_limits_scanned_rows(self, engine):
        q = _qvec(seed=11)
        _, snips, _ = engine.run_search(
            "socks", qvec=q, k=8, rerank_k=0, use_snips=True, w_best=1.0,
            max_scan=1)
        # only the first candidate review row (file order) can be scored
        assert len(snips) <= 1

    def test_max_scan_minus_one_uses_config_cap(self, engine, monkeypatch):
        monkeypatch.setattr(config, "MAX_REVIEWS_SCAN", 2, raising=False)
        q = _qvec(seed=11)
        _, snips, _ = engine.run_search(
            "socks", qvec=q, k=8, rerank_k=0, use_snips=True, w_best=1.0,
            max_scan=-1)
        assert len(snips) <= 2


class TestLastTs:
    def test_last_ts_roundtrip_and_result_rows(self, tmp_path):
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((3, 16)).astype(np.float32)
        ts = ["2021-01-01T00:00:00Z", "2022-06-01T00:00:00Z",
              "2023-12-31T00:00:00Z"]
        pidx = build_product_index(
            ["A", "B", "C"], ["alpha beta", "gamma delta", "epsilon zeta"],
            [5, 10, 15], [4.0, 3.5, 5.0], emb,
            pad_multiple=4, doc_terms_cap=8, last_ts=ts,
        )
        assert pidx.last_ts == ts
        from review_recommender_tpu.index.schema import IndexBundle

        save_bundle(IndexBundle(products=pidx), tmp_path / "b")
        loaded = load_bundle(tmp_path / "b")
        assert loaded.products.last_ts == ts

        eng = SearchEngine(loaded, emb_dtype="float32")
        df, _, _ = eng.run_search("alpha", qvec=_qvec(16), k=3, rerank_k=0,
                                  min_reviews=1)
        assert "last_ts" in df.columns
        by_sku = dict(zip(df["sku"], df["last_ts"]))
        assert by_sku["A"] == ts[0]


class TestRemoteLoading:
    def test_load_bundle_from_memory_fs(self, corpus, tmp_path):
        fsspec = pytest.importorskip("fsspec")
        products, emb, _r, _re = corpus
        bundle = build_bundle_from_products(
            products, emb, pad_multiple=8, doc_terms_cap=32)
        save_bundle(bundle, tmp_path / "b")
        fs = fsspec.filesystem("memory")
        for f in (tmp_path / "b").iterdir():
            fs.pipe_file(f"/bundle/{f.name}", f.read_bytes())
        loaded = load_bundle("memory://bundle", verify_checksums=True)
        assert loaded.products.n_docs == bundle.products.n_docs
        assert loaded.products.skus == bundle.products.skus
        np.testing.assert_allclose(loaded.products.emb, bundle.products.emb)

    def test_import_reference_artifacts_remote(self, tmp_path):
        fsspec = pytest.importorskip("fsspec")
        from review_recommender_tpu.data.pipeline import (
            import_reference_artifacts,
        )

        rng = np.random.default_rng(1)
        emb = rng.standard_normal((2, 8)).astype(np.float32)
        np.save(tmp_path / "e.npy", emb)
        meta = pd.DataFrame({
            "sku": ["X", "Y"], "agg_text": ["red shoe", "blue sock"],
            "n_reviews": [3, 4], "avg_stars": [4.0, 2.0],
            "last_ts": ["2020-01-01", "2021-01-01"],
        })
        meta.to_parquet(tmp_path / "m.parquet")
        fs = fsspec.filesystem("memory")
        fs.pipe_file("/ref/e.npy", (tmp_path / "e.npy").read_bytes())
        bundle = import_reference_artifacts(
            "memory://ref/e.npy", str(tmp_path / "m.parquet"))
        assert bundle.products.skus == ["X", "Y"]
        assert bundle.products.last_ts == ["2020-01-01", "2021-01-01"]


class TestRestrictedUnpickler:
    def test_legit_blob_loads(self, tmp_path):
        from review_recommender_tpu.data.pipeline import _load_bm25_pickle

        blob = {"skus": ["A"], "corpus": [["red", "shoe"]],
                "tokenizer": "simple_en_v1"}
        p = tmp_path / "ok.pkl"
        p.write_bytes(pickle.dumps(blob))
        with open(p, "rb") as f:
            out = _load_bm25_pickle(f)
        assert out == blob

    def test_malicious_global_refused(self, tmp_path):
        from review_recommender_tpu.data.pipeline import _load_bm25_pickle

        class Evil:
            def __reduce__(self):
                import os

                return (os.system, ("true",))

        p = tmp_path / "evil.pkl"
        p.write_bytes(pickle.dumps(Evil()))
        with open(p, "rb") as f:
            with pytest.raises(pickle.UnpicklingError):
                _load_bm25_pickle(f)


class TestSnippetReviewsCap:
    def test_per_sku_cap(self):
        from review_recommender_tpu.data.prep import (
            filter_reviews_for_snippets,
        )

        df = pd.DataFrame({
            "sku": ["A"] * 5 + ["B"] * 2,
            "text": [f"unique review text {i}" for i in range(7)],
            "stars": [4] * 7,
            "ts": [f"2021-01-0{i+1}" for i in range(5)] + ["2022-01-01",
                                                           "2022-01-02"],
        })
        out = filter_reviews_for_snippets(df, per_sku_cap=3)
        counts = out.groupby("sku").size()
        assert counts["A"] == 3 and counts["B"] == 2
        # newest-first retention: the newest A reviews survive
        assert set(out[out.sku == "A"]["ts"]) == {
            "2021-01-03", "2021-01-04", "2021-01-05"}
        # cap disabled keeps everything
        assert len(filter_reviews_for_snippets(df, per_sku_cap=0)) == 7
