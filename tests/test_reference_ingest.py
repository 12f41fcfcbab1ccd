"""Reference-artifact ingestion round-trip (VERDICT r4 item 9).

Writes tiny fixture artifacts in the reference deployment's EXACT on-disk
formats (app/app_product_search.py:94-144 + SURVEY.md §1 artifact table):

  product_emb.npy                  (N, D) float32, row-aligned with meta
  product_emb_meta.parquet         sku, n_reviews, avg_stars, last_ts, agg_text
  product_bm25.pkl                 pickle {skus, corpus: [[tok]], tokenizer}
  reviews_with_embeddings.parquet  id, sku, ts, stars, text, embedding

then drives the full path a migrating user would take: `rrt import
--data-dir <ref data dir>` -> bundle -> audit -> SearchEngine query — and
checks the ranking against the reference-semantics oracle computed from the
same raw artifacts. A real reference deployment's data dir works unmodified.
"""
import pickle

import numpy as np
import pandas as pd
import pytest

from review_recommender_tpu.utils.text import tokenize_document
from tests import oracle

N, D = 40, 32
WORDS = ("yellow sock kitten wireless headphone keyboard cable knife "
         "steel shoe running cotton shirt tea green leather wallet phone "
         "case noise battery quality great design").split()


@pytest.fixture(scope="module")
def ref_data_dir(tmp_path_factory):
    """A directory laid out exactly like the reference's data dir."""
    d = tmp_path_factory.mktemp("ref_data")
    rng = np.random.default_rng(3)

    skus = [f"B{i:09d}" for i in range(N)]
    texts = [" ".join(rng.choice(WORDS, size=int(rng.integers(6, 30))))
             for _ in range(N)]
    n_reviews = rng.integers(0, 200, N).astype(np.int64)
    avg_stars = rng.uniform(1, 5, N).round(2)

    # product_emb.npy — float32, UNNORMALIZED (the reference normalizes at
    # load, app:110)
    emb = rng.standard_normal((N, D)).astype(np.float32)
    np.save(d / "product_emb.npy", emb)

    # product_emb_meta.parquet — the nlp/11 schema
    pd.DataFrame({
        "sku": skus, "n_reviews": n_reviews, "avg_stars": avg_stars,
        "last_ts": ["2023-05-01T00:00:00Z"] * N, "agg_text": texts,
    }).to_parquet(d / "product_emb_meta.parquet")

    # product_bm25.pkl — the nlp/12 pickle schema, simple_en_v1 tokens
    blob = {
        "skus": skus,
        "corpus": [tokenize_document(t) for t in texts],
        "tokenizer": "simple_en_v1",
    }
    with open(d / "product_bm25.pkl", "wb") as f:
        pickle.dump(blob, f)

    # reviews_with_embeddings.parquet — the nlp/11 review schema with
    # embedding as list<f32>
    m = N * 3
    rev_emb = rng.standard_normal((m, D)).astype(np.float32)
    pd.DataFrame({
        "id": [f"r{i}" for i in range(m)],
        "sku": [skus[i % N] for i in range(m)],
        "ts": ["2023-01-01T00:00:00Z"] * m,
        "stars": rng.integers(1, 6, m).astype(np.int64),
        "text": [" ".join(rng.choice(WORDS, size=8)) for _ in range(m)],
        "embedding": [row.tolist() for row in rev_emb],
    }).to_parquet(d / "reviews_with_embeddings.parquet")

    return d, {"skus": skus, "texts": texts, "n_reviews": n_reviews,
               "avg_stars": avg_stars, "emb": emb, "rev_emb": rev_emb,
               "blob": blob}


@pytest.fixture(scope="module")
def imported_bundle_dir(ref_data_dir, tmp_path_factory):
    """Run the actual CLI: rrt import --data-dir <ref dir> --out <bundle>."""
    from review_recommender_tpu.serve.cli import main

    d, _raw = ref_data_dir
    out = tmp_path_factory.mktemp("bundle")
    rc = main(["import", "--data-dir", str(d), "--out", str(out),
               "--doc-terms-cap", "64"])
    assert rc == 0
    return out


@pytest.mark.integration
class TestReferenceIngest:
    def test_bundle_audits_clean(self, imported_bundle_dir):
        from review_recommender_tpu.serve.audit import audit_index_dir

        report = audit_index_dir(str(imported_bundle_dir))
        assert report["ok"], report
        assert report["n_docs"] == N
        assert report["has_reviews"] is True

    def test_round_trip_preserves_artifacts(self, ref_data_dir,
                                            imported_bundle_dir):
        from review_recommender_tpu.index.io import load_bundle

        _d, raw = ref_data_dir
        bundle = load_bundle(imported_bundle_dir, verify_checksums=True)
        assert bundle.products.skus == raw["skus"]
        assert bundle.products.agg_texts == raw["texts"]
        np.testing.assert_allclose(bundle.products.n_reviews[:N],
                                   raw["n_reviews"], rtol=1e-6)
        # embeddings are L2-normalized at import (reference normalizes at
        # load, app:110 — same contract)
        Vn = raw["emb"] / np.linalg.norm(raw["emb"], axis=1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(bundle.products.emb[:N], np.float32), Vn,
            rtol=1e-5, atol=1e-6,
        )
        assert bundle.reviews is not None
        assert bundle.reviews.n_reviews_total == N * 3
        assert bundle.meta.get("built_from") == "reference_artifacts"

    def test_query_matches_reference_oracle(self, ref_data_dir,
                                            imported_bundle_dir):
        """Full query path over the ingested bundle vs the oracle computed
        directly from the raw reference artifacts — in particular the BM25
        lane must come from the PICKLE's token lists, not a re-tokenize."""
        from review_recommender_tpu.engine.search import SearchEngine
        from review_recommender_tpu.index.io import load_bundle

        _d, raw = ref_data_dir
        bundle = load_bundle(imported_bundle_dir)
        engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="host")

        V = raw["emb"] / np.linalg.norm(raw["emb"], axis=1, keepdims=True)
        bm25 = oracle.BM25OkapiOracle(raw["blob"]["corpus"])
        cfg = dict(k=15, rerank_k=0, w_dense=0.5, w_bm25=0.3, w_rerank=0.0,
                   w_prior=0.2, w_best=0.0, prior_C=20.0, min_reviews=5,
                   gate_penalty=0.3)
        for seed, query in [(1, "yellow kitten sock"),
                            (2, "wireless headphone noise"),
                            (3, "steel knife quality")]:
            rng = np.random.default_rng(seed)
            qvec = rng.standard_normal(D).astype(np.float32)
            qvec /= np.linalg.norm(qvec)
            ref_skus, ref_final, _sig = oracle.reference_search_oracle(
                qvec, query, V, raw["skus"], raw["texts"],
                np.asarray(raw["n_reviews"], np.float64),
                np.asarray(raw["avg_stars"], np.float64),
                bm25, raw["skus"], **cfg,
            )
            df, _snips, _dbg = engine.run_search(query, qvec=qvec, **cfg)
            got_final = df["_final"].to_numpy()
            np.testing.assert_allclose(got_final, ref_final,
                                       rtol=2e-4, atol=2e-5)
            for i, (a, b) in enumerate(zip(df["sku"], ref_skus)):
                if a != b:
                    assert abs(got_final[i] - ref_final[i]) < 1e-4

    def test_snippets_from_ingested_reviews(self, ref_data_dir,
                                            imported_bundle_dir):
        from review_recommender_tpu.engine.search import SearchEngine
        from review_recommender_tpu.index.io import load_bundle

        _d, raw = ref_data_dir
        bundle = load_bundle(imported_bundle_dir)
        engine = SearchEngine(bundle, emb_dtype="float32", gate_mode="host")
        rng = np.random.default_rng(9)
        qvec = rng.standard_normal(D).astype(np.float32)
        qvec /= np.linalg.norm(qvec)
        df, snips, _dbg = engine.run_search(
            "yellow sock", qvec=qvec, k=5, rerank_k=0, w_dense=1.0,
            w_bm25=0.0, w_rerank=0.0, w_prior=0.0, w_best=0.3, prior_C=20.0,
            min_reviews=1, gate_penalty=1.0, use_snips=True,
        )
        assert snips
        rev_n = raw["rev_emb"] / np.linalg.norm(raw["rev_emb"], axis=1,
                                                keepdims=True)
        best = {}
        for i, e in enumerate(rev_n):
            s = raw["skus"][i % N]
            best[s] = max(best.get(s, -2.0), float(e @ qvec))
        for sku, s in snips.items():
            assert s["score"] == pytest.approx(best[sku], rel=1e-4)

    def test_import_without_optional_artifacts(self, ref_data_dir, tmp_path):
        """Only the two required artifacts (the reference's own
        degraded-BM25 mode, app:122-127): import succeeds, engine answers
        dense-only queries."""
        import shutil

        from review_recommender_tpu.serve.cli import main

        d, _raw = ref_data_dir
        slim = tmp_path / "slim"
        slim.mkdir()
        for name in ("product_emb.npy", "product_emb_meta.parquet"):
            shutil.copy(d / name, slim / name)
        out = tmp_path / "bundle"
        rc = main(["import", "--data-dir", str(slim), "--out", str(out)])
        assert rc == 0
        from review_recommender_tpu.index.io import load_bundle

        bundle = load_bundle(out)
        assert bundle.reviews is None
        assert bundle.products.n_docs == N
