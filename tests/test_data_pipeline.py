"""Offline pipeline tests: ETL normalization, product aggregation, embed-job
resume, end-to-end index build, reference-artifact import."""
import json
import pickle

import numpy as np
import pandas as pd
import pytest

from review_recommender_tpu.data.etl import (
    clean_chunk,
    normalize_merge,
    stable_id,
)
from review_recommender_tpu.data.prep import (
    build_products,
    filter_reviews_for_snippets,
    looks_spammy,
)
from review_recommender_tpu.data.embed_job import job_status, run_embed_job


class FakeEncoder:
    """Deterministic text -> vector stand-in (hash of text)."""

    def __init__(self, dim=16):
        self.dim = dim
        self.calls = 0

    def encode(self, texts, batch_size=256):
        self.calls += 1
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            import zlib

            rng = np.random.default_rng(zlib.crc32(str(t).encode()))
            out[i] = rng.standard_normal(self.dim)
        return out / np.maximum(np.linalg.norm(out, axis=1, keepdims=True), 1e-9)


class TestETL:
    def test_column_aliases_and_clamps(self):
        df = pd.DataFrame({
            "ASIN": ["B001", "B002", "B003"],
            "overall": [7, 0.4, 3],
            "reviewText": ["great product would buy again", "short",
                           "solid quality, fast shipping and durable"],
            "unixReviewTime": [1600000000, 1600000001, 1600000002],
        })
        out = clean_chunk(df, "snap")
        # "short" dropped (<10 chars); stars clamped to 1..5
        assert len(out) == 2
        assert out["stars"].tolist() == [5, 3]
        assert out["ts"].iloc[0] == "2020-09-13T12:26:40Z"
        assert (out["source"] == "snap").all()
        assert list(out.columns) == ["id", "sku", "ts", "stars", "text", "source"]

    def test_stable_id_stability_and_distinctness(self):
        a = stable_id("s", "sku1", "some review text")
        assert a == stable_id("s", "sku1", "some review text")
        assert a != stable_id("s", "sku2", "some review text")

    def test_missing_required_columns_skipped(self):
        out = clean_chunk(pd.DataFrame({"foo": [1]}), "x")
        assert len(out) == 0

    def test_normalize_merge_dedups(self, tmp_path):
        csv = tmp_path / "in.csv"
        pd.DataFrame({
            "asin": ["A1", "A1", "A2"],
            "rating": [5, 5, 4],
            "review_text": ["identical text here ok", "identical text here ok",
                            "different text here ok"],
        }).to_csv(csv, index=False)
        merged = normalize_merge([(csv, "csv", "kaggle")],
                                 tmp_path / "out.parquet")
        assert len(merged) == 2  # duplicate id dropped
        assert (tmp_path / "out.parquet").exists()

    def test_jsonl_streaming(self, tmp_path):
        p = tmp_path / "in.jsonl"
        rows = [{"asin": f"B{i}", "overall": 4,
                 "reviewText": f"review number {i} with enough text"}
                for i in range(7)]
        p.write_text("\n".join(json.dumps(r) for r in rows) + "\nnot-json\n")
        from review_recommender_tpu.data.etl import iter_jsonl

        chunks = list(iter_jsonl(p, "snap", chunksize=3))
        total = sum(len(c) for c in chunks)
        assert total == 7


class TestPrep:
    def test_build_products_kpis_and_topk(self):
        reviews = pd.DataFrame({
            "id": [f"r{i}" for i in range(5)],
            "sku": ["A", "A", "A", "B", "B"],
            "ts": ["2020-01-01", "2021-01-01", "2022-01-01",
                   "2020-06-01", "2020-07-01"],
            "stars": [5, 1, 3, 4, 4],
            "text": ["five star text", "one star text", "three star text",
                     "b first", "b second"],
        })
        prod = build_products(reviews, top_k=2)
        a = prod[prod.sku == "A"].iloc[0]
        assert a["n_reviews"] == 3
        assert a["avg_stars"] == pytest.approx(3.0)
        assert a["last_ts"] == "2022-01-01"
        # top-2 by stars desc then recency: 5-star then 3-star
        assert a["agg_text"] == "five star text three star text"

    def test_dedup_by_normalized_text(self):
        reviews = pd.DataFrame({
            "id": ["r1", "r2"], "sku": ["A", "A"],
            "ts": [None, None], "stars": [5, 5],
            "text": ["Same   Text", "same text"],
        })
        prod = build_products(reviews)
        assert prod.iloc[0]["n_reviews"] == 1

    def test_spam_filter(self):
        assert looks_spammy("visit https://spam.example now")
        assert looks_spammy("use code SAVE20 for discount code")
        assert looks_spammy("greaaaaaaaat product")
        assert not looks_spammy("honestly a great product, works fine")
        df = pd.DataFrame({
            "sku": ["A", "A"], "stars": [5, 4],
            "text": ["fine product works well", "buy at www.spam.biz"],
        })
        assert len(filter_reviews_for_snippets(df)) == 1


class TestEmbedJob:
    def test_shards_and_resume(self, tmp_path):
        texts = [f"text number {i}" for i in range(25)]
        enc = FakeEncoder()
        out1 = run_embed_job(texts, enc, tmp_path, shard_rows=10)
        assert out1.shape == (25, 16)
        first_calls = enc.calls
        assert job_status(tmp_path)["complete"]

        # resume: no new encode calls
        out2 = run_embed_job(texts, enc, tmp_path, shard_rows=10)
        assert enc.calls == first_calls
        np.testing.assert_array_equal(out1, out2)

        # delete a shard -> only that shard re-encodes
        (tmp_path / "emb_shard_00001.npy").unlink()
        assert not job_status(tmp_path)["complete"]
        out3 = run_embed_job(texts, enc, tmp_path, shard_rows=10)
        assert enc.calls == first_calls + 1
        np.testing.assert_array_equal(out1, out3)


class TestEndToEnd:
    def test_build_index_from_reviews(self, tmp_path):
        from review_recommender_tpu.data.pipeline import build_index_from_reviews
        from review_recommender_tpu.index.io import load_bundle

        reviews = pd.DataFrame({
            "id": [f"r{i}" for i in range(12)],
            "sku": [f"P{i % 4}" for i in range(12)],
            "ts": ["2021-01-01"] * 12,
            "stars": [(i % 5) + 1 for i in range(12)],
            "text": [f"review {i} about a wireless headphone with bass"
                     for i in range(12)],
        })
        bundle = build_index_from_reviews(
            reviews, FakeEncoder(), tmp_path / "idx", doc_terms_cap=32,
        )
        assert bundle.products.n_docs == 4
        assert bundle.reviews is not None
        loaded = load_bundle(tmp_path / "idx")
        assert loaded.products.n_docs == 4
        assert loaded.reviews.n_reviews_total == bundle.reviews.n_reviews_total

    def test_import_reference_artifacts(self, tmp_path):
        from review_recommender_tpu.data.pipeline import import_reference_artifacts

        rng = np.random.default_rng(0)
        emb = rng.standard_normal((3, 8)).astype(np.float32)
        np.save(tmp_path / "product_emb.npy", emb)
        pd.DataFrame({
            "sku": ["X1", "X2", "X3"],
            "n_reviews": [10, 20, 30],
            "avg_stars": [4.0, 3.5, 5.0],
            "last_ts": ["2021"] * 3,
            "agg_text": ["wireless headphone great", "yellow sock cute",
                         "kitchen knife sharp"],
        }).to_parquet(tmp_path / "meta.parquet")
        # bm25 pickle in a different sku order than meta
        blob = {"skus": ["X3", "X1", "X2"],
                "corpus": [["kitchen", "knife", "sharp"],
                           ["wireless", "headphone", "great"],
                           ["yellow", "sock", "cute"]],
                "tokenizer": "simple_en_v1"}
        with open(tmp_path / "bm25.pkl", "wb") as f:
            pickle.dump(blob, f)

        bundle = import_reference_artifacts(
            tmp_path / "product_emb.npy", tmp_path / "meta.parquet",
            bm25_pkl=tmp_path / "bm25.pkl", out_dir=tmp_path / "idx",
            doc_terms_cap=16,
        )
        p = bundle.products
        assert p.n_docs == 3
        # corpus re-aligned to meta order: X1's tokens are wireless/...
        inv = {v: k for k, v in p.vocab.items()}
        row0_terms = {inv[t] for t in p.doc_terms[0] if t > 0}
        assert row0_terms == {"wireless", "headphone", "great"}
