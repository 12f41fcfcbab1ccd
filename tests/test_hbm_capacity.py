"""HBM capacity ownership (VERDICT r2 item 5).

The index bundle must report its device footprint before placement, the
engines must refuse corpora that cannot fit the backend's memory, and the
builder must derive a corpus-appropriate postings width instead of a flat
512.
"""
import logging

import numpy as np
import pytest

from review_recommender_tpu.index.build import (
    build_bundle_from_products,
    build_product_index,
    derive_doc_terms_cap,
)
from review_recommender_tpu.index.schema import check_hbm_fit, enforce_hbm_fit
from tests.test_engine_parity import make_corpus


@pytest.fixture(scope="module")
def bundle():
    products, emb, reviews, remb = make_corpus(n=48, dim=64, seed=3)
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=16, doc_terms_cap=64,
    )


class TestFootprint:
    def test_bytes_match_shapes(self, bundle):
        fp = bundle.products.device_footprint("float32")
        p = bundle.products
        assert fp["emb"] == p.n_padded * p.dim * 4
        assert fp["doc_terms"] == p.n_padded * p.terms_cap * 4
        assert fp["valid"] == p.n_padded
        # review arrays included at the bundle level
        full = bundle.device_footprint("float32")
        assert full["rev_emb"] == (bundle.reviews.m_padded
                                   * bundle.reviews.rev_emb.shape[1] * 4)
        assert sum(full.values()) > sum(fp.values())

    def test_int8_halves_emb(self, bundle):
        f32 = bundle.products.device_footprint("float32")
        i8 = bundle.products.device_footprint("bfloat16", quantize_int8=True)
        assert i8["emb_q"] == f32["emb"] // 4  # int8 vs f32
        assert "emb" not in i8 and "emb_scale" in i8

    def test_check_hbm_fit_sharding_divides(self):
        rep1 = check_hbm_fit(8 * 2**30, n_shards=1)
        rep8 = check_hbm_fit(8 * 2**30, n_shards=8)
        assert rep8["per_device_bytes"] == rep1["per_device_bytes"] // 8

    def test_enforce_refuses_oversized(self, bundle, monkeypatch):
        """With a mocked 1 MiB device limit the engine-side gate refuses."""
        import review_recommender_tpu.index.schema as schema

        monkeypatch.setattr(schema, "device_memory_limit", lambda: 2**10)
        with pytest.raises(RuntimeError, match="GiB"):
            enforce_hbm_fit(bundle, "float32")
        # escape hatch downgrades to a warning
        monkeypatch.setenv("RRT_IGNORE_HBM_CHECK", "true")
        rep = enforce_hbm_fit(bundle, "float32")
        assert not rep["fits"]

    def test_enforce_warns_near_limit(self, bundle, monkeypatch, caplog):
        import review_recommender_tpu.index.schema as schema

        total = sum(bundle.device_footprint("float32").values())
        monkeypatch.setattr(schema, "device_memory_limit",
                            lambda: int(total / 0.9))
        with caplog.at_level(logging.WARNING):
            rep = enforce_hbm_fit(bundle, "float32")
        assert rep["fits"] and rep["warn"]
        assert any("HBM" in r.message or "GiB" in r.message
                   for r in caplog.records)

    def test_audit_reports_footprint(self, bundle, tmp_path):
        from review_recommender_tpu.index.io import save_bundle
        from review_recommender_tpu.serve.audit import audit_index_dir

        save_bundle(bundle, tmp_path / "idx")
        report = audit_index_dir(tmp_path / "idx")
        assert report["ok"]
        fp = report["device_footprint"]
        assert fp["total_bytes"] > 0
        assert "doc_terms" in fp["bytes_per_array"]
        assert any(c["check"] == "hbm_fit" for c in report["checks"])


class TestAutoCap:
    def test_derive_rounding_and_clamps(self):
        assert derive_doc_terms_cap(np.full(100, 100)) == 104  # next mult of 8
        assert derive_doc_terms_cap(np.full(100, 3)) == 32     # floor
        assert derive_doc_terms_cap(np.full(100, 9000)) == 512  # ceiling

    def test_auto_cap_follows_corpus(self):
        """A corpus whose docs have ~20 unique terms gets L≈24, not 512."""
        rng = np.random.default_rng(0)
        words = [f"w{i}" for i in range(200)]
        texts = [" ".join(rng.choice(words, size=20)) for _ in range(64)]
        emb = rng.standard_normal((64, 16)).astype(np.float32)
        pidx = build_product_index(
            [f"S{i}" for i in range(64)], texts, [5.0] * 64, [4.0] * 64,
            emb, doc_terms_cap="auto", pad_multiple=8,
        )
        assert pidx.terms_cap <= 32
        assert pidx.terms_cap % 8 == 0

    def test_auto_cap_scores_match_flat_cap(self):
        """BM25 candidate scores are identical when no doc exceeds the
        derived cap (the common case: P99 covers the corpus)."""
        rng = np.random.default_rng(1)
        words = [f"term{i}" for i in range(50)]
        texts = [" ".join(rng.choice(words, size=15)) for _ in range(32)]
        emb = rng.standard_normal((32, 16)).astype(np.float32)
        args = ([f"S{i}" for i in range(32)], texts, [5.0] * 32, [4.0] * 32,
                emb)
        p_auto = build_product_index(*args, doc_terms_cap="auto",
                                     pad_multiple=8)
        p_flat = build_product_index(*args, doc_terms_cap=64, pad_multiple=8)
        n = p_auto.n_docs
        La = p_auto.terms_cap
        np.testing.assert_array_equal(p_auto.doc_terms[:n],
                                      p_flat.doc_terms[:n, :La])
        np.testing.assert_array_equal(p_auto.doc_tf[:n],
                                      p_flat.doc_tf[:n, :La])
        # everything beyond the derived cap in the flat build is padding
        assert (p_flat.doc_terms[:n, La:] == 0).all()
