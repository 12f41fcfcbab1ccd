"""Index bundle build + save/load round-trip tests."""
import numpy as np
import pytest

from review_recommender_tpu.index.build import (
    build_bundle_from_products,
    compute_idf,
)
from review_recommender_tpu.index.io import load_bundle, save_bundle


def _mini_bundle(with_reviews=True):
    rng = np.random.default_rng(1)
    products = [
        {"sku": "A", "agg_text": "yellow socks cats", "n_reviews": 5, "avg_stars": 4.0},
        {"sku": "B", "agg_text": "wireless headphones noise cancelling", "n_reviews": 9,
         "avg_stars": 3.5},
        {"sku": "C", "agg_text": "keyboard keyboard gaming", "n_reviews": 2,
         "avg_stars": float("nan")},
    ]
    emb = rng.standard_normal((3, 16)).astype(np.float32)
    reviews = None
    remb = None
    if with_reviews:
        reviews = [
            {"sku": "A", "text": "great socks", "stars": 5},
            {"sku": "A", "text": "nice yellow", "stars": 4},
            {"sku": "B", "text": "loud bass", "stars": 3},
            {"sku": "ZZZ", "text": "orphan review", "stars": 1},
        ]
        remb = rng.standard_normal((4, 16)).astype(np.float32)
    return build_bundle_from_products(
        products, emb, reviews=reviews, review_embeddings=remb,
        pad_multiple=8, doc_terms_cap=16,
    )


def test_build_shapes_and_padding():
    b = _mini_bundle()
    p = b.products
    assert p.n_docs == 3 and p.n_padded == 8
    assert p.valid[:3].all() and not p.valid[3:].any()
    # embeddings L2-normalized
    norms = np.linalg.norm(p.emb[:3], axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)
    # doc_len counts tokens incl. duplicates ("keyboard keyboard gaming" = 3)
    assert p.doc_len[2] == 3.0
    # gate bits: doc A contains "socks", "cats" -> "cat" substring too
    from review_recommender_tpu.utils.text import GATE_PHRASE_ID
    assert p.gate_bits[0, GATE_PHRASE_ID["socks"]]
    assert p.gate_bits[0, GATE_PHRASE_ID["cat"]]  # substring of "cats"
    assert not p.gate_bits[1, GATE_PHRASE_ID["socks"]]


def test_orphan_review_goes_to_discard_bucket():
    b = _mini_bundle()
    r = b.reviews
    assert r.rev_product[3] == 3  # == n_products discard bucket


def test_idf_epsilon_floor():
    # term in all docs -> raw idf negative -> floored at eps * avg_idf
    df = np.array([0, 3, 1], np.int32)  # PAD, common, rare
    idf = compute_idf(df, 3)
    assert idf[0] == 0.0
    raw_common = np.log(3 - 3 + 0.5) - np.log(3.5)
    raw_rare = np.log(2.5) - np.log(1.5)
    avg = (raw_common + raw_rare) / 2
    assert idf[1] == pytest.approx(0.25 * avg, rel=1e-5)
    assert idf[2] == pytest.approx(raw_rare, rel=1e-5)


def test_save_load_roundtrip(tmp_path):
    b = _mini_bundle()
    save_bundle(b, tmp_path / "idx")
    b2 = load_bundle(tmp_path / "idx", verify_checksums=True)
    p, p2 = b.products, b2.products
    np.testing.assert_array_equal(p.emb, p2.emb)
    np.testing.assert_array_equal(p.doc_terms, p2.doc_terms)
    np.testing.assert_array_equal(p.gate_bits, p2.gate_bits)
    np.testing.assert_allclose(p.idf, p2.idf)
    assert p.vocab == p2.vocab
    assert p.skus == p2.skus
    assert p2.avgdl == pytest.approx(p.avgdl)
    assert b2.reviews is not None
    np.testing.assert_array_equal(b.reviews.rev_product, b2.reviews.rev_product)
    assert b2.reviews.rev_texts == b.reviews.rev_texts


def test_checksum_validation(tmp_path):
    b = _mini_bundle(with_reviews=False)
    out = save_bundle(b, tmp_path / "idx")
    (out / "vocab.txt").write_text("tampered\n")
    with pytest.raises(ValueError, match="checksum"):
        load_bundle(out, verify_checksums=True)
