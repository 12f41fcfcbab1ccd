"""Native tower format tests: save_native_tower <-> load round-trips
(torch-free), loader dispatch via the format marker, and the `rrt train`
CLI end-to-end on a tiny bundle."""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from review_recommender_tpu.models.bert import (
    BertConfig,
    init_biencoder,
    init_crossencoder,
)
from review_recommender_tpu.models.encoder import BiEncoder, CrossEncoder
from review_recommender_tpu.models.load import (
    NATIVE_FORMAT,
    load_biencoder,
    load_crossencoder,
    load_native_biencoder,
    load_native_crossencoder,
    save_native_tower,
)
from review_recommender_tpu.models.tokenizer import (
    HashTokenizer,
    WordPieceTokenizer,
)

TEXTS = ["wireless headphones with great sound",
         "soft yellow socks", "stainless chef knife"]


@pytest.fixture(scope="module")
def bi_tower():
    cfg = BertConfig.tiny(vocab_size=512)
    _, params = init_biencoder(cfg, seed=3)
    return BiEncoder(cfg, params, HashTokenizer(512), dtype=jnp.float32,
                     max_len=32)


def test_biencoder_roundtrip(bi_tower, tmp_path):
    out = save_native_tower(tmp_path / "bi", "biencoder", bi_tower.cfg,
                            bi_tower.params, bi_tower.tokenizer)
    meta = json.loads((out / "config.json").read_text())
    assert meta["format"] == NATIVE_FORMAT
    assert meta["kind"] == "biencoder"
    assert meta["tokenizer"]["type"] == "hash"

    loaded = load_native_biencoder(out, dtype=jnp.float32, max_len=32)
    np.testing.assert_allclose(loaded.encode(TEXTS), bi_tower.encode(TEXTS),
                               atol=1e-6)


def test_loader_dispatches_on_marker(bi_tower, tmp_path):
    out = save_native_tower(tmp_path / "bi", "biencoder", bi_tower.cfg,
                            bi_tower.params, bi_tower.tokenizer)
    # the generic HF loader must notice the marker and take the native path
    loaded = load_biencoder(out, dtype=jnp.float32, max_len=32)
    np.testing.assert_allclose(loaded.encode(TEXTS), bi_tower.encode(TEXTS),
                               atol=1e-6)


def test_crossencoder_roundtrip(tmp_path):
    cfg = BertConfig.tiny(vocab_size=512)
    _, params = init_crossencoder(cfg, seed=5)
    xe = CrossEncoder(cfg, params, HashTokenizer(512), dtype=jnp.float32,
                      max_len=64)
    out = save_native_tower(tmp_path / "xe", "crossencoder", cfg, params,
                            xe.tokenizer)
    loaded = load_crossencoder(out, dtype=jnp.float32, max_len=64)
    q = ["best headphones"] * len(TEXTS)
    np.testing.assert_allclose(loaded.score_pairs(q, TEXTS),
                               xe.score_pairs(q, TEXTS), atol=1e-6)


def test_kind_mismatch_rejected(bi_tower, tmp_path):
    out = save_native_tower(tmp_path / "bi", "biencoder", bi_tower.cfg,
                            bi_tower.params, bi_tower.tokenizer)
    with pytest.raises(ValueError, match="expected 'crossencoder'"):
        load_native_crossencoder(out)


def test_wordpiece_vocab_roundtrip(tmp_path):
    vocab_words = ("[PAD] [UNK] [CLS] [SEP] [MASK] wireless head ##phones "
                   "great sound soft yellow socks").split()
    vocab = {w: i for i, w in enumerate(vocab_words)}
    tok = WordPieceTokenizer(vocab)
    cfg = BertConfig.tiny(vocab_size=len(vocab))
    _, params = init_biencoder(cfg, seed=1)
    bi = BiEncoder(cfg, params, tok, dtype=jnp.float32, max_len=32)
    out = save_native_tower(tmp_path / "wp", "biencoder", cfg, params, tok)
    assert (out / "vocab.txt").exists()
    loaded = load_native_biencoder(out, dtype=jnp.float32, max_len=32)
    assert loaded.tokenizer.vocab == vocab
    np.testing.assert_allclose(loaded.encode(TEXTS), bi.encode(TEXTS),
                               atol=1e-6)


def test_cli_train_end_to_end(tmp_path, monkeypatch):
    """rrt train on a tiny bundle: mines pairs from the bundle's reviews,
    trains both towers, writes native dirs the serving loaders accept."""
    from tests.test_engine_parity import make_corpus
    from review_recommender_tpu.index.build import build_bundle_from_products
    from review_recommender_tpu.index.io import save_bundle
    from review_recommender_tpu.serve.cli import main

    p, e, r, re_ = make_corpus(n=24, dim=32, seed=9)
    idx = tmp_path / "idx"
    save_bundle(
        build_bundle_from_products(p, e, reviews=r, review_embeddings=re_,
                                   pad_multiple=8, doc_terms_cap=32),
        idx,
    )
    out = tmp_path / "towers"
    rc = main([
        "train", "--index-dir", str(idx), "--out", str(out), "--cross",
        "--epochs", "1", "--batch-size", "8", "--max-len", "32",
        "--hidden", "64", "--layers", "1", "--vocab-size", "512",
    ])
    assert rc == 0
    bi = load_biencoder(out / "biencoder", max_len=32)
    emb = bi.encode(TEXTS)
    assert emb.shape == (3, 64)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)
    xe = load_crossencoder(out / "crossencoder", max_len=64)
    scores = xe.score_pairs(["socks"] * 3, TEXTS)
    assert scores.shape == (3,) and np.isfinite(scores).all()


def test_cli_train_with_mlm_pretrain(tmp_path):
    """--mlm-steps pretrains a trunk, grafts it into BOTH from-scratch
    towers (cross-encoder dims follow the trunk), and saves it."""
    from tests.test_engine_parity import make_corpus
    from review_recommender_tpu.index.build import build_bundle_from_products
    from review_recommender_tpu.index.io import save_bundle
    from review_recommender_tpu.serve.cli import main

    p, e, r, re_ = make_corpus(n=16, dim=32, seed=4)
    idx = tmp_path / "idx"
    save_bundle(
        build_bundle_from_products(p, e, reviews=r, review_embeddings=re_,
                                   pad_multiple=8, doc_terms_cap=32),
        idx,
    )
    out = tmp_path / "towers"
    rc = main([
        "train", "--index-dir", str(idx), "--out", str(out), "--cross",
        "--epochs", "1", "--batch-size", "8", "--max-len", "32",
        "--hidden", "64", "--layers", "1", "--vocab-size", "512",
        "--mlm-steps", "4",
    ])
    assert rc == 0
    assert (out / "mlm_trunk.msgpack").exists()
    bi = load_biencoder(out / "biencoder", max_len=32)
    assert bi.encode(TEXTS).shape == (3, 64)
    xe = load_crossencoder(out / "crossencoder", max_len=64)
    # cross-encoder took the trunk dims (hidden 64), not the hidden//2 path
    assert xe.cfg.hidden_size == 64 and xe.cfg.intermediate_size == 128
    assert np.isfinite(xe.score_pairs(["socks"] * 3, TEXTS)).all()
