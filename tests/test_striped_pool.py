"""Striped dense-pool mode (ops/dense.py:striped_topk + DENSE_POOL_MODE):
exact scores, stripe-level pool membership, exactness when n <= stripes."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from review_recommender_tpu.engine.search import SearchEngine
from review_recommender_tpu.index.build import build_bundle_from_products
from review_recommender_tpu.ops.dense import striped_topk
from review_recommender_tpu.ops.fusion import FusionWeights
from tests.test_engine_parity import make_corpus


def test_exact_when_stripes_ge_n():
    rng = np.random.default_rng(0)
    sims = jnp.asarray(rng.standard_normal(100).astype(np.float32))
    top, idx = striped_topk(sims, pool=10, stripes=128)
    want_s, want_i = jax.lax.top_k(sims, 10)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_i))
    np.testing.assert_allclose(np.asarray(top), np.asarray(want_s))


def test_scores_exact_and_recall_high():
    rng = np.random.default_rng(1)
    n, pool = 4096, 32
    sims_h = rng.standard_normal(n).astype(np.float32)
    top, idx = map(np.asarray, striped_topk(jnp.asarray(sims_h), pool,
                                            stripes=512))
    # every returned (idx, score) pair is exact
    np.testing.assert_allclose(top, sims_h[idx], rtol=1e-6)
    # descending order
    assert np.all(np.diff(top) <= 1e-6)
    # recall vs exact pool: expected ~1 - pool^2/(2*512) ~ 0.999
    exact = set(np.argsort(-sims_h)[:pool].tolist())
    assert len(exact & set(idx.tolist())) / pool >= 0.9


def test_handles_non_divisible_n():
    rng = np.random.default_rng(2)
    sims_h = rng.standard_normal(1000).astype(np.float32)  # 1000 % 128 != 0
    top, idx = map(np.asarray, striped_topk(jnp.asarray(sims_h), 16,
                                            stripes=128))
    assert idx.max() < 1000
    np.testing.assert_allclose(top, sims_h[idx], rtol=1e-6)


def test_batched_under_vmap():
    rng = np.random.default_rng(3)
    sims_h = rng.standard_normal((4, 512)).astype(np.float32)
    f = jax.vmap(lambda s: striped_topk(s, 8, stripes=64))
    top, idx = map(np.asarray, f(jnp.asarray(sims_h)))
    assert top.shape == (4, 8) and idx.shape == (4, 8)
    for b in range(4):
        np.testing.assert_allclose(top[b], sims_h[b][idx[b]], rtol=1e-6)


def test_scan_matches_separate_pipeline():
    """dense_striped_topk_scan (fused score+pool, strided stripes) returns
    EXACT scores for whatever rows it picks, recall comparable to
    striped_topk, and is exact when every stripe holds one row."""
    from review_recommender_tpu.ops.dense import (
        dense_scores,
        dense_striped_topk_scan,
        slice_corpus_for_striped,
    )

    rng = np.random.default_rng(5)
    n, d, pool = 1000, 32, 16
    emb_h = rng.standard_normal((n, d)).astype(np.float32)
    emb_h /= np.linalg.norm(emb_h, axis=1, keepdims=True)
    valid_h = np.ones(n, bool)
    valid_h[-7:] = False  # padding rows must never be selected
    q = rng.standard_normal(d).astype(np.float32)

    emb = jnp.asarray(emb_h)
    valid = jnp.asarray(valid_h)
    sims = np.asarray(dense_scores(emb, jnp.asarray(q), valid))

    # stripes >= n -> exact top-k
    emb_s, valid_s = slice_corpus_for_striped(emb, valid, stripes=1024)
    top, idx = map(np.asarray,
                   dense_striped_topk_scan(emb_s, valid_s, jnp.asarray(q),
                                           pool))
    exact_idx = np.argsort(-sims)[:pool]
    np.testing.assert_array_equal(np.sort(idx), np.sort(exact_idx))
    np.testing.assert_allclose(top, sims[idx], atol=1e-6)

    # stripes < n -> scores still exact for the chosen rows, high recall,
    # invalid rows excluded
    emb_s, valid_s = slice_corpus_for_striped(emb, valid, stripes=128)
    top, idx = map(np.asarray,
                   dense_striped_topk_scan(emb_s, valid_s, jnp.asarray(q),
                                           pool))
    assert (idx < n - 7).all()
    np.testing.assert_allclose(top, sims[idx], atol=1e-6)
    assert len(set(idx.tolist()) & set(exact_idx.tolist())) >= pool - 3

    # batched under vmap
    qs = rng.standard_normal((4, d)).astype(np.float32)
    f = jax.vmap(lambda qq: dense_striped_topk_scan(emb_s, valid_s, qq, 8))
    tb, ib = map(np.asarray, f(jnp.asarray(qs)))
    assert tb.shape == (4, 8) and ib.shape == (4, 8)
    for b in range(4):
        sims_b = np.where(valid_h, emb_h @ qs[b], -np.inf)
        np.testing.assert_allclose(tb[b], sims_b[ib[b]], atol=1e-5)


def test_int8_scan_matches_int8_pipeline():
    from review_recommender_tpu.ops.dense import (
        dense_scores_int8,
        dense_striped_topk_scan_int8,
        quantize_corpus_int8,
        slice_corpus_for_striped_int8,
    )

    rng = np.random.default_rng(11)
    n, d, pool = 500, 32, 12
    emb_h = rng.standard_normal((n, d)).astype(np.float32)
    emb_h /= np.linalg.norm(emb_h, axis=1, keepdims=True)
    valid = jnp.asarray(np.arange(n) < n - 5)
    q = jnp.asarray(rng.standard_normal(d).astype(np.float32))
    emb_q, scale = quantize_corpus_int8(jnp.asarray(emb_h))
    sims = np.asarray(dense_scores_int8(emb_q, scale, q, valid))

    qs3, sc3, v3 = slice_corpus_for_striped_int8(emb_q, scale, valid, 64)
    top, idx = map(np.asarray,
                   dense_striped_topk_scan_int8(qs3, sc3, v3, q, pool))
    assert (idx < n - 5).all()
    np.testing.assert_allclose(top, sims[idx], atol=1e-6)
    exact_idx = np.argsort(-sims)[:pool]
    assert len(set(idx.tolist()) & set(exact_idx.tolist())) >= pool - 2


def test_engine_int8_striped_mode():
    from tests.test_engine_parity import make_corpus
    from review_recommender_tpu.engine.search import SearchEngine
    from review_recommender_tpu.index.build import build_bundle_from_products
    from review_recommender_tpu.ops.fusion import FusionWeights

    products, emb, _r, _re = make_corpus(n=64, dim=32, seed=6)
    bundle = build_bundle_from_products(products, emb, pad_multiple=16,
                                        doc_terms_cap=32)
    eng = SearchEngine(bundle, emb_dtype="int8", gate_mode="device",
                       dense_pool="striped")
    assert "emb_qs" in eng.arrays
    qv = np.asarray(emb[3], np.float32)
    rows, scores = eng.query_fused(qv, products[3]["agg_text"][:30],
                                   FusionWeights.make(), pool=16, k=5)
    rows = np.asarray(rows)
    assert rows.shape == (5,) and np.isfinite(np.asarray(scores)[0])
    # self-query: the doc itself must be in the pool (stripes >= n: exact)
    assert 3 in rows.tolist() or np.asarray(scores)[0] > 0


def test_engine_striped_uses_scan_path():
    """A striped-mode engine builds the (s, G, D) slices and routes
    _dense_topk through the fused scan."""
    from tests.test_engine_parity import make_corpus
    from review_recommender_tpu.engine.search import SearchEngine
    from review_recommender_tpu.index.build import build_bundle_from_products

    products, emb, _r, _re = make_corpus(n=64, dim=32, seed=2)
    bundle = build_bundle_from_products(products, emb, pad_multiple=16,
                                        doc_terms_cap=32)
    eng = SearchEngine(bundle, emb_dtype="float32", gate_mode="device",
                       dense_pool="striped")
    assert "emb_s" in eng.arrays and "valid_s" in eng.arrays
    s, g, d = eng.arrays["emb_s"].shape
    assert s * g >= eng.products.n_padded and d == 32


def test_engine_striped_mode_small_corpus_matches_exact():
    """On a corpus smaller than the stripe count the striped engine is
    bit-identical to the exact engine (stripe size 1)."""
    products, emb, _r, _re = make_corpus(n=48, dim=32, seed=21)
    bundle = build_bundle_from_products(products, emb, pad_multiple=16,
                                        doc_terms_cap=64)
    exact = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
    striped = SearchEngine(bundle, emb_dtype="float32", gate_mode="device",
                           dense_pool="striped")
    assert striped.dense_pool == "striped"
    rng = np.random.default_rng(5)
    w = FusionWeights.make(w_dense=0.5, w_bm25=0.3, w_prior=0.2)
    for q in ["yellow cat socks", "wireless headphones"]:
        qv = rng.standard_normal(32).astype(np.float32)
        r1, s1 = exact.query_fused(qv, q, w, pool=32, k=8)
        r2, s2 = striped.query_fused(qv, q, w, pool=32, k=8)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-6)


def test_engine_striped_mode_large_pool_recall():
    """With stripes < n the pool is approximate but top results with clear
    margins survive."""
    from review_recommender_tpu import config as cfg_mod

    products, emb, _r, _re = make_corpus(n=256, dim=32, seed=22)
    bundle = build_bundle_from_products(products, emb, pad_multiple=16,
                                        doc_terms_cap=64)
    old = cfg_mod.config.DENSE_POOL_STRIPES
    cfg_mod.config.DENSE_POOL_STRIPES = 64
    try:
        exact = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
        striped = SearchEngine(bundle, emb_dtype="float32",
                               gate_mode="device", dense_pool="striped")
        rng = np.random.default_rng(9)
        w = FusionWeights.make(w_dense=1.0, w_bm25=0.0, w_prior=0.0,
                               min_reviews=0)
        hits = tot = 0
        for q in ["socks", "headphones", "knife", "shoes"]:
            qv = rng.standard_normal(32).astype(np.float32)
            r1, _ = exact.query_fused(qv, q, w, pool=32, k=8)
            r2, _ = striped.query_fused(qv, q, w, pool=32, k=8)
            hits += len(set(np.asarray(r1).tolist())
                        & set(np.asarray(r2).tolist()))
            tot += 8
        assert hits / tot >= 0.75
    finally:
        cfg_mod.config.DENSE_POOL_STRIPES = old


def test_sharded_striped_matches_exact_small_corpus():
    """With per-shard stripe count >= local rows the sharded striped path is
    bit-identical to the exact sharded path (stripe size 1)."""
    from review_recommender_tpu.parallel.sharded import ShardedSearchEngine

    products, emb, _r, _re = make_corpus(n=96, dim=64, seed=4)
    bundle = build_bundle_from_products(products, emb, pad_multiple=16,
                                        doc_terms_cap=64)
    exact = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")
    striped = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32",
                                  dense_pool="striped")
    rng = np.random.default_rng(11)
    w = FusionWeights.make(w_dense=0.5, w_bm25=0.3, w_prior=0.2,
                           min_reviews=5, gate_penalty=0.3)
    for q in ["yellow cat socks", "wireless bluetooth headphones"]:
        qv = rng.standard_normal(64).astype(np.float32)
        qv /= np.linalg.norm(qv)
        r1, s1 = exact.query_fused(qv, q, w, pool=48, k=10)
        r2, s2 = striped.query_fused(qv, q, w, pool=48, k=10)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)


def test_config_validates_mode(monkeypatch):
    from review_recommender_tpu.config import Config

    monkeypatch.setattr(Config, "DENSE_POOL_MODE", "bogus")
    with pytest.raises(ValueError, match="DENSE_POOL_MODE"):
        Config.validate()


def test_config_validates_auto_min(monkeypatch):
    from review_recommender_tpu.config import Config

    monkeypatch.setattr(Config, "DENSE_POOL_MODE", "auto")
    Config.validate()  # 'auto' is a legal mode
    monkeypatch.setattr(Config, "DENSE_POOL_AUTO_MIN", 0)
    with pytest.raises(ValueError, match="DENSE_POOL_AUTO_MIN"):
        Config.validate()


def test_auto_mode_resolution(monkeypatch):
    """'auto' resolves by padded corpus size: exact below
    DENSE_POOL_AUTO_MIN (tests/parity corpora), striped at or above it
    (production corpora). Explicit modes are never overridden."""
    from review_recommender_tpu.config import Config

    assert Config.resolve_pool_mode("exact", 10**9) == "exact"
    assert Config.resolve_pool_mode("striped", 8) == "striped"
    monkeypatch.setattr(Config, "DENSE_POOL_AUTO_MIN", 100)
    assert Config.resolve_pool_mode("auto", 99) == "exact"
    assert Config.resolve_pool_mode("auto", 100) == "striped"


def test_engine_auto_mode_small_corpus_is_exact(monkeypatch):
    """Default-constructed engines on small corpora resolve auto -> exact,
    keeping every oracle-parity test on the reference-identical pool; with
    the threshold forced below the corpus size the same construction picks
    striped, on the single-chip AND sharded engines."""
    from review_recommender_tpu.engine import search as search_mod
    from review_recommender_tpu.parallel import sharded as sharded_mod
    from review_recommender_tpu.parallel.sharded import ShardedSearchEngine

    # patch the class of the instance each ENGINE module captured at its
    # import (test_config.py reloads the config module, so modules imported
    # before and after that reload can hold DIFFERENT Config classes)
    classes = {type(search_mod.config), type(sharded_mod.config)}

    products, emb, _r, _re = make_corpus(n=96, dim=32, seed=3)
    bundle = build_bundle_from_products(products, emb, pad_multiple=16,
                                        doc_terms_cap=64)
    for C in classes:
        monkeypatch.setattr(C, "DENSE_POOL_MODE", "auto")
    eng = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
    assert eng.dense_pool == "exact"

    for C in classes:
        monkeypatch.setattr(C, "DENSE_POOL_AUTO_MIN", 64)
    eng2 = SearchEngine(bundle, emb_dtype="float32", gate_mode="device")
    assert eng2.dense_pool == "striped"
    sh = ShardedSearchEngine(bundle, n_shards=8, emb_dtype="float32")
    assert sh.dense_pool == "striped"
